"""First-order Markov chains over per-conversation state sequences.

Agent transcripts are STATE SEQUENCES — role/tool per turn.  The
transition structure (what follows what, and where mass concentrates
after k steps) is the behavioral fingerprint of a corpus: it powers
drift comparison between corpus snapshots, synthetic-data QA (does the
generator's chain match production?), and anomaly routing (a
conversation whose transitions are improbable under the corpus chain).
Complements `trajectories.py` (exact path identity) with the
distributional view.

Determinism contract: transition counts and row marginals are exact
bigints; probabilities are single divisions rounded to ``dp``.  The
k-step distribution folds at most |S| terms per destination state in
sorted source order (`aggregate(array_sort(collect_list(...)))` vs the
oracle's ``SUM(term ORDER BY src)``), with each step's result rounded
to ``dp`` before the next — the same fixed-K bit-pinned-trajectory
discipline as `graph.pagerank` and `textstats.quality_train_logreg`.

Dangling states (states never observed as a transition source — e.g. a
role that only ever ends conversations) follow the SELF-LOOP
convention: their mass stays put, so the distribution remains a
distribution at every step (the PageRank dangling-mass problem, solved
the boring way because chains here are small and the oracle must agree
exactly).

Scale shape: transitions come from one lag window partitioned by
conversation (parallel, the sessionize shape).  The chain itself is
|S|^2 rows — tiny — so every step of the power iteration broadcasts
the chain and shuffles only |S| rows; the heavy data is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["transition_matrix", "initial_distribution", "k_step_distribution"]


def transition_matrix(
    df: DataFrame,
    seq_col: str,
    order_col: str,
    state_col: str,
    dp: int = 9,
) -> DataFrame:
    """Per-(src, dst) transition counts + row-normalized probabilities
    from (sequence id, order, state) rows: consecutive turns within a
    sequence form one transition.  Returns (src, dst, n, prob), prob =
    n / sum_dst n — an exact rational, rounded."""
    w = Window.partitionBy("_seq").orderBy("_ord")
    pairs = (
        df.select(
            F.col(seq_col).alias("_seq"),
            F.col(order_col).alias("_ord"),
            F.col(state_col).alias("src"),
        )
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
    )
    per = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("n")
    )
    out = per.withColumn(
        "_tot", F.sum("n").over(Window.partitionBy("src"))
    )
    return out.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.col("_tot").cast("double"), dp).alias("prob"),
    )


def initial_distribution(
    df: DataFrame,
    seq_col: str,
    order_col: str,
    state_col: str,
    dp: int = 9,
) -> DataFrame:
    """Distribution of each sequence's FIRST state (by min order):
    (state, n, prob) — exact counts, single division."""
    w = Window.partitionBy("_seq").orderBy("_ord")
    first = (
        df.select(
            F.col(seq_col).alias("_seq"),
            F.col(order_col).alias("_ord"),
            F.col(state_col).alias("state"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    per = first.groupBy("state").agg(F.count("*").cast("bigint").alias("n"))
    tot = per.agg(F.sum("n").cast("bigint").alias("_t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "state",
        "n",
        F.round(F.col("n") / F.col("_t").cast("double"), dp).alias("prob"),
    )


def k_step_distribution(
    transitions: DataFrame,
    init: DataFrame,
    k: int,
    dp: int = 9,
) -> DataFrame:
    """Push the initial distribution ``k`` steps through the chain:
    d_{t+1}(s') = sum_s d_t(s) * P(s, s'), dangling states self-loop.
    Each step's probabilities are rounded to ``dp`` before the next
    (bit-pinned trajectory).  Returns (state, prob) for states with
    nonzero mass."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    trans = transitions.select("src", "dst", "prob").localCheckpoint(
        eager=True
    )
    sources = trans.select(F.col("src").alias("state")).distinct()
    dist = init.select("state", F.col("prob").alias("p"))
    for _ in range(k):
        live = dist.join(F.broadcast(sources), "state", "left_semi")
        dangling = dist.join(F.broadcast(sources), "state", "left_anti")
        moved = (
            live.join(
                F.broadcast(trans), live["state"] == trans["src"]
            )
            .select(
                F.col("dst").alias("state"),
                F.col("src").alias("_src"),
                (F.col("p") * F.col("prob")).alias("_term"),
            )
            .groupBy("state")
            .agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("_src", "_term"))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["_term"],
                ).alias("p")
            )
        )
        # a dangling state may ALSO receive moved mass: combine with one
        # full outer join + a single two-operand addition (deterministic;
        # a groupBy-sum over the union would fold in partition order)
        dist = (
            moved.join(
                dangling.select("state", F.col("p").alias("_dp")),
                "state",
                "full",
            )
            .select(
                "state",
                F.round(
                    F.coalesce(F.col("p"), F.lit(0.0))
                    + F.coalesce(F.col("_dp"), F.lit(0.0)),
                    dp,
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    return dist.select("state", F.col("p").alias("prob")).filter(
        F.col("prob") > 0
    )
