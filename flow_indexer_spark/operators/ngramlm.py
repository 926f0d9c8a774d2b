"""Distributed n-gram language models: Stupid Backoff (trigram) and
interpolated Kneser-Ney (bigram) training + scoring, entirely on the
engine.

These are the two classic web-scale LM recipes: Stupid Backoff is the
scheme Google built FOR distributed counting (Brants et al. 2007,
"Large Language Models in Machine Translation" — score = count ratios
with a fixed backoff multiplier, no normalization, so training is
nothing but count aggregations), and interpolated Kneser-Ney is the
standard smoothed model whose continuation counts ("how many distinct
contexts precede w") are themselves plain distinct-aggregations. The
reference's analogue is the per-document indexer that reduces a corpus
to count tables and answers queries by joining against them
(/root/reference/store/leveldb.go postings counts; flowindexer/
flowindexer.go:368-394 bucket counting) — here the "index" is the
n-gram count tables and the "query" is a likelihood join.

Scale notes (100 TB corpus):
- Training is groupBy count aggregations on gram keys — map-side
  combined, one Exchange per order, key cardinality = distinct grams
  (sub-linear in corpus size). Gram explode is in-row (transform over
  a bound token array, no UDF).
- Scoring joins candidate grams against the count tables on gram keys
  — shuffle hash joins; the model is NEVER broadcast (a vocab^2/3
  table) and never collected. Corpus totals travel as a broadcast
  1-row cross join.
- Pass ``model_path`` to persist the top-order count table once and
  derive the lower orders from the scan (train-once / score-many, the
  same persisted-state idiom as dedup_state / bigram_lm_scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grams(
    df: DataFrame, n: int, text_col: str = "text", *keep: Column | str
) -> DataFrame:
    """In-row n-gram explode: one output row per length-``n`` window of
    the whitespace token stream, columns w1..wn (+ ``keep``). The token
    array is bound once per row (element_at re-splitting per position
    is O(len^2) — same pitfall textstats.bigram_lm_scores documents)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from flow_indexer_spark.functions.inrow import bind
    from flow_indexer_spark.operators.dedup import tokens

    def _grams(tok):
        idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
        packs = F.transform(
            idx,
            lambda i: F.struct(
                *[
                    F.element_at(tok, i + k).alias(f"w{k + 1}")
                    for k in range(n)
                ]
            ),
        )
        return F.when(F.size(tok) >= n, packs)

    d = df.select(*keep, bind(tokens(text_col), _grams).alias("_g"))
    return (
        d.filter(F.col("_g").isNotNull())
        .select(*keep, F.explode("_g").alias("_e"))
        .select(
            *keep, *[F.col(f"_e.w{k + 1}").alias(f"w{k + 1}") for k in range(n)]
        )
    )


def stupid_backoff_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.4,
    model_path: str | None = None,
) -> DataFrame:
    """Trigram Stupid Backoff (Brants et al. 2007 §4): score every doc
    with >= 3 tokens by the mean log backoff-score of its trigrams.

    S(w3 | w1 w2) = C(w1w2w3)/C(w1w2)            if the trigram was seen
                  = lam * C(w2w3)/C(w2)          elif the bigram was seen
                  = lam^2 * C(w3)/N              elif w3 was seen
                  = lam^2 * 1/N                  (OOV floor; the paper
                    trains on the full vocab and never needs one — a
                    held-out scorer does, and 1/N is the count-1 score)

    Lower-order counts are standalone corpus counts (every adjacent
    bigram / every token), NOT marginals of the trigram table — the
    paper's counting, and what makes each order one independent
    aggregation. Returns (id, n_trigrams, avg_logs, backoff_ppl) where
    backoff_ppl = exp(-avg_logs) (a perplexity-like diagnostic; stupid
    backoff scores are not normalized probabilities, Brants §4)."""
    spark = train_df.sparkSession
    t3 = grams(train_df, 3, text_col)
    c3 = t3.groupBy("w1", "w2", "w3").agg(F.count("*").alias("_c3"))
    if model_path is not None:
        c3.write.mode("overwrite").parquet(model_path + "/c3")
        grams(train_df, 2, text_col).groupBy("w1", "w2").agg(
            F.count("*").alias("_c2")
        ).write.mode("overwrite").parquet(model_path + "/c2")
        grams(train_df, 1, text_col).groupBy("w1").agg(
            F.count("*").alias("_c1")
        ).write.mode("overwrite").parquet(model_path + "/c1")
        c3 = spark.read.parquet(model_path + "/c3")
        c2 = spark.read.parquet(model_path + "/c2")
        c1 = spark.read.parquet(model_path + "/c1")
    else:
        c2 = grams(train_df, 2, text_col).groupBy("w1", "w2").agg(
            F.count("*").alias("_c2")
        )
        c1 = grams(train_df, 1, text_col).groupBy("w1").agg(
            F.count("*").alias("_c1")
        )
    n_tok = c1.agg(F.sum("_c1").alias("_n"))

    s3 = grams(score_df, 3, text_col, F.col(id_col))
    lam = float(lam)
    score = (
        F.when(
            F.col("_c3").isNotNull(),
            F.col("_c3").cast("double") / F.col("_ctx2").cast("double"),
        )
        .when(
            F.col("_bo2").isNotNull(),
            F.lit(lam)
            * F.col("_bo2").cast("double")
            / F.col("_ctx1").cast("double"),
        )
        .otherwise(
            # lam * lam as an EXPRESSION (not a pre-multiplied literal)
            # so the double rounding matches the SQL oracle's 0.4 * 0.4
            F.lit(lam)
            * F.lit(lam)
            * F.coalesce(F.col("_uni").cast("double"), F.lit(1.0))
            / F.col("_n").cast("double")
        )
    )
    return (
        s3.join(c3, ["w1", "w2", "w3"], "left")
        .join(
            c2.select("w1", "w2", F.col("_c2").alias("_ctx2")),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("_c2").alias("_bo2"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            c1.select(F.col("w1").alias("w2"), F.col("_c1").alias("_ctx1")),
            ["w2"],
            "left",
        )
        .join(
            c1.select(F.col("w1").alias("w3"), F.col("_c1").alias("_uni")),
            ["w3"],
            "left",
        )
        .join(F.broadcast(n_tok))
        .select(id_col, F.log(score).alias("_ls"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.avg("_ls").alias("avg_logs"),
        )
        .withColumn("backoff_ppl", F.exp(-F.col("avg_logs")))
    )


def kneser_ney_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    model_path: str | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 4.25 with one fixed discount D): score every doc
    with >= 2 tokens by mean log-likelihood / perplexity.

    P(w2|w1) = max(C(w1w2)-D, 0)/C(w1.)
             + (D * N1+(w1 .)/C(w1.)) * Pcont(w2)
    Pcont(w2) = N1+(. w2) / N1+(. .)   — the continuation probability:
    how many distinct contexts precede w2, over all bigram types.

    Held-out edge cases (both engines, documented so the oracle is
    exact): an unseen CONTEXT w1 scores P = Pcont(w2) (no counts to
    interpolate, pure continuation); an unseen continuation w2 gets
    pseudo-count D in N1+(. w2) — the same mass a once-seen type keeps
    after discounting — so nothing hits log(0).

    Everything is count/distinct-count aggregations over the bigram
    table plus gram-keyed hash joins at scoring; the continuation
    counts ARE the inverted-index cardinalities (distinct contexts per
    token = distinct docs per entity in the reference's postings,
    store/leveldb.go)."""
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    spark = train_df.sparkSession
    c2 = grams(train_df, 2, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("_c2")
    )
    if model_path is not None:
        c2.write.mode("overwrite").parquet(model_path + "/c2")
        c2 = spark.read.parquet(model_path + "/c2")
    ctx = c2.groupBy("w1").agg(
        F.sum("_c2").alias("_ctot"),
        F.count("*").alias("_nfwd"),  # N1+(w1 .): distinct successors
    )
    back = c2.groupBy("w2").agg(
        F.count("*").alias("_nback")  # N1+(. w2): distinct predecessors
    )
    types = c2.agg(F.count("*").alias("_ntypes"))  # N1+(. .)

    s2 = grams(score_df, 2, text_col, F.col(id_col))
    d = float(discount)
    pcont = F.coalesce(
        F.col("_nback").cast("double"), F.lit(d)
    ) / F.col("_ntypes").cast("double")
    p_seen_ctx = (
        F.greatest(
            F.coalesce(F.col("_c2").cast("double"), F.lit(0.0)) - F.lit(d),
            F.lit(0.0),
        )
        / F.col("_ctot").cast("double")
        + F.lit(d)
        * F.col("_nfwd").cast("double")
        / F.col("_ctot").cast("double")
        * pcont
    )
    p = F.when(F.col("_ctot").isNotNull(), p_seen_ctx).otherwise(pcont)
    return (
        s2.join(c2, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(back, ["w2"], "left")
        .join(F.broadcast(types))
        .select(id_col, F.log(p).alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("_lp").alias("avg_logp"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logp")))
    )
