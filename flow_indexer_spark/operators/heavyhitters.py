"""Exact heavy hitters in two bounded-state passes (Misra-Gries
candidates -> exact verification).

The skew the postings index salts for (operators/postings.py) and the
hub nodes PageRank surfaces (operators/graph.py) share one upstream
question: WHICH keys are hot? The naive answer — ``groupBy(key).count``
over everything — shuffles every distinct key at full width, exactly
the job you're trying to avoid at 10^12 rows when only the ~1/phi keys
above a frequency threshold matter. This operator answers it with the
classic two-pass summary-then-verify shape every production heavy-
hitter pipeline uses:

Pass 1 (candidates, NO shuffle of the input): one narrow
``mapInPandas`` sweep keeps a Misra-Gries summary (Misra & Gries 1982,
"Finding repeated elements"; the SpaceSaving/Frequent family) of
``capacity`` counters per task, folded across the task's Arrow batches
in generator state and emitted once at task end — per-task output is
<= capacity+1 tiny rows regardless of input size. MG's guarantee:
summing each key's surviving counters across tasks gives ``est`` with

    true - N/(capacity+1) <= est <= true

so every key with true count > N/(capacity+1) survives in at least
one task summary (if it were absent everywhere, summing the per-task
bounds gives true <= N/(capacity+1)). With ``capacity >=
2/threshold_frac`` the candidate set is a guaranteed SUPERSET of the
heavy hitters, and keys whose summed lower bound can't reach the
threshold even with maximal undercount are pruned before pass 2.

Pass 2 (verify): broadcast the pruned candidates (<= capacity * tasks
rows, post-pruning usually ~capacity) back onto the input as a
broadcast semi-join, count EXACTLY only those keys, and keep
``count >= ceil(N * threshold_frac)``. The output is therefore exact
and partitioning-independent — the sketch only ever chooses how little
work the exact pass does, never the answer — which is what makes the
DuckDB oracle a plain ``GROUP BY ... HAVING count >= T``.

Scale: pass 1 state is O(capacity) per task and its output O(capacity
x tasks); pass 2 shuffles only candidate-key rows (the broadcast hash
join filters map-side, so non-candidate rows never enter the
Exchange). Two scans of the input is the price; at 100 TB that beats
one full-width groupBy whenever distinct keys >> heavy keys, i.e.
always for entity/user keys. Reference analogue: flow-indexer's
per-document hit counts feed the same "which keys are hot" question at
query time (httpd.go queryStat); here it runs corpus-wide.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_fold(counts: dict, batch: pd.Series, capacity: int) -> None:
    """Fold one batch's exact value counts into the MG summary in
    place, compressing to ``capacity`` counters: subtracting the
    (capacity+1)-th largest count from all counters removes >=
    (capacity+1) units of mass per unit of undercount — the MG bound."""
    for k, c in batch.value_counts().items():
        counts[k] = counts.get(k, 0) + int(c)
    if len(counts) > capacity:
        cut = sorted(counts.values(), reverse=True)[capacity]
        for k in [k for k, v in counts.items() if v <= cut]:
            del counts[k]
        for k in counts:
            counts[k] -= cut


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float,
    capacity: int | None = None,
) -> DataFrame:
    """Keys of ``df[key_col]`` whose exact count >= ceil(N *
    threshold_frac), with that exact count — computed without ever
    running a full-width groupBy over all distinct keys.

    Returns (key_col, cnt). ``capacity`` defaults to
    ``max(64, ceil(2 / threshold_frac))`` — twice the 1/phi floor the
    superset guarantee needs, so pruning has slack.
    """
    if not 0.0 < threshold_frac <= 1.0:
        raise ValueError("threshold_frac must be in (0, 1]")
    if capacity is None:
        capacity = max(64, math.ceil(2.0 / threshold_frac))
    if capacity + 1 <= 1.0 / threshold_frac:
        raise ValueError(
            f"capacity {capacity} cannot guarantee the superset at "
            f"threshold {threshold_frac}: need capacity+1 > 1/threshold"
        )
    field = df.schema[key_col]
    out_schema = f"`{key_col}` {field.dataType.simpleString()}, est bigint"

    def _pass1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_task = 0
        for pdf in batches:
            col = pdf[key_col].dropna()
            n_task += len(col)
            _mg_fold(counts, col, capacity)
        # one summary per task: the surviving counters, plus a null-key
        # row carrying the task's row count so N needs no second scan
        yield pd.DataFrame(
            {
                key_col: list(counts.keys()) + [None],
                "est": list(counts.values()) + [n_task],
            }
        )

    summary = df.select(key_col).mapInPandas(_pass1, out_schema)
    summary = summary.localCheckpoint(eager=True)  # tiny; scanned twice
    n_total = (
        summary.where(F.col(key_col).isNull())
        .agg(F.sum("est"))
        .collect()[0][0]
        or 0
    )
    if n_total == 0:
        return (
            df.select(key_col)
            .limit(0)
            .withColumn("cnt", F.lit(0).cast("bigint"))
        )
    threshold = math.ceil(n_total * threshold_frac)
    # prune: summed-est is a lower bound undercounting by < N/(cap+1);
    # keys that can't reach the threshold even with the full undercount
    # restored are provably light
    floor = threshold - n_total // (capacity + 1) - 1
    candidates = (
        summary.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.sum("est").alias("_est"))
        .where(F.col("_est") >= floor)
        .select(key_col)
    )
    exact = (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= threshold)
    )
    return exact
