"""Mergeable-sketch rollups: distinct counts, set algebra, and quantiles
that re-aggregate WITHOUT rescanning raw data.

The exact rollup (operators/telemetry.py) stores additive counts, which
re-aggregate to any coarser grain for free — but ``COUNT(DISTINCT ...)``
and percentiles are NOT additive: a per-day exact rollup cannot answer
"distinct users this month" without going back to the raw 100 TB. The
reference hits the same wall with its per-index unique-entity metric
(/root/reference/flowindexer/flowindexer.go:352-366 recomputes from the
store per query). The standard scale answer is mergeable sketches
(Apache DataSketches, exposed as Spark 4 SQL aggregates):

- **HLL** for distinct counts — union is register-max, so per-day
  sketches fold to week/month/all-time estimates from the rollup alone;
- **Theta** for distinct-set ALGEBRA — intersection/difference between
  stored sketches gives returning/churned user estimates with no join
  against raw history;
- **KLL** for rank/quantile queries — merged per-day sketches answer
  "p90 this quarter" with a guaranteed rank error (~1.65% at the
  default k) independent of data size.

Every sketch column is a plain ``binary`` parquet column, so rollup
chunks follow the same batch-keyed append + compact lifecycle as the
exact rollup (telemetry.maintain_rollup): incremental batches append
chunk rows, queries fold chunks with the union/merge aggregates, and
compaction collapses chunks to one row per bucket. All aggregation is
JVM-side (``ObjectHashAggregate`` over DataSketches states) — one
map-side-combinable shuffle to build, and estimate queries touch only
the rollup (days x keys rows), never the raw table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sketch_rollup(
    events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    granularity: str = "day",
    id_col: str = "user_id",
    value_col: str | None = "value",
    lg_k: int = 12,
) -> DataFrame:
    """Per (keys..., bucket) sketch row over the raw events: exact
    additive ``n_events`` plus the three mergeable summaries of the
    non-additive stats. ONE shuffle, map-side combined — each map task
    folds its rows into local sketch states and ships ~|keys x buckets|
    fixed-size binaries, so shuffle volume is independent of row count.

    ``lg_k`` is the HLL accuracy/size knob (2^lg_k registers; 12 gives
    ~1.6% relative standard error in ~4 KB).
    """
    aggs = [
        F.count("*").alias("n_events"),
        F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("ids_hll"),
        F.theta_sketch_agg(id_col).alias("ids_theta"),
    ]
    if value_col is not None:
        aggs.append(F.kll_sketch_agg_double(value_col).alias("value_kll"))
    return events.groupBy(
        *keys, F.date_trunc(granularity, ts_col).alias("bucket")
    ).agg(*aggs)


def compact_sketch_rollup(
    rollup: DataFrame, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Fold multiple chunk rows per (keys..., bucket) — the state an
    incremental maintainer appends batch by batch — back to one row,
    with identical query semantics: counts add, HLL/Theta union,
    KLL merges. Runs on the rollup (tiny), never the raw table."""
    aggs = [
        F.sum("n_events").alias("n_events"),
        F.hll_union_agg("ids_hll").alias("ids_hll"),
        F.theta_union_agg("ids_theta").alias("ids_theta"),
    ]
    if "value_kll" in rollup.columns:
        aggs.append(F.kll_merge_agg_double("value_kll").alias("value_kll"))
    return rollup.groupBy(*keys, "bucket").agg(*aggs)


def rollup_estimates(
    rollup: DataFrame,
    group_keys: Sequence[str] = ("event_type",),
    quantiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Answer at any grain COARSER than the stored buckets, from the
    rollup alone: exact event totals (additive), estimated distinct ids
    (HLL union), and estimated value quantiles (KLL merge). The input
    may hold multiple chunk rows per bucket — union semantics make
    chunked and compacted state indistinguishable to this query."""
    aggs = [
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("ids_hll")).alias(
            "distinct_ids_est"
        ),
    ]
    if "value_kll" in rollup.columns:
        merged = F.kll_merge_agg_double("value_kll")
        aggs.extend(
            F.kll_sketch_get_quantile_double(merged, F.lit(float(q))).alias(
                f"value_p{int(round(q * 100)):02d}"
            )
            for q in quantiles
        )
    return rollup.groupBy(*group_keys).agg(*aggs)


def maintain_sketch_rollup(
    spark,
    delta: DataFrame,
    rollup_path: str,
    batch_id: str,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    granularity: str = "day",
    id_col: str = "user_id",
    value_col: str | None = "value",
    lg_k: int = 12,
) -> None:
    """Fold a DELTA of events into a stored sketch rollup with O(delta)
    work — the non-additive-stats twin of telemetry.maintain_rollup,
    with the identical batch-keyed chunk idempotence: each batch writes
    ONLY its own per-bucket sketch rows under ``batch=<id>`` via dynamic
    partition overwrite, so a replay (crash mid-write, lost checkpoint,
    double submit) replaces its own partition and never touches another
    batch's chunks. Because HLL/Theta union and KLL merge are
    associative and chunk-insensitive, the read-time fold
    (:func:`rollup_estimates`) gives the same answers as a one-shot
    build over all rows — stored history is never read or rewritten.
    Late data lands as an extra chunk for its old bucket; no special
    path."""
    if not batch_id:
        raise ValueError("batch_id must be a stable non-empty identifier")
    chunk = sketch_rollup(
        delta, keys, ts_col, granularity, id_col, value_col, lg_k
    ).withColumn("batch", F.lit(batch_id))
    (
        chunk.coalesce(1)  # chunk is bucket-cardinality-sized
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(rollup_path)
    )


def read_sketch_rollup(spark, rollup_path: str) -> DataFrame:
    """The maintained chunked rollup, ready for
    :func:`rollup_estimates` / :func:`compact_sketch_rollup` (both fold
    chunk rows via the union/merge aggregates, so callers never see the
    chunking)."""
    return spark.read.parquet(rollup_path).drop("batch")


def theta_bucket_overlap(
    rollup: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Consecutive-bucket distinct-set algebra from stored Theta
    sketches: for every bucket with a predecessor, the estimated number
    of ids seen in BOTH buckets (returning), only in the current
    (new-ish), and only in the previous (churned). This is the
    new-vs-returning question (telemetry.new_vs_returning) answered
    without any raw-data join — the window runs over the rollup's
    |keys x buckets| rows, and each comparison is pure sketch math.

    Expects one row per (keys..., bucket) — compact chunked state with
    :func:`compact_sketch_rollup` first (Theta set ops are binary
    expressions, not aggregates, so the pairing is a ``lag`` window).
    """
    w = Window.partitionBy(*keys).orderBy("bucket") if keys else (
        Window.orderBy("bucket")
    )
    prev = F.lag("ids_theta").over(w)
    out = rollup.select(
        *keys,
        "bucket",
        prev.alias("_prev"),
        F.col("ids_theta").alias("_cur"),
    ).filter(F.col("_prev").isNotNull())
    est = F.theta_sketch_estimate
    return out.select(
        *keys,
        "bucket",
        est(F.theta_intersection("_prev", "_cur")).alias("returning_est"),
        est(F.theta_difference("_cur", "_prev")).alias("new_est"),
        est(F.theta_difference("_prev", "_cur")).alias("churned_est"),
    )
