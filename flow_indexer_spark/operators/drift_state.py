"""Incremental lexical-drift monitoring against persisted reference
counts — the O(batch) streaming twin of `diagnostics.lexical_js_divergence`.

A pipeline ingesting batches forever needs "is TODAY'S batch drifting
from everything accepted so far" without rescanning the corpus.  The
state is the unigram count table — the sufficient statistic of the
JS divergence — persisted as batch-keyed partitions with the same
append-only idempotence discipline as `dedup_state` (replaying a
batch replaces its own partition wholesale; the reference is the
union-aggregate of all committed partitions, never rewritten).

JS here is TWO-sided open-vocabulary: tokens only in the batch and
tokens only in the reference both reduce to closed forms (x*ln2 mass
terms), so the compute per batch is one exploded groupBy over the
batch plus ONE outer join against the vocab-sized reference counts —
never a corpus rescan.  Terms quantize to the 1e-9 integer lattice
(order-free exact sums, the repo's cross-engine discipline, though
this operator's oracle is its own batch-replay invariance rather
than SQL).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from flow_indexer_spark.operators.dedup import tokens

__all__ = ["commit_token_counts", "reference_counts", "batch_drift"]

_GRID = 1_000_000_000


def _batch_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def commit_token_counts(
    spark: SparkSession,
    docs: DataFrame,
    state_path: str,
    batch_id: str,
    text_col: str = "text",
) -> dict:
    """Append this batch's token counts as the partition
    ``state_path/batch=<batch_id>`` (overwritten wholesale on replay —
    idempotent; other batches untouched). Returns {n_tokens, n_distinct}."""
    if not batch_id or "/" in batch_id:
        raise ValueError(f"bad batch_id {batch_id!r}")
    counts = _batch_counts(docs, text_col)
    out = os.path.join(state_path, f"batch={batch_id}")
    counts.write.mode("overwrite").parquet(out)
    agg = counts.agg(
        F.sum("n").alias("t"), F.count("*").alias("d")
    ).first()
    meta = {"n_tokens": int(agg["t"] or 0), "n_distinct": int(agg["d"] or 0)}
    with open(os.path.join(state_path, f"_batch_{batch_id}.json"), "w") as f:
        json.dump(meta, f)
    return meta


def reference_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """The accumulated reference: union-aggregate of every committed
    batch partition (token, n)."""
    df = spark.read.option("basePath", state_path).parquet(
        os.path.join(state_path, "batch=*")
    )
    return df.groupBy("token").agg(F.sum("n").cast("bigint").alias("n"))


def batch_drift(
    spark: SparkSession,
    docs: DataFrame,
    state_path: str,
    text_col: str = "text",
    dp: int = 9,
) -> dict:
    """One-row JS divergence of this batch's unigram distribution vs
    the persisted reference — O(batch + vocab), open-vocabulary (both
    one-sided token sets fold to closed-form ln2 mass terms).  Returns
    {js_divergence, n_batch_tokens, n_ref_tokens, batch_only_mass,
    ref_only_mass}."""
    b = _batch_counts(docs, text_col)
    r = reference_counts(spark, state_path)
    bt = b.agg(F.sum("n")).first()[0] or 0
    rt = r.agg(F.sum("n")).first()[0] or 0
    if bt == 0 or rt == 0:
        raise ValueError("empty batch or empty reference state")
    j = (
        b.withColumnsRenamed({"n": "nb"})
        .join(r.withColumnsRenamed({"n": "nr"}), "token", "full_outer")
        .select(
            F.coalesce("nb", F.lit(0)).alias("nb"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    p = F.col("nb") / F.lit(float(bt))
    q = F.col("nr") / F.lit(float(rt))
    m = (p + q) / 2.0
    shared = (F.col("nb") > 0) & (F.col("nr") > 0)
    tp = F.when(shared, F.round(p * F.log(p / m) * _GRID)).otherwise(0)
    tq = F.when(shared, F.round(q * F.log(q / m) * _GRID)).otherwise(0)
    agg = j.agg(
        F.sum(tp.cast("bigint")).alias("sp"),
        F.sum(tq.cast("bigint")).alias("sq"),
        F.sum(F.when(~shared & (F.col("nb") > 0), F.col("nb")).otherwise(0))
        .cast("bigint")
        .alias("b_only"),
        F.sum(F.when(~shared & (F.col("nr") > 0), F.col("nr")).otherwise(0))
        .cast("bigint")
        .alias("r_only"),
        F.count("*").alias("vocab"),
    ).first()
    import math

    b_only_mass = agg["b_only"] / bt
    r_only_mass = agg["r_only"] / rt
    js = 0.5 * (
        agg["sp"] / _GRID
        + math.log(2.0) * b_only_mass
        + agg["sq"] / _GRID
        + math.log(2.0) * r_only_mass
    )
    return {
        "js_divergence": round(js, dp),
        "n_batch_tokens": int(bt),
        "n_ref_tokens": int(rt),
        "batch_only_mass": round(b_only_mass, dp),
        "ref_only_mass": round(r_only_mass, dp),
        "n_union_vocab": int(agg["vocab"]),
    }
