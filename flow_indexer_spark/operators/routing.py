"""Rendezvous (highest-random-weight) sink routing + churn audit.

The pipeline fans extracted entities out to per-class routed sinks
(plans/pipeline.py — the analogue of the reference's per-index bucket
directories, /root/reference/flowindexer/flowindexer.go per-indexer
outputs).  Class-based routing is static; a production deployment also
re-routes by KEY across a CHANGING sink set (adding a shard, draining
a node), and the operational question is "how many keys move?".

Rendezvous hashing (Thaler & Ravishankar, IEEE/ACM ToN 1998) answers
with the minimal-disruption guarantee: each key goes to the sink with
the highest hash(key, sink) weight, so adding one sink to n moves
EXACTLY the keys the new sink now wins — 1/(n+1) of them in
expectation — and removing one moves only its own keys.  Consistent
hashing without the ring.

Determinism: weights are md5-derived 32-bit ints (the md5_int32
discipline — bit-identical in the DuckDB oracle), argmax ties broken
by first position in the sink list (a tie needs an md5 collision;
the rule exists so even that case is deterministic on both engines).

Scale shape: routing is a pure in-row projection (|sinks| hashes per
key, JVM codegen, no shuffle, no broadcast) — at 100 TB it fuses into
the scan.  The churn report is one groupBy over the routed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flow_indexer_spark.operators.dedup import md5_int32


def rendezvous_sink(key: Column | str, sinks: list[str]) -> Column:
    """The HRW-chosen sink name for ``key`` over the literal sink
    list: argmax over md5_int32('rv|' + key + '|' + sink)."""
    if not sinks:
        raise ValueError("sink list must be non-empty")
    if len(set(sinks)) != len(sinks):
        raise ValueError("sink names must be distinct")
    k = F.col(key) if isinstance(key, str) else key
    arr = F.array(*[F.lit(s) for s in sinks])
    weights = F.transform(
        arr,
        lambda s: md5_int32(F.concat(F.lit("rv|"), k, F.lit("|"), s)),
    )
    return F.element_at(
        arr, F.array_position(weights, F.array_max(weights)).cast("int")
    )


def rendezvous_churn(
    keys: DataFrame,
    key_col: str,
    sinks_before: list[str],
    sinks_after: list[str],
) -> DataFrame:
    """Routing-churn audit for a sink-set change: route every key under
    BOTH sink sets and aggregate the transition matrix.

    Output: (sink_before, sink_after, n_keys, moved) ordered, one row
    per observed transition — the minimal-disruption property reads
    directly off it (under rendezvous, every ``moved`` row's
    sink_after is a NEWLY ADDED sink, or its sink_before a removed
    one; a bucket-mod router would scatter keys everywhere)."""
    k = keys.select(F.col(key_col).alias("k")).distinct()
    routed = k.select(
        "k",
        rendezvous_sink(F.col("k"), sinks_before).alias("sink_before"),
        rendezvous_sink(F.col("k"), sinks_after).alias("sink_after"),
    )
    return (
        routed.groupBy("sink_before", "sink_after")
        .agg(F.count("*").cast("bigint").alias("n_keys"))
        .withColumn("moved", F.col("sink_before") != F.col("sink_after"))
        .orderBy("sink_before", "sink_after")
    )
