"""Mergeable-sketch rollup tests: merge == direct (the property that
makes the rollup answer coarser grains without rescanning raw data),
set-algebra exactness below sketch capacity, KLL rank guarantees, and
the parquet chunk lifecycle (append -> fold -> compact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.sketches import (
    compact_sketch_rollup,
    rollup_estimates,
    sketch_rollup,
    theta_bucket_overlap,
)


@pytest.fixture(scope="module")
def events(spark):
    """Deterministic events: 400 users x 3 types over 10 days, with a
    sliding active-user window so consecutive days genuinely overlap."""
    day = F.pmod(F.floor(F.col("id") / 400), F.lit(10))
    return (
        spark.range(12000)
        .select(
            (F.col("id") % 400).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("buy")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            F.timestamp_seconds(
                F.lit(1700000000) + day * 86400 + F.col("id") % 1000
            ).alias("ts"),
            (F.pmod(F.xxhash64("id"), 1000) / F.lit(10.0)).alias("value"),
            day.alias("_day"),
        )
        # day d sees only users in a 250-wide window sliding 30/day:
        # ~88% day-over-day overlap, some churn, some new
        .filter(
            F.pmod(F.col("user_id") - F.col("_day") * 30, F.lit(400)) < 250
        )
        .drop("_day")
        .cache()
    )


def test_hll_union_of_daily_matches_direct(spark, events):
    direct = events.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("est"),
        F.count_distinct("user_id").alias("exact"),
    )
    daily = sketch_rollup(events)
    merged = rollup_estimates(daily).select(
        "event_type", "distinct_ids_est", "n_events"
    )
    rows = {r.event_type: r for r in direct.join(merged, "event_type").collect()}
    assert len(rows) == 3
    for r in rows.values():
        # union-of-daily vs one-shot: same registers up to estimator
        # mode, so the estimates agree tightly and both track exact
        assert abs(r.distinct_ids_est - r.est) / r.exact < 0.01
        assert abs(r.distinct_ids_est - r.exact) / r.exact < 0.03


def test_rollup_n_events_is_exact(spark, events):
    got = {
        r.event_type: r.n_events
        for r in rollup_estimates(sketch_rollup(events)).collect()
    }
    want = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_theta_overlap_exact_below_capacity(spark, events):
    """At < 4096 distinct ids Theta sketches store raw hashes, so the
    intersection/difference estimates are EXACT — pin equality, not
    tolerance."""
    rollup = sketch_rollup(events, keys=(), granularity="day")
    got = {
        r.bucket: (int(r.returning_est), int(r.new_est), int(r.churned_est))
        for r in theta_bucket_overlap(rollup, keys=()).collect()
    }
    daily = events.select(F.date_trunc("day", "ts").alias("bucket"), "user_id").distinct()
    prev = daily.select((F.col("bucket") + F.expr("INTERVAL 1 DAY")).alias("bucket"),
                        F.col("user_id"))
    want = {}
    buckets = sorted(r.bucket for r in daily.select("bucket").distinct().collect())
    for i, b in enumerate(buckets[1:], start=1):
        cur = {r.user_id for r in daily.filter(F.col("bucket") == b).collect()}
        pre = {
            r.user_id
            for r in daily.filter(F.col("bucket") == buckets[i - 1]).collect()
        }
        want[b] = (len(cur & pre), len(cur - pre), len(pre - cur))
    assert got == want
    assert all(v[0] > 0 and v[1] > 0 and v[2] > 0 for v in want.values())


def test_kll_quantiles_within_rank_tolerance(spark, events):
    est = rollup_estimates(sketch_rollup(events), quantiles=(0.5, 0.9))
    vals = events.select("event_type", "value")
    for r in est.collect():
        sub = vals.filter(F.col("event_type") == r.event_type)
        n = sub.count()
        for q, v in ((0.5, r.value_p50), (0.9, r.value_p90)):
            rank = sub.filter(F.col("value") <= v).count() / n
            assert abs(rank - q) < 0.02, (r.event_type, q, v, rank)


def test_chunked_parquet_lifecycle(spark, events, tmp_path):
    """Two incremental batches append sketch chunk rows to parquet; the
    estimate query folds chunks transparently; compaction collapses them
    to one row per bucket with identical answers."""
    path = str(tmp_path / "rollup")
    b1 = events.filter(F.col("user_id") % 2 == 0)
    b2 = events.filter(F.col("user_id") % 2 == 1)
    sketch_rollup(b1).write.mode("append").parquet(path)
    sketch_rollup(b2).write.mode("append").parquet(path)
    chunked = spark.read.parquet(path)
    assert chunked.count() > sketch_rollup(events).count()  # real chunks

    one_shot = rollup_estimates(sketch_rollup(events))
    folded = rollup_estimates(chunked)
    compacted = compact_sketch_rollup(chunked)
    assert compacted.count() == sketch_rollup(events).count()
    after_compact = rollup_estimates(compacted)

    def key(df):
        return {
            r.event_type: (r.n_events, r.distinct_ids_est, r.value_p50, r.value_p90)
            for r in df.collect()
        }

    k1, k2, k3 = key(one_shot), key(folded), key(after_compact)
    assert set(k1) == set(k2) == set(k3)
    for et in k1:
        assert k1[et][0] == k2[et][0] == k3[et][0]  # counts exact-additive
        for i in (1, 2, 3):
            # sketch estimates: chunk-fold and compact-then-fold answer
            # within sketch tolerance of the one-shot build (KLL merge is
            # order-sensitive across shuffles, so exact equality between
            # evaluations is NOT a property — closeness is)
            assert abs(k1[et][i] - k2[et][i]) <= abs(k1[et][i]) * 0.02 + 1e-9
            assert abs(k2[et][i] - k3[et][i]) <= abs(k2[et][i]) * 0.02 + 1e-9
