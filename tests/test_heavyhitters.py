"""Two-pass exact heavy hitters (operators/heavyhitters.py): the
answer must be EXACT and partitioning-independent — the Misra-Gries
pass only bounds how much work the verify pass does."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.heavyhitters import _mg_fold, heavy_hitters


def _brute(df, key, frac):
    import math

    n = df.where(F.col(key).isNotNull()).count()
    t = math.ceil(n * frac)
    return {
        (r[0], r[1])
        for r in df.where(F.col(key).isNotNull())
        .groupBy(key)
        .count()
        .where(F.col("count") >= t)
        .collect()
    }


def _zipf_df(spark, n=20_000, seed=3):
    """Zipf-ish key stream: 200^U - 1 for uniform U concentrates mass
    on small keys (key 0 gets ~ log-uniform share)."""
    return spark.range(n).select(
        F.floor(F.pow(F.lit(200.0), F.rand(seed)) - 1).cast("long").alias("k")
    )


def test_exact_and_partitioning_independent(spark):
    df = _zipf_df(spark)
    want = _brute(df, "k", 0.01)
    assert want  # fixture sanity: some keys ARE heavy
    for parts in (df.coalesce(1), df.repartition(7), df.repartition(16, "k")):
        got = {tuple(r) for r in heavy_hitters(parts, "k", 0.01).collect()}
        assert got == want


def test_distributed_mass_key_survives(spark):
    """A key that is heavy globally but below the heavy threshold in
    every task (the case a per-partition top-k would miss) must still
    be found: MG's summed lower bounds guarantee it survives in at
    least one task summary."""
    # 300 X-rows spread evenly over 10 partitions among 9700 near-unique
    pdf = pd.DataFrame(
        {"k": ["X"] * 300 + [f"u{i}" for i in range(9_700)]}
    ).sample(frac=1.0, random_state=5)
    df = spark.createDataFrame(pdf).repartition(10)
    got = {tuple(r) for r in heavy_hitters(df, "k", 0.02).collect()}
    assert got == {("X", 300)}


def test_uniform_data_yields_empty(spark):
    df = spark.range(5_000).select(F.col("id").cast("string").alias("k"))
    assert heavy_hitters(df, "k", 0.01).count() == 0


def test_nulls_ignored_and_threshold_on_nonnull_count(spark):
    pdf = pd.DataFrame({"k": ["a"] * 50 + [None] * 950 + ["b"] * 2})
    df = spark.createDataFrame(pdf)
    # N = 52 non-null; frac 0.5 -> threshold 26: only 'a'
    got = {tuple(r) for r in heavy_hitters(df, "k", 0.5).collect()}
    assert got == {("a", 50)}


def test_parameter_validation(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters(df, "k", 0.001, capacity=100)


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert heavy_hitters(df, "k", 0.1).count() == 0


def test_verify_pass_is_broadcast_semi_join(spark):
    """Plan pin: the exact pass must filter via BroadcastHashJoin
    LeftSemi (map-side, before the count's Exchange) — a shuffled semi
    join would defeat the point of the candidate pass."""
    df = _zipf_df(spark, n=5_000)
    plan = (
        heavy_hitters(df, "k", 0.01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_mg_fold_bound():
    """After folding N elements through any batch split, every key's
    counter undercounts by at most N/(capacity+1)."""
    import random

    rng = random.Random(11)
    stream = [rng.choice("abcdefghijklmnop"[: rng.randint(2, 16)]) for _ in range(4_000)]
    truth: dict = {}
    for s in stream:
        truth[s] = truth.get(s, 0) + 1
    for cap in (3, 5, 8):
        for batch_size in (1, 7, 100, 4_000):
            counts: dict = {}
            for i in range(0, len(stream), batch_size):
                _mg_fold(
                    counts,
                    pd.Series(stream[i : i + batch_size]),
                    cap,
                )
            bound = len(stream) / (cap + 1)
            assert len(counts) <= cap
            for k, true in truth.items():
                est = counts.get(k, 0)
                assert est <= true
                assert true - est <= bound, (cap, batch_size, k)
