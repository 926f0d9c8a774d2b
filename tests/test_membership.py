"""membership.py sketches vs plain-Python mirrors: Bloom no-false-
negatives, HLL register-exactness + estimator accuracy + mergeability."""

from __future__ import annotations

import hashlib

from flow_indexer_spark.operators.membership import (
    bloom_build,
    bloom_probe,
    hll_build,
    hll_estimate,
)


def _h60(key: str) -> int:
    return int(hashlib.md5(f"hll|{key}".encode()).hexdigest()[:15], 16)


def _mirror_registers(keys, p: int) -> dict[int, int]:
    wbits = 60 - p
    reg: dict[int, int] = {}
    for k in keys:
        h = _h60(k)
        j, w = h % (1 << p), h >> p
        rho = (wbits + 1) if w == 0 else wbits - w.bit_length() + 1
        reg[j] = max(reg.get(j, 0), rho)
    return reg


def test_hll_registers_match_python_mirror(spark):
    keys = [f"user-{i}" for i in range(500)] * 3  # duplicates are free
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["j"]: r["r"] for r in hll_build(df, "key", p=8).collect()}
    assert got == _mirror_registers(keys, 8)


def test_hll_estimate_accuracy_and_duplicate_insensitivity(spark):
    n = 2000
    keys = [f"item-{i}" for i in range(n)]
    df = spark.createDataFrame([(k,) for k in keys * 5], "key string")
    row = hll_estimate(hll_build(df, "key", p=10), p=10).collect()[0]
    assert row["m_registers"] == 1024
    # raw HLL std error ~ 1.04/sqrt(m) ~ 3.3%; allow 4 sigma
    assert abs(row["hll_estimate"] - n) / n < 0.13
    # duplicates must not move the estimate at all
    row2 = hll_estimate(hll_build(df.limit(n), "key", p=10), p=10).collect()[0]
    assert row["hll_estimate"] == row2["hll_estimate"]


def test_hll_merge_is_register_max(spark):
    import pyspark.sql.functions as F

    a = spark.createDataFrame([(f"a-{i}",) for i in range(300)], "key string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(300)], "key string")
    merged = (
        hll_build(a, "key", p=8)
        .unionByName(hll_build(b, "key", p=8))
        .groupBy("j")
        .agg(F.max("r").alias("r"))
    )
    direct = hll_build(a.unionByName(b), "key", p=8)
    got_m = {r["j"]: r["r"] for r in merged.collect()}
    got_d = {r["j"]: r["r"] for r in direct.collect()}
    assert got_m == got_d


def test_hll_param_guards(spark):
    import pytest

    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="p must be"):
        hll_build(df, "key", p=3)
    with pytest.raises(ValueError, match="alpha"):
        hll_estimate(hll_build(df, "key", p=10), p=5)


def test_bloom_no_false_negatives(spark):
    members = [f"m-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in members], "key string")
    bl = bloom_build(df, "key", m_bits=2048, k=3)
    probed = bloom_probe(bl, df, "key", m_bits=2048, k=3)
    assert all(r["in_bloom"] for r in probed.collect())
