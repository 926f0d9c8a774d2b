"""rrf_fuse, wilson_bounds, concentration_report: hand-computed values
and edge conventions."""

from __future__ import annotations

import math

from flow_indexer_spark.operators.diagnostics import concentration_report
from flow_indexer_spark.operators.ranking import rrf_fuse
from flow_indexer_spark.operators.robust import wilson_bounds


def test_rrf_hand_computed(spark):
    rows = [("l1", "a", 1), ("l1", "b", 2), ("l2", "b", 1), ("l2", "c", 2)]
    df = spark.createDataFrame(rows, "list_id string, item string, rank int")
    out = rrf_fuse(df, k0=60).collect()
    assert [r["item"] for r in out] == ["b", "a", "c"]
    by = {r["item"]: r for r in out}
    assert by["b"]["n_lists"] == 2
    assert by["b"]["rrf_score"] == round(1 / 62 + 1 / 61, 9)
    assert by["a"]["rrf_score"] == round(1 / 61, 9)
    top2 = rrf_fuse(df, k0=60, topk=2).collect()
    assert [r["item"] for r in top2] == ["b", "a"]


def test_rrf_equal_scores_stable_order(spark):
    rows = [("l1", "x", 1), ("l1", "y", 1)]
    df = spark.createDataFrame(rows, "list_id string, item string, rank int")
    out = rrf_fuse(df).collect()
    assert [r["item"] for r in out] == ["x", "y"]


def test_wilson_hand_computed(spark):
    z = 1.959963985
    df = spark.createDataFrame(
        [("g", 1)] * 5 + [("g", 0)] * 5, "grp string, s int"
    )
    r = wilson_bounds(df, "grp", "s", z=z).collect()[0]
    n, p, z2 = 10.0, 0.5, z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = z / denom * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    assert (r["n"], r["successes"], r["p_hat"]) == (10, 5, 0.5)
    assert r["lo"] == round(center - half, 9)
    assert r["hi"] == round(center + half, 9)
    assert 0.0 < r["lo"] < 0.5 < r["hi"] < 1.0


def test_wilson_zero_successes_stays_in_unit_interval(spark):
    df = spark.createDataFrame([("g", 0)] * 20, "grp string, s int")
    r = wilson_bounds(df, "grp", "s").collect()[0]
    assert r["p_hat"] == 0.0
    assert r["lo"] == 0.0  # Wilson is exact-zero at p=0, Wald would go negative
    assert 0.0 < r["hi"] < 0.2


def test_concentration_uniform_mix(spark):
    rows = [(g,) for g in "abcd" for _ in range(25)]
    df = spark.createDataFrame(rows, "src string")
    r = concentration_report(df, "src").collect()[0]
    assert (r["n_groups"], r["n_rows"]) == (4, 100)
    assert r["hhi"] == 0.25
    assert r["entropy"] == round(math.log(4), 9)
    assert r["entropy_norm"] == 1.0
    assert r["gini"] == 0.0


def test_concentration_single_group(spark):
    df = spark.createDataFrame([("only",)] * 7, "src string")
    r = concentration_report(df, "src").collect()[0]
    assert r["hhi"] == 1.0 and r["entropy"] == 0.0
    assert r["entropy_norm"] is None and r["gini"] == 0.0


def test_concentration_skewed(spark):
    rows = [("a",)] * 99 + [("b",)]
    r = concentration_report(
        spark.createDataFrame(rows, "src string"), "src"
    ).collect()[0]
    # sorted asc: b=1 (i=1), a=99 (i=2): G = 2*(1+198)/(2*100) - 3/2
    assert r["gini"] == round(2 * 199 / 200 - 1.5, 9)
    assert r["hhi"] == round((99 * 99 + 1) / 10000, 9)
