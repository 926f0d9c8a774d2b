"""robust.py: lower-median/MAD conventions, Hampel flag, two-proportion
test hand values and degenerate guards."""

from __future__ import annotations

import math

import pytest

from flow_indexer_spark.operators.robust import (
    median_mad_outliers,
    two_proportion_test,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, x bigint")


def test_median_mad_odd_group(spark):
    out = {
        r["value"]: r
        for r in median_mad_outliers(
            _vals(spark, [("a", v) for v in (1, 2, 3, 4, 100)]), "g", "x"
        ).collect()
    }
    assert out[3]["med"] == 3 and out[3]["mad"] == 1
    assert out[100]["dev"] == 97 and out[100]["is_outlier"]
    assert not any(out[v]["is_outlier"] for v in (1, 2, 3, 4))


def test_median_mad_even_group_lower_convention(spark):
    # n=4: lower rank floor(5/2)=2 -> med = 2nd smallest, never an
    # interpolated half
    out = {
        r["value"]: r
        for r in median_mad_outliers(
            _vals(spark, [("a", v) for v in (1, 2, 3, 10)]), "g", "x"
        ).collect()
    }
    assert out[1]["med"] == 2 and out[1]["mad"] == 1
    assert out[10]["is_outlier"] and not out[3]["is_outlier"]


def test_mad_zero_flags_any_deviation(spark):
    out = {
        r["value"]: r
        for r in median_mad_outliers(
            _vals(spark, [("a", v) for v in (5, 5, 5, 9)]), "g", "x"
        ).collect()
    }
    assert out[5]["mad"] == 0
    assert out[9]["is_outlier"] and not out[5]["is_outlier"]


def test_groups_are_independent(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (100, 200, 300)]
    out = median_mad_outliers(_vals(spark, rows), "g", "x").collect()
    meds = {r["group"]: r["med"] for r in out}
    assert meds == {"a": 2, "b": 200}
    assert not any(r["is_outlier"] for r in out)


def test_two_proportion_hand_computed(spark):
    rows = [(0, 1)] * 4 + [(0, 0)] * 6 + [(1, 1)] * 1 + [(1, 0)] * 9
    df = spark.createDataFrame(rows, "variant int, conv int")
    r = two_proportion_test(df, "variant", "conv").collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (10, 10, 4, 1)
    z = (0.4 - 0.1) / math.sqrt(0.25 * 0.75 * (0.1 + 0.1))
    assert r["z"] == round(z, 9)
    assert r["chi2"] == 2.4  # exact rational: 20*900/7500
    assert abs(r["chi2"] - r["z"] ** 2) < 1e-8  # identity chi2 = z^2


def test_two_proportion_rejects_wrong_arity(spark):
    one = spark.createDataFrame([(0, 1)], "variant int, conv int")
    with pytest.raises(ValueError, match="exactly 2 variants"):
        two_proportion_test(one, "variant", "conv")
    three = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 1)], "variant int, conv int"
    )
    with pytest.raises(ValueError, match="exactly 2 variants"):
        two_proportion_test(three, "variant", "conv")


def test_two_proportion_degenerate_rates_null(spark):
    allconv = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1)], "variant int, conv int"
    )
    r = two_proportion_test(allconv, "variant", "conv").collect()[0]
    assert r["z"] is None and r["chi2"] is None and r["p_a"] == 1.0


def test_trimmed_mean_exact_hand_case(spark):
    """10% trim of 10 values drops exactly min and max; ties across the
    trim boundary keep partial multiplicity."""
    from flow_indexer_spark.operators.robust import trimmed_mean_report

    vals = [100.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 5.0, -50.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    got = trimmed_mean_report(df, "grp", "value", trim_frac=0.1).collect()[0]
    inner = sorted(vals)[1:-1]
    assert got["n"] == 10 and got["n_trimmed_each_side"] == 1
    assert got["trimmed_mean"] == round(sum(inner) / len(inner), 9)
    assert got["raw_mean"] == round(sum(vals) / 10, 9)
    # boundary ties: k=1 with duplicated extremes trims ONE copy only
    vals2 = [1.0, 1.0, 2.0, 9.0, 9.0, 3.0, 3.0, 4.0, 5.0, 6.0]
    df2 = spark.createDataFrame(
        [("g", v) for v in vals2], "grp string, value double"
    )
    got2 = trimmed_mean_report(df2, "grp", "value", trim_frac=0.1).collect()[0]
    inner2 = sorted(vals2)[1:-1]
    assert got2["trimmed_mean"] == round(sum(inner2) / len(inner2), 9)
    import pytest as _pt

    with _pt.raises(ValueError):
        trimmed_mean_report(df, "grp", "value", trim_frac=0.5)
