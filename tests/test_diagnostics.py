"""Skew report: hand-computed fixture; the sf0.01 oracle twin runs in
test_entry_contract.py."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.diagnostics import skew_report


def test_skew_report_hand_counts(spark):
    # key 'a': 6 rows, 'b': 2, 'c': 1  -> total 9, mean 3
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top_k=2, target_rows_per_task=4).collect()
    assert [(r["key"], r["n_rows"]) for r in got] == [("a", 6), ("b", 2)]
    top = got[0]
    assert top["share"] == pytest.approx(6 / 9)
    assert top["skew_factor"] == pytest.approx(6 / 3)
    assert top["n_salt"] == 2          # ceil(6/4)
    assert got[1]["n_salt"] == 1       # ceil(2/4) floored to 1


def test_skew_report_composite_key_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (1, "y")], "a long, b string"
    )
    got = skew_report(df, ["a", "b"], top_k=3).collect()
    # tie between '1|y' and '2|y' broken by key ascending
    assert [r["key"] for r in got] == ["1|x", "1|y", "2|y"]


def test_skew_report_rejects_bad_args(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        skew_report(df, [])
    with pytest.raises(ValueError):
        skew_report(df, ["a"], top_k=0)


def test_cube_report_all_marginals(spark):
    """cube_report: all 2^d marginals in one pass; grouping() keeps a
    genuine NULL dim value distinct from the rolled-up ALL label."""
    from flow_indexer_spark.operators.telemetry import cube_report

    rows = [
        ("en", "a", 10), ("en", "b", 20), ("de", "a", 30), (None, "a", 40),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, n long")
    out = {
        (r.lang, r.source): (r.n_rows, r.total_value)
        for r in cube_report(df, ["lang", "source"], "n").collect()
    }
    # 4 observed cells + 3 lang marginals + 2 source marginals + grand
    assert len(out) == 10
    assert out[("ALL", "ALL")] == (4, 100)
    assert out[("en", "ALL")] == (2, 30)
    assert out[("ALL", "a")] == (3, 80)
    assert out[(None, "a")] == (1, 40)   # null data value, NOT the ALL label
    assert out[("en", "b")] == (1, 20)
    import pytest as _pt

    with _pt.raises(ValueError):
        cube_report(df, [], "n")


def test_spearman_matches_scipy_free_reference(spark):
    """spearman_correlation vs a plain-python average-rank reference,
    including ties; perfect monotone and anti-monotone bounds."""
    from flow_indexer_spark.operators.diagnostics import spearman_correlation

    rows = [(3, 9), (1, 2), (4, 16), (1, 3), (5, 25), (9, 81), (2, 4),
            (6, 36), (5, 24), (3, 10)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = spearman_correlation(df, "x", "y").collect()[0]

    def avg_ranks(vals):
        import collections
        cnt = collections.Counter(vals)
        below, r = {}, 0
        for v in sorted(cnt):
            below[v] = r
            r += cnt[v]
        return [below[v] + (cnt[v] + 1) / 2 for v in vals]

    xs, ys = [r[0] for r in rows], [r[1] for r in rows]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    assert got["n"] == n
    assert abs(got["rho"] - num / den) < 1e-9
    # a strictly monotone pair is exactly 1; reversed exactly -1
    mono = spark.createDataFrame(
        [(i, i * i) for i in range(1, 9)], "x bigint, y bigint"
    )
    assert spearman_correlation(mono, "x", "y").collect()[0]["rho"] == 1.0
    anti = spark.createDataFrame(
        [(i, -i) for i in range(1, 9)], "x bigint, y bigint"
    )
    assert spearman_correlation(anti, "x", "y").collect()[0]["rho"] == -1.0
