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
