"""sliding_active_users + ngram_diversity: hand-computed windows and
ratios."""

from __future__ import annotations

import datetime as dt

import pytest

from flow_indexer_spark.operators.telemetry import sliding_active_users
from flow_indexer_spark.operators.textstats import ngram_diversity


def test_sliding_active_hand(spark):
    d = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, d),                        # u1 day1
        (1, d + dt.timedelta(days=2)),  # u1 day3
        (2, d),                        # u2 day1
        (2, d + dt.timedelta(hours=1)),  # same user+day dedups
    ]
    df = spark.createDataFrame(rows, "u bigint, ts timestamp")
    out = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in sliding_active_users(df, "u", "ts", window_days=2).collect()
    }
    assert out["2024-01-01"] == (2, 2, 1.0)
    assert out["2024-01-02"] == (0, 2, 0.0)
    assert out["2024-01-03"] == (1, 1, 1.0)
    assert out["2024-01-04"] == (0, 1, 0.0)
    assert len(out) == 4


def test_sliding_window_one_is_dau(spark):
    d = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, d), (2, d), (1, d + dt.timedelta(days=1))],
        "u bigint, ts timestamp",
    )
    out = sliding_active_users(df, "u", "ts", window_days=1).collect()
    assert all(r["dau"] == r["wau"] and r["stickiness"] == 1.0 for r in out)
    with pytest.raises(ValueError, match="window_days"):
        sliding_active_users(df, "u", "ts", window_days=0)


def test_ngram_diversity_hand(spark):
    docs = spark.createDataFrame(
        [("g", "a a a"), ("g", "a b")], "src string, text string"
    )
    out = {
        r["n"]: (r["total_ngrams"], r["distinct_ngrams"], r["distinct_ratio"])
        for r in ngram_diversity(docs, "src", "text", max_n=3).collect()
    }
    assert out[1] == (5, 2, 0.4)
    assert out[2] == (3, 2, round(2 / 3, 9))
    assert out[3] == (1, 1, 1.0)  # the short doc has no trigram


def test_ngram_diversity_groups_independent(spark):
    docs = spark.createDataFrame(
        [("x", "p q"), ("y", "p p")], "src string, text string"
    )
    out = {
        (r["group"], r["n"]): r["distinct_ratio"]
        for r in ngram_diversity(docs, "src", "text", max_n=1).collect()
    }
    assert out[("x", 1)] == 1.0 and out[("y", 1)] == 0.5
    with pytest.raises(ValueError, match="max_n"):
        ngram_diversity(docs, "src", "text", max_n=0)
