"""ewma_truncated + touch attribution: hand-computed values, horizon
semantics, organic conversions."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.funnels import touch_attribution, touch_report
from flow_indexer_spark.operators.telemetry import ewma_truncated


def _series(spark, vals):
    rows = [("s", i + 1, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, t int, x bigint")


def test_ewma_hand_computed(spark):
    out = {
        r["t"]: r["ewma"]
        for r in ewma_truncated(
            _series(spark, [10, 20, 40]), "g", "t", "x", alpha=0.5, lags=8
        ).collect()
    }
    assert out[1] == 10.0
    assert out[2] == round(12.5 / 0.75, 9)
    assert out[3] == round(26.25 / 0.875, 9)


def test_ewma_constant_series_is_identity(spark):
    out = ewma_truncated(
        _series(spark, [7] * 10), "g", "t", "x", alpha=0.5, lags=8
    ).collect()
    assert all(r["ewma"] == 7.0 for r in out)


def test_ewma_lag_horizon_truncates(spark):
    out = {
        r["t"]: r["ewma"]
        for r in ewma_truncated(
            _series(spark, [10, 20, 40]), "g", "t", "x", alpha=0.5, lags=2
        ).collect()
    }
    # t3 sees only x3, x2: (40*.5 + 20*.25) / .75
    assert out[3] == round(25.0 / 0.75, 9)


def test_ewma_validates_params(spark):
    s = _series(spark, [1])
    with pytest.raises(ValueError, match="alpha"):
        ewma_truncated(s, "g", "t", "x", alpha=0.0)
    with pytest.raises(ValueError, match="lags"):
        ewma_truncated(s, "g", "t", "x", lags=0)


def _events(spark):
    rows = [
        (1, 1, "purchase"),  # organic — nothing precedes
        (1, 2, "view"),
        (1, 3, "purchase"),  # last touch: view@2
        (1, 4, "click"),
        (1, 5, "purchase"),  # last touch: click@4
        (2, 6, "error"),     # non-touch event must not claim credit
        (2, 7, "purchase"),  # organic (error is not a touch)
    ]
    return spark.createDataFrame(rows, "u bigint, e bigint, ty string")


def test_last_touch_per_conversion(spark):
    att = {
        (r["user"], r["conv_order"]): (r["touch_order"], r["touch_type"])
        for r in touch_attribution(
            _events(spark), "u", "e", "ty", ["view", "click"], "purchase"
        ).collect()
    }
    assert att[(1, 1)] == (None, None)
    assert att[(1, 3)] == (2, "view")
    assert att[(1, 5)] == (4, "click")
    assert att[(2, 7)] == (None, None)


def test_touch_report_counts(spark):
    rep = {
        r["touch_type"]: r["n_conversions"]
        for r in touch_report(
            _events(spark), "u", "e", "ty", ["view", "click"], "purchase"
        ).collect()
    }
    assert rep == {"organic": 2, "view": 1, "click": 1}
