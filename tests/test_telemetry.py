"""Telemetry rollups: cohort newness and trailing-baseline anomaly.

Semantics pinned on a hand-computed fixture (the reference's hand-written
expected-count test style, /root/reference/flowindexer/flowindexer_test.go);
the sf0.01 oracle twin runs in test_entry_contract.py.
"""

from __future__ import annotations

from datetime import datetime

from flow_indexer_spark.operators.telemetry import daily_anomaly, new_vs_returning


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_new_vs_returning_hand_counts(spark):
    ev = _events(
        spark,
        [
            (1, "click", datetime(2024, 1, 1, 9)),
            (1, "click", datetime(2024, 1, 1, 10)),  # same day dup: one pair
            (1, "view", datetime(2024, 1, 2, 9)),    # returning on day 2
            (2, "click", datetime(2024, 1, 2, 9)),   # new on day 2
            (3, "click", datetime(2024, 1, 3, 9)),   # new on day 3
            (1, "click", datetime(2024, 1, 3, 9)),   # returning on day 3
        ],
    )
    got = {
        r["bucket"].day: (r["n_new"], r["n_returning"])
        for r in new_vs_returning(ev).collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 1)}


def test_daily_anomaly_trailing_excludes_current(spark):
    ev = _events(
        spark,
        [(1, "a", datetime(2024, 1, 1, h)) for h in range(2)]
        + [(1, "a", datetime(2024, 1, 2, h)) for h in range(4)]
        + [(1, "a", datetime(2024, 1, 3, h)) for h in range(6)],
    )
    rows = daily_anomaly(ev, trailing=7).collect()
    by_day = {r["bucket"].day: r for r in rows}
    # first bucket has no history -> null baseline and ratio
    assert by_day[1]["trailing_avg"] is None and by_day[1]["ratio"] is None
    # day 2 baseline = day 1 only (current excluded): 2 -> ratio 4/2
    assert by_day[2]["trailing_avg"] == 2.0 and by_day[2]["ratio"] == 2.0
    # day 3 baseline = mean(2, 4) = 3 -> ratio 6/3
    assert by_day[3]["trailing_avg"] == 3.0 and by_day[3]["ratio"] == 2.0


def test_daily_anomaly_window_is_per_class(spark):
    ev = _events(
        spark,
        [
            (1, "a", datetime(2024, 1, 1, 9)),
            (1, "b", datetime(2024, 1, 1, 9)),
            (1, "b", datetime(2024, 1, 2, 9)),
        ],
    )
    rows = {(r["klass"], r["bucket"].day): r for r in daily_anomaly(ev).collect()}
    assert rows[("b", 2)]["trailing_avg"] == 1.0  # b's own history only
    assert rows[("a", 1)]["trailing_avg"] is None
