"""km_curve vs a hand KM computation with censoring and a zero tail."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flow_indexer_spark.operators.survival import km_curve


def _ev(u, day, typ):
    return (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=day), typ)


def test_km_textbook_with_censoring(spark):
    # subjects: A converts day 1; B converts day 3; C censored day 2;
    # D converts day 3; E censored day 5
    rows = (
        [_ev(1, 0, "view"), _ev(1, 1, "purchase")]
        + [_ev(2, 0, "view"), _ev(2, 3, "purchase")]
        + [_ev(3, 0, "view"), _ev(3, 2, "view")]
        + [_ev(4, 0, "view"), _ev(4, 3, "purchase"), _ev(4, 9, "view")]
        + [_ev(5, 0, "view"), _ev(5, 5, "view")]
    )
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["t_day"]: r.asDict()
        for r in km_curve(
            df, "user_id", "ts", F.col("event_type") == "purchase"
        ).collect()
    }
    # day 1: 5 at risk, 1 event -> S = 4/5
    assert got[1]["n_risk"] == 5 and got[1]["n_events"] == 1
    assert abs(got[1]["survival"] - 4 / 5) < 2e-9
    # day 2 is censoring only -> no curve row
    assert 2 not in got
    # day 3: at risk = 5 - 1(event d1) - 1(censor d2) = 3; 2 events
    assert got[3]["n_risk"] == 3 and got[3]["n_events"] == 2
    assert abs(got[3]["survival"] - (4 / 5) * (1 / 3)) < 2e-9
    assert set(got) == {1, 3}


def test_km_zero_tail_when_all_die(spark):
    rows = [_ev(1, 0, "view"), _ev(1, 2, "purchase"),
            _ev(2, 0, "view"), _ev(2, 2, "purchase")]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = km_curve(
        df, "user_id", "ts", F.col("event_type") == "purchase"
    ).collect()
    assert len(got) == 1
    assert got[0]["t_day"] == 2 and got[0]["survival"] == 0.0
