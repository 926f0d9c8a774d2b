"""Funnel matching and retention cohorts: hand-computed fixtures pin the
greedy-earliest chain semantics (anchor budget, strict ordering, chain
restart never happens) and the cohort-offset math; the min-chaining SQL
twin runs in test_entry_contract.py."""

from __future__ import annotations

from datetime import datetime, timedelta

from flow_indexer_spark.operators.funnels import funnel_counts, funnel_steps
from flow_indexer_spark.operators.telemetry import retention_matrix

T0 = datetime(2024, 1, 1)


def _h(hours):
    return T0 + timedelta(hours=hours)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


STEPS = ["view", "click", "purchase"]


def test_funnel_full_chain_and_partial(spark):
    ev = _ev(
        spark,
        [
            # u1: full chain
            (1, "view", _h(0)), (1, "click", _h(1)), (1, "purchase", _h(2)),
            # u2: click before view never counts; then only view
            (2, "click", _h(0)), (2, "view", _h(1)),
            # u3: no funnel events at all -> absent from output
            (3, "error", _h(0)),
        ],
    )
    got = {
        r["user_id"]: (r["steps_completed"], r["anchor_ts"], r["last_step_ts"])
        for r in funnel_steps(ev, STEPS).collect()
    }
    assert got[1] == (3, _h(0), _h(2))
    assert got[2] == (1, _h(1), _h(1))
    assert 3 not in got
    counts = {r["step"]: r["n_users"] for r in funnel_counts(ev, STEPS).collect()}
    assert counts == {1: 2, 2: 1, 3: 1}


def test_funnel_anchor_budget_is_from_first_step(spark):
    ev = _ev(
        spark,
        [
            (1, "view", _h(0)), (1, "click", _h(5)), (1, "purchase", _h(11)),
            # u2: purchase lands past the 10h anchor budget
            (2, "view", _h(0)), (2, "click", _h(5)), (2, "purchase", _h(10.5)),
        ],
    )
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(ev, STEPS, within_hours=10).collect()
    }
    # u1's purchase at +11h exceeds the budget; u2's +10.5h also does.
    assert got == {1: 2, 2: 2}
    ok = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(ev, STEPS, within_hours=12).collect()
    }
    assert ok == {1: 3, 2: 3}


def test_funnel_greedy_anchors_at_earliest_first_step(spark):
    # earliest view has no click after it within budget; a later view
    # would convert, but the chain anchors greedily at the first view.
    ev = _ev(
        spark,
        [
            (1, "view", _h(0)),
            (1, "view", _h(100)),
            (1, "click", _h(101)),
        ],
    )
    got = funnel_steps(ev, STEPS, within_hours=10).collect()[0]
    assert got["steps_completed"] == 1 and got["anchor_ts"] == _h(0)
    # without a budget the first view still anchors, and the click counts
    free = funnel_steps(ev, STEPS).collect()[0]
    assert free["steps_completed"] == 2 and free["anchor_ts"] == _h(0)


def test_funnel_strictly_after_previous_step(spark):
    ev = _ev(spark, [(1, "view", _h(1)), (1, "click", _h(1))])
    got = funnel_steps(ev, STEPS).collect()[0]
    assert got["steps_completed"] == 1  # same-ts click is not "after" the view


def test_retention_matrix_weekly(spark):
    # cohort week of 2024-01-01 (Monday); active again 2 weeks later
    ev = _ev(
        spark,
        [
            (1, "view", _h(0)),
            (1, "view", _h(24 * 14)),
            (2, "view", _h(24 * 14)),  # second cohort, week offset 0
        ],
    )
    got = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention_matrix(ev).collect()
    }
    assert got == {
        (datetime(2024, 1, 1), 0): 1,
        (datetime(2024, 1, 1), 2): 1,
        (datetime(2024, 1, 15), 0): 1,
    }
