"""Rollup and pivot matrix: hand-computed fixtures; oracle twins at
sf0.01 run in test_entry_contract.py."""

from __future__ import annotations

from datetime import datetime

import pytest

from flow_indexer_spark.operators.telemetry import pivot_matrix, rollup_counts


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_rollup_levels(spark):
    ev = _events(
        spark,
        [
            (1, "a", datetime(2024, 1, 1, 9)),
            (2, "a", datetime(2024, 1, 1, 10)),
            (3, "a", datetime(2024, 1, 2, 9)),
            (4, "b", datetime(2024, 1, 1, 9)),
        ],
    )
    got = {(r["klass"], r["bucket"]): r["n"] for r in rollup_counts(ev).collect()}
    assert got[("a", "2024-01-01 00:00:00")] == 2
    assert got[("a", "2024-01-02 00:00:00")] == 1
    assert got[("b", "2024-01-01 00:00:00")] == 1
    assert got[("a", "ALL")] == 3          # per-class subtotal
    assert got[("b", "ALL")] == 1
    assert got[("ALL", "ALL")] == 4        # grand total
    assert len(got) == 6


def test_pivot_matrix_dense_zeros(spark):
    ev = _events(
        spark,
        [
            (1, "a", datetime(2024, 1, 1, 9)),
            (2, "a", datetime(2024, 1, 1, 10)),
            (3, "b", datetime(2024, 1, 2, 9)),
        ],
    )
    rows = sorted(
        pivot_matrix(ev, classes=["a", "b"]).collect(), key=lambda r: r["bucket"]
    )
    assert [(r["a"], r["b"]) for r in rows] == [(2, 0), (0, 1)]


def test_pivot_matrix_requires_explicit_classes(spark):
    ev = _events(spark, [(1, "a", datetime(2024, 1, 1))])
    with pytest.raises(ValueError):
        pivot_matrix(ev, classes=None)


def _rollup_rows(spark, path):
    from flow_indexer_spark.operators.telemetry import read_rollup

    return sorted(
        (r["klass"], r["bucket"], r["n"]) for r in read_rollup(spark, path).collect()
    )


def test_maintain_rollup_two_batches_equal_oneshot(spark, tmp_path):
    from flow_indexer_spark.operators.telemetry import maintain_rollup

    rows = [
        (1, "a", datetime(2024, 1, 1, 9)),
        (2, "a", datetime(2024, 1, 1, 10)),
        (3, "b", datetime(2024, 1, 1, 11)),
        (4, "a", datetime(2024, 1, 2, 9)),
        (5, "b", datetime(2024, 1, 3, 9)),
    ]
    inc, oneshot = str(tmp_path / "inc"), str(tmp_path / "one")
    # incremental: both batches contain partial day-1 counts
    maintain_rollup(spark, _events(spark, rows[:2]), inc)
    maintain_rollup(spark, _events(spark, rows[2:]), inc)
    maintain_rollup(spark, _events(spark, rows), oneshot)
    assert _rollup_rows(spark, inc) == _rollup_rows(spark, oneshot)
    assert ("a", "2024-01-01", 2) in _rollup_rows(spark, inc)


def test_maintain_rollup_touches_only_affected_partitions(spark, tmp_path):
    """Late data for day 1 must re-write day 1's partition and leave day
    2's files untouched on disk — the O(delta) partition-pruning claim."""
    import os

    from flow_indexer_spark.operators.telemetry import maintain_rollup

    path = str(tmp_path / "r")
    maintain_rollup(
        spark,
        _events(
            spark,
            [(1, "a", datetime(2024, 1, 1, 9)), (2, "a", datetime(2024, 1, 2, 9))],
        ),
        path,
    )

    def _files(day):
        d = os.path.join(path, f"bucket={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    day2_before = _files("2024-01-02")
    # late row for day 1 only
    maintain_rollup(
        spark, _events(spark, [(3, "a", datetime(2024, 1, 1, 23))]), path
    )
    assert _files("2024-01-02") == day2_before  # untouched partition intact
    got = _rollup_rows(spark, path)
    assert ("a", "2024-01-01", 2) in got and ("a", "2024-01-02", 1) in got
