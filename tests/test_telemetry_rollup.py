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
