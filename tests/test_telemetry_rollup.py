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
    maintain_rollup(spark, _events(spark, rows[:2]), inc, "b0")
    maintain_rollup(spark, _events(spark, rows[2:]), inc, "b1")
    maintain_rollup(spark, _events(spark, rows), oneshot, "all")
    assert _rollup_rows(spark, inc) == _rollup_rows(spark, oneshot)
    assert ("a", "2024-01-01", 2) in _rollup_rows(spark, inc)


def test_maintain_rollup_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch (crash retry / double submit) must replace its
    own chunk, not double-count — the failure mode a read-modify-write
    merge cannot survive."""
    from flow_indexer_spark.operators.telemetry import maintain_rollup

    path = str(tmp_path / "r")
    b0 = [(1, "a", datetime(2024, 1, 1, 9))]
    b1 = [(2, "a", datetime(2024, 1, 1, 10)), (3, "b", datetime(2024, 1, 2, 9))]
    maintain_rollup(spark, _events(spark, b0), path, "b0")
    maintain_rollup(spark, _events(spark, b1), path, "b1")
    before = _rollup_rows(spark, path)
    for _ in range(2):  # replay b1 twice more
        maintain_rollup(spark, _events(spark, b1), path, "b1")
    assert _rollup_rows(spark, path) == before
    assert ("a", "2024-01-01", 2) in before


def test_maintain_rollup_other_batches_untouched_and_compact(spark, tmp_path):
    """A new batch must not rewrite other batches' files on disk
    (O(delta) claim); compaction folds chunks, preserving totals."""
    import os

    from flow_indexer_spark.operators.telemetry import (
        compact_rollup,
        maintain_rollup,
    )

    path = str(tmp_path / "r")
    maintain_rollup(
        spark, _events(spark, [(1, "a", datetime(2024, 1, 1, 9))]), path, "b0"
    )

    def _files(batch):
        d = os.path.join(path, f"batch={batch}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b0_before = _files("b0")
    # late data for the same day arrives in a NEW batch
    maintain_rollup(
        spark, _events(spark, [(2, "a", datetime(2024, 1, 1, 23))]), path, "b1"
    )
    assert _files("b0") == b0_before  # prior chunk intact on disk
    before = _rollup_rows(spark, path)
    assert ("a", "2024-01-01", 2) in before

    compact_rollup(spark, path)
    assert _rollup_rows(spark, path) == before
    assert {d for d in os.listdir(path) if d.startswith("batch=")} == {
        "batch=compacted"
    }
