"""SCD2 build + temporal lookup: change collapse, null-safe attribute
comparison, half-open interval boundaries, and left-outer lookup."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.scd import scd2_build, scd2_lookup


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


@pytest.fixture(scope="module")
def dim(spark):
    # key u1: gold@1, gold@2 (no-op), silver@3, silver@4 (no-op), gold@5
    # key u2: null@1 (real version), null@2 (no-op), bronze@3
    rows = [
        ("u1", "gold", _ts(1), 1),
        ("u1", "gold", _ts(2), 2),
        ("u1", "silver", _ts(3), 3),
        ("u1", "silver", _ts(4), 4),
        ("u1", "gold", _ts(5), 5),
        ("u2", None, _ts(1), 6),
        ("u2", None, _ts(2), 7),
        ("u2", "bronze", _ts(3), 8),
    ]
    log = spark.createDataFrame(rows, "k string, tier string, ts timestamp, i int")
    return scd2_build(log, key="k", attrs=["tier"], ts_col="ts", tiebreak="i")


def test_build_collapses_noops(dim):
    got = [
        (r.k, r.tier, r.valid_from.hour,
         r.valid_to.hour if r.valid_to else None, r.version, r.is_current)
        for r in dim.orderBy("k", "version").collect()
    ]
    assert got == [
        ("u1", "gold", 1, 3, 1, False),
        ("u1", "silver", 3, 5, 2, False),
        ("u1", "gold", 5, None, 3, True),
        ("u2", None, 1, 3, 1, False),
        ("u2", "bronze", 3, None, 2, True),
    ]


def test_multi_attr_change_detection(spark):
    rows = [
        ("k", "a", 1, _ts(1)),
        ("k", "a", 1, _ts(2)),  # no-op
        ("k", "a", 2, _ts(3)),  # second attr changes -> new version
    ]
    log = spark.createDataFrame(rows, "k string, x string, y int, ts timestamp")
    out = scd2_build(log, key="k", attrs=["x", "y"], ts_col="ts").collect()
    assert [(r.y, r.version) for r in sorted(out, key=lambda r: r.version)] == [
        (1, 1),
        (2, 2),
    ]


def test_empty_attrs_raises(spark):
    log = spark.createDataFrame([("k", _ts(1))], "k string, ts timestamp")
    with pytest.raises(ValueError):
        scd2_build(log, key="k", attrs=[], ts_col="ts")


def test_lookup_boundaries_and_outer(spark, dim):
    facts = spark.createDataFrame(
        [
            ("f0", "u1", _ts(0)),   # before first version -> NULL
            ("f1", "u1", _ts(1)),   # exactly at valid_from -> v1
            ("f3", "u1", _ts(3)),   # exactly at v1's valid_to -> v2 (half-open)
            ("f9", "u1", _ts(9)),   # after last change -> current v3
            ("fx", "zz", _ts(5)),   # unknown key -> NULL, row kept
        ],
        "fid string, k string, ts timestamp",
    )
    out = {
        r.fid: (r.d_tier, r.d_version)
        for r in scd2_lookup(facts, dim, key="k").collect()
    }
    assert out == {
        "f0": (None, None),
        "f1": ("gold", 1),
        "f3": ("silver", 2),
        "f9": ("gold", 3),
        "fx": (None, None),
    }
