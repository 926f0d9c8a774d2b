"""Data-quality audit: exact counts on hand fixtures, null-is-failure
semantics, threshold gating, uniqueness reporting, and the one-scan
plan guarantee (R rules must not become R jobs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.validate import (
    in_range,
    in_set,
    matches,
    non_empty,
    not_null,
    rule,
    validate,
)


@pytest.fixture(scope="module")
def fixture(spark):
    rows = [
        (1, "alice", "en", 10.0),
        (2, "bob", "en", 150.0),     # out of range
        (3, None, "de", 20.0),       # null name
        (4, "", "fr", 30.0),         # empty name
        (5, "eve", "xx", None),      # bad lang, null value
        (5, "dup", "en", 40.0),      # duplicate id
    ]
    return spark.createDataFrame(
        rows, "id long, name string, lang string, value double"
    )


def test_validate_exact_counts(fixture):
    rep = {
        r.rule: r
        for r in validate(
            fixture,
            [
                not_null("name"),
                non_empty("name"),
                in_set("lang", ["en", "de", "fr"]),
                in_range("value", 0, 100),
                rule("name_shape", F.col("name").rlike("^[a-z]+$")),
            ],
            unique_keys=[["id"], ["id", "name"]],
        ).collect()
    }
    assert (rep["not_null(name)"].n_pass, rep["not_null(name)"].n_fail) == (5, 1)
    # empty string passes not_null but fails non_empty; null fails both
    assert rep["non_empty(name)"].n_fail == 2
    assert rep["in_set(lang,[en,de,fr])"].n_fail == 1
    # null value counts as a FAILURE, plus the 150.0
    assert rep["in_range(value,0,100)"].n_fail == 2
    assert rep["name_shape"].n_fail == 2  # null and ""
    u = rep["unique(id)"]
    assert (u.n_rows, u.n_pass, u.n_fail, u.ok) == (6, 4, 2, False)
    u2 = rep["unique(id,name)"]
    assert (u2.n_pass, u2.ok) == (6, True)
    for r in rep.values():
        assert r.n_pass + r.n_fail == r.n_rows
        assert abs(r.pass_rate - r.n_pass / r.n_rows) < 1e-12


def test_validate_threshold_gating(fixture):
    rep = {
        r.rule: r
        for r in validate(
            fixture,
            [
                not_null("name", min_pass_rate=0.8),   # 5/6 = .833 -> ok
                non_empty("name", min_pass_rate=0.8),  # 4/6 = .667 -> not ok
                not_null("id"),                        # 6/6 strict -> ok
            ],
        ).collect()
    }
    assert rep["not_null(name)"].ok is True
    assert rep["non_empty(name)"].ok is False
    assert rep["not_null(id)"].ok is True


def test_validate_is_one_scan(fixture):
    """Five row-local rules must compile into a single aggregate over
    one scan — count the scans in the physical plan."""
    rep = validate(
        fixture,
        [
            not_null("name"),
            non_empty("name"),
            in_set("lang", ["en"]),
            in_range("value", 0, 100),
            matches("name", "^[a-z]*$"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_validate_empty_input(spark):
    df = spark.createDataFrame([], "id long, name string")
    rep = {
        r.rule: r
        for r in validate(
            df, [not_null("name")], unique_keys=[["id"]]
        ).collect()
    }
    # vacuous health: 0 rows, 0 failures, ok (rate defined as 1.0)
    for r in rep.values():
        assert (r.n_rows, r.n_fail, r.ok) == (0, 0, True)
        assert r.pass_rate == 1.0


def test_validate_rejects_bad_args(fixture):
    with pytest.raises(ValueError):
        validate(fixture, [])
    with pytest.raises(ValueError):
        validate(fixture, [not_null("name"), not_null("name")])
    with pytest.raises(ValueError):
        rule("x", F.lit(True), min_pass_rate=1.5)
