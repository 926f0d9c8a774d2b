"""Rendezvous routing: python-mirror equality, minimal-disruption
property (adds only pull to the new sink; removals only scatter the
removed sink's keys), and determinism guards."""

from __future__ import annotations

import hashlib

import pytest

from flow_indexer_spark.operators.routing import (
    rendezvous_churn,
    rendezvous_sink,
)


def _mirror(key: str, sinks: list[str]) -> str:
    best = max(
        sinks,
        key=lambda s: (
            int(hashlib.md5(f"rv|{key}|{s}".encode()).hexdigest()[:8], 16),
            -sinks.index(s),
        ),
    )
    return best


def test_rendezvous_matches_python_mirror(spark):
    sinks = ["s0", "s1", "s2", "s3"]
    keys = [f"key-{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["sink"]
        for r in df.select(
            "k", rendezvous_sink("k", sinks).alias("sink")
        ).collect()
    }
    assert got == {k: _mirror(k, sinks) for k in keys}
    # spread sanity: every sink gets a reasonable share
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == set(sinks) and min(c.values()) > 300 / len(sinks) / 3


def test_rendezvous_minimal_disruption(spark):
    before = ["s0", "s1", "s2", "s3"]
    after = before + ["s4"]
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(400)], "k string"
    )
    rows = rendezvous_churn(keys, "k", before, after).collect()
    moved = [r for r in rows if r["moved"]]
    stayed = sum(r["n_keys"] for r in rows if not r["moved"])
    n_moved = sum(r["n_keys"] for r in moved)
    # EVERY moved key lands on the newly added sink — the rendezvous
    # guarantee a bucket-mod router violates
    assert all(r["sink_after"] == "s4" for r in moved)
    # expectation 1/5 of 400 = 80; allow generous binomial slack
    assert 40 <= n_moved <= 130
    assert stayed + n_moved == 400
    # removal: only the removed sink's keys move
    rows2 = rendezvous_churn(keys, "k", after, before).collect()
    assert all(r["sink_before"] == "s4" for r in rows2 if r["moved"])


def test_rendezvous_guards(spark):
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_sink("k", [])
    with pytest.raises(ValueError, match="distinct"):
        rendezvous_sink("k", ["a", "a"])
