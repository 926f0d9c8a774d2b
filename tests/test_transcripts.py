"""Transcript-level analytics: rollups, adjacency latency, co-occurrence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from flow_indexer_spark.operators.transcripts import (
    conversation_rollup,
    entity_cooccurrence,
    response_latency,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _turn(conv, idx, role, secs, tool=""):
    return Row(
        conv_id=conv,
        turn_idx=idx,
        role=role,
        text=f"turn {idx}",
        tool=tool,
        ts=T0 + dt.timedelta(seconds=secs),
    )


def test_conversation_rollup_golden(spark):
    rows = [
        _turn("c1", 0, "user", 0),
        _turn("c1", 1, "assistant", 5, tool="search"),
        _turn("c1", 2, "user", 60),
        _turn("c1", 3, "assistant", 62, tool="search"),
        _turn("c2", 0, "system", 0),
    ]
    got = {
        r["conv_id"]: r
        for r in conversation_rollup(spark.createDataFrame(rows)).collect()
    }
    c1 = got["c1"]
    assert c1["n_turns"] == 4
    assert c1["n_user_turns"] == 2 and c1["n_assistant_turns"] == 2
    assert c1["n_distinct_tools"] == 1  # 'search' twice, '' excluded
    assert (c1["last_ts"] - c1["first_ts"]).total_seconds() == 62
    assert got["c2"]["n_user_turns"] == 0
    assert got["c2"]["n_distinct_tools"] == 0


def test_response_latency_golden(spark):
    rows = [
        _turn("c1", 0, "user", 0),
        _turn("c1", 1, "assistant", 7),       # pair: latency 7
        _turn("c1", 2, "user", 100),
        _turn("c1", 3, "user", 110),          # user->user: no pair for idx 2
        _turn("c1", 4, "assistant", 112.5),   # pair with idx 3: 2.5
    ]
    got = {
        r["turn_idx"]: (r["next_turn_idx"], r["latency_s"])
        for r in response_latency(spark.createDataFrame(rows)).collect()
    }
    assert got == {0: (1, 7.0), 3: (4, 2.5)}


def test_entity_cooccurrence_cap_and_ordering(spark):
    rows = [
        # turn 1: entities A, B, C -> pairs AB AC BC
        ("ip", "A", "c1", 0), ("ip", "B", "c1", 0), ("role", "C", "c1", 0),
        # turn 2: A, B again -> AB count 2
        ("ip", "A", "c1", 1), ("ip", "B", "c1", 1),
        # duplicate row must not double-count
        ("ip", "A", "c1", 1),
    ]
    df = spark.createDataFrame(
        rows, ["entity_class", "entity_key", "conv_id", "turn_idx"]
    )
    got = {
        (r["class_a"], r["key_a"], r["class_b"], r["key_b"]): r["n_turns"]
        for r in entity_cooccurrence(df, max_entity_df=None).collect()
    }
    assert got == {
        ("ip", "A", "ip", "B"): 2,
        ("ip", "A", "role", "C"): 1,
        ("ip", "B", "role", "C"): 1,
    }
    # cap: A and B appear in 2 turns; cap 1 excludes them, C has no partner
    assert entity_cooccurrence(df, max_entity_df=1).count() == 0
