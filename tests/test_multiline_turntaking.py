"""reassemble_multiline + turn_taking_stats: stitching semantics,
orphans, runs."""

from __future__ import annotations

from flow_indexer_spark.operators.multiline import reassemble_multiline
from flow_indexer_spark.operators.transcripts import turn_taking_stats


def test_multiline_stitches_continuations(spark):
    rows = [
        ("s1", 1, "ERROR boom", True),
        ("s1", 2, "  at frame0", False),
        ("s1", 3, "  at frame1", False),
        ("s1", 4, "INFO ok", True),
        ("s2", 5, "INFO solo", True),
    ]
    df = spark.createDataFrame(rows, "p string, o bigint, l string, s boolean")
    out = {
        (r["stream"], r["record_id"]): r
        for r in reassemble_multiline(df, "p", "o", "l", "s").collect()
    }
    rec1 = out[("s1", 1)]
    assert rec1["n_lines"] == 3 and rec1["start_order"] == 1
    assert rec1["record_text"] == "ERROR boom\n  at frame0\n  at frame1"
    assert rec1["has_start"]
    assert out[("s1", 2)]["record_text"] == "INFO ok"
    assert out[("s2", 1)]["n_lines"] == 1


def test_multiline_orphans_kept_and_flagged(spark):
    rows = [
        ("s", 1, "  dangling", False),
        ("s", 2, "  more dangling", False),
        ("s", 3, "START", True),
    ]
    df = spark.createDataFrame(rows, "p string, o bigint, l string, s boolean")
    out = {
        r["record_id"]: r
        for r in reassemble_multiline(df, "p", "o", "l", "s").collect()
    }
    orphan = out[0]
    assert not orphan["has_start"] and orphan["n_lines"] == 2
    assert orphan["record_text"] == "  dangling\n  more dangling"
    assert out[1]["has_start"] and out[1]["record_text"] == "START"


def test_turn_taking_hand(spark):
    rows = [
        ("c1", 1, "user"), ("c1", 2, "agent"), ("c1", 3, "agent"),
        ("c1", 4, "user"),
        ("c2", 1, "user"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r["conv_id"]: r for r in turn_taking_stats(t).collect()}
    c1 = out["c1"]
    # switches: user->agent, agent->user = 2; longest run: agent,agent = 2
    assert (c1["n_turns"], c1["n_switches"], c1["longest_run"]) == (4, 2, 2)
    assert c1["alternation"] == round(2 / 3, 9)
    c2 = out["c2"]
    assert c2["n_turns"] == 1 and c2["alternation"] is None
    assert c2["longest_run"] == 1


def test_turn_taking_monologue(spark):
    rows = [("c", i, "agent") for i in range(1, 6)]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    r = turn_taking_stats(t).collect()[0]
    assert r["n_switches"] == 0 and r["alternation"] == 0.0
    assert r["longest_run"] == 5
