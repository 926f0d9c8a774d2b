"""tool_retry_chains: hand-built runs, recovery/exhaustion semantics."""

from __future__ import annotations

from flow_indexer_spark.operators.transcripts import tool_retry_chains


def test_retry_chain_semantics(spark):
    rows = [
        # conv A, tool s: fail, fail, ok  -> recovered chain, len 3
        ("A", 0, "s", False),
        ("A", 1, "s", False),
        ("A", 2, "s", True),
        # conv A, tool f: ok (no chain)
        ("A", 3, "f", True),
        # conv A, tool s AGAIN (new run): fail, fail -> exhausted, len 2
        ("A", 4, "s", False),
        ("A", 5, "s", False),
        # conv B, tool s: single failure, never retried -> not a chain
        ("B", 0, "s", False),
        # conv B, tool f: ok then fail -> trailing failure, not a chain
        ("B", 1, "f", True),
        ("B", 2, "f", False),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ok boolean"
    )
    got = {r["tool"]: r.asDict() for r in tool_retry_chains(df).collect()}
    s, f = got["s"], got["f"]
    assert s["n_runs"] == 3 and s["n_retry_chains"] == 2
    assert s["n_recovered"] == 1 and s["n_exhausted"] == 1
    assert s["max_chain_len"] == 3
    assert s["wasted_attempts"] == (3 - 1) + (2 - 1)
    assert f["n_runs"] == 2 and f["n_retry_chains"] == 0
    assert f["max_chain_len"] == 0 and f["wasted_attempts"] == 0


def test_null_ok_counts_as_failure(spark):
    """A null status means the attempt never reported success: it must
    count as a FAILURE (oracle semantics: CASE maps null to 0), not
    silently vanish from n_failures / final_ok through a null-
    propagating cast (the round-4 ADVICE divergence)."""
    rows = [
        # conv A, tool s: null, null, ok -> recovered chain, len 3
        ("A", 0, "s", None),
        ("A", 1, "s", None),
        ("A", 2, "s", True),
        # conv B, tool s: ok then trailing null -> final_ok=0, no chain
        ("B", 0, "s", True),
        ("B", 1, "s", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ok boolean"
    )
    got = {r["tool"]: r.asDict() for r in tool_retry_chains(df).collect()}
    s = got["s"]
    assert s["n_runs"] == 2
    assert s["n_retry_chains"] == 1          # conv A's nulls are failures
    assert s["n_recovered"] == 1 and s["n_exhausted"] == 0
    assert s["max_chain_len"] == 3
    assert s["wasted_attempts"] == 2


def test_topic_segments_boundaries(spark):
    """Hand-built conversation: overlap-rich run, hard topic switch,
    empty-turn reset, single-turn conversation."""
    from flow_indexer_spark.operators.transcripts import topic_segments

    rows = [
        ("A", 0, "alpha beta gamma"),
        ("A", 1, "beta gamma delta"),     # jaccard 2/4 = 0.5 -> same seg
        ("A", 2, "xray yankee zulu"),     # 0 -> boundary
        ("A", 3, "yankee zulu xray"),     # 1.0 -> same
        ("B", 0, "solo"),
        ("C", 0, "one two"),
        ("C", 1, "   "),                  # empty side -> boundary
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["conv_id"]: r.asDict() for r in topic_segments(df).collect()}
    assert got["A"]["n_turns"] == 4 and got["A"]["n_segments"] == 2
    assert got["A"]["mean_segment_len"] == 2.0
    assert got["A"]["min_jaccard"] == 0.0
    assert got["B"]["n_segments"] == 1 and got["B"]["min_jaccard"] is None
    assert got["C"]["n_segments"] == 2


def test_context_eviction_policies(spark):
    """Hand case: recency keeps the fitting suffix; longest-first keeps
    the big turns regardless of position; empty conversation guarded."""
    from flow_indexer_spark.operators.transcripts import (
        context_eviction_report,
    )

    rows = [
        ("A", 0, "w " * 50), ("A", 1, "w " * 10), ("A", 2, "w " * 10),
        ("B", 0, "w " * 100), ("B", 1, "w " * 5),
        ("C", 0, "   "),
    ]
    df = spark.createDataFrame(
        [(c, i, t.strip()) for c, i, t in rows],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        r["conv_id"]: r.asDict()
        for r in context_eviction_report(df, budget=60).collect()
    }
    # A: suffix sums from the end: 10, 20, 70 -> keep 2 turns (20 tok);
    # longest-first: 50, 60, 70 -> keep 2 turns (60 tok)
    a = got["A"]
    assert a["kept_recency"] == 2 and a["retained_recency"] == round(20 / 70, 9)
    assert a["kept_longest"] == 2 and a["retained_longest"] == round(60 / 70, 9)
    # B: last turn fits (5), the 100-turn doesn't in either policy
    b = got["B"]
    assert b["kept_recency"] == 1 and b["kept_longest"] == 1
    assert b["retained_longest"] == round(5 / 105, 9)
    # C: zero tokens -> null fractions
    assert got["C"]["total_tokens"] == 0
    assert got["C"]["retained_recency"] is None
    import pytest as _pt

    with _pt.raises(ValueError):
        context_eviction_report(df, budget=-1)


def test_tool_loop_report_hand_cycles(spark):
    """Hand-built cycles: ABAB... is a period-2 loop, AAA a period-1
    loop, distinct tools no loop; empty-tool turns are ignored."""
    from flow_indexer_spark.operators.transcripts import tool_loop_report

    rows = (
        [("A", i, "sf"[i % 2]) for i in range(6)]       # s f s f s f
        + [("B", 0, "s"), ("B", 1, "s"), ("B", 2, "s")]  # s s s
        + [("C", 0, "a"), ("C", 1, "b"), ("C", 2, "c")]
        + [("D", 0, "x"), ("D", 1, ""), ("D", 2, "x"), ("D", 3, "x")]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    got = {r["conv_id"]: r.asDict() for r in tool_loop_report(df).collect()}
    a = got["A"]
    assert a["cyc2"] == 3 and a["cyc1"] == 1
    assert a["max_cycles"] == 3 and a["loop_period"] == 2
    assert a["is_looping"] is True
    b = got["B"]
    assert b["cyc1"] == 3 and b["loop_period"] == 1 and b["is_looping"]
    c = got["C"]
    assert c["max_cycles"] == 1 and c["loop_period"] == 1
    assert c["is_looping"] is False
    d = got["D"]  # empty tool dropped: x x x -> period-1 run of 2
    assert d["n_tool_turns"] == 3 and d["cyc1"] == 3
