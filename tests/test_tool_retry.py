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
