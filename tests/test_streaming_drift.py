"""Streaming drift monitor: bootstrap tick, second-tick drift record,
delta-only processing, and batch-replay safety of the reference."""

from __future__ import annotations

import json
import math
import os

from flow_indexer_spark.operators.drift_state import reference_counts
from flow_indexer_spark.streaming.drift import stream_drift


def _write_docs(spark, path, texts, start_id=0):
    rows = [
        (start_id + i, t, "en", "s0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).coalesce(1).write.mode("append").parquet(path)


def test_two_ticks_bootstrap_then_drift(spark, tmp_path):
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    _write_docs(spark, src, ["x y x", "y x y"])
    stream_drift(spark, src, state)
    log = [
        json.loads(l)
        for l in open(os.path.join(state, "drift_log.jsonl"))
    ]
    assert log[-1].get("bootstrap") is True
    assert log[-1]["n_tokens"] == 6

    # second tick: only the NEW file is processed (checkpoint), and its
    # identical distribution drifts 0
    _write_docs(spark, src, ["x y x y"], start_id=10)
    stream_drift(spark, src, state)
    log = [
        json.loads(l)
        for l in open(os.path.join(state, "drift_log.jsonl"))
    ]
    assert len(log) == 2
    assert log[-1]["js_divergence"] == 0.0
    assert log[-1]["n_batch_tokens"] == 4  # delta only, not 10

    # disjoint third tick: drift ~ ln 2
    _write_docs(spark, src, ["p q p q"], start_id=20)
    stream_drift(spark, src, state)
    log = [
        json.loads(l)
        for l in open(os.path.join(state, "drift_log.jsonl"))
    ]
    assert abs(log[-1]["js_divergence"] - math.log(2)) < 1e-9
    # reference accumulated all three batches
    ref = {
        r["token"]: r["n"] for r in reference_counts(spark, state).collect()
    }
    assert ref["x"] == 5 and ref["p"] == 2
