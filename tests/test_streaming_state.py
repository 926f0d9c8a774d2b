"""Stateful streaming operator: per-conversation running summaries with
state persisted across stream restarts (applyInPandasWithState)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.streaming.state import run_tracking_tick


def _latest(spark, out_path):
    """Latest summary per conv (max n_turns row — counts are monotone)."""
    df = spark.read.parquet(out_path)
    w = df.groupBy("conv_id").agg(F.max("n_turns").alias("n_turns"))
    return {r["conv_id"]: r["n_turns"] for r in w.collect()}


@pytest.mark.parametrize("cut", ["2015-05-01"])
def test_state_accumulates_across_restarts(spark, transcripts, tmp_path, cut):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    early = transcripts.filter(F.col("ts") < cut)
    late = transcripts.filter(F.col("ts") >= cut)
    early.coalesce(1).write.mode("append").parquet(src)

    run_tracking_tick(spark, src, ckpt, out)
    got1 = _latest(spark, out)
    want1 = {
        r["conv_id"]: r["n"]
        for r in early.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert got1 == want1

    # stream restarts (new tick), state restored from checkpoint: totals
    # must accumulate, not reset
    late.coalesce(1).write.mode("append").parquet(src)
    run_tracking_tick(spark, src, ckpt, out)
    got2 = _latest(spark, out)
    want2 = {
        r["conv_id"]: r["n"]
        for r in transcripts.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert got2 == want2


def test_time_span_tracked(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    transcripts.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    run_tracking_tick(spark, src, str(tmp_path / "ckpt"), out)
    got = spark.read.parquet(out)
    one = got.orderBy(F.desc("n_turns")).head()
    src_rows = transcripts.filter(F.col("conv_id") == one["conv_id"]).agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).head()
    assert one["first_ts"] == src_rows["mn"]
    assert one["last_ts"] == src_rows["mx"]
