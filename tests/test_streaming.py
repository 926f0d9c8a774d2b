"""Structured Streaming ingest: drain semantics, incremental pickup,
equivalence with the batch pipeline, and double-layer idempotence.

Reference analogue tests: daemon tick + HasDocument idempotence
(/root/reference/flowindexer/flowindexer.go:439-466, index.go:17-24).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest
from flow_indexer_spark.streaming.ingest import TRANSCRIPT_SCHEMA, stream_ingest


@pytest.fixture()
def split_source(spark, transcripts, tmp_path):
    """Transcripts written as two parquet 'days' (file batches)."""
    src = str(tmp_path / "src")
    cut = "2015-05-01"
    early = transcripts.filter(F.col("ts") < cut)
    late = transcripts.filter(F.col("ts") >= cut)
    early.coalesce(2).write.mode("append").parquet(src)
    return src, early, late


def _postings_counts(spark, cfg):
    from flow_indexer_spark.operators.postings import entity_totals

    df = spark.read.parquet(cfg.postings_path)
    return {
        (r["entity_class"], r["entity_key"]): r["ndocs"]
        for r in entity_totals(df).collect()
    }


def test_stream_matches_batch_and_picks_up_new_files(
    spark, transcripts, split_source, tmp_path
):
    src, early, late = split_source
    cfg = PipelineConfig(output_root=str(tmp_path / "out"))

    # drain the first batch of files
    stream_ingest(spark, src, cfg)
    batch_cfg = PipelineConfig(output_root=str(tmp_path / "batch_out"))
    run_ingest(spark, early, batch_cfg)
    assert _postings_counts(spark, cfg) == _postings_counts(spark, batch_cfg)

    # new files arrive; a second AvailableNow tick ingests only them
    late.coalesce(2).write.mode("append").parquet(src)
    stream_ingest(spark, src, cfg)
    run_ingest(spark, transcripts, PipelineConfig(output_root=str(tmp_path / "full_out")))
    assert _postings_counts(spark, cfg) == _postings_counts(
        spark, PipelineConfig(output_root=str(tmp_path / "full_out"))
    )


def test_stream_idempotent_after_checkpoint_loss(spark, split_source, tmp_path):
    """Deleting the streaming checkpoint replays all files; the manifest
    layer inside run_ingest must still dedup (no double postings)."""
    import shutil

    src, early, _ = split_source
    cfg = PipelineConfig(output_root=str(tmp_path / "out"))
    stream_ingest(spark, src, cfg)
    before = _postings_counts(spark, cfg)

    shutil.rmtree(f"{cfg.output_root}/_checkpoint")
    stream_ingest(spark, src, cfg)  # full replay, manifest skips everything
    assert _postings_counts(spark, cfg) == before


def test_second_tick_same_date_not_dropped(spark, transcripts, tmp_path):
    """Regression: new files whose rows fall on a date some earlier batch
    already committed must STILL be indexed. A date-level anti-join inside
    foreachBatch would silently drop them (the idempotence unit must match
    the delivery unit — files, not dates)."""
    src = str(tmp_path / "src")
    # split WITHIN dates: even vs odd turn_idx — every date in part B was
    # already committed by part A's tick
    part_a = transcripts.filter(F.col("turn_idx") % 2 == 0)
    part_b = transcripts.filter(F.col("turn_idx") % 2 == 1)
    cfg = PipelineConfig(output_root=str(tmp_path / "out"))

    part_a.coalesce(2).write.mode("append").parquet(src)
    stream_ingest(spark, src, cfg)
    part_b.coalesce(2).write.mode("append").parquet(src)
    stream_ingest(spark, src, cfg)

    full = PipelineConfig(output_root=str(tmp_path / "full_out"))
    run_ingest(spark, transcripts, full)
    assert _postings_counts(spark, cfg) == _postings_counts(spark, full)

    # routed retains every turn exactly once
    routed = spark.read.parquet(cfg.routed_path)
    n_turns = routed.select("conv_id", "turn_idx").distinct().count()
    assert n_turns == transcripts.count()
    assert routed.count() == spark.read.parquet(full.routed_path).count()


def test_stream_schema_is_input_hint(spark):
    names = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    assert names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
