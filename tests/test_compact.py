"""Compaction: fragmented postings rewrite preserves content + layout."""

from __future__ import annotations

from flow_indexer_spark.operators.compact import _parquet_file_count, compact_postings
from flow_indexer_spark.operators.queries import search


def _counts(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        (r["entity_class"], r["entity_key"], r["ndocs"])
        for r in df.select("entity_class", "entity_key", "ndocs").collect()
    )


def test_compact_preserves_content_and_reduces_files(spark, pipeline_out, tmp_path):
    cfg, _ = pipeline_out
    # fragment a copy of the postings table: rewrite with many partitions
    frag = str(tmp_path / "postings_frag")
    df = spark.read.parquet(cfg.postings_path)
    df.repartition(24).write.partitionBy("entity_class").parquet(frag)
    before_content = _counts(spark, frag)
    before_files = _parquet_file_count(frag)

    res = compact_postings(spark, frag, min_files=4)
    assert res["compacted"]
    assert res["files_after"] < before_files
    assert _counts(spark, frag) == before_content
    # query layer still works over the compacted table
    post = spark.read.parquet(frag)
    assert search(post, "10.0.0.1").count() > 0


def test_compact_skips_small_tables(spark, pipeline_out):
    cfg, _ = pipeline_out
    res = compact_postings(spark, cfg.postings_path, min_files=10_000)
    assert not res["compacted"]
