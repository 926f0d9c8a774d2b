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


def test_compact_folds_incremental_batch_chunks(spark, transcripts, dims, tmp_path):
    """After two incremental batches, an entity has chunk rows in BOTH
    batch dirs; compaction must fold them to one row per (entity, chunk)
    with the merged sorted posting array — the offline analogue of the
    reference's read-modify-write posting union
    (/root/reference/store/leveldb.go:261-278)."""
    from pyspark.sql import functions as F

    from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest

    cfg = PipelineConfig(output_root=str(tmp_path / "inc"))
    tr, rt = dims
    parts = sorted(
        r.p
        for r in transcripts.select(F.date_format("ts", "yyyy-MM-dd").alias("p"))
        .distinct()
        .collect()
    )
    cut = parts[len(parts) // 2]
    run_ingest(spark, transcripts.filter(F.date_format("ts", "yyyy-MM-dd") < cut), cfg, tr, rt)
    run_ingest(spark, transcripts, cfg, tr, rt)

    def exploded(path):
        return sorted(
            map(
                repr,
                spark.read.parquet(path)
                .select("entity_class", "entity_key", F.explode("postings").alias("p"))
                .select("entity_class", "entity_key", "p.conv_id", "p.turn_idx")
                .collect(),
            )
        )

    before = exploded(cfg.postings_path)
    # the hot entity appears in both batches -> duplicate (entity, chunk) rows
    hot_rows_before = (
        spark.read.parquet(cfg.postings_path)
        .groupBy("entity_class", "entity_key", "chunk_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert hot_rows_before > 0

    res = compact_postings(spark, cfg.postings_path, min_files=1)
    assert res["compacted"]
    post = spark.read.parquet(cfg.postings_path)
    assert exploded(cfg.postings_path) == before
    assert (
        post.groupBy("entity_class", "entity_key", "chunk_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    # per-chunk arrays are sorted and ndocs consistent
    bad = post.filter(
        (F.size("postings") != F.col("ndocs"))
        | (F.to_json(F.array_sort("postings")) != F.to_json("postings"))
    )
    assert bad.count() == 0
    assert search(post, "10.0.0.1").count() > 0


def test_compact_skips_small_tables(spark, pipeline_out):
    cfg, _ = pipeline_out
    res = compact_postings(spark, cfg.postings_path, min_files=10_000)
    assert not res["compacted"]
