"""End-to-end pipeline tests: per-sink aggregate counts, routed-row
equality, enrich null path, manifest resume idempotence — the north_rule
correctness criteria."""

import pandas as pd
from pyspark.sql import functions as F

from flow_indexer_spark.generator import make_transcripts
from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest
from tests.oracle import extract_oracle


def test_metrics_counts(pipeline_out, transcripts_pdf):
    _, metrics = pipeline_out
    assert metrics["skipped"] is False
    assert metrics["n_turns"] == len(transcripts_pdf)
    assert metrics["n_entities"] == len(extract_oracle(transcripts_pdf))
    assert metrics["n_partitions"] > 1


def test_per_sink_aggregate_counts(spark, pipeline_out, transcripts_pdf):
    """Per-entity-class routed row counts == oracle (per-sink counts)."""
    cfg, _ = pipeline_out
    routed = spark.read.parquet(cfg.routed_path)
    got = {
        r.entity_class: r.n
        for r in routed.groupBy("entity_class").agg(F.count("*").alias("n")).collect()
    }
    want = extract_oracle(transcripts_pdf).groupby("entity_class").size().to_dict()
    assert got == want


def test_routed_row_equality(spark, pipeline_out, transcripts_pdf):
    """Routed rows preserve the original turn columns exactly (per-turn text
    equality under stable (conv_id, turn_idx) ordering)."""
    cfg, _ = pipeline_out
    routed = (
        spark.read.parquet(cfg.routed_path)
        .select("conv_id", "turn_idx", "text", "role", "tool")
        .dropDuplicates(["conv_id", "turn_idx"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    src = transcripts_pdf.set_index(["conv_id", "turn_idx"])
    for r in routed.itertuples():
        s = src.loc[(r.conv_id, r.turn_idx)]
        assert r.text == s["text"] and r.role == s["role"] and r.tool == s["tool"]


def test_enrich_columns_and_null_path(spark, pipeline_out):
    cfg, _ = pipeline_out
    routed = spark.read.parquet(cfg.routed_path)
    assert {"tool_class", "owner", "role_class"} <= set(routed.columns)
    # ghost_tool appears in transcripts but not in the registry -> nulls
    ghost = routed.filter(F.col("tool") == "ghost_tool")
    if ghost.count() > 0:
        assert ghost.filter(F.col("tool_class").isNotNull()).count() == 0
    # known tool enriched
    known = routed.filter(F.col("tool") == "search")
    if known.count() > 0:
        assert known.filter(F.col("tool_class") != "search").count() == 0


def test_manifest_resume_idempotent(spark, transcripts, dims, tmp_path):
    cfg = PipelineConfig(output_root=str(tmp_path / "out"))
    tr, rt = dims
    m1 = run_ingest(spark, transcripts, cfg, tr, rt)
    n_routed_1 = spark.read.parquet(cfg.routed_path).count()
    m2 = run_ingest(spark, transcripts, cfg, tr, rt)
    n_routed_2 = spark.read.parquet(cfg.routed_path).count()
    assert m1["skipped"] is False and m2["skipped"] is True
    assert n_routed_1 == n_routed_2  # no duplicate appends


def test_incremental_new_partition_only(spark, transcripts, dims, tmp_path):
    """Feed half the partitions, then all: second run must process only the
    remainder, and final tables must equal a one-shot run."""
    cfg = PipelineConfig(output_root=str(tmp_path / "inc"))
    tr, rt = dims
    parts = sorted(
        r.p for r in transcripts.select(F.date_format("ts", "yyyy-MM-dd").alias("p")).distinct().collect()
    )
    cut = parts[len(parts) // 2]
    first = transcripts.filter(F.date_format("ts", "yyyy-MM-dd") < cut)
    m1 = run_ingest(spark, first, cfg, tr, rt)
    m2 = run_ingest(spark, transcripts, cfg, tr, rt)
    assert m1["n_turns"] + m2["n_turns"] == transcripts.count()

    cfg_full = PipelineConfig(output_root=str(tmp_path / "full"))
    run_ingest(spark, transcripts, cfg_full, tr, rt)
    inc_post = spark.read.parquet(cfg.postings_path)
    full_post = spark.read.parquet(cfg_full.postings_path)
    cols = ["entity_class", "entity_key", "postings"]
    assert sorted(map(repr, inc_post.select(*cols).collect())) == sorted(
        map(repr, full_post.select(*cols).collect())
    )


def test_lineage_records(spark, pipeline_out):
    cfg, metrics = pipeline_out
    man = spark.read.parquet(cfg.manifest_path)
    rows = man.collect()
    assert all(r.state == "done" for r in rows)
    assert len({r.src_partition for r in rows}) == metrics["n_partitions"]
    assert all(r.run_id == metrics["run_id"] for r in rows)
    assert sum(r.n_turns for r in rows) == metrics["n_turns"]
    assert sum(r.n_entities for r in rows) == metrics["n_entities"]
