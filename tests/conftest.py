"""Shared fixtures: one SparkSession per test session (boot ~20s), seeded
transcripts, and a fully-ingested pipeline output reused across tests."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flow_indexer_spark.generator import make_dims, make_transcripts, make_transcripts_pdf
from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest
from flow_indexer_spark.session import get_spark

N_CONVS = 40
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="flow-indexer-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    return make_transcripts_pdf(N_CONVS, SEED)


@pytest.fixture(scope="session")
def transcripts(spark):
    return make_transcripts(spark, N_CONVS, SEED).cache()


@pytest.fixture(scope="session")
def dims(spark):
    return make_dims(spark)


@pytest.fixture(scope="session")
def pipeline_out(spark, transcripts, dims, tmp_path_factory):
    """Run the full ingest once; tests read its tables."""
    root = str(tmp_path_factory.mktemp("pipeline"))
    cfg = PipelineConfig(output_root=root)
    tool_registry, role_taxonomy = dims
    metrics = run_ingest(spark, transcripts, cfg, tool_registry, role_taxonomy)
    return cfg, metrics


@pytest.fixture(scope="session")
def postings(spark, pipeline_out):
    cfg, _ = pipeline_out
    return spark.read.parquet(cfg.postings_path).cache()
