"""Ingest manifest: checkpoint / resume / lineage.

Reference analogues: per-store HasDocument dedup check
(/root/reference/store/leveldb.go:58-68, flowindexer/index.go:17-24) and
the in-memory indexed-files cache (flowindexer/flowindexer.go:193-195).
Here the unit of idempotence is a **source partition** (a date bucket of
the transcripts table), not a file: processed partitions are recorded with
metrics, and ingest anti-joins the manifest so re-runs only process new
partitions — resumable-from-checkpoint per the north_rule.

On Iceberg in production this table is a real catalog table and commits
ride snapshot isolation (write-audit-publish); on local parquet we append
one manifest file per run, which is atomic enough for tests.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("src_partition", StringType(), False),
        StructField("state", StringType(), False),
        StructField("n_turns", LongType(), True),
        StructField("n_entities", LongType(), True),
        StructField("wall_ms", LongType(), True),
        StructField("run_id", StringType(), True),
    ]
)


def with_src_partition(df: DataFrame, col: str = "ts") -> DataFrame:
    """Derive the ingest partition key (UTC date of ts) — the analogue of
    the reference's filename->database regex routing
    (/root/reference/flowindexer/util.go:12-26)."""
    return df.withColumn("src_partition", F.date_format(F.col(col), "yyyy-MM-dd"))


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def pending_partitions(df: DataFrame, manifest: DataFrame) -> DataFrame:
    """Anti-join already-committed partitions (J2): keep rows whose
    src_partition has no 'done' manifest record."""
    done = manifest.filter(F.col("state") == "done").select("src_partition").distinct()
    return df.join(F.broadcast(done), on="src_partition", how="left_anti")


def commit_partitions(
    spark: SparkSession,
    path: str,
    metrics: list[dict],
    run_id: str | None = None,
) -> str:
    """Append 'done' records with per-partition metrics (lineage rows)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    rows = [
        {
            "src_partition": m["src_partition"],
            "state": "done",
            "n_turns": int(m.get("n_turns", 0)),
            "n_entities": int(m.get("n_entities", 0)),
            "wall_ms": int(m.get("wall_ms", 0)),
            "run_id": run_id,
        }
        for m in metrics
    ]
    spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(path)
    return run_id


class StageTimer:
    def __init__(self) -> None:
        self.t0 = time.monotonic()

    def ms(self) -> int:
        return int((time.monotonic() - self.t0) * 1000)
