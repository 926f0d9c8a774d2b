"""Ingest manifest: checkpoint / resume / lineage + batch publish protocol.

Reference analogues: per-store HasDocument dedup check
(/root/reference/store/leveldb.go:58-68, flowindexer/index.go:17-24) and
the in-memory indexed-files cache (flowindexer/flowindexer.go:193-195).
Here the unit of idempotence is a **source partition** (a date bucket of
the transcripts table), not a file: processed partitions are recorded with
metrics, and ingest anti-joins the manifest so re-runs only process new
partitions — resumable-from-checkpoint per the north_rule.

Write-audit-publish: every ingest writes its routed/postings output under
a per-batch partition directory (``batch_id=bXXXX``) and the manifest
commit at the END of the run is the publish step. A crash between the
data writes and the commit leaves orphan batch directories; the next run
deletes any batch dir whose id is not in the manifest before doing new
work (:func:`clean_orphan_batches`), so a retry can never double-index —
the reference's per-doc ``HasDocument`` guard re-expressed at batch
granularity. On Iceberg this whole protocol is a snapshot commit + WAP;
the directory dance below is its local-parquet approximation (single
writer per index root, like the reference's one daemon per config).

Error records: rows whose ``ts`` cannot be bucketed (null) route to the
reserved ``_invalid_ts`` partition and are counted as ``n_errors`` in the
lineage row — the analogue of the reference's per-doc filename→time parse
errors (/root/reference/flowindexer/flowindexer.go:391-393, golden test
flowindexer_test.go:205-228). The rows are still indexed (the reference
indexes files whose timestamps fail to parse too; time only feeds stats).
"""

from __future__ import annotations

import os
import shutil
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
        StructField("n_errors", LongType(), True),
        StructField("wall_ms", LongType(), True),
        StructField("run_id", StringType(), True),
    ]
)

#: reserved partition for rows whose ts is null/unbucketable (error channel)
INVALID_TS_PARTITION = "_invalid_ts"


def new_batch_id() -> str:
    """Batch/run id for the publish protocol. 'b' prefix keeps the value
    non-numeric so parquet partition-column type inference can't coerce a
    digits-only id to a long (which would break batch_id equality filters)."""
    return "b" + uuid.uuid4().hex[:12]


def with_src_partition(df: DataFrame, col: str = "ts") -> DataFrame:
    """Derive the ingest partition key (UTC date of ts) — the analogue of
    the reference's filename->database regex routing
    (/root/reference/flowindexer/util.go:12-26). Null/unparseable ts maps
    to the reserved error partition instead of a null join key (a null key
    would never match the manifest anti-join and reprocess forever)."""
    return df.withColumn(
        "src_partition",
        F.coalesce(F.date_format(F.col(col), "yyyy-MM-dd"), F.lit(INVALID_TS_PARTITION)),
    )


def _local_manifest_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Manifest rows as a JVM-side LocalRelation (pandas/Arrow path).
    ``createDataFrame`` on a plain Python list pickles the rows into a
    Python RDD, and EVERY downstream action then launches a Python
    worker to re-evaluate it — measured 1.3-1.4 s per manifest append
    inside the ingest hot path (27% of a bench ingest wall). The
    pandas route materializes the same rows as an Arrow LocalRelation
    once: the identical append costs ~0.2 s and the empty-manifest
    anti-join plan stays free of PythonRDD scans."""
    import pandas as pd

    cols = [f.name for f in MANIFEST_SCHEMA.fields]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols), MANIFEST_SCHEMA
    )


def manifest_exists(path: str) -> bool:
    """Cheap local-FS existence probe (this module's lifecycle ops are
    local-FS by design — see clean_orphan_batches; on Iceberg these are
    catalog calls). Lets first-run callers skip both the exception-path
    Spark read and the committed-run-ids collect job (~0.4 s of pure
    driver latency per ingest on a fresh output root)."""
    return os.path.exists(path)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    if not manifest_exists(path):
        return _local_manifest_df(spark, [])
    try:
        return spark.read.parquet(path)
    except Exception:
        return _local_manifest_df(spark, [])


def pending_partitions(df: DataFrame, manifest: DataFrame) -> DataFrame:
    """Anti-join already-committed partitions (J2): keep rows whose
    src_partition has no 'done' manifest record."""
    done = manifest.filter(F.col("state") == "done").select("src_partition").distinct()
    return df.join(F.broadcast(done), on="src_partition", how="left_anti")


def committed_run_ids(manifest: DataFrame) -> set[str]:
    """All run ids ever published (any state) — the set of batch dirs that
    are legitimate table contents."""
    return {
        r["run_id"]
        for r in manifest.select("run_id").distinct().collect()
        if r["run_id"]
    }


def clean_orphan_batches(paths: list[str], committed: set[str]) -> list[str]:
    """Delete batch directories not published in the manifest (crash
    leftovers). ``compact-*`` ids are maintenance rewrites published by the
    compactor's atomic swap, not by the manifest — always kept. Local-FS
    walk; on Iceberg this is snapshot expiry / remove_orphan_files."""
    removed: list[str] = []
    for path in paths:
        if not os.path.isdir(path):
            continue
        for root, dirs, _files in os.walk(path):
            for d in list(dirs):
                if not d.startswith("batch_id="):
                    continue
                val = d.split("=", 1)[1]
                # batch dirs never nest inside batch dirs, so the walk
                # never needs to descend into one — pruning here keeps
                # the scan O(partitions), not O(files): kept batches'
                # part files (the bulk of a grown table) are never
                # listed (measured ~0.4 s -> ~0.05 s on the bench
                # table's ~400 part files).
                dirs.remove(d)
                if val.startswith("compact-") or val in committed:
                    continue
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                removed.append(val)
    return removed


def commit_partitions(
    spark: SparkSession,
    path: str,
    metrics: list[dict],
    run_id: str | None = None,
) -> str:
    """Append 'done' records with per-partition metrics (lineage rows) —
    the publish step of the write-audit-publish batch protocol."""
    run_id = run_id or new_batch_id()
    rows = [
        {
            "src_partition": m["src_partition"],
            "state": m.get("state", "done"),
            "n_turns": int(m.get("n_turns", 0)),
            "n_entities": int(m.get("n_entities", 0)),
            "n_errors": int(m.get("n_errors", 0)),
            "wall_ms": int(m.get("wall_ms", 0)),
            "run_id": run_id,
        }
        for m in metrics
    ]
    _local_manifest_df(spark, rows).coalesce(1).write.mode("append").parquet(path)
    return run_id


class StageTimer:
    def __init__(self) -> None:
        self.t0 = time.monotonic()

    def ms(self) -> int:
        return int((time.monotonic() - self.t0) * 1000)
