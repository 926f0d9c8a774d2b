"""Table maintenance: compaction of small files.

Reference analogue: LevelDB ``CompactRange`` after bulk indexing
(/root/reference/store/leveldb.go:50-52, flowindexer/compact.go:7-13,
cmd/compact.go:8-15). Incremental ingest appends one file set per batch;
after many batches the postings/routed tables fragment into many small
files, which at 100 TB scale means catalog pressure and poor scan
locality. On Iceberg this is ``rewrite_data_files``; on plain parquet we
rewrite partitions that exceed a file-count threshold, preserving the
sorted-by-entity_key layout that makes range queries file-skipping scans.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _parquet_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_postings(
    spark: SparkSession,
    path: str,
    *,
    min_files: int = 8,
    sort_col: str = "entity_key",
    partition_col: str = "entity_class",
) -> dict:
    """Rewrite the postings table if fragmented: read, range-repartition on
    (partition, sort) keys, re-sort within partitions, atomic swap via a
    sibling temp dir + rename. Returns {files_before, files_after,
    compacted}.

    The rewrite preserves the write-layout invariants of
    ``write_postings``: one writer per key range -> non-overlapping
    parquet min/max on ``sort_col`` -> range queries keep skipping files.
    """
    before = _parquet_file_count(path)
    if before < min_files:
        return {"files_before": before, "files_after": before, "compacted": False}

    df = spark.read.parquet(path)
    parent = os.path.dirname(os.path.abspath(path))
    tmp = tempfile.mkdtemp(prefix="_compact_", dir=parent)
    tmp_out = os.path.join(tmp, "data")
    (
        df.repartitionByRange(partition_col, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{sort_col}", "true")
        .partitionBy(partition_col)
        .parquet(tmp_out)
    )
    # local-POSIX-only swap (at S3/HDFS scale this is an Iceberg
    # rewrite_data_files snapshot commit instead); clear any stale _old
    # left by a prior crash-after-rename so the swap can't wedge.
    old = path.rstrip("/") + "_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp_out, path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    after = _parquet_file_count(path)
    return {"files_before": before, "files_after": after, "compacted": True}
