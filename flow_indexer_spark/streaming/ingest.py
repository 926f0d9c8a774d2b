"""Structured Streaming wrapper for the ingest pipeline.

Reference analogue: the 60 s daemon poll loop
(/root/reference/flowindexer/flowindexer.go:439-466 ``RunDaemon``) with its
growing-file guard (/root/reference/flowindexer/util.go:63-90) and
idempotent re-index check (/root/reference/flowindexer/index.go:17-24).

Spark mapping:
- poll loop        -> ``readStream`` file source with
                      ``Trigger.AvailableNow`` (drain-and-stop, the batch
                      daemon tick) or ``processingTime`` (resident daemon).
- growing-file     -> the file source only picks up *closed* files listed
  guard               after the last checkpoint offset; on Iceberg the same
                      role is played by snapshot isolation (only committed
                      snapshots are readable) — no watermark needed.
- idempotent       -> two layers: the streaming checkpoint (exactly-once
  re-index            file offsets) AND the ingest manifest anti-join
                      inside ``run_ingest`` (partition-level dedup), so a
                      deleted checkpoint does not double-index.

``foreachBatch`` hands each micro-batch to the SAME batch ``run_ingest``
used by spark-submit jobs — one code path for batch and streaming (the
kappa-architecture property the reference approximates with its
indexall-vs-daemon split).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest

#: input_hint schema (BASELINE.json): the fixed transcript row shape
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def stream_ingest(
    spark: SparkSession,
    source_path: str,
    config: PipelineConfig,
    *,
    checkpoint_path: str | None = None,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    tool_registry=None,
    role_taxonomy=None,
):
    """Start (and for AvailableNow: finish) a streaming ingest.

    - ``processing_time=None`` -> ``Trigger.AvailableNow``: drain all
      unprocessed files, then stop — the scheduled-batch daemon tick.
    - ``processing_time='60 seconds'`` -> resident micro-batch daemon
      (caller owns ``query.stop()``).
    - ``max_files_per_trigger`` bounds per-batch work (backpressure), the
      analogue of indexing one file at a time in the reference.

    Returns the finished/running StreamingQuery.
    """
    checkpoint = checkpoint_path or f"{config.output_root}/_checkpoint"
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path)

    def _process(batch_df, batch_id: int) -> None:
        # The checkpoint delivers each source file exactly once, so the
        # date-level manifest anti-join must be OFF here: its unit of
        # idempotence (UTC date) is coarser than the delivery unit (files),
        # and the first micro-batch touching a date would mark it 'done'
        # and silently drop every later same-day batch.
        #
        # Idempotence is instead per FILE — the reference's HasDocument
        # unit (/root/reference/store/leveldb.go:58-68): rows from files
        # already published as 'file_done' are dropped (covers checkpoint
        # loss, where the source replays everything), and this batch's
        # file list is committed atomically with its lineage rows. Crash
        # retry within a checkpoint epoch is covered by run_ingest's
        # orphan-batch cleanup (unpublished dirs deleted before rework).
        from flow_indexer_spark.sources.manifest import read_manifest

        man = read_manifest(spark, config.manifest_path)
        done_files = (
            man.filter(F.col("state") == "file_done")
            .select(F.col("src_partition").substr(F.lit(6), F.lit(1 << 20)).alias("_src_file"))
            .distinct()
        )
        b = batch_df.withColumn("_src_file", F.input_file_name()).join(
            F.broadcast(done_files), "_src_file", "left_anti"
        )
        batch_files = [
            r["_src_file"] for r in b.select("_src_file").distinct().collect()
        ]
        if not batch_files:
            return
        run_ingest(
            spark,
            b.drop("_src_file"),
            config,
            tool_registry=tool_registry,
            role_taxonomy=role_taxonomy,
            use_manifest_antijoin=False,
            extra_manifest_rows=[
                {"src_partition": f"file:{f}", "state": "file_done"}
                for f in sorted(batch_files)
            ],
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if processing_time is None:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.trigger(processingTime=processing_time).start()
    return query
