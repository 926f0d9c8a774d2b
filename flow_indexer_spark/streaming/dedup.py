"""Streaming deduplication with bounded state.

The batch dedup suite (operators/dedup.py) assumes the whole corpus is
addressable; a resident ingest daemon sees rows trickle in and must drop
re-deliveries (at-least-once upstreams, retried producers, replayed
partitions) WITHOUT keeping every key ever seen. That is exactly
``dropDuplicatesWithinWatermark``: state holds only keys younger than
the watermark, so memory is O(keys per watermark window), not O(history)
— the same bounded-state argument as streaming/sessions.py, applied to
the reference's idempotent re-index guard
(/root/reference/flowindexer/index.go:17-24, store/leveldb.go:58-68):
the reference dedups at file granularity against a persistent store; a
row-granular stream dedups against a TTL'd state store instead.

Exactly-once layering: the checkpoint gives exactly-once FILE delivery;
this gives at-most-once per KEY within the watermark horizon; replays
older than the horizon are the manifest's job (content-level anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    stream: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within the watermark
    horizon. ``id_cols`` defaults to the transcript identity
    (conv_id, turn_idx) — the reference's document identity unit. The
    event-time column must NOT be part of the key: two deliveries of the
    same turn may carry skewed timestamps; dropDuplicatesWithinWatermark
    matches on the key alone and uses event time only for state TTL."""
    keys = id_cols if id_cols is not None else ["conv_id", "turn_idx"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_dedup_tick(
    spark,
    source_path: str,
    checkpoint_path: str,
    out_path: str,
    schema,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> None:
    """One AvailableNow tick: drain new source files, emit each key's
    first-seen row exactly once, append to ``out_path``. Dedup state lives
    in the checkpoint and expires as the watermark advances."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    deduped = stream_dedup(stream, id_cols, ts_col, watermark)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_content_dedup_tick(
    spark,
    source_path: str,
    checkpoint_path: str,
    state_path: str,
    out_path: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_bucket_df: int | None = 1000,
    rows_per_band: int = 1,
) -> None:
    """One AvailableNow tick of CONTENT-level dedup against the persisted
    signature state (operators/dedup_state.py) — the unbounded-horizon
    complement to :func:`stream_dedup`'s TTL'd key dedup: a document
    re-delivered MONTHS later still classifies 'exact' because the state
    keys on content, not arrival time.

    Exactly-once layering: the checkpoint gives exactly-once source-file
    delivery per epoch; both side effects — the signature-state partition
    and the survivors' output partition — are then keyed by the epoch id
    PLUS an order-insensitive digest of the batch's row ids, via dynamic
    partition overwrite. A replayed epoch (crash between the writes and
    the checkpoint commit) re-delivers the same rows, recomputes the same
    key, and rewrites its own partitions wholesale instead of appending
    duplicates. A full checkpoint LOSS re-delivers the backlog with
    DIFFERENT batching (file-source maxFilesPerTrigger can split it into
    several epochs whose numbers collide with the old run's) — the digest
    makes those keys distinct, so the old run's partitions are never
    clobbered; re-delivered content classifies 'exact' against the
    still-intact state and is simply not re-emitted, so the output
    converges duplicate-free without losing previously accepted rows.
    The digest costs one batch-sized aggregation per tick.
    """
    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.dedup import md5_int32
    from flow_indexer_spark.operators.dedup_state import dedup_against_state

    def _fold(batch_df, epoch_id):
        key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
        digest = batch_df.agg(
            F.sum(md5_int32(F.concat(F.lit("cd"), key))).alias("d")
        ).first()["d"]
        batch = f"epoch{epoch_id}x{(digest or 0) % 10**12}"
        out = dedup_against_state(
            spark, batch_df, state_path, batch,
            id_col, text_col, n_bands, max_bucket_df, rows_per_band,
        )
        (
            out.filter(F.col("dup_kind") == "unique")
            .drop("content_hash", "dup_kind")
            .withColumn("batch", F.lit(batch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(out_path)
        )

    stream = spark.readStream.schema(schema).parquet(source_path)
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
