"""Streaming continuous aggregate: exactly-once rollup maintenance.

Composition of two existing pieces into an end-to-end guarantee:
Structured Streaming's checkpoint replays a failed micro-batch with the
SAME batch_id, and ``maintain_rollup`` (operators/telemetry.py) is
idempotent per batch_id — a replayed batch overwrites its own chunk
partition instead of double-counting. foreachBatch + batch-keyed chunk
table therefore gives an exactly-once aggregate SINK with no
transactional store: the same trick the ingest pipeline uses for
postings (file-keyed manifest rows, streaming/ingest.py) applied at the
aggregate level.

State is zero (no watermark, no state store): each micro-batch folds to
bucket-cardinality rows and lands as one chunk; ``read_rollup`` sums
chunks at read time and ``compact_rollup`` bounds their count offline.
"""

from __future__ import annotations

from flow_indexer_spark.operators.telemetry import maintain_rollup


def stream_rollup(
    spark,
    source_path: str,
    rollup_path: str,
    checkpoint_path: str,
    schema,
    class_col: str = "event_type",
    ts_col: str = "ts",
    granularity: str = "day",
    processing_time: str | None = None,
):
    """Maintain the rollup from a file stream. ``processing_time=None``
    runs one AvailableNow tick (drain new files, fold, stop); a value
    like ``'60 seconds'`` leaves a resident daemon (caller stops it).
    Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(source_path)

    def _fold(batch_df, batch_id: int) -> None:
        maintain_rollup(
            spark,
            batch_df,
            rollup_path,
            f"stream-{batch_id}",
            class_col=class_col,
            ts_col=ts_col,
            granularity=granularity,
        )

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if processing_time is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime=processing_time).start()
    return q


def stream_sketch_rollup(
    spark,
    source_path: str,
    rollup_path: str,
    checkpoint_path: str,
    schema,
    keys=("event_type",),
    ts_col: str = "ts",
    granularity: str = "day",
    id_col: str = "user_id",
    value_col: str | None = "value",
    processing_time: str | None = None,
):
    """Exactly-once CONTINUOUS sketch aggregate: the same
    checkpoint-replays-batch_id x idempotent-chunk-commit composition as
    :func:`stream_rollup`, maintaining distinct-count / set-algebra /
    quantile sketches instead of additive counts — the streaming answer
    to "distinct users per day, live" that an exact streaming
    COUNT(DISTINCT) would need unbounded state for. Zero state store:
    each micro-batch folds to bucket-cardinality sketch rows and lands
    as its own batch-keyed chunk (operators/sketches.py
    maintain_sketch_rollup); union-at-read makes chunking invisible."""
    from flow_indexer_spark.operators.sketches import maintain_sketch_rollup

    stream = spark.readStream.schema(schema).parquet(source_path)

    def _fold(batch_df, batch_id: int) -> None:
        maintain_sketch_rollup(
            spark,
            batch_df,
            rollup_path,
            f"stream-{batch_id}",
            keys=keys,
            ts_col=ts_col,
            granularity=granularity,
            id_col=id_col,
            value_col=value_col,
        )

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if processing_time is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime=processing_time).start()
    return q
