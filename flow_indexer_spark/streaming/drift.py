"""Streaming lexical-drift monitor: Structured Streaming over document
batches, accumulating reference token counts and emitting a JS-drift
record per micro-batch.

The batch operator (`operators/drift_state.py`) answers "has THIS
batch drifted from the accepted corpus"; this wires it into the same
Structured Streaming shape as `streaming/ingest.py`: a parquet file
source + ``foreachBatch``, AvailableNow for the scheduled daemon tick
or a processing-time trigger for a resident monitor.  Per micro-batch:

1. drift of the incoming batch vs the CURRENT reference (skipped for
   the very first batch, which has nothing to drift against),
2. commit of the batch's token counts into the reference state
   (idempotent batch partitions keyed by the checkpoint's batch_id —
   a replayed epoch replaces its own partition, never double-counts),
3. one JSON drift record appended to ``<state>/drift_log.jsonl``.

The reference state only ever grows by vocab-sized partitions; no
step rescans history (the union-aggregate read is vocab-bounded, and
at cluster scale the batch partitions compact like any chunked state
— operators/compact.py discipline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from flow_indexer_spark.operators.drift_state import (
    batch_drift,
    commit_token_counts,
)

__all__ = ["stream_drift"]

#: minimal schema the file source needs (matches the documents table)
DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def stream_drift(
    spark: SparkSession,
    source_path: str,
    state_path: str,
    *,
    checkpoint_path: str | None = None,
    processing_time: str | None = None,
    text_col: str = "text",
):
    """Start (AvailableNow: finish) the drift monitor over a directory
    of document parquet files. Returns the StreamingQuery; drift
    records land in ``<state_path>/drift_log.jsonl``."""
    checkpoint = checkpoint_path or os.path.join(state_path, "_checkpoint")
    log_path = os.path.join(state_path, "drift_log.jsonl")

    def _process(batch_df, batch_id: int) -> None:
        os.makedirs(state_path, exist_ok=True)
        rec: dict = {"batch_id": int(batch_id)}
        has_ref = any(
            e.name.startswith("batch=") for e in os.scandir(state_path)
        ) if os.path.isdir(state_path) else False
        if has_ref:
            try:
                rec.update(batch_drift(spark, batch_df, state_path, text_col))
            except ValueError as e:  # empty batch: record, don't commit
                rec["error"] = str(e)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec, sort_keys=True) + "\n")
                return
        else:
            rec["bootstrap"] = True
        meta = commit_token_counts(
            spark, batch_df, state_path, f"e{batch_id}", text_col
        )
        rec.update(meta)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")

    writer = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(source_path)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if processing_time is None:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.trigger(processingTime=processing_time).start()
    return query
