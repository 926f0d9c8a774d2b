"""Custom stateful streaming operator: incremental conversation tracking.

The reference's only state is the indexed-files manifest (T3); a
transcript stream has a natural richer state — per-conversation running
aggregates (turn counts, time span, entity tallies) maintained across
micro-batches and process restarts. This is the
``applyInPandasWithState`` surface: Arrow-batched per-group state updates
inside Structured Streaming, state persisted in the checkpoint's state
store (RocksDB/HDFS-backed on a cluster), restored on restart.

Semantics: Update-mode output — each micro-batch emits one refreshed
summary row per conversation that received turns in that batch. Exactly
the shape of the reference daemon's per-file "Wrote N unique ips" counter
(/root/reference/flowindexer/index.go:46-51), generalized to a keyed,
restart-safe stream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CONV_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("first_ts", LongType()),  # epoch micros (state stores primitives)
        StructField("last_ts", LongType()),
    ]
)

CONV_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _track(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, first, last = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        mn, mx = _us(pdf["ts"].min()), _us(pdf["ts"].max())
        first = mn if first is None or mn < first else first
        last = mx if last is None or mx > last else last
    state.update((n, first, last))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n],
            "first_ts": [pd.Timestamp(first * 1000, unit="ns")],
            "last_ts": [pd.Timestamp(last * 1000, unit="ns")],
        }
    )


def track_conversations(stream: DataFrame) -> DataFrame:
    """Streaming transcripts -> per-conversation running summaries.

    Grouping by conv_id shuffles each micro-batch once; state lives with
    the group partition (same hash partitioning every batch — no state
    movement). Skew note: a single conversation's state is O(1) (running
    aggregates, not buffered turns), so a hot conversation costs only its
    per-batch row throughput, never memory.
    """
    return stream.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=CONV_OUTPUT_SCHEMA,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_tracking_tick(
    spark,
    source_path: str,
    checkpoint_path: str,
    out_path: str,
    schema=None,
) -> None:
    """One AvailableNow tick of the tracker: drain new source files,
    update state (restored from checkpoint), append the refreshed
    summaries to ``out_path`` parquet (latest row per conv_id wins —
    readers take max by last_ts; an Iceberg MERGE would upsert instead).
    """
    from flow_indexer_spark.streaming.ingest import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(schema or TRANSCRIPT_SCHEMA).parquet(source_path)
    tracked = track_conversations(stream)

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        tracked.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
