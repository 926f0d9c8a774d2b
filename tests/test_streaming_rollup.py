"""Streaming continuous aggregate: ticks fold micro-batches into the
chunked rollup table; totals match batch; replay after checkpoint loss
is bounded by batch-id idempotence."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flow_indexer_spark.operators.telemetry import read_rollup, rollup_counts
from flow_indexer_spark.streaming.rollup import stream_rollup

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_type=e, user_id=u, ts=T0 + dt.timedelta(hours=h))
            for e, u, h in rows
        ],
        SCHEMA,
    )


def _totals(spark, path):
    return sorted(
        (r["klass"], r["bucket"], r["n"]) for r in read_rollup(spark, path).collect()
    )


def test_stream_rollup_matches_batch_across_ticks(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    b1 = [("click", 1, 0), ("click", 2, 1), ("view", 1, 30)]  # day 1 + day 2
    b2 = [("click", 3, 2), ("view", 2, 31)]                  # same days again
    _events(spark, b1).coalesce(1).write.mode("append").parquet(src)
    stream_rollup(spark, src, out, ckpt, SCHEMA)
    _events(spark, b2).coalesce(1).write.mode("append").parquet(src)
    stream_rollup(spark, src, out, ckpt, SCHEMA)

    batch_twin = {
        (r["klass"], r["bucket"][:10], r["n"])  # bucket is 'YYYY-MM-DD HH:MM:SS'
        for r in rollup_counts(_events(spark, b1 + b2)).collect()
        if r["klass"] != "ALL" and r["bucket"] != "ALL"
    }
    assert set(_totals(spark, out)) == batch_twin


def test_stream_rollup_checkpoint_loss_replay_is_idempotent(spark, tmp_path):
    """Deleting the checkpoint replays ALL source files as batch 0 —
    which overwrites chunk stream-0 rather than double-counting, and the
    extra tick's chunks are re-folded wholesale. Totals stay correct."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    rows = [("click", 1, 0), ("view", 2, 1)]
    _events(spark, rows).coalesce(1).write.mode("append").parquet(src)
    stream_rollup(spark, src, out, ckpt, SCHEMA)
    before = _totals(spark, out)

    shutil.rmtree(ckpt)  # lose the checkpoint: full replay as stream-0
    stream_rollup(spark, src, out, ckpt, SCHEMA)
    assert _totals(spark, out) == before
