"""Streaming session windows: watermark-finalized gap sessions that
match the batch session_window path on closed sessions, with state
evicted (exactly-once per session) across ticks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from flow_indexer_spark.streaming.sessions import run_session_tick

SCHEMA = StructType(
    [
        StructField("user_id", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame([Row(user_id=u, ts=_mk(m)) for u, m in rows], SCHEMA)


def _closed(spark, out):
    df = spark.read.parquet(out)
    return sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in df.collect()
    )


def test_sessions_close_at_watermark_and_survive_restart(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # user 1: two sessions (gap 40 > 30 min); user 2: one session.
    # The sentinel event at +10000 min pushes the watermark (2h delay)
    # far past all of them so every session closes in tick 1.
    batch1 = [(1, 0), (1, 10), (1, 50), (2, 5), (9, 10000)]
    _events(spark, batch1).coalesce(1).write.mode("append").parquet(src)
    run_session_tick(spark, src, ckpt, out, SCHEMA)

    got = _closed(spark, out)
    assert (1, _mk(0), 2) in got      # session {0,10}
    assert (1, _mk(50), 1) in got     # session {50}
    assert (2, _mk(5), 1) in got
    n_closed_1 = len(got)
    assert n_closed_1 == 3            # sentinel session still open

    # tick 2: new events for user 3 plus a later sentinel; previously
    # closed sessions must NOT re-emit (state evicted, checkpoint resume)
    batch2 = [(3, 10100), (9, 30000)]
    _events(spark, batch2).coalesce(1).write.mode("append").parquet(src)
    run_session_tick(spark, src, ckpt, out, SCHEMA)

    got2 = _closed(spark, out)
    assert len([g for g in got2 if g[0] in (1, 2)]) == 3  # no duplicates
    assert (9, _mk(10000), 1) in got2  # first sentinel closed by second
    assert (3, _mk(10100), 1) in got2


def test_streaming_matches_batch_session_window(spark, tmp_path):
    """Closed streaming sessions == batch session_window aggregation on
    the same events (excluding the still-open sentinel session)."""
    from flow_indexer_spark.operators.sessions import session_stats_native

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    rows = []
    for user in range(1, 5):
        t = 0
        for i in range(25):
            t += ((user * 31 + i * 17) % 70) + 1  # gaps 1..70 min
            rows.append((user, t))
    rows.append((99, 10**6))  # sentinel: watermark passes everything else
    _events(spark, rows).coalesce(1).write.mode("append").parquet(src)
    run_session_tick(spark, src, ckpt, out, SCHEMA)

    streamed = spark.read.parquet(out).filter(F.col("user_id") != 99)
    got = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["total_events"])
        for r in streamed.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
        .collect()
    }
    batch = _events(spark, rows).filter(F.col("user_id") != 99)
    want = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["total_events"])
        for r in session_stats_native(batch).collect()
    }
    assert got == want
