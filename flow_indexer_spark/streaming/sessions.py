"""Streaming sessionization: session_window + watermark.

The batch twin lives in operators/sessions.py (lag+cumsum baseline and
the session_window hash-agg scale path). This is the streaming form of
the latter: the reference's 60s poll daemon
(/root/reference/flowindexer/flowindexer.go:439-466) never windowed by
event time — the growing-file guard (util.go:63-90) was its only
late-data defense — whereas a transcript stream needs real event-time
sessions with bounded state, which is exactly watermark + session_window:
a user's session stays in the state store only until the watermark passes
its end, then is finalized, emitted once (append mode), and evicted.

State size is O(open sessions), not O(history); the watermark delay is
the late-data tolerance knob. Both properties are what make this the
100 TB streaming path — an unwatermarked aggregation would accumulate
state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_session_windows(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-user gap sessions, finalized-once (append mode).

    Output: (user, session_start, session_end, n_events) — one row per
    CLOSED session (watermark passed its end). Gap semantics match the
    batch paths: an event at exactly gap_minutes after the previous one
    extends the session (inclusive merge — pinned by the batch
    differential test in test_dedup.py).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def run_session_tick(
    spark,
    source_path: str,
    checkpoint_path: str,
    out_path: str,
    schema,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> None:
    """One AvailableNow tick: drain new source files, close every session
    whose end precedes the updated watermark, append the closed rows to
    ``out_path``. Open sessions persist in the checkpoint state store and
    close on a later tick — exactly-once per session via the checkpoint.
    """
    stream = spark.readStream.schema(schema).parquet(source_path)
    sessions = stream_session_windows(
        stream, user_col, ts_col, gap_minutes, watermark
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
