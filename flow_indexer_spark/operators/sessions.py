"""Conversation/event sessionization (gap-based) via window functions.

The reference buckets documents purely by filename time (db-per-month,
/root/reference/flowindexer/util.go:12-26); a transcript pipeline also
needs behavioral sessions: split a user's event stream wherever the gap
between consecutive events exceeds a threshold, then aggregate per
session. This is the classic lag + cumulative-sum pattern — two window
passes over the SAME partitioning (user), so Spark shuffles once and both
windows run in one sort within partitions.

At skew risk: one hyperactive user key. The window partitions by user, so
a single user's whole history must fit one task — acceptable for human
users; for bot-scale keys, pre-split by (user, month) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign session_id (0-based per user) by the gap rule.

    The cumulative sum pins an explicit ROWS frame: the default window
    frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW, which on duplicate
    (user, ts) rows gives every tied row the post-increment session_id —
    diverging from engines (and our DuckDB oracle) that use ROWS.
    ``tiebreak_cols`` makes lag ordering deterministic when ts ties are
    possible (e.g. an event_id column).
    """
    order = [ts_col, *tiebreak_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w)
    # exact microsecond gap (cast-to-long would truncate sub-second parts
    # differently than SQL engines that round — unix_micros is unambiguous).
    # NTZ columns need the cast; session tz is pinned UTC so it's linear.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = us(F.col(ts_col)) - us(prev)
    new_sess = F.when(prev.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(new_sess).over(w_rows) - 1)


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session summary: session count, longest session (events),
    total events. One shuffle (the window partition), then an in-partition
    re-aggregation — map-side combine applies to the final groupBy."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    per_sess = s.groupBy(user_col, "session_id").agg(F.count("*").alias("n_events"))
    return per_sess.groupBy(user_col).agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


def session_stats_native(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Scale-path twin of ``session_stats`` built on Spark's native
    ``session_window`` aggregate instead of lag + cumulative sum.

    Why a second implementation: the window-function path sorts each
    user's FULL history inside one task (the one-user-one-task ceiling
    noted in the module docstring); ``session_window`` runs as a hash
    aggregate with in-partition session merging (UpdatingSessions), spills
    via the aggregation machinery, and is the only form that also works
    under Structured Streaming with watermark-based state eviction. The
    two are differential-tested against each other (the reference keeps
    dual nfdump implementations cross-checked the same way,
    /root/reference/backend/nfdump_test.go:30-55).

    Boundary semantics (verified empirically, pinned by
    test_session_stats_native_differential): ``session_window`` merges an
    event whose ts <= the current window end (ts_prev + gap) — i.e. the
    INCLUSIVE gap <= threshold rule, identical to ``sessionize``. An
    event 1 microsecond past the threshold starts a new session in both
    paths, so no gap adjustment is needed.
    """
    gap = f"{gap_minutes} minutes"
    per_sess = df.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(F.count("*").alias("n_events"))
    return per_sess.groupBy(user_col).agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


def session_length_percentiles(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Corpus-wide session-length distribution: exact interpolated
    percentiles (Spark ``percentile`` == SQL quantile_cont semantics:
    sorted, idx = p*(n-1), linear interpolation) of events-per-session,
    plus max. Exact (not approx_percentile) so the result is
    engine-portable; at 100 TB swap in approx_percentile and accept the
    documented error bound."""
    per_sess = (
        sessionize(df, user_col, ts_col, gap_minutes)
        .groupBy(user_col, "session_id")
        .agg(F.count("*").alias("n_events"))
    )
    return per_sess.agg(
        F.percentile("n_events", 0.5).alias("p50"),
        F.percentile("n_events", 0.9).alias("p90"),
        F.percentile("n_events", 0.99).alias("p99"),
        F.max("n_events").alias("max_events"),
    )
