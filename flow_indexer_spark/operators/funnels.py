"""Funnel analysis: ordered multi-step conversion matching per entity.

The reference answers "which docs contain X" (set membership); funnel
analysis asks the ordered version over an event stream: did this user do
step1, THEN step2, THEN step3, all inside a time budget from step1? The
matching rule is the standard greedy-earliest chain (the one analytics
SQL engines implement with min-chaining): the first step anchors at the
user's earliest step1 event; each later step matches its earliest event
strictly after the previous match and within ``within`` of the anchor.
Greedy-earliest is optimal here: taking the earliest possible event for
a step never forecloses a longer chain (exchange argument), so
"steps_completed" is the true maximum.

Scale shape: ONE shuffle (groupBy user), then a JVM in-row fold
(``F.aggregate``) over each user's time-sorted relevant events — no UDF,
no per-step join cascade, no window. Only events whose type appears in
``steps`` are collected, so per-user state is bounded by the user's
funnel-relevant activity, and the later summary is a tiny groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_hours: float | None = None,
) -> DataFrame:
    """Per-user funnel progress: (user, steps_completed, anchor_ts,
    last_step_ts). ``steps_completed`` counts matched prefix steps (0 if
    the user never did step1). Ties on ts resolve in event order of the
    sorted (ts, type) struct — pass pre-deduped events for exact
    determinism if identical (user, ts, type) rows are possible."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    within_us = None if within_hours is None else int(within_hours * 3600 * 1_000_000)

    relevant = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.col(type_col).alias("_e"),
    )
    per_user = relevant.groupBy("_u").agg(
        F.array_sort(F.collect_list(F.struct("_t", "_e"))).alias("_ev")
    )

    # fold state: (done steps, anchor micros, last-match micros)
    zero = F.struct(
        F.lit(0).alias("done"),
        F.lit(None).cast("long").alias("anchor"),
        F.lit(None).cast("long").alias("last"),
    )
    step_arr = F.array(*[F.lit(s) for s in steps])

    def fold(acc, ev):
        # least() keeps the index in range when the chain is already
        # complete (ANSI mode makes out-of-range element_at throw); the
        # done < k guard below then rejects the match anyway.
        wanted = F.element_at(step_arr, F.least(acc["done"] + 1, F.lit(k)))
        in_budget = (
            F.lit(True)
            if within_us is None
            else (ev["_t"] <= acc["anchor"] + F.lit(within_us))
        )
        matches = (acc["done"] < k) & (ev["_e"] == wanted) & (
            (acc["done"] == 0) | ((ev["_t"] > acc["last"]) & in_budget)
        )
        return F.when(
            matches,
            F.struct(
                (acc["done"] + 1).alias("done"),
                F.when(acc["done"] == 0, ev["_t"]).otherwise(acc["anchor"]).alias("anchor"),
                ev["_t"].alias("last"),
            ),
        ).otherwise(acc)

    return per_user.withColumn("_res", F.aggregate("_ev", zero, fold)).select(
        F.col("_u").alias(user_col),
        F.col("_res.done").alias("steps_completed"),
        F.timestamp_micros(F.col("_res.anchor")).alias("anchor_ts"),
        F.timestamp_micros(F.col("_res.last")).alias("last_step_ts"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_hours: float | None = None,
) -> DataFrame:
    """Funnel summary: for each step index (1-based) the number of users
    whose chain reached at least that step. Monotone non-increasing by
    construction. Tiny second aggregate over the per-user output."""
    per_user = funnel_steps(events, steps, user_col, type_col, ts_col, within_hours)
    step_idx = F.explode(
        F.sequence(F.lit(1), F.col("steps_completed"))
    ).alias("step")
    return (
        per_user.filter(F.col("steps_completed") >= 1)
        .select(step_idx)
        .groupBy("step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("step")
    )


def touch_attribution(
    events: DataFrame,
    user_col: str,
    order_col: str,
    type_col: str,
    touch_types: list[str],
    conversion_type: str,
) -> DataFrame:
    """Attribute each conversion to the LAST preceding touch event of
    the user (last-touch attribution, the marketing-analytics default;
    first-touch would be the identical pass with ``F.first`` over the
    same frame).

    Returns one row per conversion event: (user, conv_order,
    touch_order, touch_type) with NULLs when no touch precedes
    (an "organic" conversion).

    Plan: ONE window pass partitioned by user ordered by
    ``order_col`` — the carried last-touch is ``last(touch_marker,
    ignorenulls=True)`` over rows (-inf, -1), so no self-join and no
    per-conversion scan; ties are impossible when ``order_col`` is
    unique per user (event ids here).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user")
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(touch_types)
    marked = events.select(
        F.col(user_col).alias("user"),
        F.col(order_col).alias("_o"),
        F.col(type_col).alias("_t"),
        F.when(is_touch, F.col(order_col)).alias("_touch_o"),
        F.when(is_touch, F.col(type_col)).alias("_touch_t"),
    )
    carried = marked.select(
        "user",
        "_o",
        "_t",
        F.last("_touch_o", ignorenulls=True).over(w).alias("touch_order"),
        F.last("_touch_t", ignorenulls=True).over(w).alias("touch_type"),
    )
    return carried.filter(F.col("_t") == conversion_type).select(
        "user",
        F.col("_o").alias("conv_order"),
        "touch_order",
        "touch_type",
    )


def touch_report(
    events: DataFrame,
    user_col: str,
    order_col: str,
    type_col: str,
    touch_types: list[str],
    conversion_type: str,
) -> DataFrame:
    """Conversion credit per touch type (plus 'organic' for
    conversions with no preceding touch): (touch_type, n_conversions)
    — the aggregate view of :func:`touch_attribution`, exact
    counts."""
    att = touch_attribution(
        events, user_col, order_col, type_col, touch_types, conversion_type
    )
    return (
        att.select(
            F.coalesce(F.col("touch_type"), F.lit("organic")).alias(
                "touch_type"
            )
        )
        .groupBy("touch_type")
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
    )
