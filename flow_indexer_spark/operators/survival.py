"""Kaplan-Meier survival estimation over event telemetry.

Time-to-event questions — how long until a user converts, a
conversation errors, a tool call first fails — need CENSORING-aware
estimation: users who never converted are not "conversion time =
infinity", they are observed-until-their-last-activity.  The
Kaplan-Meier product-limit estimator (Kaplan & Meier, JASA 1958) is
the standard nonparametric answer:

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

with d_i events and n_i at-risk at event time t_i (the convention:
subjects censored AT t_i are still at risk for the t_i deaths).

Exactness/scale shape: durations discretize to integer days, so the
whole computation lives on the DURATION GRID, not the corpus — one
groupBy(subject) for (duration, event) rows, one groupBy(duration),
then prefix sums and the product over the tiny grid.  The product is
exp of a cumulative sum of per-step ln terms quantized to the 1e-9
integer lattice (order-free exact addition; exp/round of identical
doubles on both engines); the S(t) = 0 tail after a step where every
remaining subject dies is handled by an explicit flag, never by
ln(0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["km_curve"]

_GRID = 1_000_000_000


def km_curve(
    events: DataFrame,
    subject_col: str,
    ts_col: str,
    event_cond: Column,
    dp: int = 9,
) -> DataFrame:
    """Per-subject clock starts at the subject's first event; the
    terminal event is the first row matching ``event_cond``; subjects
    with none are right-censored at their last activity.  Returns one
    row per EVENT day: (t_day, n_risk, n_events, n_censored,
    survival), survival = the product-limit estimate just after that
    day."""
    per = events.groupBy(F.col(subject_col).alias("s")).agg(
        F.min(ts_col).alias("_t0"),
        F.min(F.when(event_cond, F.col(ts_col))).alias("_te"),
        F.max(ts_col).alias("_tl"),
    )
    dur = F.floor(
        (
            F.unix_timestamp(F.coalesce("_te", "_tl"))
            - F.unix_timestamp("_t0")
        )
        / 86400
    ).cast("bigint")
    subj = per.select(
        dur.alias("t_day"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grid = subj.groupBy("t_day").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("n_censored"),
    )
    n_total = subj.count()
    w_prior = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = grid.withColumn(
        "n_risk",
        (
            F.lit(n_total)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_prior),
                F.lit(0),
            )
        ).cast("bigint"),
    )
    # per-step ln(1 - d/n) on the integer lattice; a step that kills
    # every remaining at-risk subject flags the exact-zero tail
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.round(
            F.log((F.col("n_risk") - F.col("n_events")) / F.col("n_risk"))
            * _GRID
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    dead = F.when(
        F.col("n_events") >= F.col("n_risk"), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    g = g.withColumn("_lsum", F.sum(term).over(w_cum)).withColumn(
        "_dead", F.max(dead).over(w_cum)
    )
    return (
        g.filter(F.col("n_events") > 0)
        .select(
            "t_day",
            "n_risk",
            "n_events",
            "n_censored",
            F.when(F.col("_dead") == 1, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.col("_lsum") / F.lit(float(_GRID))), dp)
            )
            .alias("survival"),
        )
    )
