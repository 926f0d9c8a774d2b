"""Distribution-robust telemetry gates: exact median/MAD outliers and
a two-proportion experiment (A/B) test.

`telemetry.py daily_anomaly` flags level shifts against a trailing
MEAN baseline — which a single spike can drag.  The robust pair here
uses order statistics instead: the median and the median absolute
deviation (MAD, Hampel 1974) have a 50% breakdown point, so one
corrupt day cannot move the gate.  The A/B test closes the loop for
pipeline experiments (two extraction configs, two curation policies):
did variant B change the conversion/error rate beyond sampling noise?

Determinism contract: medians use the LOWER-median convention — the
element at 1-indexed rank floor((n+1)/2) of the value ordering — an
exact SELECTION, not an interpolation, so integer-valued inputs keep
every statistic an exact integer (deviations |x - med| included) and
the outlier predicate ``dev > c * mad`` is an integer comparison.  The
two-proportion z and Pearson chi-square are single IEEE expressions of
exact bigint counts (one sqrt, one division) — bit-identical on both
engines.

Scale shape: both median passes are Windows PARTITIONED by the group
key — fully parallel across groups; within a group the sort is one
task, which is the right trade for telemetry groups (a group = one
entity class / experiment arm, rows = days or users-per-arm-summary,
bounded). For unbounded groups use the mergeable KLL quantile sketch
(`operators/sketches.py`) — approximate ranks with error bounds — and
keep this exact path for audits.  The A/B test aggregates to 2 rows
before any math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["median_mad_outliers", "two_proportion_test"]


def median_mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    c: int = 3,
) -> DataFrame:
    """Per-group robust outlier report: every row tagged with its
    group's lower-median, MAD, absolute deviation, and the Hampel flag
    ``is_outlier = dev > c * MAD``.

    Returns (group, value, med, mad, dev, is_outlier) — callers filter
    ``is_outlier`` for the alert list; keeping all rows makes the
    report a join-free audit table.  A degenerate group (MAD = 0, over
    half the values identical) flags ANY deviation — the strictest
    consistent reading of the rule, documented rather than special-
    cased.

    Two window passes per group (value order, then deviation order);
    the median is extracted with a full-partition ``max(CASE WHEN rn =
    (n+1)/2 ...)`` window so no self-join materializes.
    """
    d = df.select(
        F.col(group_col).alias("group"), F.col(value_col).alias("value")
    )
    lower_rank = F.floor((F.col("_n") + 1) / 2)
    d = d.withColumn("_rn", F.row_number().over(
        Window.partitionBy("group").orderBy("value")
    )).withColumn("_n", F.count("*").over(Window.partitionBy("group")))
    med = F.max(
        F.when(F.col("_rn") == lower_rank, F.col("value"))
    ).over(Window.partitionBy("group"))
    d = d.withColumn("med", med).withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    d = d.withColumn(
        "_rd",
        F.row_number().over(Window.partitionBy("group").orderBy("dev", "value")),
    )
    mad = F.max(
        F.when(F.col("_rd") == lower_rank, F.col("dev"))
    ).over(Window.partitionBy("group"))
    d = d.withColumn("mad", mad)
    return d.select(
        "group",
        "value",
        "med",
        "mad",
        "dev",
        (F.col("dev") > c * F.col("mad")).alias("is_outlier"),
    )


def two_proportion_test(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    dp: int = 9,
) -> DataFrame:
    """Two-proportion z-test + Pearson chi-square (2x2, no continuity
    correction) from per-unit rows (variant in {exactly two values},
    converted 0/1).  Raises ValueError unless exactly two variants are
    present (an experiment with one arm or three is an upstream bug).

    Returns one row: (variant_a, variant_b, n_a, n_b, conv_a, conv_b,
    p_a, p_b, z, chi2) with variant_a the smaller variant key,
    z = (p_a - p_b) / sqrt(p(1-p)(1/n_a + 1/n_b)) under the pooled
    p = (conv_a+conv_b)/(n_a+n_b), and the chi-square identity
    chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) over exact bigints
    (chi2 = z^2 analytically; both reported, both single IEEE
    expressions).  A zero margin (pooled rate 0 or 1) yields NULL z
    and chi2.
    """
    per = (
        df.groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col(converted_col).cast("bigint"))
            .cast("bigint")
            .alias("conv"),
        )
    )
    rows = per.orderBy("variant").collect()  # 2 rows — driver edge, by design
    if len(rows) != 2:
        raise ValueError(
            f"two_proportion_test needs exactly 2 variants, got "
            f"{[r['variant'] for r in rows]}"
        )
    spark = df.sparkSession
    a = per.filter(F.col("variant") == rows[0]["variant"]).select(
        F.col("variant").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("conv").alias("conv_a"),
    )
    b = per.filter(F.col("variant") == rows[1]["variant"]).select(
        F.col("variant").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("conv").alias("conv_b"),
    )
    j = a.crossJoin(b)
    na, nb = F.col("n_a"), F.col("n_b")
    xa, xb = F.col("conv_a"), F.col("conv_b")
    p_a = xa / na.cast("double")
    p_b = xb / nb.cast("double")
    pool = (xa + xb) / (na + nb).cast("double")
    z = F.when(
        (pool > 0) & (pool < 1),
        (p_a - p_b)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)),
    )
    # 2x2 cells: a=conv_a, b=n_a-conv_a, c=conv_b, d=n_b-conv_b
    det = xa * (nb - xb) - (na - xa) * xb
    denom = (na * nb * (xa + xb) * (na + nb - xa - xb)).cast("double")
    chi2 = F.when(
        (pool > 0) & (pool < 1),
        (na + nb).cast("double") * (det * det).cast("double") / denom,
    )
    return j.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, dp).alias("p_a"),
        F.round(p_b, dp).alias("p_b"),
        F.round(z, dp).alias("z"),
        F.round(chi2, dp).alias("chi2"),
    )


def wilson_bounds(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.959963985,
    dp: int = 9,
) -> DataFrame:
    """Per-group success rate with the Wilson (1927) score interval —
    the right small-n interval for rates (never leaves [0,1], behaves
    at p=0/1, unlike the Wald +-z*sqrt(pq/n)).  Returns (group, n,
    successes, p_hat, lo, hi).

    center = (p + z^2/(2n)) / (1 + z^2/n)
    half   = (z / (1 + z^2/n)) * sqrt(p(1-p)/n + z^2/(4 n^2))

    Counts are exact bigints; each bound is ONE IEEE expression
    mirrored verbatim (same association order) in the oracle, rounded
    to ``dp``.  One map-side-combined aggregate; no join, no fold.
    """
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(success_col).cast("bigint"))
        .cast("bigint")
        .alias("successes"),
    )
    n = F.col("n").cast("double")
    p = F.col("successes") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(z)
        / denom
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    )
    return per.select(
        "group",
        "n",
        "successes",
        F.round(p, dp).alias("p_hat"),
        F.round(center - half, dp).alias("lo"),
        F.round(center + half, dp).alias("hi"),
    )


def trimmed_mean_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
    cents: int = 100,
    dp: int = 9,
) -> DataFrame:
    """Per-group symmetric TRIMMED mean — the robust location estimate
    between the mean (outlier-hostage) and the median (throws away
    80% of the data): drop exactly k = floor(n * trim_frac) smallest
    and k largest observations, average the rest.

    Exact by construction: values quantize to integer cents at the row
    level; per (group, cent-value) counts plus a per-group running
    prefix give each value's rank interval, so the trimmed sum is
    SUM(value * kept_multiplicity) with kept_multiplicity =
    overlap of [rank_lo, rank_hi] with [k+1, n-k] — pure integer
    arithmetic, one shuffle (groupBy), windows partitioned per group
    over the value GRID.  Output: (group, n, n_trimmed_each_side,
    trimmed_mean, raw_mean)."""
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError("trim_frac must be in [0, 0.5)")
    v = F.round(F.col(value_col) * cents).cast("bigint")
    hist = df.select(F.col(group_col).alias("grp"), v.alias("v")).groupBy(
        "grp", "v"
    ).agg(F.count("*").cast("bigint").alias("c"))
    w_tot = Window.partitionBy("grp")
    w_pre = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    h = (
        hist.withColumn("n", F.sum("c").over(w_tot))
        .withColumn("below", F.coalesce(F.sum("c").over(w_pre), F.lit(0)))
    )
    k = F.floor(F.col("n") * trim_frac).cast("bigint")
    # rank interval of this value: [below+1, below+c]; keep window
    # [k+1, n-k]; kept multiplicity = interval overlap
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("below") + F.col("c"), F.col("n") - k)
        - F.greatest(F.col("below") + 1, k + 1)
        + 1,
    )
    agg = h.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max(k).alias("k"),
        F.sum(F.col("v") * kept).alias("_ts"),
        F.sum(kept).alias("_tn"),
        F.sum(F.col("v") * F.col("c")).alias("_rs"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.col("k").alias("n_trimmed_each_side"),
        F.round(
            F.col("_ts") / (F.col("_tn") * F.lit(float(cents))), dp
        ).alias("trimmed_mean"),
        F.round(
            F.col("_rs") / (F.col("n") * F.lit(float(cents))), dp
        ).alias("raw_mean"),
    )
