"""Inter-annotator agreement: Cohen's and Fleiss' kappa.

A labeling pipeline (quality raters, preference annotators, safety
taggers — the upstream of `operators/curation.py`'s preference pairs
and `textstats.py`'s trained quality classifier) is only as good as
its raters agree beyond chance.  Cohen's kappa (Educ. Psychol. Meas.
1960) corrects two raters' raw agreement by the chance rate implied by
their marginals; Fleiss' kappa (Psychol. Bull. 1971) generalizes to a
fixed panel of n raters per item.

Determinism contract — stronger than the sorted-fold modules: every
sufficient statistic here is an EXACT INTEGER (agreement counts,
marginal products, sums of squared per-item category counts), so each
output is a single division of exact integers with one final
round(dp).  No float accumulation order exists to pin; the SQL oracle
is the same arithmetic verbatim.

Scale shape: everything is map-side-combined aggregates — per-category
marginals (|labels| rows), per-(item,label) counts (one shuffle on
item), then scalar sums.  Nothing is ever per-pair-of-raters joined at
row level except Cohen's single item-keyed equi-join of the two
raters' label columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cohen_kappa(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    rater_a: str,
    rater_b: str,
    dp: int = 9,
) -> DataFrame:
    """Cohen's kappa between two raters over the items BOTH rated.

    ``ratings``: long-form (item, rater, label).  Returns one row:
    (rater_a, rater_b, n_items, po, pe, kappa).  po is raw agreement;
    pe = sum_c n_a(c)*n_b(c) / n^2 uses the exact-integer cross-marginal
    sum (one number, no per-category float fold); the degenerate
    pe = 1 case (both raters constant) yields kappa 1.0 when they agree
    and 0.0 when they do not, the usual convention.
    """
    a = ratings.filter(F.col(rater_col) == rater_a).select(
        F.col(item_col).alias("_i"), F.col(label_col).alias("_la")
    )
    b = ratings.filter(F.col(rater_col) == rater_b).select(
        F.col(item_col).alias("_i"), F.col(label_col).alias("_lb")
    )
    pairs = a.join(b, "_i")
    agree = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("_la") == F.col("_lb")).cast("bigint")).alias("n_agree"),
    )
    ma = pairs.groupBy("_la").agg(F.count("*").cast("bigint").alias("na"))
    mb = pairs.groupBy("_lb").agg(F.count("*").cast("bigint").alias("nb"))
    # raters sharing NO label (fully disjoint vocabularies) leave the
    # marginal join empty: the sum must be 0, not NULL, so pe = 0
    cross = ma.join(mb, ma["_la"] == mb["_lb"]).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .cast("bigint")
        .alias("s_ab")
    )
    j = agree.crossJoin(cross)
    n = F.col("n").cast("double")
    po = F.col("n_agree") / n
    pe = F.col("s_ab") / (n * n)
    kappa = F.when(
        pe == 1.0, F.when(po == 1.0, F.lit(1.0)).otherwise(F.lit(0.0))
    ).otherwise((po - pe) / (F.lit(1.0) - pe))
    return j.select(
        F.lit(rater_a).alias("rater_a"),
        F.lit(rater_b).alias("rater_b"),
        F.col("n").alias("n_items"),
        F.round(po, dp).alias("po"),
        F.round(pe, dp).alias("pe"),
        F.round(kappa, dp).alias("kappa"),
    )


def fleiss_kappa(
    ratings: DataFrame, item_col: str, label_col: str, dp: int = 9
) -> DataFrame:
    """Fleiss' kappa for a fixed panel: every item must carry the same
    number of ratings (raises ValueError otherwise — a ragged panel is
    an upstream bug, not a statistic).

    Returns one row (n_items, n_raters, n_categories, p_bar, p_e,
    kappa), each ratio a single division of exact integer sums:
    p_bar = (sum_ic n_ic^2 - N*n) / (N*n*(n-1)),
    p_e   = sum_c (sum_i n_ic)^2 / (N*n)^2.
    """
    per_item = ratings.groupBy(item_col).agg(
        F.count("*").cast("bigint").alias("_n")
    )
    sizes = [r["_n"] for r in per_item.select("_n").distinct().limit(2).collect()]
    if len(sizes) != 1:
        raise ValueError(f"ragged panel: per-item rating counts {sorted(sizes)}")
    n_raters = int(sizes[0])
    if n_raters < 2:
        raise ValueError("fleiss_kappa needs >= 2 ratings per item")

    nic = ratings.groupBy(item_col, label_col).agg(
        F.count("*").cast("bigint").alias("_nic")
    )
    stats = nic.agg(
        F.sum(F.col("_nic") * F.col("_nic")).cast("bigint").alias("s2"),
        F.count_distinct(F.col(item_col)).cast("bigint").alias("n_items"),
        F.count_distinct(F.col(label_col)).cast("bigint").alias("n_cats"),
    )
    marg = (
        nic.groupBy(label_col)
        .agg(F.sum("_nic").cast("bigint").alias("mc"))
        .agg(F.sum(F.col("mc") * F.col("mc")).cast("bigint").alias("sm2"))
    )
    j = stats.crossJoin(marg)
    N = F.col("n_items").cast("double")
    n = float(n_raters)
    p_bar = (F.col("s2") - N * n) / (N * n * (n - 1.0))
    p_e = F.col("sm2") / (N * n * N * n)
    kappa = F.when(
        p_e == 1.0, F.when(p_bar == 1.0, F.lit(1.0)).otherwise(F.lit(0.0))
    ).otherwise((p_bar - p_e) / (F.lit(1.0) - p_e))
    return j.select(
        F.col("n_items"),
        F.lit(n_raters).cast("int").alias("n_raters"),
        F.col("n_cats").alias("n_categories"),
        F.round(p_bar, dp).alias("p_bar"),
        F.round(p_e, dp).alias("p_e"),
        F.round(kappa, dp).alias("kappa"),
    )
