"""Classifier / retrieval evaluation metrics over scored corpora.

A curation pipeline that TRAINS filters (`textstats.py quality_train_logreg`,
DSIR weights, preference models in `btrank.py`) needs on-engine EVALUATION
of those filters before trusting them to gate 100 TB of data: ROC-AUC,
precision/recall curves, calibration (ECE / Brier), and ranking quality
(NDCG / MRR) for the retrieval surface (`ranking.py bm25_search`).

Reference analogue: flow-indexer validates its extraction with differential
dual-implementation tests (`backend/compare.go`) — this module is the same
discipline applied to learned components: every metric is computed from
EXACT INTEGER sufficient statistics wherever mathematically possible, so
the DuckDB oracle twin is a single identical division away.

Determinism contract:
* ``roc_auc`` — the Mann-Whitney identity with midrank tie handling,
  AUC = sum_s pos_s * (2*cum_neg_below(s) + neg_s) / (2*P*N).  The
  numerator is ONE exact bigint; no float fold exists.
* ``pr_curve`` — per-threshold TP/FP/FN are exact bigints (TP(t) =
  P - cum_pos_below(t)); precision/recall/F1 are single divisions.
* ``calibration_report`` / ``brier_ece`` — defined over an integer score
  grid (``score_scale`` quantization, the natural shape of a calibrated
  classifier head); every bin statistic is a ratio of exact integers.
* ``ndcg_mrr`` — per-query folds over at most ``k`` log2 terms, rounded
  to ``dp``; the fold is tiny so 1-ulp association error is ~1e-15,
  far below the 1e-9 rounding grain.

Scale shape (the part Catalyst cannot do for us): cumulative counts over
the score axis need a prefix sum.  A bare ``Window.orderBy(score)`` with
no partition key is a single-task sort — correct at any size but serial.
``_prefix_below`` instead bands the score domain ([0,1] probabilities ->
``n_bands`` equal ranges): per-band totals are a tiny aggregate (B rows,
broadcast back), and the within-band running sum is a Window PARTITIONED
by band — fully parallel, one shuffle on the (already aggregated)
distinct-score table.  The same per-score prefix table feeds both the
AUC numerator and every PR-curve point, so the expensive pass happens
once per metric call, not once per threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "roc_auc",
    "pr_curve",
    "calibration_report",
    "brier_ece",
    "ndcg_mrr",
]


def _prefix_below(
    df: DataFrame, label_col: str, score_col: str, n_bands: int = 64
) -> DataFrame:
    """Per-distinct-score exact cumulative counts STRICTLY BELOW each
    score: (score, pos, neg, cpos_below, cneg_below).

    Scores are assumed in [0, 1] (probability outputs — callers with raw
    margins normalize first).  One shuffle (groupBy score); the prefix
    is banded: band totals (<= ``n_bands`` rows) take the serial window,
    per-score running sums run parallel per band partition.
    """
    lab = F.col(label_col).cast("bigint")
    per_score = df.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(lab).alias("pos"),
        F.sum(1 - lab).alias("neg"),
    )
    band = F.least(
        F.lit(n_bands - 1),
        F.greatest(F.lit(0), F.floor(F.col("score") * n_bands)),
    ).cast("int")
    per_score = per_score.withColumn("_band", band)
    # band-level prefix: tiny (<= n_bands rows) — the serial window is free
    band_tot = per_score.groupBy("_band").agg(
        F.sum("pos").alias("_bpos"), F.sum("neg").alias("_bneg")
    )
    wb = (
        Window.orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    band_prefix = band_tot.select(
        "_band",
        F.coalesce(F.sum("_bpos").over(wb), F.lit(0)).alias("_ppos"),
        F.coalesce(F.sum("_bneg").over(wb), F.lit(0)).alias("_pneg"),
    )
    ws = (
        Window.partitionBy("_band")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_score.join(F.broadcast(band_prefix), "_band")
        .select(
            "score",
            "pos",
            "neg",
            (
                F.col("_ppos")
                + F.coalesce(F.sum("pos").over(ws), F.lit(0))
            ).alias("cpos_below"),
            (
                F.col("_pneg")
                + F.coalesce(F.sum("neg").over(ws), F.lit(0))
            ).alias("cneg_below"),
        )
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bands: int = 64,
    dp: int = 9,
) -> DataFrame:
    """One-row ROC-AUC via the Mann-Whitney rank identity with midrank
    (tie-aware) handling: AUC = sum over distinct scores s of
    pos_s * (2 * neg_below(s) + neg_s) / (2 * P * N).

    Returns (n_pos, n_neg, n_scores, auc).  Degenerate single-class
    inputs (P = 0 or N = 0) yield auc NULL — no rank statistic exists.
    """
    pre = _prefix_below(df, label_col, score_col, n_bands)
    agg = pre.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("n_scores"),
        F.sum(
            F.col("pos") * (2 * F.col("cneg_below") + F.col("neg"))
        )
        .cast("bigint")
        .alias("_num"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("_num")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg")),
            dp,
        ),
    )
    return agg.select("n_pos", "n_neg", "n_scores", auc.alias("auc"))


def pr_curve(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bands: int = 64,
    dp: int = 9,
) -> DataFrame:
    """Precision/recall/F1 at every distinct score threshold t
    ("predict positive when score >= t"): TP(t) = P - pos_below(t),
    FP(t) = N - neg_below(t), all exact bigints from the one banded
    prefix pass.  Returns (threshold, tp, fp, fn, precision, recall,
    f1) ordered by threshold; F1 is NULL at the degenerate tp=fp=fn=0
    point.
    """
    pre = _prefix_below(df, label_col, score_col, n_bands)
    totals = pre.agg(
        F.sum("pos").cast("bigint").alias("_P"),
        F.sum("neg").cast("bigint").alias("_N"),
    )
    j = pre.crossJoin(F.broadcast(totals))
    tp = (F.col("_P") - F.col("cpos_below")).alias("tp")
    fp = (F.col("_N") - F.col("cneg_below")).alias("fp")
    fn = F.col("cpos_below").alias("fn")
    out = j.select(F.col("score").alias("threshold"), tp, fp, fn)
    prec = F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")
    rec = F.col("tp") / (F.col("tp") + F.col("fn")).cast("double")
    f1 = F.when(
        (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        2.0
        * F.col("tp")
        / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
    )
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round(prec, dp).alias("precision"),
        F.round(rec, dp).alias("recall"),
        F.round(f1, dp).alias("f1"),
    ).orderBy("threshold")


def calibration_report(
    df: DataFrame,
    label_col: str,
    score_int_col: str,
    score_scale: int,
    n_bins: int = 8,
    dp: int = 9,
) -> DataFrame:
    """Reliability table over an INTEGER score grid: ``score_int_col``
    holds scores as integers in [0, score_scale) (probability =
    score_int / score_scale — the quantized head output).  Bin b =
    floor(score_int * n_bins / score_scale); per bin: n, exact mean
    predicted probability, exact empirical positive rate, and the
    |confidence - accuracy| gap.  Every statistic is a ratio of exact
    integers (sum(score_int) and pos counts are bigints).
    """
    if score_scale % n_bins != 0:
        raise ValueError(
            f"n_bins={n_bins} must divide score_scale={score_scale} "
            "for exact bin edges"
        )
    lab = F.col(label_col).cast("bigint")
    si = F.col(score_int_col).cast("bigint")
    binc = F.floor(si * n_bins / score_scale).cast("int")
    per = (
        df.select(binc.alias("bin"), si.alias("_s"), lab.alias("_y"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("_s").cast("bigint").alias("_ssum"),
            F.sum("_y").cast("bigint").alias("pos"),
        )
    )
    conf = F.col("_ssum") / (F.lit(float(score_scale)) * F.col("n"))
    acc = F.col("pos") / F.col("n").cast("double")
    return per.select(
        "bin",
        "n",
        "pos",
        F.round(conf, dp).alias("avg_score"),
        F.round(acc, dp).alias("frac_pos"),
        F.round(F.abs(conf - acc), dp).alias("gap"),
    ).orderBy("bin")


def brier_ece(
    df: DataFrame,
    label_col: str,
    score_int_col: str,
    score_scale: int,
    n_bins: int = 8,
    dp: int = 9,
) -> DataFrame:
    """One-row calibration summary on the integer score grid:

    * brier = sum (score_int - scale*y)^2 / (scale^2 * n)  — the mean
      squared error of the probability, exact-integer numerator;
    * ece   = sum_b |sum_b score_int - scale*pos_b| / (scale * n) —
      the bin-weighted |confidence - accuracy| with the n_b weights
      cancelled algebraically, again one exact bigint per bin.
    """
    if score_scale % n_bins != 0:
        raise ValueError(
            f"n_bins={n_bins} must divide score_scale={score_scale}"
        )
    lab = F.col(label_col).cast("bigint")
    si = F.col(score_int_col).cast("bigint")
    binc = F.floor(si * n_bins / score_scale).cast("int")
    d = (F.col("_s") - score_scale * F.col("_y"))
    per = (
        df.select(binc.alias("bin"), si.alias("_s"), lab.alias("_y"))
        .withColumn("_sq", d * d)
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("_n"),
            F.sum("_sq").cast("bigint").alias("_sq"),
            F.abs(
                F.sum(F.col("_s") - score_scale * F.col("_y"))
            )
            .cast("bigint")
            .alias("_gap"),
        )
    )
    tot = per.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum("_sq").cast("bigint").alias("_sq"),
        F.sum("_gap").cast("bigint").alias("_g"),
        F.count("*").cast("int").alias("n_bins_used"),
    )
    scale = float(score_scale)
    return tot.select(
        "n",
        "n_bins_used",
        F.round(
            F.col("_sq") / (scale * scale * F.col("n")), dp
        ).alias("brier"),
        F.round(F.col("_g") / (scale * F.col("n")), dp).alias("ece"),
    )


def ndcg_mrr(
    results: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int,
    dp: int = 9,
) -> DataFrame:
    """Per-query ranking quality at cutoff ``k`` from a result table
    (query, rank starting at 1, graded relevance >= 0):

    * dcg@k  = sum_{rank<=k} rel / log2(rank+1)
    * idcg@k = the same sum with relevances re-ranked descending
      (ties broken by the actual rank — deterministic, and irrelevant
      to the value since equal rels contribute equal terms)
    * ndcg@k = dcg/idcg (NULL when idcg = 0: no relevant results)
    * rr     = 1 / min rank with rel > 0 within top-k (0.0 if none —
      the standard MRR convention)

    All folds are <= k terms per query; rounded to ``dp``.  Fully
    parallel: every window is partitioned by query.
    """
    q = F.col(query_col).alias("query")
    d = results.select(
        q,
        F.col(rank_col).cast("int").alias("_r"),
        F.col(rel_col).cast("bigint").alias("_rel"),
    ).filter(F.col("_r") <= k)
    ideal_pos = F.row_number().over(
        Window.partitionBy("query").orderBy(
            F.col("_rel").desc(), F.col("_r")
        )
    )
    d = d.withColumn("_ip", ideal_pos)
    per = d.groupBy("query").agg(
        F.count("*").cast("bigint").alias("n_results"),
        F.sum(F.col("_rel") / F.log2(F.col("_r") + 1.0)).alias("_dcg"),
        F.sum(F.col("_rel") / F.log2(F.col("_ip") + 1.0)).alias("_idcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_r"))).alias("_first"),
    )
    ndcg = F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg"))
    rr = F.coalesce(1.0 / F.col("_first"), F.lit(0.0))
    return per.select(
        "query",
        "n_results",
        F.round(F.col("_dcg"), dp).alias("dcg"),
        F.round(F.col("_idcg"), dp).alias("idcg"),
        F.round(ndcg, dp).alias("ndcg"),
        F.round(rr, dp).alias("rr"),
    ).orderBy("query")


def isotonic_calibration(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 16,
    score_scale: int = 64,
) -> DataFrame:
    """Isotonic calibration map (pool-adjacent-violators; Ayer et al.
    1955, Zadrozny & Elkan 2002) fitted on-engine, with the same
    bin-compression trick as the EM family: bin the integer score grid
    into ``n_bins`` equal-width bins (one groupBy -> exact integer
    sufficient statistics), then compute the PAV fit via its MINIMAX
    closed form over the tiny bin table:

        iso(i) = max_{j <= i} min_{k >= i} mean(y over bins j..k)

    — a textbook identity with the sequential pooling algorithm, but
    expressible as two nested extrema over interval averages, i.e.
    pure joins/windows over n_bins^2 interval rows: engine-exact on
    both sides, no driver-side loop, no recursion.  The corpus is
    touched exactly once regardless of n_bins.

    Output per bin: (bin, n, n_pos, rate, iso_rate) — iso_rate is the
    calibrated probability the isotonic map assigns to scores in that
    bin; rate is the raw bin positive rate.  iso_rate is monotone
    non-decreasing in bin by construction."""
    if n_bins < 1 or score_scale < 1:
        raise ValueError("n_bins and score_scale must be >= 1")
    width = max(1, (score_scale + n_bins - 1) // n_bins)
    b = scored.select(
        F.least(
            F.lit(n_bins - 1), (F.col(score_col) / width).cast("int")
        ).alias("bin"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    bins = b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    # interval averages over the <= n_bins^2 (j, k) spans: cumulative
    # sums per bin make avg(j..k) = (cp[k]-cp[j-1]) / (cn[k]-cn[j-1])
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", "n_pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("n_pos").over(w).alias("cp"),
    )
    lo = cum.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cp") - F.col("n_pos")).alias("cp_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cn_hi"),
        F.col("cp").alias("cp_hi"),
    )
    spans = lo.join(hi, F.col("k") >= F.col("j")).select(
        "j", "k",
        (
            (F.col("cp_hi") - F.col("cp_lo"))
            / (F.col("cn_hi") - F.col("cn_lo"))
        ).alias("avg"),
    )
    # classic minimax: iso(i) = max_{j <= i} min_{k >= i} avg(j..k) —
    # enumerate (i, j, k) with j <= i <= k (n_bins^3 tiny rows), min
    # over k per (i, j), then max over j per i
    idx = bins.select(F.col("bin").alias("i"))
    iso = (
        idx.join(
            spans, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i"))
        )
        .groupBy("i", "j")
        .agg(F.min("avg").alias("minavg"))
        .groupBy("i")
        .agg(F.max("minavg").alias("iso_rate"))
        .select(F.col("i").alias("bin"), "iso_rate")
    )
    return (
        bins.join(iso, "bin")
        .select(
            "bin", "n", "n_pos",
            F.round(F.col("n_pos") / F.col("n"), 9).alias("rate"),
            F.round("iso_rate", 9).alias("iso_rate"),
        )
    )


def lift_gain_curve(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    n_buckets: int = 10,
    score_scale: int = 64,
) -> DataFrame:
    """Decile lift / cumulative-gain chart — the 'how much better than
    random is the top X%' view every targeting/curation ranking is
    judged by in practice (the Lorenz-curve companion to roc_auc):

    per score bucket, ranked best-first: ``n``, ``n_pos``,
    ``cum_n``, ``cum_pos`` (exact bigints via the banded-prefix
    discipline, here over the tiny bucket table), ``gain`` =
    cum_pos/P, ``lift`` = (cum_pos/cum_n)/(P/N) — single divisions of
    exact integers."""
    if n_buckets < 1 or score_scale < 1:
        raise ValueError("n_buckets and score_scale must be >= 1")
    width = max(1, (score_scale + n_buckets - 1) // n_buckets)
    b = scored.select(
        F.least(
            F.lit(n_buckets - 1), (F.col(score_col) / width).cast("int")
        ).alias("bucket"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    per = b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("_tn"),
        F.sum("n_pos").cast("bigint").alias("_tp"),
    )
    return (
        per.withColumn("cum_n", F.sum("n").over(w).cast("bigint"))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("bigint"))
        .join(F.broadcast(tot))
        .select(
            "bucket", "n", "n_pos", "cum_n", "cum_pos",
            F.round(F.col("cum_pos") / F.col("_tp"), 9).alias("gain"),
            F.round(
                (F.col("cum_pos") / F.col("cum_n"))
                / (F.col("_tp") / F.col("_tn")),
                9,
            ).alias("lift"),
        )
    )
