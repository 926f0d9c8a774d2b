"""evalmetrics: hand-computed values, tie handling, degenerate inputs."""

from __future__ import annotations

import math

import pytest

from flow_indexer_spark.operators.evalmetrics import (
    brier_ece,
    calibration_report,
    ndcg_mrr,
    pr_curve,
    roc_auc,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "label int, score double")


def test_roc_auc_hand_computed_with_ties(spark):
    # pos scores {0.8, 0.5}, neg {0.5, 0.2}: pairwise wins 3, tie 1
    # -> AUC = (3 + 0.5) / 4 = 0.875 (midrank convention)
    df = _pts(spark, [(1, 0.8), (1, 0.5), (0, 0.5), (0, 0.2)])
    r = roc_auc(df, "label", "score").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (2, 2, 3)
    assert r["auc"] == 0.875


def test_roc_auc_perfect_and_inverted(spark):
    perfect = _pts(spark, [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    assert roc_auc(perfect, "label", "score").collect()[0]["auc"] == 1.0
    inverted = _pts(spark, [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)])
    assert roc_auc(inverted, "label", "score").collect()[0]["auc"] == 0.0


def test_roc_auc_single_class_is_null(spark):
    df = _pts(spark, [(1, 0.9), (1, 0.1)])
    r = roc_auc(df, "label", "score").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_roc_auc_banding_matches_unbanded(spark):
    # many distinct scores spread across bands vs n_bands=1 (pure
    # serial window): identical exact numerator either way
    rows = [(i % 2, (i * 37 % 101) / 101.0) for i in range(200)]
    df = _pts(spark, rows)
    a = roc_auc(df, "label", "score", n_bands=64).collect()[0]["auc"]
    b = roc_auc(df, "label", "score", n_bands=1).collect()[0]["auc"]
    assert a == b


def test_pr_curve_cells_and_extremes(spark):
    df = _pts(spark, [(1, 0.8), (1, 0.5), (0, 0.5), (0, 0.2)])
    rows = {r["threshold"]: r for r in pr_curve(df, "label", "score").collect()}
    # lowest threshold predicts everything positive
    lo = rows[0.2]
    assert (lo["tp"], lo["fp"], lo["fn"]) == (2, 2, 0)
    assert lo["recall"] == 1.0 and lo["precision"] == 0.5
    # highest threshold keeps only the top score
    hi = rows[0.8]
    assert (hi["tp"], hi["fp"], hi["fn"]) == (1, 0, 1)
    assert hi["precision"] == 1.0 and hi["recall"] == 0.5
    mid = rows[0.5]
    assert (mid["tp"], mid["fp"], mid["fn"]) == (2, 1, 0)
    assert mid["f1"] == round(4 / 5, 9)


def test_calibration_exact_bins(spark):
    # score grid /8, 4 bins: bin = s8 // 2
    rows = [(1, 7), (0, 7), (1, 6), (0, 0), (0, 1), (1, 2)]
    df = spark.createDataFrame(rows, "label int, s8 int")
    out = {
        r["bin"]: r
        for r in calibration_report(
            df, "label", "s8", score_scale=8, n_bins=4
        ).collect()
    }
    b3 = out[3]  # s8 in {6,7,7}: conf = 20/24, acc = 2/3
    assert b3["n"] == 3 and b3["pos"] == 2
    assert b3["avg_score"] == round(20 / 24, 9)
    assert b3["frac_pos"] == round(2 / 3, 9)
    assert b3["gap"] == round(abs(20 / 24 - 2 / 3), 9)
    b0 = out[0]  # s8 {0,1}, no positives
    assert b0["pos"] == 0 and b0["frac_pos"] == 0.0


def test_calibration_rejects_inexact_bins(spark):
    df = spark.createDataFrame([(1, 3)], "label int, s int")
    with pytest.raises(ValueError, match="must divide"):
        calibration_report(df, "label", "s", score_scale=8, n_bins=3)
    with pytest.raises(ValueError, match="must divide"):
        brier_ece(df, "label", "s", score_scale=8, n_bins=3)


def test_brier_ece_hand_computed(spark):
    # scale 4, 2 bins. points: (y=1,s=3),(y=0,s=1)
    # brier = ((3-4)^2 + 1^2) / (16*2) = 2/32 = 0.0625
    # bins: s=1 -> bin0 gap |1-0|=1 ; s=3 -> bin1 gap |3-4|=1
    # ece = (1+1)/(4*2) = 0.25
    df = spark.createDataFrame([(1, 3), (0, 1)], "label int, s int")
    r = brier_ece(df, "label", "s", score_scale=4, n_bins=2).collect()[0]
    assert r["n"] == 2 and r["n_bins_used"] == 2
    assert r["brier"] == 0.0625 and r["ece"] == 0.25


def test_ece_cancellation_within_bin(spark):
    # two points in ONE bin with opposite residuals (+2, -2): the
    # bin-level gap |sum| = 0 (over- and under-confidence cancel
    # inside a bin, as ECE defines) even though brier sees both
    df = spark.createDataFrame(
        [(0, 2), (1, 2)], "label int, s int"
    )  # residuals s-4y: +2 and -2, same bin (scale 4, 1 bin)
    r = brier_ece(df, "label", "s", score_scale=4, n_bins=1).collect()[0]
    assert r["ece"] == 0.0
    assert r["brier"] == round((4 + 4) / (16 * 2), 9)


def test_ndcg_mrr_hand_computed(spark):
    rows = [
        ("q1", 1, 3), ("q1", 2, 2), ("q1", 3, 0),  # already ideal
        ("q2", 1, 0), ("q2", 2, 3),                # inverted
        ("q3", 1, 0), ("q3", 2, 0),                # nothing relevant
    ]
    df = spark.createDataFrame(rows, "q string, r int, rel int")
    out = {r["query"]: r for r in ndcg_mrr(df, "q", "r", "rel", k=10).collect()}
    q1 = out["q1"]
    dcg1 = 3 / math.log2(2) + 2 / math.log2(3)
    assert q1["ndcg"] == 1.0 and q1["rr"] == 1.0
    assert q1["dcg"] == round(dcg1, 9) and q1["idcg"] == round(dcg1, 9)
    q2 = out["q2"]
    assert q2["dcg"] == round(3 / math.log2(3), 9)
    assert q2["idcg"] == 3.0
    assert q2["ndcg"] == round(1 / math.log2(3), 9)
    assert q2["rr"] == 0.5
    q3 = out["q3"]
    assert q3["ndcg"] is None and q3["rr"] == 0.0 and q3["dcg"] == 0.0


def test_ndcg_cutoff_excludes_beyond_k(spark):
    rows = [("q", 1, 0), ("q", 2, 0), ("q", 3, 3)]
    df = spark.createDataFrame(rows, "q string, r int, rel int")
    r2 = ndcg_mrr(df, "q", "r", "rel", k=2).collect()[0]
    assert r2["n_results"] == 2 and r2["rr"] == 0.0 and r2["ndcg"] is None
    r3 = ndcg_mrr(df, "q", "r", "rel", k=3).collect()[0]
    assert r3["rr"] == round(1 / 3, 9) and r3["ndcg"] is not None
