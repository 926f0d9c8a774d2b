"""Kappa statistics: textbook hand examples, perfect/degenerate cases,
and the ragged-panel guard."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.agreement import cohen_kappa, fleiss_kappa


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "item int, rater string, label string")


def test_cohen_hand_example(spark):
    # classic 2x2: A/B rate 50 items; confusion yes-yes 20, yes-no 5,
    # no-yes 10, no-no 15 -> po=0.7, pe=(25*30 + 25*20)/2500=0.5,
    # kappa=0.4 (Cohen 1960's worked example)
    rows = []
    i = 0
    for ab, n in ((("y", "y"), 20), (("y", "n"), 5), (("n", "y"), 10), (("n", "n"), 15)):
        for _ in range(n):
            rows += [(i, "A", ab[0]), (i, "B", ab[1])]
            i += 1
    out = cohen_kappa(_ratings(spark, rows), "item", "rater", "label", "A", "B")
    r = out.collect()[0]
    assert (r.n_items, r.po, r.pe, r.kappa) == (50, 0.7, 0.5, 0.4)


def test_cohen_perfect_and_degenerate(spark):
    perfect = [(i, r, "x" if i < 3 else "y") for i in range(6) for r in "AB"]
    r = cohen_kappa(_ratings(spark, perfect), "item", "rater", "label", "A", "B").collect()[0]
    assert r.kappa == 1.0
    # both raters constant (pe=1): agree -> 1.0, disagree -> 0.0
    const_agree = [(i, r, "x") for i in range(4) for r in "AB"]
    assert cohen_kappa(_ratings(spark, const_agree), "item", "rater", "label", "A", "B").collect()[0].kappa == 1.0
    const_dis = [(i, "A", "x") for i in range(4)] + [(i, "B", "y") for i in range(4)]
    assert cohen_kappa(_ratings(spark, const_dis), "item", "rater", "label", "A", "B").collect()[0].kappa == 0.0


def test_fleiss_textbook(spark):
    # Fleiss 1971 worked example (14 raters, 10 items, 5 categories)
    # reduced: use the well-known 2-category check instead — 3 raters,
    # 4 items, counts chosen so p_bar and p_e are exact decimals.
    # items: (3,0) (2,1) (1,2) (0,3) across categories (a,b)
    rows = []
    for i, (na, nb) in enumerate([(3, 0), (2, 1), (1, 2), (0, 3)]):
        for k in range(na):
            rows.append((i, f"r{k}", "a"))
        for k in range(nb):
            rows.append((i, f"r{na + k}", "b"))
    out = fleiss_kappa(_ratings(spark, rows), "item", "label").collect()[0]
    # sum nic^2 = 9+ (4+1) + (1+4) + 9 = 28; N=4,n=3
    # p_bar = (28-12)/(4*3*2) = 16/24 = 0.666666667
    # marginals: a=6,b=6 -> sm2=72; p_e = 72/144 = 0.5
    # kappa = (2/3 - 1/2)/(1/2) = 1/3
    assert out.n_items == 4 and out.n_raters == 3 and out.n_categories == 2
    assert out.p_bar == pytest.approx(0.666666667)
    assert out.p_e == 0.5
    assert out.kappa == pytest.approx(0.333333333)


def test_fleiss_ragged_panel_raises(spark):
    rows = [(0, "A", "x"), (0, "B", "x"), (1, "A", "x")]
    with pytest.raises(ValueError, match="ragged"):
        fleiss_kappa(_ratings(spark, rows), "item", "label")


def test_fleiss_single_rater_raises(spark):
    rows = [(0, "A", "x"), (1, "A", "y")]
    with pytest.raises(ValueError, match=">= 2"):
        fleiss_kappa(_ratings(spark, rows), "item", "label")
