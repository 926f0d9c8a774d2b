"""Containment pairs, b-bit minhash estimation, priority sampling."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.curation import priority_sample
from flow_indexer_spark.operators.dedup import (
    bbit_minhash_pairs,
    containment_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, grp string, w bigint"
    )


def test_containment_finds_subset_jaccard_misses(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h", "g", 1),
            (4, "a b c d e f g h i j k l m n o p q r", "g", 1),
        ],
    )
    rows = containment_pairs(
        docs, "doc_id", "text", k=2, min_containment=0.9
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cont_a_in_b"] == 1.0  # doc 1 fully quoted inside doc 4
    # resemblance would be only 7/17 — the asymmetric measure is the point
    assert r["n_shared"] == 7 and r["size_b"] == 17
    assert r["cont_b_in_a"] < 0.5


def test_containment_df_cap_drops_boilerplate(spark):
    # the same 2-gram in every doc; df cap 2 removes it from the index
    docs = _docs(
        spark,
        [(i, f"common gram unique{i} tail{i}", "g", 1) for i in range(5)],
    )
    rows = containment_pairs(
        docs, "doc_id", "text", k=2, min_containment=0.01, max_df=2
    ).collect()
    assert rows == []  # only the boilerplate was shared; capped away


def test_bbit_estimator_bounds_and_identity(spark):
    pairs = spark.createDataFrame(
        [(1, "a b c d", "a b c d"), (2, "a b c", "x y z")],
        "pair bigint, cand string, ref string",
    )
    got = {
        r["pair"]: r
        for r in bbit_minhash_pairs(pairs, n_hashes=24, b_bits=2).collect()
    }
    assert got[1]["n_match"] == 24 and got[1]["s_bbit"] == 1.0
    assert got[1]["jaccard"] == 1.0
    # disjoint: collisions hover near the 2^-b floor; estimator near 0
    c0 = 0.25
    assert got[2]["n_match"] <= 24
    assert -c0 / (1 - c0) - 1e-9 <= got[2]["s_bbit"] <= 1.0
    assert got[2]["jaccard"] == 0.0
    with pytest.raises(ValueError):
        bbit_minhash_pairs(pairs, n_hashes=0)
    with pytest.raises(ValueError):
        bbit_minhash_pairs(pairs, b_bits=0)


def test_priority_sample_is_deterministic_weighted_topk(spark):
    docs = _docs(
        spark,
        [(i, f"t{i}", "g1" if i < 6 else "g2", 1 + i % 3) for i in range(10)],
    )
    a = priority_sample(docs, "grp", "w", "doc_id", k=3)
    b = priority_sample(docs, "grp", "w", "doc_id", k=3)
    ra = sorted((r["grp"], r["doc_id"]) for r in a.collect())
    assert ra == sorted((r["grp"], r["doc_id"]) for r in b.collect())
    per = {}
    for g, d in ra:
        per.setdefault(g, []).append(d)
    assert len(per["g1"]) == 3 and len(per["g2"]) == 3
    # a dominating weight is always selected: q = w*2^32/(h+1) with
    # h < 2^32 makes w=2^20 beat any w<=3 row's maximum priority
    big = _docs(spark, [(99, "big", "g1", 1 << 20)])
    sel = priority_sample(docs.union(big), "grp", "w", "doc_id", k=3)
    assert 99 in {r["doc_id"] for r in sel.collect()}
    with pytest.raises(ValueError):
        priority_sample(docs, "grp", "w", "doc_id", k=0)


def test_lsh_tuning_curve_bounds_and_identity(spark):
    """Identical pairs must predict AND observe collision 1.0; disjoint
    pairs predict ~0 and never collide; predictions stay in [0,1]."""
    from flow_indexer_spark.operators.dedup import lsh_tuning_curve

    pairs = spark.createDataFrame(
        [
            (1, "a b c d e", "a b c d e"),   # jaccard 1 -> decile 9
            (2, "a b c", "x y z"),           # jaccard 0 -> decile 0
            (3, "a b c d", "a b c e"),       # jaccard 0.6 -> decile 6
        ],
        "pair bigint, cand string, ref string",
    )
    got = {
        r["decile"]: r
        for r in lsh_tuning_curve(pairs, n_bands=4, rows_per_band=2).collect()
    }
    assert got[9]["mean_predicted"] == 1.0 and got[9]["observed_rate"] == 1.0
    assert got[0]["mean_predicted"] == 0.0 and got[0]["observed_rate"] == 0.0
    d6 = got[6]
    # analytic value at s = 0.6, r=2, b=4: 1 - (1 - 0.36)^4
    u = 1.0 - 0.6 * 0.6
    assert abs(d6["mean_predicted"] - round(1.0 - ((u * u) * u) * u, 9)) < 2e-9
    assert 0.0 <= d6["observed_rate"] <= 1.0
    import pytest as _pt

    with _pt.raises(ValueError):
        lsh_tuning_curve(pairs, n_bands=0)
