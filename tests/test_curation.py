"""Curation operators: deterministic hash split + per-group cap."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.curation import hash_split, per_group_cap


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 5}", score=(i * 37) % 101)
        for i in range(400)
    ]
    return spark.createDataFrame(rows).cache()


def test_hash_split_deterministic_and_complete(docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # rerun-stable
    assert set(a.values()) <= {"train", "val", "test"}
    # ~90/5/5 with hash noise at n=400
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.8 < frac_train < 0.97
    assert all(s in ("train", "val", "test") for s in a.values())


def test_hash_split_disjoint_under_different_salt(docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="A").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="B").collect()}
    assert a != b  # salt actually changes the assignment


def test_per_group_cap_exact(docs):
    kept = per_group_cap(docs, "source", n=10)
    per = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {f"s{i}": 10 for i in range(5)}
    # deterministic: same kept set on rerun
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in per_group_cap(docs, "source", n=10).collect())
    assert ids1 == ids2


def test_per_group_cap_order_col_keeps_best(docs):
    kept = per_group_cap(docs, "source", n=3, order_col="score")
    worst_kept = kept.groupBy("source").agg(F.max("score").alias("mx")).collect()
    full = {
        r["source"]: r["scores"]
        for r in docs.groupBy("source")
        .agg(F.sort_array(F.collect_list("score")).alias("scores"))
        .collect()
    }
    for r in worst_kept:
        assert r["mx"] == full[r["source"]][2]  # 3rd-smallest score per group


def test_per_group_cap_prefilter_differential(docs):
    exact = sorted(r["doc_id"] for r in per_group_cap(docs, "source", n=7).collect())
    pre = sorted(
        r["doc_id"]
        for r in per_group_cap(docs, "source", n=7, prefilter=True).collect()
    )
    assert exact == pre


def test_per_group_cap_small_groups_untouched(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="only") for i in range(4)]
    )
    assert per_group_cap(df, "source", n=10).count() == 4
    assert per_group_cap(df, "source", n=10, prefilter=True).count() == 4


def test_assign_to_centroids_roundtrip(spark):
    """Vectors near their own label's centroid assign back to it."""
    import numpy as np
    from pyspark.sql import Row

    from flow_indexer_spark.operators.similarity import (
        assign_to_centroids,
        label_centroids,
    )

    rng = np.random.default_rng(3)
    centers = {0: rng.normal(size=8), 1: rng.normal(size=8) + 5.0}
    rows = []
    i = 0
    for label, c in centers.items():
        for _ in range(20):
            rows.append(
                Row(
                    vec_id=i,
                    label=label,
                    embedding=[float(x) for x in c + rng.normal(scale=0.05, size=8)],
                )
            )
            i += 1
    emb = spark.createDataFrame(rows)
    cents = label_centroids(emb)
    got = {
        r["vec_id"]: r["assigned_label"]
        for r in assign_to_centroids(emb, cents).collect()
    }
    want = {r["vec_id"]: r["label"] for r in rows}
    assert got == want


def test_hash_split_null_id_deterministic(spark):
    df = spark.createDataFrame(
        [Row(doc_id=None), Row(doc_id="")], "doc_id: string"
    )
    got = [r["split"] for r in hash_split(df).collect()]
    assert got[0] == got[1]  # null hashes like '' — never null-propagates


def test_cross_split_contamination_golden(spark):
    from flow_indexer_spark.operators.curation import cross_split_contamination

    rows = [
        Row(doc_id=1, split="train", text="alpha beta gamma delta"),
        Row(doc_id=2, split="val", text="alpha beta gamma zeta"),   # shares 'alpha beta gamma'
        Row(doc_id=3, split="test", text="totally clean eval document"),
        Row(doc_id=4, split="train", text="unrelated training content here"),
    ]
    df = spark.createDataFrame(rows)
    got = {r["doc_id"]: r for r in cross_split_contamination(df, n=3).collect()}
    assert set(got) == {2}  # doc 3 is clean -> absent
    r = got[2]
    assert r["n_shared_grams"] == 1 and r["n_grams"] == 2
    assert r["contamination_ratio"] == 0.5
    assert r["example_train_doc"] == 1


def test_stratified_sample_golden(spark):
    from flow_indexer_spark.operators.curation import stratified_sample

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows).cache()
    out = stratified_sample(df, fractions={"s0": 0.5, "s1": 0.0})
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert "s1" not in counts                      # 0% stratum fully dropped
    assert counts["s2"] == 100                     # default 1.0 keeps all
    assert 25 <= counts["s0"] <= 75                # ~50% of 100, hash-uniform

    # determinism + monotonicity: same rows across runs; raising a
    # fraction only adds rows
    ids = lambda o: {r["doc_id"] for r in o.select("doc_id").collect()}  # noqa: E731
    a = ids(stratified_sample(df, fractions={"s0": 0.3}))
    b = ids(stratified_sample(df, fractions={"s0": 0.3}))
    c = ids(stratified_sample(df, fractions={"s0": 0.6}))
    assert a == b and a <= c
    df.unpersist()


def test_pack_sequences_matches_python_replay(spark):
    """Exact replay: recompute the per-shard concat-and-chunk layout in
    plain python with the same md5 hash and compare every field."""
    import hashlib

    from flow_indexer_spark.operators.curation import pack_sequences

    rows = [Row(doc_id=f"d{i}", text=" ".join(["w"] * (i % 7 + 1))) for i in range(50)]
    df = spark.createDataFrame(rows)
    budget, n_shards = 10, 4
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"], r["pack_id"], r["offset"])
        for r in pack_sequences(df, budget=budget, n_shards=n_shards).collect()
    }

    h = lambda i: int(hashlib.md5(f"packd{i}".encode()).hexdigest()[:8], 16)  # noqa: E731
    docs = sorted(
        ((h(i) % n_shards, h(i), f"d{i}", i % 7 + 1) for i in range(50)),
    )
    pos = {}
    want = {}
    for shard, _, doc, ntok in docs:
        p = pos.get(shard, 0)
        want[doc] = (ntok, shard, f"{shard}-{p // budget}", p % budget)
        pos[shard] = p + ntok
    assert got == want
    assert all(0 <= v[3] < budget for v in got.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(df, budget=0)


# --- preference pairs -------------------------------------------------------


def test_preference_pairs_hand_fixture(spark):
    from flow_indexer_spark.operators.curation import preference_pairs

    rows = [
        # group g1: scores 10,8,5,3,1 -> pairs (10,1), (8,3); 5 is the
        # unpaired middle (2*3 > 5)
        ("g1", 1, 10.0), ("g1", 2, 8.0), ("g1", 3, 5.0),
        ("g1", 4, 3.0), ("g1", 5, 1.0),
        # group g2: a single row can never pair
        ("g2", 6, 7.0),
        # group g3: two equal scores -> margin 0, filtered out
        ("g3", 7, 4.0), ("g3", 8, 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    out = preference_pairs(df, ["g"], "id", "score", max_pairs_per_group=3)
    got = sorted(
        (r.g, r.pair_rank, r.chosen_id, r.rejected_id, r.margin)
        for r in out.collect()
    )
    assert got == [("g1", 1, 1, 5, 9.0), ("g1", 2, 2, 4, 5.0)]


def test_preference_pairs_never_self_pairs_on_ties(spark):
    """All-equal-score groups with even sizes: every candidate pair has
    margin 0 and must be filtered; with distinct scores but heavy ties
    elsewhere, chosen_id != rejected_id always holds."""
    from flow_indexer_spark.operators.curation import preference_pairs

    rows = [("g", i, float(i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    out = preference_pairs(df, ["g"], "id", "score", max_pairs_per_group=10)
    for r in out.collect():
        assert r.chosen_id != r.rejected_id
        assert r.margin > 0
        assert r.chosen_score > r.rejected_score


def test_preference_pairs_min_margin_and_determinism(spark):
    from flow_indexer_spark.operators.curation import preference_pairs

    import random

    random.seed(5)
    rows = [
        (f"g{i % 7}", i, round(random.random() * 10, 2)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    wide = preference_pairs(df, ["g"], "id", "score", 5, min_margin=0.0)
    tight = preference_pairs(df, ["g"], "id", "score", 5, min_margin=4.0)
    w = {tuple(r) for r in wide.collect()}
    t = {tuple(r) for r in tight.collect()}
    assert t <= w
    assert all(r[-1] >= 4.0 for r in t)
    assert {tuple(r) for r in wide.collect()} == w  # stable re-run


def test_doremi_weights_hand_example(spark):
    """doremi_weights: clipping, softmax normalization, monotonicity in
    excess; uniform when proxy never lags."""
    import math

    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.curation import doremi_weights

    rows = [
        ("a", 2.0, 1.0),   # excess 1.0
        ("a", 1.5, 1.5),   # excess 0.0
        ("b", 1.0, 3.0),   # proxy BETTER -> clipped to 0
        ("b", 1.0, 1.0),
        ("c", 4.0, 1.0),   # excess 3.0
    ]
    df = spark.createDataFrame(rows, "src string, lp double, lr double")
    got = {
        r["src"]: r.asDict()
        for r in doremi_weights(df, "src", "lp", "lr", eta=1.0).collect()
    }
    assert got["a"]["mean_excess"] == 0.5
    assert got["b"]["mean_excess"] == 0.0
    assert got["c"]["mean_excess"] == 3.0
    z = math.exp(0.5) + math.exp(0.0) + math.exp(3.0)
    assert abs(got["c"]["weight"] - math.exp(3.0) / z) < 2e-9
    assert abs(sum(g["weight"] for g in got.values()) - 1.0) < 3e-9
    assert got["c"]["weight"] > got["a"]["weight"] > got["b"]["weight"]
