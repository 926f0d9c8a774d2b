"""kmeans_fit differential test: the DataFrame Lloyd loop must agree
with a plain-numpy spherical k-means using the identical deterministic
hash init and tie-breaking; the sf0.01 oracle twin (one-iteration SQL
replica) runs in test_entry_contract.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.similarity import (
    assign_to_centroids,
    kmeans_fit,
    kmeans_seeds,
)


def _np_kmeans(vecs: np.ndarray, ids: list[int], k: int, n_iter: int, salt="km"):
    def h(i):
        return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)

    order = sorted(range(len(ids)), key=lambda j: (h(ids[j]), ids[j]))
    cents = [vecs[j].copy() for j in order[:k]]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    asg = None
    for _ in range(n_iter):
        asg = []
        for v in vecs:
            sims = [cos(v, c) for c in cents]
            asg.append(max(range(k), key=lambda l: (sims[l], -l)))
        for l in range(k):
            members = [vecs[j] for j in range(len(vecs)) if asg[j] == l]
            if members:
                cents[l] = np.mean(members, axis=0)
    # final assignment against the trained centroids
    final = []
    for v in vecs:
        sims = [cos(v, c) for c in cents]
        final.append(max(range(k), key=lambda l: (sims[l], -l)))
    return cents, final


@pytest.fixture(scope="module")
def blob_vectors():
    rng = np.random.RandomState(7)
    centers = np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], dtype=float
    )
    vecs = np.vstack(
        [centers[i % 3] + rng.randn(4) * 0.5 for i in range(30)]
    )
    return vecs


def test_kmeans_matches_numpy_twin(spark, blob_vectors):
    ids = list(range(30))
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in blob_vectors[i]]) for i in ids]
    )
    cents = kmeans_fit(df, k=3, n_iter=3)
    got = {
        (r["label"], r["dim"]): r["centroid"] for r in cents.collect()
    }
    want, final = _np_kmeans(blob_vectors, ids, k=3, n_iter=3)
    assert len(got) == 3 * 4
    for (l, d), v in got.items():
        assert abs(v - want[l][d]) < 1e-9, (l, d, v, want[l][d])

    asg = {
        r["vec_id"]: r["assigned_label"]
        for r in assign_to_centroids(df, cents).collect()
    }
    assert asg == {i: final[i] for i in ids}
    # well-separated blobs: clustering recovers the generating partition
    by_cluster = {}
    for i, l in asg.items():
        by_cluster.setdefault(l, set()).add(i % 3)
    assert all(len(v) == 1 for v in by_cluster.values())


def test_kmeans_empty_cluster_carryover(spark):
    # k=3 over 2 tight groups: one seed-cluster starves; its centroid
    # must survive (carried over), never silently dropping to k=2
    rows = [Row(vec_id=i, embedding=[1.0, 0.0]) for i in range(4)] + [
        Row(vec_id=i, embedding=[0.0, 1.0]) for i in range(4, 8)
    ]
    df = spark.createDataFrame(rows)
    cents = kmeans_fit(df, k=3, n_iter=2)
    labels = {r["label"] for r in cents.select("label").distinct().collect()}
    assert labels == {0, 1, 2}

    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, n_iter=0)


def test_kmeans_seeds_are_hash_deterministic(spark):
    rows = [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows)
    a = kmeans_seeds(df, k=4).collect()
    b = kmeans_seeds(df, k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def h(i):
        return int(hashlib.md5(f"km{i}".encode()).hexdigest()[:8], 16)

    order = sorted(range(20), key=lambda i: (h(i), i))[:4]
    got0 = [r["centroid"] for r in sorted(a) if r[0] == 0 and r[1] == 0]
    assert got0 == [float(order[0])]


def test_ivf_with_trained_centroids_recall(spark, blob_vectors):
    """End-to-end IVF quality: train lists with kmeans_fit, search with
    ivf_topk, measure recall@5 against the exact scan. With nprobe
    covering 2 of 3 well-separated lists, the probe's own cluster is
    always ranked first, so recall must be perfect here."""
    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.similarity import (
        assign_to_centroids,
        ivf_topk,
        kmeans_fit,
        topk_cosine,
    )

    ids = list(range(30))
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in blob_vectors[i]]) for i in ids]
    )
    cents = kmeans_fit(df, k=3, n_iter=3)
    labeled = df.join(
        assign_to_centroids(df, cents).select(
            "vec_id", F.col("assigned_label").alias("label")
        ),
        "vec_id",
    )
    probe = labeled.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in topk_cosine(labeled, list(blob_vectors[0]), k=5).collect()}
    approx = {r["vec_id"] for r in ivf_topk(labeled, probe, k=5, nprobe=2).collect()}
    assert len(exact & approx) / 5 >= 1.0


def test_hard_negatives_semantics(spark):
    from flow_indexer_spark.operators.similarity import hard_negatives

    # anchor 0 (label A, along x); same-label 1 is nearest positive;
    # different-label 10..13 ordered by angle from x-axis
    rows = [
        Row(vec_id=0, label=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, label=0, embedding=[0.9, 0.1]),
        Row(vec_id=2, label=0, embedding=[0.1, 0.9]),
        Row(vec_id=10, label=1, embedding=[0.8, 0.2]),
        Row(vec_id=11, label=1, embedding=[0.6, 0.4]),
        Row(vec_id=12, label=1, embedding=[0.4, 0.6]),
        Row(vec_id=13, label=1, embedding=[0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    anchors = df.filter(F.col("vec_id") == 0)
    out = hard_negatives(df, anchors, k_neg=2).collect()
    pos = [r for r in out if r["kind"] == "positive"]
    neg = sorted(
        (r for r in out if r["kind"] == "negative"), key=lambda r: r["rank"]
    )
    assert len(pos) == 1 and pos[0]["vec_id"] == 1  # anchor itself excluded
    assert [r["vec_id"] for r in neg] == [10, 11]  # hardest two negatives

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hard_negatives(df, anchors, k_neg=0)
