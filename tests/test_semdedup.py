"""semdedup invariants + brute-force twin: the cluster-scoped dedup must
agree with a plain-python replica (same deterministic hash-seeded
centroids, same id-ordered witness rule); the sf0.01 oracle twin runs in
test_entry_contract.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row

from flow_indexer_spark.operators.dedup import semdedup
from flow_indexer_spark.operators.similarity import kmeans_seeds

THRESHOLD = 0.995


@pytest.fixture(scope="module")
def semdedup_result(spark):
    rng = np.random.RandomState(3)
    centers = np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10]], float
    )
    vecs = []
    for i in range(48):
        base = centers[i % 4] + rng.randn(4) * 3.0
        vecs.append(base)
        if i % 5 == 0:  # inject a semantic near-copy of this vector
            vecs.append(base + rng.randn(4) * 0.02)
    vecs = np.array(vecs)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(len(vecs))]
    )
    cents = kmeans_seeds(emb, k=4)
    out = semdedup(emb, cents, threshold=THRESHOLD).collect()
    return vecs, out


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _py_assign(vecs, k=4, salt="km"):
    def h(i):
        return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)

    order = sorted(range(len(vecs)), key=lambda j: (h(j), j))
    cents = [vecs[j] for j in order[:k]]
    return [
        max(range(k), key=lambda l: (_cos(vecs[i], cents[l]), -l))
        for i in range(len(vecs))
    ]


def test_semdedup_matches_bruteforce_twin(semdedup_result):
    vecs, out = semdedup_result
    asg = _py_assign(vecs)
    expect_dup_of = {}
    for i in range(len(vecs)):
        ws = [
            j
            for j in range(i)
            if asg[j] == asg[i] and _cos(vecs[j], vecs[i]) >= THRESHOLD
        ]
        if ws:
            expect_dup_of[i] = min(ws)
    got = {r["vec_id"]: r for r in out}
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i]["assigned_label"] == asg[i]
        assert got[i]["keep"] == (i not in expect_dup_of)
        assert got[i]["dup_of"] == expect_dup_of.get(i)


def test_semdedup_invariants(semdedup_result):
    vecs, out = semdedup_result
    kept = [r for r in out if r["keep"]]
    dropped = [r for r in out if not r["keep"]]
    assert dropped, "fixture must exercise the drop path"
    assert len(kept) > len(dropped), "most of the fixture is distinct"
    # no same-cluster kept pair reaches the threshold
    for a in kept:
        for b in kept:
            if a["vec_id"] < b["vec_id"] and a["assigned_label"] == b["assigned_label"]:
                assert _cos(vecs[a["vec_id"]], vecs[b["vec_id"]]) < THRESHOLD
    # every dropped row names a valid lower-id same-cluster witness
    lab = {r["vec_id"]: r["assigned_label"] for r in out}
    for r in dropped:
        w = r["dup_of"]
        assert w is not None and w < r["vec_id"]
        assert lab[w] == r["assigned_label"]
        assert _cos(vecs[w], vecs[r["vec_id"]]) >= THRESHOLD
