"""Product-quantization differential tests: pq_fit / pq_encode / pq_topk
must agree with a plain-numpy twin (identical hash seeding, argmin
tie-breaks, Lloyd updates, ADC math); plus an end-to-end recall check on
clustered data. The sf0.01 oracle twin runs in test_entry_contract.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row

from flow_indexer_spark.operators.similarity import (
    pq_encode,
    pq_fit,
    pq_seeds,
    pq_topk,
)

M, K, DIMS = 4, 4, 8


def _h(i, salt="pq"):
    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)


def _np_seeds(vecs, k=K, m=M):
    order = sorted(range(len(vecs)), key=lambda j: (_h(j), j))
    sub = vecs.shape[1] // m
    # books[j][label] = subvector
    return np.array(
        [[vecs[order[l]][j * sub : (j + 1) * sub] for l in range(k)] for j in range(m)]
    )


def _np_assign(vecs, books):
    m, k, sub = books.shape
    codes = np.zeros((len(vecs), m), dtype=int)
    for i, v in enumerate(vecs):
        for j in range(m):
            d = ((books[j] - v[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
            codes[i, j] = int(np.argmin(d))  # first min = lowest label
    return codes


def _np_fit(vecs, n_iter, k=K, m=M):
    books = _np_seeds(vecs, k, m)
    sub = vecs.shape[1] // m
    for _ in range(n_iter):
        codes = _np_assign(vecs, books)
        new = books.copy()
        for j in range(m):
            for l in range(k):
                members = vecs[codes[:, j] == l][:, j * sub : (j + 1) * sub]
                if len(members):
                    new[j, l] = members.mean(axis=0)
        books = new
    return books


@pytest.fixture(scope="module")
def pq_vectors(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(60, DIMS)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(60)]
    )
    return vecs, emb


def _books_from_df(cb_rows, m=M, k=K, sub=DIMS // M):
    books = np.zeros((m, k, sub))
    for r in cb_rows:
        books[r["subspace"], r["label"], r["dim"]] = r["centroid"]
    return books


def test_pq_seeds_match_numpy(pq_vectors):
    vecs, emb = pq_vectors
    got = _books_from_df(pq_seeds(emb, M, K, DIMS).collect())
    assert np.allclose(got, _np_seeds(vecs), atol=1e-12)


def test_pq_fit_matches_numpy_twin(pq_vectors):
    vecs, emb = pq_vectors
    got = _books_from_df(pq_fit(emb, M, K, DIMS, n_iter=2).collect())
    assert np.allclose(got, _np_fit(vecs, 2), atol=1e-9)


def test_pq_encode_matches_numpy(pq_vectors):
    vecs, emb = pq_vectors
    cb = pq_fit(emb, M, K, DIMS, n_iter=2)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb, M, DIMS).collect()}
    want = _np_assign(vecs, _np_fit(vecs, 2))
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i] == list(want[i]), i


def test_pq_topk_matches_numpy_adc(pq_vectors):
    vecs, emb = pq_vectors
    books = _np_fit(vecs, 2)
    codes = _np_assign(vecs, books)
    q = vecs[0]
    m, k, sub = books.shape
    lut = np.array(
        [((books[j] - q[j * sub : (j + 1) * sub]) ** 2).sum(axis=1) for j in range(m)]
    )
    adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
    want = sorted(range(len(vecs)), key=lambda i: (adc[i], i))[:7]

    cb = pq_fit(emb, M, K, DIMS, n_iter=2)
    cdf = pq_encode(emb, cb, M, DIMS)
    got = [r["vec_id"] for r in pq_topk(cdf, cb, [float(x) for x in q], k=7).collect()]
    assert got == want


def test_pq_adc_recall_on_clustered_data(spark):
    """End to end on separable data: ADC top-10 must largely agree with
    exact L2 top-10 (PQ is lossy; on blob data the clusters dominate)."""
    rng = np.random.RandomState(9)
    centers = rng.randn(6, DIMS) * 6
    vecs = np.vstack([centers[i % 6] + rng.randn(DIMS) * 0.3 for i in range(120)])
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(120)]
    )
    cb = pq_fit(emb, m=4, k=8, dims=DIMS, n_iter=3)
    cdf = pq_encode(emb, cb, 4, DIMS)
    q = vecs[7]
    got = {r["vec_id"] for r in pq_topk(cdf, cb, [float(x) for x in q], k=10).collect()}
    exact = set(np.argsort(((vecs - q) ** 2).sum(axis=1))[:10].tolist())
    assert len(got & exact) >= 6


def test_pq_validates_args(pq_vectors):
    _, emb = pq_vectors
    with pytest.raises(ValueError):
        pq_fit(emb, m=3, k=4, dims=DIMS)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        pq_fit(emb, m=4, k=4, dims=DIMS, n_iter=-1)
    cb = pq_seeds(emb, M, K, DIMS)
    cdf = pq_encode(emb, cb, M, DIMS)
    with pytest.raises(ValueError):
        pq_topk(cdf, cb, [0.0] * 7, k=3, m=M)  # 7 % 4 != 0
