"""Distributed gram / PCA: exactness, partitioning-invariance, and a
numpy replay oracle (the dedup/ANN modules' brute-force-twin pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.linalg import (
    pca_fit,
    pca_transform,
    quantized_gram,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb_df):
    rows = emb_df.orderBy("vec_id").select("embedding").collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def _gram_dict(df):
    return {(r["i"], r["j"]): r["g"] for r in df.collect()}


def test_quantized_gram_matches_numpy(emb_df, emb_np):
    q = np.floor(emb_np * 1000).astype(np.int64)
    expect = q.T @ q
    got = _gram_dict(quantized_gram(emb_df))
    d = emb_np.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), g in got.items():
        assert i <= j
        assert g == expect[i, j], (i, j)


def test_quantized_gram_partitioning_invariant(emb_df):
    one = _gram_dict(quantized_gram(emb_df.repartition(1)))
    many = _gram_dict(quantized_gram(emb_df.repartition(7)))
    assert one == many  # exact integer reduction commutes


def test_pca_fit_matches_numpy_replay(emb_df, emb_np):
    model = pca_fit(emb_df, k=3)
    mean = emb_np.mean(axis=0)
    cov = (emb_np - mean).T @ (emb_np - mean) / emb_np.shape[0]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    np.testing.assert_allclose(model["mean"], mean, atol=1e-12)
    # eigenvectors up to sign; fit normalizes sign, do the same here
    for r, c in enumerate(order):
        vec = v[:, c]
        m = np.argmax(np.abs(vec))
        if vec[m] < 0:
            vec = -vec
        np.testing.assert_allclose(model["components"][r], vec, atol=1e-9)
    assert model["explained"][0] >= model["explained"][1] >= model["explained"][2]


def test_pca_transform_projects_in_row(emb_df, emb_np):
    model = pca_fit(emb_df, k=2)
    out = (
        pca_transform(emb_df, model)
        .orderBy("vec_id")
        .select("proj")
        .collect()
    )
    got = np.asarray([r["proj"] for r in out], dtype=np.float64)
    expect = (emb_np - model["mean"]) @ np.asarray(model["components"]).T
    np.testing.assert_allclose(got, expect, atol=1e-5)  # float32 output
    # plan shape: no shuffle — stateless projection
    plan = pca_transform(emb_df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_empty_and_tiny_inputs(spark, emb_df):
    with pytest.raises(ValueError):
        pca_fit(emb_df.limit(0))
    with pytest.raises(ValueError):
        pca_fit(emb_df.limit(1))


def test_gram_single_exchange_plan(emb_df):
    plan = (
        quantized_gram(emb_df)._jdf.queryExecution().executedPlan().toString()
    )
    # one Exchange for the d^2-row reduce; the row scan never shuffles
    assert plan.count("Exchange") <= 2  # hash agg exchange (+AQE read)
