"""fit_logreg differential test: the DataFrame gradient-descent loop must
reproduce a plain-numpy twin bit-for-bit (per-iteration 8-dp weight
rounding pins the trajectory across engines); the sf0.01 oracle twin
(nested-CTE SQL replica) runs in test_entry_contract.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from flow_indexer_spark.operators.textstats import fit_logreg


def _np_logreg(X, y, n_iter=4, lr=0.5, standardize=True, round_dp=8):
    X = X.astype(float).copy()
    if standardize:
        m = X.mean(axis=0)
        s = np.maximum(X.std(axis=0), 1e-9)  # population std
        X = (X - m) / s
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = ((p - y)[:, None] * X).mean(axis=0)
        gb = (p - y).mean()
        w = np.round(w - lr * g, round_dp)
        b = round(b - lr * gb, round_dp)
    return w, b


@pytest.fixture(scope="module")
def labeled_features(spark):
    rng = np.random.RandomState(11)
    n = 200
    # two overlapping blobs in 3 feature dims; label correlates with dim 0
    y = (rng.rand(n) < 0.5).astype(float)
    X = rng.randn(n, 3) * [2.0, 50.0, 0.3] + [5.0, 100.0, 1.0]
    X[:, 0] += y * 4.5
    rows = [
        Row(doc_id=i, f_a=float(X[i, 0]), f_b=float(X[i, 1]), f_c=float(X[i, 2]), label=float(y[i]))
        for i in range(n)
    ]
    return spark.createDataFrame(rows), X, y


def test_logreg_matches_numpy_twin(labeled_features):
    df, X, y = labeled_features
    out = fit_logreg(df, ["f_a", "f_b", "f_c"], "label", n_iter=4, lr=0.5)
    got = {r["feature"]: r["weight"] for r in out.collect()}
    w, b = _np_logreg(X, y)
    assert abs(got["_bias"] - b) <= 1e-12
    for j, c in enumerate(["f_a", "f_b", "f_c"]):
        assert abs(got[c] - w[j]) <= 1e-12, (c, got[c], w[j])


def test_logreg_learns_signal(labeled_features):
    df, X, y = labeled_features
    out = fit_logreg(df, ["f_a", "f_b", "f_c"], "label", n_iter=25, lr=1.0)
    got = {r["feature"]: r["weight"] for r in out.collect()}
    # dim 0 carries the label signal: its weight dominates and is positive
    assert got["f_a"] > 0
    assert abs(got["f_a"]) > 3 * abs(got["f_b"])
    assert abs(got["f_a"]) > 3 * abs(got["f_c"])
    # and the fitted model beats chance on its training set
    m = X.mean(axis=0)
    s = np.maximum(X.std(axis=0), 1e-9)
    Z = (X - m) / s
    w = np.array([got["f_a"], got["f_b"], got["f_c"]])
    p = 1.0 / (1.0 + np.exp(-(Z @ w + got["_bias"])))
    acc = ((p >= 0.5) == (y == 1.0)).mean()
    assert acc >= 0.75


def test_logreg_no_standardize_matches_twin(labeled_features):
    df, X, y = labeled_features
    out = fit_logreg(
        df, ["f_a", "f_b", "f_c"], "label", n_iter=3, lr=0.01, standardize=False
    )
    got = {r["feature"]: r["weight"] for r in out.collect()}
    w, b = _np_logreg(X, y, n_iter=3, lr=0.01, standardize=False)
    assert abs(got["_bias"] - b) <= 1e-12
    for j, c in enumerate(["f_a", "f_b", "f_c"]):
        assert abs(got[c] - w[j]) <= 1e-12


def test_logreg_validates_args(labeled_features):
    df, _, _ = labeled_features
    with pytest.raises(ValueError):
        fit_logreg(df, [], "label")
    with pytest.raises(ValueError):
        fit_logreg(df, ["f_a"], "label", n_iter=0)
