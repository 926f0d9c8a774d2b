"""Incremental drift state: replay idempotence, identity/disjoint
bounds, two-sided open-vocabulary mass, textbook-JS agreement."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from flow_indexer_spark.operators.drift_state import (
    batch_drift,
    commit_token_counts,
    reference_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _ref_js(batch_texts, ref_texts):
    pb = Counter(t for s in batch_texts for t in s.split() if t)
    pr = Counter(t for s in ref_texts for t in s.split() if t)
    nb, nr = sum(pb.values()), sum(pr.values())
    js = 0.0
    for t in set(pb) | set(pr):
        p, q = pb.get(t, 0) / nb, pr.get(t, 0) / nr
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    return js


def test_commit_replay_is_idempotent_and_drift_matches_textbook(
    spark, tmp_path
):
    state = str(tmp_path / "drift_state")
    ref1 = ["a b c a", "b c d"]
    ref2 = ["a a e", "c d"]
    commit_token_counts(spark, _docs(spark, ref1), state, "b1")
    commit_token_counts(spark, _docs(spark, ref2), state, "b2")
    before = {
        r["token"]: r["n"] for r in reference_counts(spark, state).collect()
    }
    # replaying b2 must not double-count
    commit_token_counts(spark, _docs(spark, ref2), state, "b2")
    after = {
        r["token"]: r["n"] for r in reference_counts(spark, state).collect()
    }
    assert before == after
    assert after["a"] == 4 and after["e"] == 1

    batch = ["a b q q", "c z"]
    rep = batch_drift(spark, _docs(spark, batch), state)
    ref = _ref_js(batch, ref1 + ref2)
    assert abs(rep["js_divergence"] - ref) < 2e-8
    # q,z are batch-only (3 of 6 tokens); d,e are ref-only (3 of 12)
    assert rep["batch_only_mass"] == round(3 / 6, 9)
    assert rep["ref_only_mass"] == round(3 / 12, 9)


def test_identity_and_disjoint_bounds(spark, tmp_path):
    state = str(tmp_path / "s2")
    commit_token_counts(spark, _docs(spark, ["x y x", "y x y"]), state, "b")
    same = batch_drift(spark, _docs(spark, ["x y x y x y"]), state)
    assert same["js_divergence"] == 0.0  # identical distributions
    disj = batch_drift(spark, _docs(spark, ["p p r r"]), state)
    assert abs(disj["js_divergence"] - math.log(2)) < 1e-9
    with pytest.raises(ValueError):
        batch_drift(spark, _docs(spark, ["   "]), state)
    with pytest.raises(ValueError):
        commit_token_counts(spark, _docs(spark, ["x"]), state, "a/b")
