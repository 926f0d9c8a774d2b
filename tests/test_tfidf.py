"""TF-IDF lattice weights and lexical cosine pairs vs a numpy oracle."""

from __future__ import annotations

import math
from collections import Counter

from flow_indexer_spark.operators.tfidf import (
    tfidf_cosine_pairs,
    tfidf_weights,
)

DOCS = [
    (0, "spark shuffle join agg spark"),
    (1, "spark shuffle join agg"),
    (2, "cat dog bird"),
    (3, "cat dog bird cat"),
    (4, "solo unique tokens here"),
]


def _ref():
    tf = {d: Counter(t.split()) for d, t in DOCS}
    df = Counter(tok for c in tf.values() for tok in c)
    n = len(DOCS)
    w = {
        d: {
            t: round(math.log(1 + c[t]) * math.log(n / df[t]) * 1e6)
            for t in c
        }
        for d, c in tf.items()
    }
    pairs = {}
    for a in range(n):
        for b in range(a + 1, n):
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = math.sqrt(sum(v * v for v in w[a].values()))
            nb = math.sqrt(sum(v * v for v in w[b].values()))
            if na and nb:
                pairs[(a, b)] = round(dot / (na * nb), 9)
    return w, pairs


def test_weights_and_cosine_match_numpy_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    w = tfidf_weights(df, "doc_id", "text")
    ref_w, ref_pairs = _ref()
    got_w = {(r["doc"], r["token"]): r["w"] for r in w.collect()}
    for d, terms in ref_w.items():
        for t, v in terms.items():
            assert got_w[(d, t)] == v, (d, t)
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(w, min_cosine=0.0, max_df=50).collect()
    }
    keep = {k: v for k, v in ref_pairs.items() if v >= 0.0}
    assert got == keep
    # docs 0/1 share their whole vocab -> near-1 cosine; 2/3 likewise
    assert got[(0, 1)] > 0.9 and got[(2, 3)] > 0.9


def test_df_cap_drops_ubiquitous_terms(spark):
    rows = [(i, "common filler x" + str(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = tfidf_weights(df, "doc_id", "text")
    # 'common'/'filler' appear in all 6 docs; cap at 5 removes them, and
    # the x{i} terms are unique -> no candidate pairs at all
    assert tfidf_cosine_pairs(w, min_cosine=0.0, max_df=5).count() == 0
