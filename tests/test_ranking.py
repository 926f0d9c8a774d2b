"""BM25 ranked-retrieval tests: exact python replay + ordering/edge
goldens (dual-implementation strategy, as everywhere)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from flow_indexer_spark.operators.ranking import bm25_search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=1, text="spark shuffle join spark spark"),
        Row(doc_id=2, text="spark join"),
        Row(doc_id=3, text="join join join join join join join join"),
        Row(doc_id=4, text="unrelated words entirely here"),
        Row(doc_id=5, text=""),
    ]
    return spark.createDataFrame(rows).cache()


def _py_bm25(docs, query_words, k1=1.2, b=0.75):
    toks = {d: t.split() if t else [] for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for w in sorted(set(query_words)):
        dfreq = sum(1 for t in toks.values() if w in t)
        if dfreq == 0:
            continue
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for d, t in toks.items():
            tf = t.count(w)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
    return scores


def test_bm25_matches_python_replay(corpus):
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = _py_bm25(docs, ["spark", "join"])
    got = {r["doc_id"]: r["score"] for r in bm25_search(corpus, "spark join").collect()}
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-12)


def test_bm25_ranking_properties(corpus):
    out = [r["doc_id"] for r in bm25_search(corpus, "spark").collect()]
    # doc 1 has tf=3 of 'spark', doc 2 tf=1 but is much shorter; both
    # contain it, others don't
    assert set(out) == {1, 2}
    # repeated query terms don't double-count; unknown terms contribute 0
    a = {r["doc_id"]: r["score"] for r in bm25_search(corpus, "spark spark").collect()}
    b = {r["doc_id"]: r["score"] for r in bm25_search(corpus, "spark zzz_missing").collect()}
    assert a == b
    # topk truncation is by score desc
    top1 = bm25_search(corpus, "join", topk=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 3
    with pytest.raises(ValueError):
        bm25_search(corpus, "")
