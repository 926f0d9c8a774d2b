"""Speculative-decoding draft analytics: tie-break, short-doc guard,
min_count, and uncovered-context semantics."""

from __future__ import annotations

from flow_indexer_spark.operators.specdec import (
    bigram_draft_model,
    draft_acceptance,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, src string")


def test_argmax_and_lexicographic_tiebreak(spark):
    # context 'a': b twice, c twice -> tie broken by draft ASC -> 'b'
    docs = _docs(
        spark,
        [(1, "a b a c", "s"), (2, "a b a c", "s"), (3, "x y", "s")],
    )
    m = {
        r["context"]: (r["draft"], r["n"])
        for r in bigram_draft_model(docs, "doc_id", "text").collect()
    }
    assert m["a"] == ("b", 2)
    assert m["b"] == ("a", 2)
    assert m["x"] == ("y", 1)


def test_short_docs_and_empty_tokens_ignored(spark):
    docs = _docs(spark, [(1, "solo", "s"), (2, "  ", "s"), (3, "p  q", "s")])
    rows = bigram_draft_model(docs, "doc_id", "text").collect()
    # only doc 3 has an adjacent pair; the double space collapses
    assert [(r["context"], r["draft"], r["n"]) for r in rows] == [("p", "q", 1)]


def test_min_count_drops_rare_contexts(spark):
    docs = _docs(spark, [(1, "a b a b c d", "s")])
    m = bigram_draft_model(docs, "doc_id", "text", min_count=2).collect()
    assert {r["context"] for r in m} == {"a"}  # a->b twice; b,c singletons


def test_acceptance_counts_and_uncovered_contexts(spark):
    # model (min_count=1): a->b (2 of 3 a-pairs accepted), c->d (1 of 1)
    docs = _docs(
        spark,
        [(1, "a b", "s1"), (2, "a b", "s1"), (3, "a c d", "s2")],
    )
    rep = {
        r["src"]: r
        for r in draft_acceptance(
            docs, "doc_id", "text", group_col="src"
        ).collect()
    }
    assert rep["s1"]["n_positions"] == 2 and rep["s1"]["n_accepted"] == 2
    # s2 positions: (a,c) rejected (draft b), (c,d) accepted
    assert rep["s2"]["n_positions"] == 2 and rep["s2"]["n_accepted"] == 1
    assert rep["s2"]["acceptance_rate"] == 0.5
