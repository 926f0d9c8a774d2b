"""Positional phrase-search tests: goldens + index-vs-scan differential
(the nfdump dual-implementation strategy,
/root/reference/backend/nfdump_test.go:30-55, applied to the phrase
index)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from flow_indexer_spark.operators.phrases import (
    phrase_search,
    phrase_search_scan,
    token_positions,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the table scan is fast"),
        Row(doc_id=2, text="scan the table"),            # words present, wrong order
        Row(doc_id=3, text="table  scan"),               # double space: positions skip empties
        Row(doc_id=4, text="a table scanner"),           # token boundary: no partial match
        Row(doc_id=5, text="table scan table scan"),     # two occurrences
        Row(doc_id=6, text="batch batch batch"),         # repeated-word phrase target
        Row(doc_id=7, text="batch only once"),
        Row(doc_id=8, text=""),
    ]
    return spark.createDataFrame(rows).cache()


def _ids(out):
    return [r["doc_id"] for r in out.collect()]


def test_phrase_golden(docs):
    pos = token_positions(docs, id_cols=("doc_id",))
    assert _ids(phrase_search(pos, "table scan", id_cols=("doc_id",))) == [1, 3, 5]
    assert _ids(phrase_search(pos, "batch batch", id_cols=("doc_id",))) == [6]
    assert _ids(phrase_search(pos, "batch batch batch", id_cols=("doc_id",))) == [6]
    assert _ids(phrase_search(pos, "the table scan is fast", id_cols=("doc_id",))) == [1]
    assert _ids(phrase_search(pos, "missing phrase", id_cols=("doc_id",))) == []
    # single word degenerates to plain containment
    assert _ids(phrase_search(pos, "batch", id_cols=("doc_id",))) == [6, 7]
    with pytest.raises(ValueError):
        phrase_search(pos, "")


def test_phrase_index_vs_scan_differential(docs, spark):
    pos = token_positions(docs, id_cols=("doc_id",))
    for phrase in ("table scan", "batch batch", "the table", "scan", "is fast"):
        a = _ids(phrase_search(pos, phrase, id_cols=("doc_id",)))
        b = _ids(phrase_search_scan(docs, phrase, id_cols=("doc_id",)))
        assert a == b, phrase


def test_phrase_differential_on_sf0001(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pos = token_positions(d, id_cols=("doc_id",))
    for phrase in ("table scan", "batch batch", "the fast key"):
        a = _ids(phrase_search(pos, phrase, id_cols=("doc_id",)))
        b = _ids(phrase_search_scan(d, phrase, id_cols=("doc_id",)))
        assert a == b and len(a) > 0, phrase
