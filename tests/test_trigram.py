"""Trigram index: substring/regex search must equal the brute-force scan
(the index is a candidate pruner; verification makes it exact)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.trigram import (
    char_trigrams,
    regex_required_grams,
    regex_search,
    substring_search,
    trigram_df_stats,
    trigram_postings,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "quick brown foxes leap; lazy dogs nap"),
    (3, "ab"),  # shorter than one trigram
    (4, ""),  # empty
    (5, "boxing quickly"),
    (6, "aaaa"),  # self-overlapping grams collapse to one distinct
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _brute(literal):
    return sorted(i for i, t in DOCS if literal in t)


def test_char_trigrams_matches_python(docs):
    rows = docs.select("doc_id", char_trigrams("text").alias("g")).collect()
    for r in rows:
        text = dict(DOCS)[r["doc_id"]]
        expect = list(dict.fromkeys(text[i : i + 3] for i in range(len(text) - 2)))
        assert r["g"] == expect, r["doc_id"]


def test_short_strings_produce_empty_arrays(docs):
    got = {
        r["doc_id"]: r["g"]
        for r in docs.select("doc_id", char_trigrams("text").alias("g")).collect()
    }
    assert got[3] == [] and got[4] == []
    assert got[6] == ["aaa"]  # self-overlapping grams collapse


@pytest.mark.parametrize(
    "literal",
    ["quick brown", "lazy dog", "box", "zzz", "fox", "aaaa", "aa"],
)
def test_substring_search_equals_scan(docs, literal):
    got = sorted(r[0] for r in substring_search(docs, literal).collect())
    assert got == _brute(literal), literal


def test_substring_short_query_falls_back_exact(docs):
    # < 3 chars: no trigram evidence, still exact via direct scan
    got = sorted(r[0] for r in substring_search(docs, "ab").collect())
    assert got == _brute("ab")


def test_substring_empty_literal_raises(docs):
    with pytest.raises(ValueError):
        substring_search(docs, "")


def test_candidates_actually_prune(docs):
    # the candidate set for a rare literal must be smaller than the corpus
    idx = trigram_postings(docs)
    from flow_indexer_spark.operators.trigram import _candidates, _literal_grams

    cand = _candidates(idx, "doc_id", _literal_grams("liquor jugs"))
    assert cand.count() == 1  # only doc 1 carries all those grams


@pytest.mark.parametrize(
    "pattern",
    [
        "quick.*dog",
        "brown fox|liquor",
        "lazy.*nap|boxing",
        "fox.*zzz",
        "quick",
    ],
)
def test_regex_search_equals_scan(docs, pattern):
    got = sorted(r[0] for r in regex_search(docs, pattern).collect())
    expect = sorted(i for i, t in DOCS if re.search(pattern, t))
    assert got == expect, pattern


def test_regex_unprunable_alternative_full_scans_exactly(docs):
    # one alternative is 2 chars -> no trigram -> full-scan fallback
    got = sorted(r[0] for r in regex_search(docs, "quick brown|ab").collect())
    expect = sorted(i for i, t in DOCS if re.search("quick brown|ab", t))
    assert got == expect


@pytest.mark.parametrize("bad", ["a[bc]", "x(y)", "a+", "b?", "^anchor", r"esc\.", "lone.dot"])
def test_unsupported_patterns_raise(bad):
    with pytest.raises(ValueError):
        regex_required_grams(bad)


def test_required_grams_derivation():
    alts = regex_required_grams("abcd.*efg|xy")
    assert alts == [{"abc", "bcd", "efg"}, set()]


def test_df_stats_orders_by_frequency(docs):
    rows = trigram_df_stats(docs, topk=3).collect()
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert all(len(r["gram"]) == 3 for r in rows)
