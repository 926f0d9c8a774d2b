"""Aho-Corasick multi-pattern scan: the automaton path and the in-row
native path must agree exactly (dual-implementation differential — the
reference's nfdump discipline, backend/nfdump.go:16-99), and both must
count OVERLAPPING occurrences."""

from __future__ import annotations

import random

import pytest

from flow_indexer_spark.operators.multipattern import (
    build_automaton,
    multi_pattern_scan,
    multi_pattern_scan_native,
    scan_text,
)


def _py_expected(docs, patterns):
    out = set()
    for did, text in docs:
        if text is None:
            continue
        for p in patterns:
            n = sum(1 for i in range(len(text) - len(p) + 1) if text[i : i + len(p)] == p)
            if n:
                first = min(
                    i + 1
                    for i in range(len(text) - len(p) + 1)
                    if text[i : i + len(p)] == p
                )
                out.add((did, p, n, first))
    return out


DOCS = [
    (0, "aaa"),  # "aa" overlaps: 2 matches
    (1, "abababa"),  # "aba" overlaps: 3 matches
    (2, "the cat sat on the mat"),
    (3, ""),
    (4, None),
    (5, "catcat concatenate"),
]
PATTERNS = ["aa", "aba", "cat", "the", "zzz"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scan_text_counts_overlaps():
    auto = build_automaton(["aa", "aba"])
    assert scan_text(auto, "aaa") == {0: (2, 1)}
    assert scan_text(auto, "abababa") == {1: (3, 1)}
    assert scan_text(auto, "") == {}


def test_automaton_suffix_outputs():
    # "she" ending also emits the suffix pattern "he" (fail-chain output merge)
    auto = build_automaton(["she", "he", "hers"])
    assert scan_text(auto, "ushers") == {0: (1, 2), 1: (1, 3), 2: (1, 3)}


@pytest.mark.parametrize("bad", [[], [""], ["a", "a"]])
def test_bad_pattern_lists_raise(bad):
    with pytest.raises(ValueError):
        build_automaton(bad)


def test_ac_matches_python_reference(docs):
    got = {
        (r["doc_id"], r["pattern"], r["n_matches"], r["first_pos"])
        for r in multi_pattern_scan(docs, PATTERNS).collect()
    }
    assert got == _py_expected(DOCS, PATTERNS)


def test_native_matches_python_reference(docs):
    got = {
        (r["doc_id"], r["pattern"], r["n_matches"], r["first_pos"])
        for r in multi_pattern_scan_native(docs, PATTERNS).collect()
    }
    assert got == _py_expected(DOCS, PATTERNS)


def test_differential_on_random_corpus(spark):
    rng = random.Random(7)
    docs = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 40))))
        for i in range(60)
    ]
    patterns = ["a", "ab", "ba", "abc", "aa", "cab", "bbb"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ac = {
        tuple(r)
        for r in multi_pattern_scan(df, patterns).collect()
    }
    native = {
        tuple(r)
        for r in multi_pattern_scan_native(df, patterns).collect()
    }
    assert ac == native
    assert ac == _py_expected(docs, patterns)
