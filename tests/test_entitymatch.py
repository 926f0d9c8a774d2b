"""Fuzzy entity matching: FastSS deletion-neighborhood blocking,
canonical-id assignment, and Unicode fold-key dedup.

The load-bearing property is FastSS completeness: deletion-neighborhood
blocking + levenshtein verify must find EXACTLY the pairs a brute-force
O(n^2) levenshtein scan finds (Bocek et al. 2007: ed(a,b) <= k implies
the depth-k deletion neighborhoods intersect; the verify step removes
the false positives the converse would admit).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.entitymatch import (
    deletion_variants,
    fastss_match,
    fold_key,
    fold_key_dedup,
    fuzzy_canonical_ids,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


#: a vocabulary dense in near-misses: all 3-letter strings over {a,b,c}
#: plus a few 2/4-letter edge cases — every ed<=1 relationship type
#: (substitute, insert, delete, identical-after-dedup) occurs.
DENSE = ["".join(p) for p in itertools.product("abc", repeat=3)] + [
    "ab", "bc", "abca", "cabc", "xyz",
]


def test_deletion_variants_depth1(spark):
    row = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc"), 1).alias("v"))
        .collect()[0]
    )
    assert sorted(row.v) == ["ab", "abc", "ac", "bc"]


def test_deletion_variants_depth2_dedups(spark):
    row = (
        spark.range(1)
        .select(deletion_variants(F.lit("aab"), 2).alias("v"))
        .collect()[0]
    )
    # depth-0 {aab}, depth-1 {ab, aa}, depth-2 {a, b} — duplicates removed
    assert sorted(row.v) == ["a", "aa", "aab", "ab", "b"]


def test_deletion_variants_rejects_bad_depth(spark):
    with pytest.raises(ValueError):
        deletion_variants("x", 0)


@pytest.mark.parametrize("k", [1, 2])
def test_fastss_equals_bruteforce(spark, k):
    df = spark.createDataFrame([(t,) for t in DENSE], ["term"])
    got = {
        (r.term_q, r.term, r.dist)
        for r in fastss_match(df, df, max_dist=k).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a in DENSE
        for b in DENSE
        if _lev(a, b) <= k
    }
    assert got == want


def test_fastss_min_len_drops_short(spark):
    df = spark.createDataFrame([("a",), ("b",), ("ab",)], ["term"])
    got = fastss_match(df, df, max_dist=1, min_len=2).collect()
    assert {(r.term_q, r.term) for r in got} == {("ab", "ab")}


def test_fastss_variant_df_cap_is_superset_safe(spark):
    # with the cap the result must be a SUBSET of the uncapped result
    # (it only drops hub variant buckets, never invents pairs)
    df = spark.createDataFrame([(t,) for t in DENSE], ["term"])
    full = {(r.term_q, r.term) for r in fastss_match(df, df, max_dist=1).collect()}
    capped = {
        (r.term_q, r.term)
        for r in fastss_match(df, df, max_dist=1, max_variant_df=3).collect()
    }
    assert capped <= full
    assert len(capped) < len(full)  # the dense fixture has hub variants


def test_fuzzy_canonical_ids_components(spark):
    terms = ["cat", "cbt", "cut", "dog", "dig", "fish"]
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    got = {r.term: (r.canonical, r.is_canonical) for r in
           fuzzy_canonical_ids(df, "term", max_dist=1).collect()}
    # {cat,cbt,cut} chain-merge (cat~cbt~cut even though cat-cut ed=1 too);
    # {dog,dig} merge; fish is a singleton
    assert got == {
        "cat": ("cat", True),
        "cbt": ("cat", False),
        "cut": ("cat", False),
        "dog": ("dig", False),
        "dig": ("dig", True),
        "fish": ("fish", True),
    }


def test_fold_key_folds_case_and_accents(spark):
    rows = spark.createDataFrame(
        [("Café",), ("CAFE",), ("cafe",), ("Øre",)], ["s"]
    ).select(fold_key("s").alias("k")).collect()
    assert [r.k for r in rows] == ["cafe", "cafe", "cafe", "øre"]
    # ø deliberately NOT folded: it is a letter, not a diacritic (matches
    # DuckDB strip_accents and NFKD)


def test_fold_key_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "Résumé"), (2, "resume"), (3, "RESUME"), (4, "other")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.keeper_id, r.group_size, r.n_spellings)
           for r in fold_key_dedup(df).collect()}
    assert got == {
        1: (1, 3, 3),
        2: (1, 3, 3),
        3: (1, 3, 3),
        4: (4, 1, 1),
    }
