"""winnowing: the SIGMOD-2003 guarantees, density bounds, df cap."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_shared_pairs,
)

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_substring_guarantees_shared_fingerprint(spark):
    # any shared token run of >= w+k-1 = 6 tokens must produce at least
    # one common fingerprint — THE winnowing guarantee
    shared = "alpha beta gamma delta epsilon zeta"
    d = _docs(
        spark,
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine ten eleven twelve"),
        ],
    )
    fp = winnow_fingerprints(d, "doc_id", "text", k=K, w=W)
    h1 = {r["hash"] for r in fp.filter("doc = 1").collect()}
    h2 = {r["hash"] for r in fp.filter("doc = 2").collect()}
    assert h1 & h2


def test_density_bounds_and_short_doc(spark):
    n_tokens = 40
    text = " ".join(f"t{i * 7 % 31}" for i in range(n_tokens))
    d = _docs(spark, [(1, text), (2, "too short here")])
    fp = winnow_fingerprints(d, "doc_id", "text", k=K, w=W)
    n_grams = n_tokens - K + 1
    n_windows = n_grams - W + 1
    got = fp.filter("doc = 1").count()
    # each window selects one; one fingerprint covers at most w windows
    assert n_windows / W <= got <= n_windows
    # < k+w-1 tokens -> no full window -> nothing selected
    assert fp.filter("doc = 2").count() == 0


def test_deterministic_across_runs(spark):
    d = _docs(spark, [(1, " ".join(f"w{i % 9}" for i in range(30)))])
    a = sorted(map(tuple, winnow_fingerprints(d, "doc_id", "text").collect()))
    b = sorted(map(tuple, winnow_fingerprints(d, "doc_id", "text").collect()))
    assert a == b and len(a) > 0


def test_shared_pairs_and_df_cap(spark):
    text = " ".join(f"u{i * 5 % 17}" for i in range(20))
    other = " ".join(f"z{i}" for i in range(20))
    d = _docs(spark, [(1, text), (2, text), (3, other)])
    fp = winnow_fingerprints(d, "doc_id", "text")
    pairs = winnow_shared_pairs(fp, min_shared=2, max_df=50).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["n_shared"] >= 2

    # three identical docs + max_df=2: every shared fingerprint has
    # df=3 > cap -> boilerplate-dropped -> no pairs survive
    d3 = _docs(spark, [(1, text), (2, text), (3, text)])
    fp3 = winnow_fingerprints(d3, "doc_id", "text")
    assert winnow_shared_pairs(fp3, min_shared=1, max_df=2).count() == 0


def test_validates_params(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(d, "doc_id", "text", k=0)
