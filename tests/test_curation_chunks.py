"""Sliding-window chunking, corpus boilerplate fraction, and exact
quantile-band trim: hand-computed fixtures; the sf0.01 oracle twins run
in test_entry_contract.py."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.curation import (
    boilerplate_fraction,
    quantile_band_filter,
    sliding_window_chunks,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunks_cover_with_overlap(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6,9; tail chunk length 1
    d = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
    rows = sorted(
        sliding_window_chunks(d, size=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1),
    ]
    # overlap: token t3 appears in chunk 0 (positions 0-3) and chunk 1
    assert len({r["chunk_hash"] for r in rows}) == 4


def test_chunks_short_and_empty_docs(spark):
    d = _docs(spark, ["only two", "   ", "a b c d e"])
    rows = sliding_window_chunks(d, size=4, stride=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [(r["start_tok"], r["n_tokens"]) for r in by_doc[0]] == [(0, 2)]
    assert 1 not in by_doc  # whitespace-only doc yields no chunks
    assert sorted((r["start_tok"], r["n_tokens"]) for r in by_doc[2]) == [
        (0, 4), (4, 1),
    ]


def test_chunks_identical_windows_share_hash(spark):
    d = _docs(spark, ["x y z x y z"])
    rows = sliding_window_chunks(d, size=3, stride=3).collect()
    hashes = [r["chunk_hash"] for r in sorted(rows, key=lambda r: r["chunk_idx"])]
    assert hashes[0] == hashes[1]


def test_chunks_rejects_bad_params(spark):
    d = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        sliding_window_chunks(d, size=0, stride=3)
    with pytest.raises(ValueError):
        sliding_window_chunks(d, size=3, stride=0)


def test_boilerplate_fraction_hand_counts(spark):
    # "the same footer" appears in 3 docs (df=3 > min_df=2); every other
    # 3-gram is unique to its doc.
    d = _docs(
        spark,
        [
            "alpha beta gamma the same footer",
            "delta epsilon zeta the same footer",
            "eta theta iota the same footer",
            "unique words only here now",
        ],
    )
    rows = {r["doc_id"]: r for r in boilerplate_fraction(d, n=3, min_df=2).collect()}
    # docs 0-2: 4 distinct grams each, exactly 1 common ("the same footer")
    for i in range(3):
        assert rows[i]["n_grams"] == 4 and rows[i]["n_common"] == 1
        assert rows[i]["boilerplate_ratio"] == pytest.approx(0.25)
    assert rows[3]["n_common"] == 0 and rows[3]["boilerplate_ratio"] == 0.0


def test_quantile_band_filter_discrete_semantics(spark):
    # values 1..10, one row each: ceil(.25*10)=3 -> lo=3; ceil(.75*10)=8 -> hi=8
    d = spark.createDataFrame([(i, i) for i in range(1, 11)], "doc_id long, v long")
    kept = sorted(r["v"] for r in quantile_band_filter(d, "v", 0.25, 0.75).collect())
    assert kept == [3, 4, 5, 6, 7, 8]


def test_quantile_band_filter_rejects_bad_range(spark):
    d = spark.createDataFrame([(1, 1)], "doc_id long, v long")
    with pytest.raises(ValueError):
        quantile_band_filter(d, "v", 0.9, 0.1)
