"""BPE differential tests: the DataFrame merge-training loop and the
nested-fold segmentation must agree with a plain-python BPE twin
(identical overlap counting, tie-breaks, and greedy left-to-right merge
application); the sf0.01 oracle twins run in test_entry_contract.py."""

from __future__ import annotations

from collections import Counter

import pytest

from flow_indexer_spark.operators.tokenize import bpe_segment, bpe_train

TEXTS = [
    "scan scan scanner table tablet",
    "scan the table the scanner",
    "a a a a banana bandana",
]


def _py_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(texts, n_merges):
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wc}
    rules = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((best[0][0], best[0][1], best[1]))
        words = {w: _py_merge(s, *best[0]) for w, s in words.items()}
    return rules, words


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_bpe_train_matches_python_twin(corpus):
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(corpus, 8).orderBy("merge_rank").collect()
    ]
    want, _ = _py_bpe(TEXTS, 8)
    assert got == want


def test_bpe_segment_matches_incremental_merges(corpus):
    """The nested-fold rule application must reproduce the training
    loop's incrementally merged word table — two different algorithms,
    same segmentation — and be lossless (pieces concat back to the
    word)."""
    rules = bpe_train(corpus, 8)
    got = {r["word"]: list(r["pieces"]) for r in bpe_segment(corpus, rules).collect()}
    _, words = _py_bpe(TEXTS, 8)
    assert got == words
    for w, pieces in got.items():
        assert "".join(pieces) == w


def test_bpe_stops_early_and_validates(spark, corpus):
    single = spark.createDataFrame([("a b c",)], "text string")
    # single-char words -> no adjacent pairs at all
    with pytest.raises(ValueError):
        bpe_train(single, 3)
    with pytest.raises(ValueError):
        bpe_train(corpus, 0)
    # more merges requested than exist -> stops when pairs run dry
    tiny = spark.createDataFrame([("ab ab",)], "text string")
    rules = bpe_train(tiny, 50).collect()
    assert len(rules) == 1  # (a,b) then 'ab' is a single symbol: done
