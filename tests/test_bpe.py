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


def test_accept_merge_batch_rules():
    """Driver-side batch acceptance: the first conflicting pair's count
    bounds every merge-created pair, so only strictly-above-the-bound
    disjoint prefixes are safe; full-horizon reads treat the unseen tail
    as a conflict; ties at the bound fall back to the single round-1
    winner."""
    from pyspark.sql import Row

    from flow_indexer_spark.operators.tokenize import _accept_merge_batch

    def r(l, rt, c):
        return Row(left_sym=l, right_sym=rt, pair_count=c)

    def pairs(acc):
        return [(x.left_sym, x.right_sym) for x in acc]

    # conflict at 90 bounds created pairs: only counts > 90 are safe
    top = [r("a", "b", 100), r("b", "c", 90), r("d", "e", 80)]
    assert pairs(_accept_merge_batch(top, 64, 10)) == [("a", "b")]
    # disjoint pairs above the bound batch together
    top = [r("a", "b", 100), r("d", "e", 95), r("b", "c", 90)]
    assert pairs(_accept_merge_batch(top, 64, 10)) == [("a", "b"), ("d", "e")]
    # horizon filled conflict-free: last fetched count is the bound
    top = [r("a", "b", 100), r("d", "e", 95)]
    assert pairs(_accept_merge_batch(top, 2, 10)) == [("a", "b")]
    # whole pair table seen conflict-free: no pair shares a symbol, all safe
    assert pairs(_accept_merge_batch(top, 64, 10)) == [("a", "b"), ("d", "e")]
    # tie at the bound: tie-break unknowable after merges -> round-1 winner only
    top = [r("a", "b", 100), r("b", "c", 100)]
    assert pairs(_accept_merge_batch(top, 64, 10)) == [("a", "b")]
    # budget truncates the accepted prefix
    top = [r("a", "b", 100), r("d", "e", 95), r("f", "g", 90)]
    assert pairs(_accept_merge_batch(top, 64, 2)) == [("a", "b"), ("d", "e")]
    # repeated-symbol pair occupies its symbol once, still conflicts later
    top = [r("a", "a", 100), r("a", "b", 90)]
    assert pairs(_accept_merge_batch(top, 64, 10)) == [("a", "a")]


def test_bpe_batched_merges_match_sequential(spark):
    """merge_horizon=1 degenerates to the one-merge-per-job sequential
    loop; the batched default must produce the bit-identical rule
    trajectory (and match the plain-python twin) on a wide-alphabet
    corpus where rounds genuinely accept multi-merge batches."""
    import random

    rng = random.Random(7)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuv") for _ in range(rng.randint(2, 9)))
        for _ in range(300)
    ]
    texts = [" ".join(rng.choices(vocab, k=12)) for _ in range(60)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    def rules(horizon):
        return [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe_train(df, 24, merge_horizon=horizon)
            .orderBy("merge_rank")
            .collect()
        ]

    batched = rules(64)
    assert batched == rules(1)
    want, _ = _py_bpe(texts, 24)
    assert [(l, rt, c) for _, l, rt, c in batched] == want


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
