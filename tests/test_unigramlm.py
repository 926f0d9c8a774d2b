"""Unigram-LM tokenizer (operators/unigramlm.py): seed vocabulary,
in-row Viterbi lattice segmentation, and hard-EM refinement, each
validated against a plain-python brute-force twin (exhaustive
enumeration of ALL segmentations for the Viterbi check — the DP must
match the argmin of the full search, not just be internally
consistent). Plus UNK fallback, tie-break determinism, and the
word-table idiom (distinct words segmented once)."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import pytest

from flow_indexer_spark.operators.unigramlm import (
    UNK_COST,
    unigram_hard_em,
    unigram_seed_vocab,
    unigram_viterbi_segment,
)

TRAIN = [
    (0, "banana band anna"),
    (1, "banana nana band"),
    (2, "an ban nab anna"),
    (3, "banana banana bandana"),
]
SCORE = [
    (100, "banana"),
    (101, "bandana anna"),
    (102, "xyzzy"),  # chars x/y/z unseen -> UNK fallback
    (103, "nabanna ban"),
    (104, ""),  # no tokens -> dropped
]
L, MIN_C, SEED = 3, 2, 12


def _words(rows):
    c = Counter()
    for _, t in rows:
        c.update(w for w in t.split() if w)
    return c


def _seed_expected():
    wc = _words(TRAIN)
    pieces = Counter()
    for w, c in wc.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + L) + 1):
                pieces[w[i:j]] += c
    kept = {
        p: c for p, c in pieces.items() if c >= MIN_C or len(p) == 1
    }
    top = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))[:SEED]
    vocab = dict(top)
    for p, c in kept.items():
        if len(p) == 1:
            vocab[p] = c
    total = sum(vocab.values())
    return {
        p: (c, round(-math.log(c / total), 12)) for p, c in vocab.items()
    }


def _all_segmentations(word):
    n = len(word)
    for k in range(n):  # k split points among n-1 gaps
        for cuts in combinations(range(1, n), k):
            bounds = (0, *cuts, n)
            yield [word[a:b] for a, b in zip(bounds, bounds[1:])]


def _viterbi_expected(word, costs):
    best = None
    for seg in _all_segmentations(word):
        if any(len(p) > L for p in seg):
            continue
        tot = 0.0
        ok = True
        for p in seg:
            if p in costs:
                tot += costs[p]
            elif len(p) == 1:
                tot += UNK_COST
            else:
                ok = False
                break
        if ok:
            cand = (tot, " ".join(seg))
            if best is None or cand < best:
                best = cand
    return best


@pytest.fixture(scope="module")
def dfs(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id int, text string")
    return mk(TRAIN), mk(SCORE)


@pytest.fixture(scope="module")
def vocab(dfs):
    return unigram_seed_vocab(
        dfs[0], max_piece_len=L, min_count=MIN_C, seed_size=SEED
    )


def test_seed_vocab_matches_bruteforce(vocab):
    got = {r.piece: (r.piece_count, r.cost) for r in vocab.collect()}
    assert got == _seed_expected()
    with pytest.raises(ValueError):
        unigram_seed_vocab(None, max_piece_len=0)


def test_viterbi_matches_exhaustive_search(dfs, vocab):
    """The in-row DP must equal the argmin over ALL (<= 2^(n-1))
    segmentations, including the (cost, segmentation-string) tie-break
    and the single-char UNK fallback."""
    costs = {r.piece: r.cost for r in vocab.collect()}
    out = {
        r.doc_id: r
        for r in unigram_viterbi_segment(
            dfs[1], vocab, max_piece_len=L
        ).collect()
    }
    assert set(out) == {100, 101, 102, 103}  # 104 has no tokens
    for i, t in SCORE:
        if not t:
            continue
        words = t.split()
        exp_pieces, exp_cost = [], 0.0
        for w in words:
            c, seg = _viterbi_expected(w, costs)
            exp_pieces.append(seg)
            exp_cost += c
        r = out[i]
        assert r.pieces_text == " ".join(exp_pieces), i
        assert r.n_words == len(words)
        assert r.n_pieces == sum(len(p.split()) for p in exp_pieces)
        assert r.total_cost == pytest.approx(exp_cost, abs=1e-6)


def test_unk_chars_cost_unk(dfs, vocab):
    out = {
        r.doc_id: r
        for r in unigram_viterbi_segment(
            dfs[1], vocab, max_piece_len=L
        ).collect()
    }
    # "xyzzy": x, y, z unseen -> five single-char UNK pieces
    assert out[102].n_pieces == 5
    assert out[102].total_cost >= 5 * UNK_COST


def test_hard_em_matches_bruteforce(dfs, vocab):
    """One hard-EM round: recount pieces along each word's Viterbi path
    weighted by word frequency, renormalize. Brute-force twin runs the
    exhaustive-search Viterbi."""
    costs = {r.piece: r.cost for r in vocab.collect()}
    wc = _words(TRAIN)
    counts = Counter()
    for w, c in wc.items():
        _, seg = _viterbi_expected(w, costs)
        for p in seg.split():
            counts[p] += c
    total = sum(counts.values())
    exp = {
        p: (c, round(-math.log(c / total), 12)) for p, c in counts.items()
    }
    got = {
        r.piece: (r.piece_count, r.cost)
        for r in unigram_hard_em(
            dfs[0],
            max_piece_len=L,
            min_count=MIN_C,
            seed_size=SEED,
            iterations=1,
        ).collect()
    }
    assert got == exp
    # EM prunes: the surviving vocab is a strict subset of the seed
    assert set(got) < set(costs)
    with pytest.raises(ValueError):
        unigram_hard_em(dfs[0], iterations=-1)


def test_zero_iterations_is_seed(dfs, vocab):
    a = sorted(map(tuple, vocab.collect()))
    b = sorted(
        map(
            tuple,
            unigram_hard_em(
                dfs[0],
                max_piece_len=L,
                min_count=MIN_C,
                seed_size=SEED,
                iterations=0,
            ).collect(),
        )
    )
    assert a == b
