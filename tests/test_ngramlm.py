"""Distributed n-gram LMs (operators/ngramlm.py): Stupid Backoff
trigram scoring and interpolated Kneser-Ney bigram perplexity, each
validated against a plain-python brute-force twin on a fixture built
to hit every backoff tier (seen trigram / seen bigram / seen unigram /
OOV; seen and unseen KN contexts). Plus the closed-form KN property:
P(.|w1) sums to exactly 1 over the seen-type vocabulary for every seen
context — the discount mass redistribution is exact, not approximate."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from flow_indexer_spark.operators.ngramlm import (
    grams,
    kneser_ney_scores,
    stupid_backoff_scores,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "a dog sat on a log"),
    (3, "the dog ate a bone"),
    (4, "fish swim in the sea"),
    (5, "the the the"),  # repeated token: c2 > 1 on one key
]
SCORE = [
    (100, "the cat sat on the mat"),        # all trigrams seen
    (101, "the cat sat quietly today"),     # backoff: bigram then unigram
    (102, "zebras paint turquoise xylophones"),  # full OOV floor
    (103, "a dog ate the fish"),            # mix of tiers
    (104, "on a"),                          # 2 tokens: bigram-only (KN), no trigram
    (105, "one"),                           # 1 token: excluded everywhere
]


def _toks(rows):
    return {i: t.split() for i, t in rows}


def _counts(rows):
    c1, c2, c3 = Counter(), Counter(), Counter()
    for _, t in rows:
        w = t.split()
        c1.update(w)
        c2.update(zip(w, w[1:]))
        c3.update(zip(w, w[1:], w[2:]))
    return c1, c2, c3


def _sb_expected(lam=0.4):
    c1, c2, c3 = _counts(TRAIN)
    n = sum(c1.values())
    out = {}
    for i, t in SCORE:
        w = t.split()
        if len(w) < 3:
            continue
        logs = []
        for g in zip(w, w[1:], w[2:]):
            if g in c3:
                s = c3[g] / c2[(g[0], g[1])]
            elif (g[1], g[2]) in c2:
                s = lam * c2[(g[1], g[2])] / c1[g[1]]
            else:
                s = lam * lam * c1.get(g[2], 1) / n
            logs.append(math.log(s))
        out[i] = (len(logs), sum(logs) / len(logs))
    return out


def _kn_expected(d=0.75):
    _, c2, _ = _counts(TRAIN)
    ctot, nfwd, nback = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        ctot[w1] += c
        nfwd[w1] += 1
        nback[w2] += 1
    ntypes = len(c2)
    out = {}
    for i, t in SCORE:
        w = t.split()
        if len(w) < 2:
            continue
        lps = []
        for g in zip(w, w[1:]):
            pc = nback.get(g[1], d) / ntypes
            if g[0] in ctot:
                p = (
                    max(c2.get(g, 0) - d, 0.0) / ctot[g[0]]
                    + d * nfwd[g[0]] / ctot[g[0]] * pc
                )
            else:
                p = pc
            lps.append(math.log(p))
        out[i] = (len(lps), sum(lps) / len(lps))
    return out


@pytest.fixture(scope="module")
def dfs(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id int, text string")
    return mk(TRAIN), mk(SCORE)


def test_grams_explode(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x"), (3, "")],
                               "doc_id int, text string")
    rows = {
        n: sorted(
            tuple(r) for r in grams(df, n, "text", "doc_id").collect()
        )
        for n in (1, 2, 3)
    }
    assert rows[1] == [(1, "a"), (1, "b"), (1, "c"), (2, "x")]
    assert rows[2] == [(1, "a", "b"), (1, "b", "c")]
    assert rows[3] == [(1, "a", "b", "c")]
    with pytest.raises(ValueError):
        grams(df, 0)


def test_stupid_backoff_matches_bruteforce(dfs):
    train, score = dfs
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logs, r.backoff_ppl)
        for r in stupid_backoff_scores(train, score).collect()
    }
    exp = _sb_expected()
    assert set(got) == set(exp)  # 104/105 excluded (< 3 tokens)
    for i, (n, avg) in exp.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(avg, abs=1e-12)
        assert got[i][2] == pytest.approx(math.exp(-avg), rel=1e-12)
    # tier sanity: the all-seen doc scores best, full-OOV worst
    assert got[100][1] > got[103][1] > got[102][1]


def test_stupid_backoff_model_path_roundtrip(dfs, tmp_path):
    train, score = dfs
    a = {
        r.doc_id: r.avg_logs
        for r in stupid_backoff_scores(train, score).collect()
    }
    b = {
        r.doc_id: r.avg_logs
        for r in stupid_backoff_scores(
            train, score, model_path=str(tmp_path / "m")
        ).collect()
    }
    assert a == b


def test_kneser_ney_matches_bruteforce(dfs):
    train, score = dfs
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp, r.ppl)
        for r in kneser_ney_scores(train, score).collect()
    }
    exp = _kn_expected()
    assert set(got) == set(exp)  # only 105 excluded (< 2 tokens)
    for i, (n, avg) in exp.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(avg, abs=1e-12)
        assert got[i][2] == pytest.approx(math.exp(-avg), rel=1e-12)
    assert got[100][1] > got[102][1]
    with pytest.raises(ValueError):
        kneser_ney_scores(dfs[0], dfs[1], discount=1.5)


def test_kneser_ney_mass_is_exactly_redistributed():
    """For every seen context w1, summing P(w2|w1) over the seen-type
    vocabulary must give exactly 1: the discount removed from seen
    bigrams re-enters through the continuation term (sum of Pcont over
    seen types is ntypes/ntypes). This is the property that makes KN a
    probability model rather than a heuristic."""
    _, c2, _ = _counts(TRAIN)
    d = 0.75
    ctot, nfwd, nback = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        ctot[w1] += c
        nfwd[w1] += 1
        nback[w2] += 1
    ntypes = len(c2)
    vocab = sorted(nback)
    for w1 in sorted(ctot):
        total = sum(
            max(c2.get((w1, w2), 0) - d, 0.0) / ctot[w1]
            + d * nfwd[w1] / ctot[w1] * (nback[w2] / ntypes)
            for w2 in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-12), w1
