"""corpus_power_laws: Zipf slope + Heaps exponent vs a numpy
least-squares oracle computed from first principles on a hand corpus."""

from __future__ import annotations

import numpy as np

from flow_indexer_spark.operators.textstats import corpus_power_laws

DOCS = [
    (1, "a a a a b b c"),
    (2, "a b c d d"),
    (3, "c d e a"),
    (4, "f"),
]


def _slope(x, y):
    x, y = np.log(np.asarray(x, float)), np.log(np.asarray(y, float))
    return float(np.cov(x, y, bias=True)[0, 1] / np.var(x))


def test_power_laws_match_numpy(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    row = corpus_power_laws(df).collect()[0]

    # Zipf: freq by word -> rank by (freq desc, word asc)
    from collections import Counter

    freq = Counter(w for _, t in DOCS for w in t.split())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    zipf = _slope([i + 1 for i in range(len(ranked))], [n for _, n in ranked])
    assert row.vocab_size == len(freq) == 6
    assert row.n_tokens == sum(freq.values()) == 17
    assert abs(row.zipf_slope - zipf) < 1e-9

    # Heaps: cumulative (tokens, distinct vocab) per doc in doc_id order
    seen: set[str] = set()
    cum_n = 0
    xs, ys = [], []
    for _, t in DOCS:
        toks = t.split()
        cum_n += len(toks)
        seen |= set(toks)
        xs.append(cum_n)
        ys.append(len(seen))
    assert row.n_points == len(DOCS)
    assert abs(row.heaps_beta - _slope(xs, ys)) < 1e-9
