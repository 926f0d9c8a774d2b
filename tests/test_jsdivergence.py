"""lexical_js_divergence: the algebraic zero-mass fold must equal the
textbook union-vocabulary sum; identity and disjoint bounds."""

from __future__ import annotations

import math
from collections import Counter

from flow_indexer_spark.operators.diagnostics import lexical_js_divergence


def _ref_js(group_texts: dict[str, list[str]]) -> dict[str, float]:
    """Plain-python textbook JS over the UNION vocabulary (no folding)."""
    corpus = Counter()
    per = {}
    for g, texts in group_texts.items():
        c = Counter(t for s in texts for t in s.split() if t)
        per[g] = c
        corpus.update(c)
    n_total = sum(corpus.values())
    out = {}
    for g, c in per.items():
        n_g = sum(c.values())
        js = 0.0
        for t in corpus:
            p = c.get(t, 0) / n_g
            q = corpus[t] / n_total
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            if q > 0:
                js += 0.5 * q * math.log(q / m)
        out[g] = js
    return out


def _run(spark, group_texts):
    rows = [
        (g, txt) for g, texts in group_texts.items() for txt in texts
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    return {
        r["src"]: r
        for r in lexical_js_divergence(df, "src", "text").collect()
    }


def test_matches_textbook_union_sum(spark):
    groups = {
        "a": ["x y z x", "y w"],
        "b": ["x x q", "q r s"],
        "c": ["z z z w"],
    }
    got = _run(spark, groups)
    ref = _ref_js(groups)
    for g in groups:
        assert abs(got[g]["js_divergence"] - ref[g]) < 2e-8, g
    assert got["a"]["n_tokens"] == 6 and got["a"]["n_distinct"] == 4


def test_single_group_is_zero(spark):
    # one group: p == q exactly -> JS = 0
    got = _run(spark, {"only": ["a b c a", "b c"]})
    assert got["only"]["js_divergence"] == 0.0


def test_disjoint_group_approaches_ln2_bound(spark):
    # two groups with disjoint vocabularies, equal sizes: each group's
    # JS vs the 50/50 corpus mix is exactly ln2 - 0.5*ln2 ... compute ref
    groups = {"a": ["p p q q"], "b": ["r r s s"]}
    got = _run(spark, groups)
    ref = _ref_js(groups)
    for g in groups:
        assert abs(got[g]["js_divergence"] - ref[g]) < 2e-8
        assert got[g]["js_divergence"] <= math.log(2) + 1e-12
