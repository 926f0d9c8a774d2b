"""pLSA EM: bit-exact trajectory vs a plain-python reference with the
same integer-lattice arithmetic, parallelism invariance, likelihood
improvement, and argument guards."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from flow_indexer_spark.operators.plsa import doc_term_counts, plsa_em

DP = 9
G = 10**DP


def _h(prefix: str, key, z: int) -> int:
    md = hashlib.md5(f"{prefix}:{key}:{z}".encode()).hexdigest()
    return int(md[:8], 16) % 1000 + 1


def _units(a: int, b: int) -> int:
    """Exact half-up a/b on the integer lattice: (2a + b) // (2b)."""
    return (2 * a + b) // (2 * b)


def _ref_plsa(nd: dict[tuple, int], k: int, t: int):
    """Plain-python mirror of plsa_em's exact arithmetic."""
    docs = sorted({d for d, _ in nd})
    vocab = sorted({w for _, w in nd})
    th = {}
    for d in docs:
        raws = [_h("d", d, z) for z in range(1, k + 1)]
        s = sum(raws)
        th[d] = [_units(r * G, s) / G for r in raws]
    vr = {w: [_h("w", w, z) for z in range(1, k + 1)] for w in vocab}
    vs = [sum(vr[w][i] for w in vocab) for i in range(k)]
    ph = {w: [_units(vr[w][i] * G, vs[i]) / G for i in range(k)] for w in vocab}
    for _ in range(t):
        R = {}
        for (d, w), n in nd.items():
            nums = [th[d][i] * ph[w][i] for i in range(k)]
            denom = nums[0]
            for x in nums[1:]:
                denom = denom + x
            R[(d, w)] = [math.floor(nums[i] / denom * G + 0.5) for i in range(k)]
        ts, ns = defaultdict(lambda: [0] * k), Counter()
        ws, wd = defaultdict(lambda: [0] * k), [0] * k
        for (d, w), n in nd.items():
            for i in range(k):
                ts[d][i] += n * R[(d, w)][i]
                ws[w][i] += n * R[(d, w)][i]
                wd[i] += n * R[(d, w)][i]
            ns[d] += n
        th = {d: [_units(ts[d][i], ns[d]) / G for i in range(k)] for d in docs}
        ph = {w: [_units(ws[w][i] * G, wd[i]) / G for i in range(k)]
              for w in vocab}
    return th, ph


FIXTURE = [
    (0, "spark shuffle join spark agg"),
    (1, "cat dog cat bird dog"),
    (2, "spark join filter scan"),
    (3, "dog bird cat cat"),
    (4, "scan filter agg spark spark"),
    (5, "bird dog bird"),
]


def _fit(spark, n_iter=2, repartition=None):
    df = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    nd = doc_term_counts(df, "doc_id", "text")
    if repartition:
        nd = nd.repartition(repartition)
    th, ph = plsa_em(nd, k=3, n_iter=n_iter, dp=DP)
    th_m = {r["doc"]: [r["th1"], r["th2"], r["th3"]] for r in th.collect()}
    ph_m = {r["token"]: [r["ph1"], r["ph2"], r["ph3"]] for r in ph.collect()}
    return th_m, ph_m


def test_trajectory_matches_python_reference_exactly(spark):
    nd = Counter()
    for d, text in FIXTURE:
        for w in text.split():
            nd[(d, w)] += 1
    ref_th, ref_ph = _ref_plsa(dict(nd), 3, 2)
    got_th, got_ph = _fit(spark)
    assert got_th == ref_th
    assert got_ph == ref_ph


def test_parallelism_invariance(spark):
    a = _fit(spark, repartition=1)
    b = _fit(spark, repartition=7)
    assert a == b


def test_distributions_normalize_and_likelihood_improves(spark):
    th1, ph1 = _fit(spark, n_iter=1)
    th3, ph3 = _fit(spark, n_iter=3)
    for v in th3.values():
        assert abs(sum(v) - 1.0) < 2e-9  # lattice-exact up to rounding
    for i in range(3):
        assert abs(sum(v[i] for v in ph3.values()) - 1.0) < 5e-8

    def ll(th, ph):
        out = 0.0
        for d, text in FIXTURE:
            for w in text.split():
                out += math.log(
                    sum(th[d][i] * ph[w][i] for i in range(3))
                )
        return out

    assert ll(th3, ph3) >= ll(th1, ph1) - 1e-9  # EM monotone (to rounding)


def test_argument_guards(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    nd = doc_term_counts(df, "doc_id", "text")
    with pytest.raises(ValueError):
        plsa_em(nd, k=1)
    with pytest.raises(ValueError):
        plsa_em(nd, n_iter=0)
