"""PSI distribution drift: differential vs a straight Python replay,
determinism, constant-column edge, and drift-flag behavior on a group
that is genuinely shifted."""

from __future__ import annotations

import math
import random

import pytest

from flow_indexer_spark.operators.diagnostics import distribution_drift


def _python_psi(rows, n_bins=8):
    vals = [v for _, v in rows]
    lo, hi = min(vals), max(vals)
    span = hi - lo

    def bin_of(v):
        if span == 0:
            return 0
        return min(max(int((v - lo) / span * n_bins), 0), n_bins - 1)

    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    tot = Counter()
    for g, v in rows:
        b = bin_of(v)
        per[g][b] += 1
        tot[b] += 1
    N = len(rows)
    out = {}
    for g, c in per.items():
        ng = sum(c.values())
        psi = 0.0
        for b in range(n_bins):
            pg = (c[b] + 0.5) / (ng + n_bins / 2)
            pr = (tot[b] - c[b] + 0.5) / (N - ng + n_bins / 2)
            psi += (pg - pr) * math.log(pg / pr)
        floor = (n_bins - 1) * (1 / ng + 1 / (N - ng)) if N > ng else float("inf")
        out[g] = (ng, psi, floor)
    return out


def test_drift_matches_python_replay(spark):
    random.seed(3)
    rows = [(f"s{i % 20}", random.gauss(50, 10)) for i in range(2000)]
    # s4 is shifted hard: replace its values with a different regime
    rows = [(g, v + 40 if g == "s17" else v) for g, v in rows]
    df = spark.createDataFrame(rows, "source string, value double")
    got = {
        r.source: (r.n_rows, r.psi, r.drifted)
        for r in distribution_drift(df, "value", "source").collect()
    }
    exp = _python_psi(rows)
    assert set(got) == set(exp)
    for g, (ng, psi, floor) in exp.items():
        assert got[g][0] == ng
        assert got[g][1] == pytest.approx(psi, rel=1e-12)
    assert got["s17"][2] is True          # the shifted group is flagged
    assert sum(1 for v in got.values() if v[2]) == 1  # and only it


def test_drift_deterministic_rerun(spark):
    random.seed(9)
    rows = [(f"s{i % 3}", random.random() * 100) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, value double")
    a = sorted(map(tuple, distribution_drift(df, "value", "source").collect()))
    b = sorted(map(tuple, distribution_drift(df, "value", "source").collect()))
    assert a == b  # bit-stable, ordered in-row fold


def test_drift_constant_column(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], "source string, value double"
    )
    out = {r.source: r for r in distribution_drift(df, "value", "source").collect()}
    # all mass in bin 0 for everyone: tiny PSI from group-size smoothing
    for r in out.values():
        assert not r.drifted
        assert abs(r.psi) < 0.25


def test_drift_rejects_bad_bins(spark):
    df = spark.createDataFrame([("a", 1.0)], "source string, value double")
    with pytest.raises(ValueError):
        distribution_drift(df, "value", "source", n_bins=1)


def test_drift_noise_floor_protects_small_groups(spark):
    """25-row groups produce PSI ~0.3 from sampling noise alone; the
    chi-square noise floor must keep them un-flagged, while a genuinely
    shifted group of the same size still clears threshold + 2*floor."""
    import random

    random.seed(11)
    rows = [(f"s{i % 20}", random.gauss(50, 10)) for i in range(500)]
    rows = [(g, v + 60 if g == "s3" else v) for g, v in rows]
    df = spark.createDataFrame(rows, "source string, value double")
    out = {r.source: r for r in distribution_drift(df, "value", "source").collect()}
    assert all(r.n_rows == 25 for r in out.values())
    flagged = {g for g, r in out.items() if r.drifted}
    assert flagged == {"s3"}
    for r in out.values():
        assert r.noise_floor == pytest.approx(7 * (1 / 25 + 1 / 475), rel=1e-12)
