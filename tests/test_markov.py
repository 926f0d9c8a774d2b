"""markov.py + diagnostics.benford_report: hand-computed chains,
dangling mass conservation, Benford terms."""

from __future__ import annotations

import math

import pytest

from flow_indexer_spark.operators.diagnostics import benford_report
from flow_indexer_spark.operators.markov import (
    initial_distribution,
    k_step_distribution,
    transition_matrix,
)


def _seqs(spark):
    # seq 1: A B A B ; seq 2: A C   (C is dangling — never a source)
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
        (2, 1, "A"), (2, 2, "C"),
    ]
    return spark.createDataFrame(rows, "s bigint, o int, st string")


def test_transition_matrix_hand(spark):
    t = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in transition_matrix(_seqs(spark), "s", "o", "st").collect()
    }
    assert t[("A", "B")] == (2, round(2 / 3, 9))
    assert t[("A", "C")] == (1, round(1 / 3, 9))
    assert t[("B", "A")] == (1, 1.0)
    assert len(t) == 3


def test_initial_distribution(spark):
    d = {
        r["state"]: (r["n"], r["prob"])
        for r in initial_distribution(_seqs(spark), "s", "o", "st").collect()
    }
    assert d == {"A": (2, 1.0)}


def test_kstep_trajectory_and_dangling_selfloop(spark):
    df = _seqs(spark)
    trans = transition_matrix(df, "s", "o", "st")
    init = initial_distribution(df, "s", "o", "st")

    d1 = {r["state"]: r["prob"] for r in k_step_distribution(trans, init, 1).collect()}
    assert d1 == {"B": round(2 / 3, 9), "C": round(1 / 3, 9)}

    # step 2: B's mass moves to A; dangling C keeps its mass
    d2 = {r["state"]: r["prob"] for r in k_step_distribution(trans, init, 2).collect()}
    assert d2 == {"A": round(2 / 3, 9), "C": round(1 / 3, 9)}

    # mass conserved through k=3 (rounding grain only)
    d3 = k_step_distribution(trans, init, 3).collect()
    assert abs(sum(r["prob"] for r in d3) - 1.0) < 5e-9


def test_kstep_zero_is_init(spark):
    df = _seqs(spark)
    trans = transition_matrix(df, "s", "o", "st")
    init = initial_distribution(df, "s", "o", "st")
    d0 = {r["state"]: r["prob"] for r in k_step_distribution(trans, init, 0).collect()}
    assert d0 == {"A": 1.0}
    with pytest.raises(ValueError, match="k must be"):
        k_step_distribution(trans, init, -1)


def test_benford_hand_computed(spark):
    df = spark.createDataFrame(
        [(1,), (19,), (25,), (999,), (0,), (-5,)], "v bigint"
    )
    rows = {r["digit"]: r for r in benford_report(df, "v").collect()}
    assert set(rows) == {1, 2, 9}
    r1 = rows[1]
    assert r1["n_obs"] == 2 and r1["frac_obs"] == 0.5
    p1 = math.log10(2)
    assert r1["p_benford"] == round(p1, 9)
    assert r1["n_expected"] == round(4 * p1, 9)
    assert r1["chi2_term"] == round((2 - 4 * p1) ** 2 / (4 * p1), 9)
    assert rows[9]["n_obs"] == 1
