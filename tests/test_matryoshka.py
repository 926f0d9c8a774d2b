"""matryoshka_fidelity: numpy mirror, zero-prefix exclusion, guards."""

from __future__ import annotations

import math

import pytest

from flow_indexer_spark.operators.similarity import matryoshka_fidelity

PAIRS = [
    (1, [1.0, 0.0, 2.0, -1.0, 0.5, 3.0], [0.5, 1.0, 2.0, -1.0, 0.25, 2.0]),
    (2, [2.0, 2.0, 0.0, 0.0, 1.0, -1.0], [2.0, -2.0, 0.0, 0.0, 1.0, 1.0]),
    # zero 2-prefix on one side: excluded at d=2, included at full
    (3, [0.0, 0.0, 1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
]


def _cos(a, b, d):
    a, b = a[:d], b[:d]
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def test_matches_numpy_mirror(spark):
    df = spark.createDataFrame(
        PAIRS, "pair bigint, va array<float>, vb array<float>"
    )
    got = {
        r["dim"]: r
        for r in matryoshka_fidelity(df, "va", "vb", dims=(2, 4)).collect()
    }
    # d=2: pair 3 excluded (zero prefix norm)
    errs2 = [
        round(abs(_cos(a, b, 2) - _cos(a, b, 6)) * 1e9)
        for _, a, b in PAIRS[:2]
    ]
    assert got[2]["n_pairs"] == 2
    assert got[2]["mae"] == round(sum(errs2) / (2 * 1e9), 9)
    assert got[2]["max_abs_err"] == round(max(errs2) / 1e9, 9)
    errs4 = [
        round(abs(_cos(a, b, 4) - _cos(a, b, 6)) * 1e9) for _, a, b in PAIRS
    ]
    assert got[4]["n_pairs"] == 3
    assert got[4]["max_abs_err"] == round(max(errs4) / 1e9, 9)
    with pytest.raises(ValueError):
        matryoshka_fidelity(df, "va", "vb", dims=())
