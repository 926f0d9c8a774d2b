"""isotonic_calibration: minimax fit vs a brute-force sequential PAV."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.evalmetrics import isotonic_calibration


def _pav_bins(ns, ps):
    """Per-bin fit from the classic sequential pool-adjacent-violators
    (merge while the previous block's rate exceeds the next's; exact
    integer cross-multiplication comparisons)."""
    stack = []
    for n, p in zip(ns, ps):
        stack.append([n, p, 1])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):
            n2, p2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            stack[-1][2] += c2
    vals = []
    for n, p, c in stack:
        vals += [p / n] * c
    return vals


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minimax_equals_sequential_pav(spark, seed):
    import random

    rng = random.Random(seed)
    rows = []
    for _ in range(400):
        s = rng.randrange(64)
        # non-monotone label probability across the score axis forces
        # real pooling
        p = [0.2, 0.7, 0.3, 0.9][s // 16]
        rows.append((1 if rng.random() < p else 0, s))
    df = spark.createDataFrame(rows, "label int, s64 int")
    got = {
        r["bin"]: r
        for r in isotonic_calibration(df, "label", "s64", n_bins=8).collect()
    }
    present = sorted(got)
    ns = [got[b]["n"] for b in present]
    ps = [got[b]["n_pos"] for b in present]
    ref = _pav_bins(ns, ps)
    for b, r in zip(present, ref):
        assert abs(got[b]["iso_rate"] - round(r, 9)) < 2e-9, (b, seed)
    vals = [got[b]["iso_rate"] for b in present]
    assert vals == sorted(vals)  # monotone non-decreasing
    with pytest.raises(ValueError):
        isotonic_calibration(df, "label", "s64", n_bins=0)
