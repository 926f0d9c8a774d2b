"""Triangle census + CUSUM: planted graphs with known counts, and the
prefix-identity CUSUM against the naive sequential recursion."""

from __future__ import annotations

import datetime as dt

from flow_indexer_spark.operators.graph import triangle_census
from flow_indexer_spark.operators.telemetry import cusum_changepoints


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "u bigint, v bigint"
    )


def test_k4_every_node_in_three_triangles(spark):
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    rows = {r.node: r for r in triangle_census(k4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert (r.degree, r.n_triangles, r.clustering) == (3, 3, 1.0)


def test_path_and_star_have_no_triangles(spark):
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    for r in triangle_census(path).collect():
        assert r.n_triangles == 0 and r.clustering == 0.0
    star = _edges(spark, [(0, i) for i in range(1, 6)])
    rows = {r.node: r for r in triangle_census(star).collect()}
    assert rows[0].degree == 5 and rows[0].n_triangles == 0
    assert rows[0].clustering == 0.0  # deg>=2 but open wedges only


def test_triangle_attached_to_hub(spark):
    # hub 0 with leaves 1..5 plus one triangle (0,1,2): orientation must
    # still find it exactly once even though 0 is the high-degree vertex
    g = _edges(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    rows = {r.node: r.n_triangles for r in triangle_census(g).collect()}
    assert rows == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def _naive_cusum(xs, k):
    mean = sum(xs) / len(xs)
    var = sum(x * x for x in xs) / len(xs) - mean * mean
    std = var**0.5
    s_hi = s_lo = 0.0
    out = []
    for x in xs:
        z = (x - mean) / std if std > 0 else 0.0
        s_hi = max(0.0, s_hi + (z - k))
        s_lo = max(0.0, s_lo + (-z - k))
        out.append((round(s_hi, 6), round(s_lo, 6)))
    return out


def test_prefix_identity_matches_naive_recursion(spark):
    xs = [10, 11, 9, 10, 10, 30, 31, 29, 30, 2, 1, 2]
    rows = spark.createDataFrame(
        [("g", dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
         for i, x in enumerate(xs)],
        "g string, day date, n bigint",
    )
    got = [
        (round(r.cusum_hi, 6), round(r.cusum_lo, 6))
        for r in cusum_changepoints(rows, ["g"], "day", "n")
        .orderBy("day")
        .collect()
    ]
    assert got == _naive_cusum(xs, 0.5)


def test_alarm_fires_after_shift_not_before(spark):
    # 12 baseline days then a 4-day level shift: standardization uses
    # the whole series, so the baseline must dominate for z to separate
    xs = [10] * 12 + [40] * 4
    rows = spark.createDataFrame(
        [("g", dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
         for i, x in enumerate(xs)],
        "g string, day date, n bigint",
    )
    got = [
        r.alarm
        for r in cusum_changepoints(rows, ["g"], "day", "n")
        .orderBy("day")
        .collect()
    ]
    assert not any(got[:12])
    assert any(got[12:])


def test_constant_series_never_alarms(spark):
    rows = spark.createDataFrame(
        [("g", dt.date(2024, 1, 1) + dt.timedelta(days=i), 7)
         for i in range(10)],
        "g string, day date, n bigint",
    )
    out = cusum_changepoints(rows, ["g"], "day", "n").collect()
    assert all(not r.alarm and r.cusum_hi == 0.0 and r.cusum_lo == 0.0
               for r in out)
