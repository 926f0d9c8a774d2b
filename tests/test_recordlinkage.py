"""Fellegi-Sunter EM linkage: the Spark/driver implementation must match
a hand-rolled numpy-free reference EM, separate matches from non-matches
on a planted fixture, and keep its rounding discipline cross-engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.recordlinkage import (
    _posterior,
    _round_away,
    agreement_pairs,
    fs_em,
    fs_em_oracle_sql,
    fs_link,
    pattern_counts,
)


def test_round_away_matches_sql_semantics():
    assert _round_away(0.5e-9, 9) == 1e-9  # half rounds AWAY, not to even
    assert _round_away(1.5e-9, 9) == 2e-9
    assert _round_away(0.1234567894, 9) == 0.123456789
    assert _round_away(0.1234567895, 9) == 0.12345679
    assert _round_away(-0.5e-9, 9) == -1e-9


def test_fs_em_hand_example():
    # two fields; planted contingency table with obvious structure
    patterns = [((1, 1), 90), ((0, 0), 880), ((1, 0), 10), ((0, 1), 20)]
    p, m, u = fs_em(patterns, 2, n_iter=10)
    # matches = the (1,1) mass: p near 9%, m high for both, u low
    assert 0.05 < p < 0.15
    assert m[0] > 0.8 and m[1] > 0.8
    assert u[0] < 0.1 and u[1] < 0.1


def test_posterior_monotone_in_agreement():
    p, m, u = 0.1, [0.9, 0.9], [0.1, 0.2]
    assert (
        _posterior((1, 1), p, m, u)
        > _posterior((1, 0), p, m, u)
        > _posterior((0, 0), p, m, u)
    )


@pytest.fixture(scope="module")
def planted(spark):
    # 6 true entities duplicated with field corruption + noise records
    a_rows = [(i, i % 3, f"name{i}", f"city{i % 4}") for i in range(30)]
    b_rows = [
        (i + 100, i % 3, f"name{i}" if i % 5 else f"NAME{i}", f"city{i % 4}")
        for i in range(30)
    ]
    a = spark.createDataFrame(a_rows, "id_a long, blk int, name string, city string")
    b = (
        spark.createDataFrame(b_rows, "id_b long, blk int, name_b string, city_b string")
    )
    return a, b


def test_agreement_pairs_and_counts(planted):
    a, b = planted
    pairs = agreement_pairs(
        a,
        b,
        "blk",
        {
            "name": F.col("name") == F.col("name_b"),
            "city": F.col("city") == F.col("city_b"),
        },
    )
    assert pairs.columns == ["id_a", "id_b", "g_name", "g_city"]
    n_pairs = pairs.count()
    assert n_pairs == 300  # 3 blocks x 10 x 10
    counts = pattern_counts(pairs, ["g_name", "g_city"])
    assert counts.agg(F.sum("n")).collect()[0][0] == n_pairs


def test_fs_link_separates_planted_matches(planted):
    a, b = planted
    pairs = agreement_pairs(
        a,
        b,
        "blk",
        {
            "name": F.col("name") == F.col("name_b"),
            "city": F.col("city") == F.col("city_b"),
        },
    )
    report, scored = fs_link(pairs, ["g_name", "g_city"], n_iter=8)
    rep = {
        (r["g_name"], r["g_city"]): r["posterior"] for r in report.collect()
    }
    assert rep[(1, 1)] > 0.9  # full agreement -> link
    assert rep[(0, 0)] < 0.1  # full disagreement -> non-link
    # join-back preserves pair count and every pair got a posterior
    assert scored.count() == pairs.count()
    assert scored.filter(F.col("posterior").isNull()).count() == 0
    # the true duplicate pairs (id_b == id_a + 100, uncorrupted names) link
    true_clean = scored.filter(
        (F.col("id_b") == F.col("id_a") + 100) & (F.col("g_name") == 1)
    )
    assert true_clean.filter(F.col("posterior") > 0.9).count() == true_clean.count()


def test_oracle_sql_matches_python_em(spark):
    # run the unrolled SQL on DuckDB against the same planted pairs and
    # compare the full pattern report with the Python EM bit-for-bit
    import duckdb

    pairs_cte = """
    SELECT a.i AS id_a, b.i AS id_b,
      CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END AS g_nm
    FROM (SELECT unnest(generate_series(0, 19)) AS i,
                 'n' || CAST(unnest(generate_series(0, 19)) % 6 AS VARCHAR) AS nm) a
    CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS i,
                 'n' || CAST(unnest(generate_series(0, 19)) % 6 AS VARCHAR) AS nm) b
    """
    sql = fs_em_oracle_sql(pairs_cte, ["g_nm"], n_iter=4) + (
        " SELECT g_nm, n_pairs, posterior FROM fin ORDER BY g_nm"
    )
    duck = duckdb.connect().execute(sql).fetchall()
    # same pattern table through the python EM
    pat_sql = f"SELECT g_nm, COUNT(*) FROM ({pairs_cte}) GROUP BY g_nm"
    pats = [((int(g),), int(n)) for g, n in duckdb.connect().execute(pat_sql).fetchall()]
    p, m, u = fs_em(pats, 1, n_iter=4)
    py = sorted(
        (g[0], n, _round_away(_posterior(g, p, m, u), 9)) for g, n in pats
    )
    assert [tuple(r) for r in duck] == py
