"""Bradley-Terry MM ranking: ratings order by true strength on a planted
duel log, sum to 1, the deterministic and plain-sum folds agree, and
smoothing keeps a never-winning item positive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.btrank import (
    bt_oracle_sql,
    bt_pair_counts,
    bt_ratings,
)


def _duels(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


@pytest.fixture(scope="module")
def planted(spark):
    # a > b > c by construction: a beats b 8/10, b beats c 8/10,
    # a beats c 9/10 (counts, not samples — fully deterministic)
    rows = (
        [("a", "b")] * 8 + [("b", "a")] * 2
        + [("b", "c")] * 8 + [("c", "b")] * 2
        + [("a", "c")] * 9 + [("c", "a")] * 1
    )
    return _duels(spark, rows)


def test_pair_counts(spark, planted):
    got = {
        (r.item_a, r.item_b): (r.n_duels, r.wins_a)
        for r in bt_pair_counts(planted).collect()
    }
    assert got == {("a", "b"): (10, 8), ("b", "c"): (10, 8), ("a", "c"): (10, 9)}


def test_ratings_order_and_normalization(spark, planted):
    r = {x.item: x.rating for x in bt_ratings(bt_pair_counts(planted)).collect()}
    assert r["a"] > r["b"] > r["c"] > 0
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_deterministic_vs_plain_sum_agree(spark, planted):
    pc = bt_pair_counts(planted)
    det = {x.item: x.rating for x in bt_ratings(pc, deterministic=True).collect()}
    pln = {x.item: x.rating for x in bt_ratings(pc, deterministic=False).collect()}
    assert det.keys() == pln.keys()
    for k in det:
        assert det[k] == pytest.approx(pln[k], rel=1e-9)


def test_never_winner_stays_positive(spark):
    d = _duels(spark, [("a", "z")] * 5 + [("b", "z")] * 5 + [("a", "b"), ("b", "a")])
    r = {x.item: x.rating for x in bt_ratings(bt_pair_counts(d)).collect()}
    assert r["z"] > 0
    assert r["z"] < r["a"] and r["z"] < r["b"]


def test_guards(spark):
    pc = bt_pair_counts(_duels(spark, [("a", "b")]))
    with pytest.raises(ValueError):
        bt_ratings(pc, n_iter=0)
    with pytest.raises(ValueError):
        bt_ratings(bt_pair_counts(_duels(spark, [])))


def test_oracle_sql_matches_spark(spark, planted):
    """The unrolled-SQL oracle and the DataFrame iteration produce the
    identical double trajectory (the cross-engine contract the driver
    gate relies on)."""
    import duckdb

    pdf = planted.toPandas()  # noqa: F841 — registered by name below
    con = duckdb.connect()
    con.register("duel_rows", pdf)
    sql = bt_oracle_sql("SELECT winner, loser FROM duel_rows") + (
        " SELECT item, rating FROM fin ORDER BY item"
    )
    oracle = {item: rating for item, rating in con.execute(sql).fetchall()}
    got = {
        x.item: x.rating
        for x in bt_ratings(bt_pair_counts(planted)).orderBy("item").collect()
    }
    assert got == oracle
