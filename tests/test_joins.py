"""As-of and interval join semantics: hand-computed fixtures plus a
seeded-random differential against the obviously-correct brute-force
formulation (theta-join + best-match window) — the dual-implementation
testing pattern the reference uses for its paired backends
(/root/reference/backend/bro_test.go vs bro_json_test.go)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import Window, functions as F

from flow_indexer_spark.operators.joins import asof_join, interval_join

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --- asof hand fixtures -----------------------------------------------------


def test_asof_backward_inclusive_and_unmatched(spark):
    left = _df(
        spark,
        [(1, _ts(0), "early"), (1, _ts(60), "exact"), (2, _ts(60), "other-key")],
        "k long, ts timestamp, tag string",
    )
    right = _df(
        spark,
        [(1, _ts(30), "a"), (1, _ts(60), "b"), (3, _ts(0), "z")],
        "k long, ts timestamp, v string",
    )
    got = {
        r["tag"]: r["r_v"]
        for r in asof_join(left, right, on="k").collect()
    }
    # ts==match ts is inclusive; no right row at/before 00:00; key 2 never matches
    assert got == {"early": None, "exact": "b", "other-key": None}


def test_asof_tolerance_voids_stale_match(spark):
    left = _df(spark, [(1, _ts(100))], "k long, ts timestamp")
    right = _df(spark, [(1, _ts(10), "old")], "k long, ts timestamp, v string")
    near = asof_join(left, right, on="k", tolerance_seconds=91 * 60).collect()
    far = asof_join(left, right, on="k", tolerance_seconds=89 * 60).collect()
    assert near[0]["r_v"] == "old"
    assert far[0]["r_v"] is None and far[0]["r_ts"] is None


def test_asof_forward(spark):
    left = _df(spark, [(1, _ts(0)), (1, _ts(45))], "k long, ts timestamp")
    right = _df(
        spark,
        [(1, _ts(10), "first-after"), (1, _ts(45), "at"), (1, _ts(90), "later")],
        "k long, ts timestamp, v string",
    )
    got = {
        r["ts"]: r["r_v"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert got == {_ts(0): "first-after", _ts(45): "at"}


# --- asof differential vs brute force ---------------------------------------


def _brute_asof(spark, left, right, direction):
    r = right.select(
        F.col("k").alias("rk"), F.col("ts").alias("rts"), F.col("v").alias("rv")
    )
    if direction == "backward":
        cond = (left["k"] == r["rk"]) & (r["rts"] <= left["ts"])
        order = [F.desc("rts")]
    else:
        cond = (left["k"] == r["rk"]) & (r["rts"] >= left["ts"])
        order = [F.asc("rts")]
    j = left.join(r, cond, "left")
    w = Window.partitionBy("k", "ts", "lid").orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("lid", F.col("rts").alias("m_ts"), F.col("rv").alias("m_v"))
    )


def test_asof_matches_brute_force_random(spark):
    rng = random.Random(7)
    left_rows = [
        (rng.randrange(6), _ts(rng.randrange(500)), i) for i in range(120)
    ]
    # right deduped per (k, ts) for determinism, as the docstring requires
    right_pairs = {(rng.randrange(6), rng.randrange(500)) for _ in range(80)}
    right_rows = [(k, _ts(m), f"v{k}_{m}") for k, m in right_pairs]
    left = _df(spark, left_rows, "k long, ts timestamp, lid long")
    right = _df(spark, right_rows, "k long, ts timestamp, v string")

    for direction in ("backward", "forward"):
        fast = {
            r["lid"]: (r["r_ts"], r["r_v"])
            for r in asof_join(left, right, on="k", direction=direction).collect()
        }
        slow = {
            r["lid"]: (r["m_ts"], r["m_v"])
            for r in _brute_asof(spark, left, right, direction).collect()
        }
        assert fast == slow


# --- interval join ----------------------------------------------------------


def test_interval_join_boundaries_and_buckets(spark):
    # 90-min interval spans 3 hour-buckets; [start, end) semantics
    iv = _df(
        spark,
        [(1, "w1", _ts(30), _ts(120))],
        "k long, win string, start timestamp, end timestamp",
    )
    pts = _df(
        spark,
        [
            (1, _ts(29), "before"),
            (1, _ts(30), "at-start"),
            (1, _ts(119), "inside-last-bucket"),
            (1, _ts(120), "at-end"),
            (2, _ts(60), "wrong-key"),
        ],
        "k long, ts timestamp, tag string",
    )
    got = {r["tag"] for r in interval_join(pts, iv, on="k").collect()}
    assert got == {"at-start", "inside-last-bucket"}
    inc = {
        r["tag"]
        for r in interval_join(pts, iv, on="k", inclusive_end=True).collect()
    }
    assert inc == {"at-start", "inside-last-bucket", "at-end"}


def test_interval_join_caps_degenerate_intervals(spark):
    iv = _df(
        spark,
        [(1, "huge", _ts(0), _ts(60 * 24 * 365)), (1, "ok", _ts(0), _ts(60))],
        "k long, win string, start timestamp, end timestamp",
    )
    pts = _df(spark, [(1, _ts(30))], "k long, ts timestamp")
    rows = interval_join(
        pts, iv, on="k", max_buckets_per_interval=24
    ).collect()
    assert [r["win"] for r in rows] == ["ok"]  # year-wide interval dropped


def test_interval_join_matches_brute_force_random(spark):
    rng = random.Random(11)
    pts = _df(
        spark,
        [(rng.randrange(4), _ts(rng.randrange(300)), i) for i in range(100)],
        "k long, ts timestamp, pid long",
    )
    ivs = []
    for i in range(40):
        s = rng.randrange(300)
        ivs.append((rng.randrange(4), _ts(s), _ts(s + rng.randrange(1, 150)), i))
    iv = _df(spark, ivs, "k long, start timestamp, end timestamp, iid long")

    fast = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, on="k", bucket_seconds=600).collect()
    }
    r2 = iv.select(
        F.col("k").alias("ik"), "start", "end", "iid"
    )
    slow = {
        (r["pid"], r["iid"])
        for r in pts.join(
            r2,
            (pts["k"] == r2["ik"]) & (pts["ts"] >= r2["start"]) & (pts["ts"] < r2["end"]),
        ).collect()
    }
    assert fast == slow


# --- salted join ------------------------------------------------------------


def _salted_fixture(spark):
    random.seed(11)
    # one brutally hot key (70% of rows) + a long tail, plus keys that
    # exist on only one side (exercise inner vs left semantics)
    left = [
        (1 if random.random() < 0.7 else random.randint(2, 20),
         i, round(random.random(), 3))
        for i in range(400)
    ] + [(99, 999, 1.0)]  # key with no right match
    right = [(k, f"dim{k}", k * 10) for k in range(0, 15)]
    l = _df(spark, left, "k long, row_id long, v double")
    r = _df(spark, right, "k long, name string, weight long")
    return l, r


def test_salted_join_row_identical_to_plain(spark):
    from flow_indexer_spark.operators.joins import salted_join

    l, r = _salted_fixture(spark)
    for how in ("inner", "left"):
        plain = sorted(map(tuple, l.join(r, "k", how).collect()))
        for n_salt in (1, 3, 8):
            salted = sorted(
                map(tuple, salted_join(l, r, "k", n_salt, how=how).collect())
            )
            assert salted == plain, (how, n_salt)


def test_salted_join_spreads_hot_key(spark):
    """The point of salting: the hot key's rows must occupy n_salt
    distinct salt values (deterministically), not one."""
    from flow_indexer_spark.operators.joins import salted_join

    l, r = _salted_fixture(spark)
    n_salt = 8
    salts = (
        l.filter("k = 1")
        .select(
            F.pmod(F.xxhash64("row_id", "v"), F.lit(n_salt)).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts == n_salt
    # and the salted plan keeps determinism: same result twice
    a = sorted(map(tuple, salted_join(l, r, "k", n_salt, salt_from=["row_id", "v"]).collect()))
    b = sorted(map(tuple, salted_join(l, r, "k", n_salt, salt_from=["row_id", "v"]).collect()))
    assert a == b


def test_salted_join_rejects_bad_args(spark):
    import pytest

    from flow_indexer_spark.operators.joins import salted_join

    l, r = _salted_fixture(spark)
    with pytest.raises(ValueError):
        salted_join(l, r, "k", 0)
    with pytest.raises(ValueError):
        salted_join(l, r, "k", 4, how="full")
    with pytest.raises(ValueError):
        salted_join(l.select("k"), r, "k", 4)
