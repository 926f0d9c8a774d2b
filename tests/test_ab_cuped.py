"""cuped_report: hand-computable covariate stats and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from flow_indexer_spark.operators.telemetry import cuped_report


def test_cuped_hand_example(spark):
    # users: (pre X, post Y) in whole units -> cents exact
    # u1 (1.00, 2.00), u2 (2.00, 4.00), u3 (3.00, 6.00): Y = 2X exactly
    rows = []
    for u, (x, y) in enumerate([(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], 1):
        rows.append((u, 0, x))
        rows.append((u, 1, y))
    df = spark.createDataFrame(rows, "user bigint, period int, value double")
    rep = cuped_report(
        df, "user", "value",
        pre_cond=F.col("period") == 0,
        post_cond=F.col("period") == 1,
    ).collect()[0]
    assert rep["n_users"] == 3
    assert rep["theta"] == 2.0       # cov/var for Y = 2X
    assert rep["corr"] == 1.0        # perfectly correlated
    assert rep["var_reduction"] == 1.0
    assert rep["mean_post"] == 4.0


def test_cuped_uncorrelated_covariate_saves_nothing(spark):
    # X constant across users -> var(X)=0 would divide by zero; use a
    # symmetric anti-pattern instead: X = [1,2], Y = [5,5] -> cov = 0
    rows = [(1, 0, 1.0), (1, 1, 5.0), (2, 0, 2.0), (2, 1, 5.0)]
    df = spark.createDataFrame(rows, "user bigint, period int, value double")
    rep = cuped_report(
        df, "user", "value",
        pre_cond=F.col("period") == 0,
        post_cond=F.col("period") == 1,
    ).collect()[0]
    assert rep["theta"] == 0.0 and rep["var_reduction"] == 0.0
