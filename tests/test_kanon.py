"""k-anonymity report + suppression semantics on a hand-built table."""

from flow_indexer_spark.operators.validate import (
    k_anonymity_report,
    k_anonymity_suppress,
)


def _fixture(spark):
    # QI classes: (a,1) x3 rows, (a,2) x1, (b,1) x2 — sizes 3,1,2
    rows = [
        ("a", 1, "u1"), ("a", 1, "u2"), ("a", 1, "u2"),
        ("a", 2, "u3"),
        ("b", 1, "u4"), ("b", 1, "u4"),
    ]
    return spark.createDataFrame(rows, "q1 string, q2 int, sens string")


def test_report_distribution(spark):
    rep = {
        r["group_size"]: r
        for r in k_anonymity_report(
            _fixture(spark), ["q1", "q2"], k=2, sensitive_col="sens"
        ).collect()
    }
    assert set(rep) == {1, 2, 3}
    assert rep[3]["n_groups"] == 1 and rep[3]["n_rows"] == 3
    assert rep[3]["min_l_diversity"] == 2  # u1,u2
    assert rep[2]["min_l_diversity"] == 1  # u4 only -> homogeneity risk
    assert rep[1]["violates_k"] == 1 and rep[2]["violates_k"] == 0


def test_suppress_drops_small_classes(spark):
    kept = k_anonymity_suppress(_fixture(spark), ["q1", "q2"], k=2)
    got = sorted((r["q1"], r["q2"]) for r in kept.collect())
    assert got == [("a", 1)] * 3 + [("b", 1)] * 2
