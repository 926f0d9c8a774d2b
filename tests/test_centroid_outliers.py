"""centroid_distance_report: obvious outlier flagged, clean label
clean."""

from __future__ import annotations

from flow_indexer_spark.operators.similarity import centroid_distance_report


def test_far_vector_flagged(spark):
    rows = [
        (1, [0.0, 0.0], 7),
        (2, [0.01, 0.0], 7),
        (3, [0.0, 0.01], 7),
        (4, [-0.01, 0.0], 7),
        (5, [10.0, 10.0], 7),  # the mislabeled/garbage vector
        # a clean label: identical vectors, MAD 0, zero deviations
        (6, [1.0, 1.0], 8),
        (7, [1.0, 1.0], 8),
        (8, [1.0, 1.0], 8),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    out = {
        r["label"]: r
        for r in centroid_distance_report(
            emb, "label", "vec_id", "embedding"
        ).collect()
    }
    assert out[7]["n"] == 5 and out[7]["n_outliers"] == 1
    assert out[8]["n"] == 3 and out[8]["n_outliers"] == 0
    assert out[8]["med"] == 0 and out[8]["mad"] == 0


def test_deterministic(spark):
    rows = [(i, [float(i % 3), float(i % 5)], i % 2) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    a = sorted(map(tuple, centroid_distance_report(emb, "label", "vec_id", "embedding").collect()))
    b = sorted(map(tuple, centroid_distance_report(emb, "label", "vec_id", "embedding").collect()))
    assert a == b
