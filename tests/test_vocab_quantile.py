"""vocab_coverage_curve + quantile_normalize: hand-computed selections
and banding consistency."""

from __future__ import annotations

import pytest

from flow_indexer_spark.operators.curation import quantile_normalize
from flow_indexer_spark.operators.tokenize import vocab_coverage_curve


def test_coverage_hand_computed(spark):
    docs = spark.createDataFrame([("a a a b b c",)], "text string")
    out = {
        r["rank"]: r
        for r in vocab_coverage_curve(docs, "text", [1, 2, 3, 5]).collect()
    }
    assert set(out) == {1, 2, 3}  # rank 5 beyond |V| -> absent
    assert (out[1]["token"], out[1]["cum_count"]) == ("a", 3)
    assert out[1]["coverage"] == 0.5
    assert (out[2]["token"], out[2]["coverage"]) == ("b", round(5 / 6, 9))
    assert (out[3]["token"], out[3]["coverage"]) == ("c", 1.0)


def test_coverage_banding_matches_plain_order(spark):
    # counts spanning several log2 bands + ties within a band: the
    # banded rank must equal the plain (count desc, token asc) rank
    words = (
        ["w8"] * 8 + ["w5"] * 5 + ["w4"] * 4 + ["t1"] + ["t2"] + ["w2"] * 2
    )
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    out = vocab_coverage_curve(docs, "text", [1, 2, 3, 4, 5, 6]).collect()
    assert [r["token"] for r in out] == ["w8", "w5", "w4", "w2", "t1", "t2"]
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5, 6]
    assert out[-1]["coverage"] == 1.0
    with pytest.raises(ValueError, match="ranks"):
        vocab_coverage_curve(docs, "text", [])


def test_quantile_normalize_hand(spark):
    rows = [("A", 1, 0.0), ("A", 2, 1.0), ("B", 3, 0.25), ("B", 4, 0.75)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    out = {
        (r["group"], r["id"]): r["norm_value"]
        for r in quantile_normalize(df, "g", "id", "v").collect()
    }
    # global order stats: [0.0, 0.25, 0.75, 1.0]; midpoint quantiles
    # .25/.75 within each 2-row group -> global ranks 1 and 3
    assert out == {
        ("A", 1): 0.0,
        ("A", 2): 0.75,
        ("B", 3): 0.0,
        ("B", 4): 0.75,
    }


def test_quantile_normalize_identity_on_single_group(spark):
    # one group == the global distribution: midpoint selection maps the
    # k-th smallest to ceil((k-0.5)) = itself
    rows = [("g", i, i / 8.0) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    out = quantile_normalize(df, "g", "id", "v").collect()
    assert all(r["norm_value"] == r["value"] for r in out)
