"""Embedding quantization and normalization: hand-computed fixtures;
the sf0.01 oracle twin runs in test_entry_contract.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.similarity import l2_normalize, quantize_int8


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_hand_values(spark):
    d = _vecs(spark, [(1, [1.0, -0.5, 0.25, 0.0])])
    r = quantize_int8(d).first()
    assert r["scale"] == 1.0
    # floor(x*127 + 0.5): 127, floor(-63.0)= -63, floor(32.25)=32, 0
    assert r["qvec"] == [127, -63, 32, 0]
    assert r["mae"] == pytest.approx(
        (abs(1.0 - 127 / 127) + abs(-0.5 + 63 / 127) + abs(0.25 - 32 / 127) + 0)
        / 4,
        abs=1e-12,
    )


def test_quantize_zero_vector(spark):
    d = _vecs(spark, [(1, [0.0, 0.0])])
    r = quantize_int8(d).first()
    assert r["scale"] == 0.0 and r["qvec"] == [0, 0] and r["mae"] == 0.0


def test_quantize_bounds(spark):
    # quantized values always within [-127, 127]
    d = _vecs(spark, [(i, [float(i) / 3, -1.0, 0.7]) for i in range(1, 20)])
    rows = quantize_int8(d).collect()
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        assert r["mae"] <= r["scale"] / 127  # max error of half-up rounding


def test_l2_normalize_unit_norm(spark):
    d = _vecs(spark, [(1, [3.0, 4.0]), (2, [0.0, 0.0])])
    out = d.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("n")
    ).collect()
    by = {r["vec_id"]: r["n"] for r in out}
    assert by[1][0] == pytest.approx(0.6) and by[1][1] == pytest.approx(0.8)
    assert by[2] == [0.0, 0.0]  # zero vector passes through


def test_tokenizer_fertility_math(spark):
    from pyspark.sql import Row
    from flow_indexer_spark.operators.textstats import tokenizer_fertility

    rows = [
        Row(doc_id=1, source="a", text="ab cd12"),  # 2 words; bpe: ab,cd,12=3
        Row(doc_id=2, source="a", text=""),
        Row(doc_id=3, source="b", text="x!"),  # 1 word; bpe: x,! = 2
    ]
    out = {
        r["source"]: r.asDict()
        for r in tokenizer_fertility(spark.createDataFrame(rows)).collect()
    }
    a = out["a"]
    assert (a["n_docs"], a["n_words"], a["n_bpe_tokens"], a["n_chars"]) == (2, 2, 3, 7)
    assert abs(a["fertility"] - 1.5) < 1e-12
    assert abs(a["chars_per_token"] - 7 / 3) < 1e-9
    b = out["b"]
    assert abs(b["fertility"] - 2.0) < 1e-12

    empty = spark.createDataFrame([Row(doc_id=1, source="z", text="")])
    z = tokenizer_fertility(empty).collect()[0]
    assert z["fertility"] is None and z["chars_per_token"] is None
