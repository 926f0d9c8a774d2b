"""Content-defined chunking: python replay oracle, edit locality, and
degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.curation import cdc_chunks


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _replay(s, window=8, mask_bits=5, base=31, modulus=1 << 20):
    """Direct per-position replay of the documented hash rule."""
    if not s:
        return []
    L = len(s)
    if L <= window:
        return [(0, L)]
    cuts = []
    for p in range(window - 1, L - 1):
        hv = sum(ord(s[p - i]) * base**i for i in range(window)) % modulus
        if hv & ((1 << mask_bits) - 1) == 0:
            cuts.append(p)
    starts = [0] + [p + 1 for p in cuts]
    ends = [p + 1 for p in cuts] + [L]
    return list(zip(starts, (e - st for st, e in zip(starts, ends))))


def _got(spark, texts, **kw):
    rows = (
        cdc_chunks(_df(spark, texts), **kw)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append((r["start"], r["chunk_len"]))
    return out


def test_matches_python_replay(spark):
    rng = np.random.default_rng(7)
    alpha = "abcdefgh \n.,"
    texts = [
        "".join(rng.choice(list(alpha), size=int(n)))
        for n in rng.integers(0, 400, size=40)
    ]
    texts += ["", "x", "tiny doc", "exactly8", "a" * 200, "ab" * 150]
    got = _got(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _replay(t), f"doc {i}"


def test_chunks_cover_text_exactly(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 10]
    spans = _got(spark, texts)[0]
    assert spans[0][0] == 0
    for (s0, l0), (s1, _) in zip(spans, spans[1:]):
        assert s0 + l0 == s1  # contiguous, no gaps/overlaps
    assert spans[-1][0] + spans[-1][1] == len(texts[0])
    assert all(l > 0 for _, l in spans)


def test_edit_locality(spark):
    """An insertion must leave chunk CONTENT after the edit point
    identical (boundaries shift by the insertion length, content-defined
    identity survives) — the property fixed-offset chunking lacks."""
    base_text = "the quick brown fox jumps over the lazy dog " * 20
    edited = base_text[:100] + "INSERTED!! " + base_text[100:]
    got = _got(spark, [base_text, edited])

    def chunk_strs(t, spans):
        return [t[s : s + l] for s, l in spans]

    a = set(chunk_strs(base_text, got[0]))
    b = set(chunk_strs(edited, got[1]))
    # all chunks strictly after the edit window re-align: the tail
    # chunks of both versions coincide
    tail_a = chunk_strs(base_text, got[0])[-5:]
    tail_b = chunk_strs(edited, got[1])[-5:]
    assert tail_a == tail_b
    # and most chunks are shared overall
    assert len(a & b) >= len(a) - 4


def test_null_and_empty_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "some genuine text that is long enough")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_param_validation(spark):
    df = _df(spark, ["abc"])
    with pytest.raises(ValueError):
        cdc_chunks(df, window=1)
    with pytest.raises(ValueError):
        cdc_chunks(df, mask_bits=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, mask_bits=25)  # > log2(modulus)
    with pytest.raises(ValueError):
        cdc_chunks(df, window=16, base=1 << 10)  # int64 overflow guard


def test_no_shuffle_plan(spark):
    df = _df(spark, ["hello world " * 30])
    plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
