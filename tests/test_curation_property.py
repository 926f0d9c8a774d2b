"""Property tests for the curation/redaction additions (hypothesis),
mirroring the keys property-test style in test_keys_property.py."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from flow_indexer_spark.operators.curation import sliding_window_chunks
from flow_indexer_spark.operators.redact import redact_entities

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    size=st.integers(min_value=1, max_value=10),
    stride=st.integers(min_value=1, max_value=10),
)
def test_chunks_cover_every_token_exactly(spark, n_tokens, size, stride):
    """Windows start at exact stride multiples, the first chunk starts at
    0, the last chunk reaches the final token, and when stride <= size the
    union of [start, start+n) covers every token position."""
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        sliding_window_chunks(df, size=size, stride=stride).collect(),
        key=lambda r: r["start_tok"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    assert rows[0]["start_tok"] == 0
    assert all(r["start_tok"] % stride == 0 for r in rows)
    # starts are consecutive stride multiples (no window skipped)
    assert [r["start_tok"] for r in rows] == [
        i * stride for i in range(len(rows))
    ]
    if stride <= size:
        # overlap mode: the last chunk reaches the final token and the
        # union of windows covers every position exactly
        last = rows[-1]
        assert last["start_tok"] + last["n_tokens"] == n_tokens
        covered = set()
        for r in rows:
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert covered == set(range(n_tokens))
    else:
        # strided-sampling mode (stride > size): gaps between windows are
        # by design; every window is full-length except possibly the tail
        assert all(
            r["n_tokens"] == min(size, n_tokens - r["start_tok"]) for r in rows
        )


@settings(max_examples=8, deadline=None)
@given(
    words=st.lists(_WORD, min_size=0, max_size=8),
    octets=st.lists(st.integers(min_value=0, max_value=255), min_size=4, max_size=4),
)
def test_redact_removes_every_ip(spark, words, octets):
    ip = ".".join(str(o) for o in octets)
    text = " ".join([*words[:4], ip, *words[4:]])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = redact_entities(df).first()
    assert ip not in r["clean_text"]
    assert r["n_ip"] >= 1
