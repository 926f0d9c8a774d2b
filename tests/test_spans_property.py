"""Property tests for duplicated-span coverage and training order.

Run AFTER bench — Spark-CPU-heavy hypothesis loops."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from flow_indexer_spark.operators.curation import training_order
from flow_indexer_spark.operators.dedup import duplicated_spans

# small alphabets force cross-doc window collisions; texts are token lists
_tok = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_tok, min_size=0, max_size=14)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_duplicated_spans_invariants(spark, docs):
    k = 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(docs)]
    )
    rows = {r["doc_id"]: r for r in duplicated_spans(df, k=k).collect()}
    eligible = {i for i, t in enumerate(docs) if len(t) >= k}
    assert set(rows) == eligible
    for i in eligible:
        r = rows[i]
        n = len(docs[i])
        assert r["n_tokens"] == n
        assert r["n_windows"] == n - k + 1
        assert 0 <= r["dup_windows"] <= r["n_windows"]
        # coverage bounds: every dup window covers <= k new tokens, the
        # union never exceeds the doc, and dup windows imply coverage >= k
        assert r["covered_tokens"] <= min(n, r["dup_windows"] * k)
        if r["dup_windows"] > 0:
            assert r["covered_tokens"] >= k
        assert r["dup_fraction"] == r["covered_tokens"] / n
    # symmetry: two identical eligible docs must both be fully covered
    texts = [" ".join(t) for t in docs]
    for i in eligible:
        if texts.count(texts[i]) > 1:
            assert rows[i]["covered_tokens"] == rows[i]["n_tokens"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=40, unique=True),
    st.sampled_from([1, 2, 8, 64]),
)
def test_training_order_total_and_stable(spark, ids, n_buckets):
    df = spark.createDataFrame([Row(doc_id=i) for i in ids])
    out = training_order(df, n_buckets=n_buckets).collect()
    ranks = sorted(r["order_rank"] for r in out)
    assert ranks == list(range(len(ids)))  # total order, gap/dupe-free
    # bucket count must not change the order — only the parallelism
    again = training_order(df, n_buckets=1).collect()
    assert {r["doc_id"]: r["order_rank"] for r in out} == {
        r["doc_id"]: r["order_rank"] for r in again
    }
