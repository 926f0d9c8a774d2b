"""Incremental dedup against persisted signature state."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.dedup_state import (
    classify_against_state,
    dedup_against_state,
    read_state,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


@pytest.fixture()
def state_path(tmp_path):
    return str(tmp_path / "sigs")


def test_first_batch_is_all_unique_and_commits_state(spark, state_path):
    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    out = dedup_against_state(spark, b1, state_path, "b1")
    kinds = {r["doc_id"]: r["dup_kind"] for r in out.collect()}
    assert kinds == {1: "unique", 2: "unique"}
    st = read_state(spark, state_path)
    assert st.count() == 2
    assert set(st.columns) >= {"doc_id", "content_hash", "band0", "batch"}


def test_second_batch_classifies_exact_near_unique(spark, state_path):
    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    dedup_against_state(spark, b1, state_path, "b1")
    b2 = _docs(
        spark,
        [
            (10, "alpha beta gamma"),  # exact copy of doc 1
            (11, "gamma alpha beta"),  # same token set, new text -> near
            (12, "totally fresh words here"),  # unique
            (13, "totally fresh words here"),  # in-batch exact of 12
        ],
    )
    out = dedup_against_state(spark, b2, state_path, "b2")
    kinds = {r["doc_id"]: r["dup_kind"] for r in out.collect()}
    assert kinds == {10: "exact", 11: "near", 12: "unique", 13: "exact"}
    # only accepted (unique) docs entered the state
    st = read_state(spark, state_path)
    assert st.count() == 3  # docs 1, 2, 12
    assert {r["doc_id"] for r in st.collect()} == {1, 2, 12}


def test_replaying_a_batch_is_idempotent(spark, state_path):
    b1 = _docs(spark, [(1, "alpha beta gamma")])
    dedup_against_state(spark, b1, state_path, "b1")
    b2 = _docs(spark, [(20, "new content entirely"), (21, "alpha beta gamma")])
    first = {
        r["doc_id"]: r["dup_kind"]
        for r in dedup_against_state(spark, b2, state_path, "b2").collect()
    }
    # replay (crash-retry / double submit): same classification, state
    # unchanged — the batch's own prior commit is excluded from compare
    # and its partition replaced, not appended
    second = {
        r["doc_id"]: r["dup_kind"]
        for r in dedup_against_state(spark, b2, state_path, "b2").collect()
    }
    assert first == second == {20: "unique", 21: "exact"}
    st = read_state(spark, state_path)
    assert st.count() == 2
    assert st.filter(F.col("batch") == "b2").count() == 1


def test_classify_without_state_side_effects(spark):
    b = _docs(spark, [(1, "x y z"), (2, "x y z")])
    kinds = {
        r["doc_id"]: r["dup_kind"]
        for r in classify_against_state(b, None).collect()
    }
    assert kinds == {1: "unique", 2: "exact"}


def test_bucket_cap_drops_degenerate_state_bands(spark, state_path):
    # Build a GUARANTEED degenerate bucket: filler tokens are chosen so
    # that for every band the anchor token's hash is the minimum, making
    # all 30 state docs share all band buckets. Capped, the query doc
    # must NOT near-match them; uncapped it must.
    import hashlib

    anchor = "aaa"

    def dominated(tok):
        return all(
            hashlib.md5(f"b{b}{anchor}".encode()).hexdigest()
            < hashlib.md5(f"b{b}{tok}".encode()).hexdigest()
            for b in range(4)
        )

    pool = [t for t in (f"w{j}" for j in range(2000)) if dominated(t)]
    assert len(pool) >= 64
    b1 = _docs(
        spark,
        [(i, f"{anchor} {pool[2 * i]} {pool[2 * i + 1]}") for i in range(30)],
    )
    dedup_against_state(spark, b1, state_path, "b1", max_bucket_df=10)
    b2 = _docs(spark, [(100, f"{anchor} {pool[60]} {pool[61]}")])
    out = dedup_against_state(spark, b2, state_path, "b2", max_bucket_df=10)
    assert out.collect()[0]["dup_kind"] == "unique"
    # uncapped, the same doc IS a near match (shared anchor-min bucket)
    out2 = classify_against_state(
        _docs(spark, [(200, f"{anchor} {pool[62]} {pool[63]}")]),
        read_state(spark, state_path, exclude_batch=None),
        max_bucket_df=None,
    )
    assert out2.collect()[0]["dup_kind"] == "near"


def test_rejects_empty_batch_id(spark, state_path):
    b = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        dedup_against_state(spark, b, state_path, "")


def test_compact_state_folds_batches_and_preserves_semantics(
    spark, state_path
):
    from flow_indexer_spark.operators.dedup_state import compact_state

    dedup_against_state(
        spark, _docs(spark, [(1, "alpha beta gamma")]), state_path, "b1"
    )
    dedup_against_state(
        spark, _docs(spark, [(2, "delta epsilon zeta")]), state_path, "b2"
    )
    before = {
        (r["doc_id"], r["content_hash"])
        for r in read_state(spark, state_path).collect()
    }
    compact_state(spark, state_path)
    st = read_state(spark, state_path)
    after = {(r["doc_id"], r["content_hash"]) for r in st.collect()}
    assert after == before
    assert st.select("batch").distinct().count() == 1
    # classification against compacted state is unchanged
    out = dedup_against_state(
        spark,
        _docs(spark, [(30, "alpha beta gamma"), (31, "fresh new words")]),
        state_path,
        "b3",
    )
    kinds = {r["doc_id"]: r["dup_kind"] for r in out.collect()}
    assert kinds == {30: "exact", 31: "unique"}


def test_interrupted_compaction_recovers(spark, state_path):
    """Crash window between compact_state's two renames: live path gone,
    staged table complete. read_state must promote the staged table, NOT
    treat the corpus as empty (which would accept every duplicate)."""
    import os

    dedup_against_state(
        spark, _docs(spark, [(1, "alpha beta gamma")]), state_path, "b1"
    )
    # simulate the crash: live -> _old done, staged swap not yet done
    staged = state_path + "_compacting"
    os.rename(state_path, staged)
    st = read_state(spark, state_path)
    assert st is not None and st.count() == 1
    assert not os.path.exists(staged)
    out = dedup_against_state(
        spark, _docs(spark, [(9, "alpha beta gamma")]), state_path, "b2"
    )
    assert out.collect()[0]["dup_kind"] == "exact"


def test_band_count_mismatch_raises(spark, state_path):
    dedup_against_state(
        spark, _docs(spark, [(1, "a b c")]), state_path, "b1", n_bands=4
    )
    with pytest.raises(ValueError):
        dedup_against_state(
            spark, _docs(spark, [(2, "d e f")]), state_path, "b2", n_bands=2
        )


def test_signature_param_mismatch_rejected_via_meta(spark, state_path):
    dedup_against_state(
        spark, _docs(spark, [(1, "a b c")]), state_path, "b1",
        n_bands=2, rows_per_band=2,
    )
    # same schema (2 band columns) but different band VALUES — only the
    # recorded meta can catch this
    with pytest.raises(ValueError):
        dedup_against_state(
            spark, _docs(spark, [(2, "d e f")]), state_path, "b2",
            n_bands=2, rows_per_band=1,
        )


def test_forget_then_reingest(spark, state_path):
    """Right-to-be-forgotten contract: after forget_from_state, the
    forgotten doc's content hash and MinHash bands are gone, so
    re-submitting the same (or near-same) text classifies 'unique'
    again — the state stops acting on deleted data. Non-forgotten
    signatures keep matching, re-forget is a no-op, and a partition
    emptied by the purge is removed outright (dynamic overwrite alone
    would leave it untouched)."""
    from flow_indexer_spark.operators.dedup_state import forget_from_state

    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    dedup_against_state(spark, b1, state_path, "b1")
    b2 = _docs(spark, [(3, "solitary sentinel content")])
    dedup_against_state(spark, b2, state_path, "b2")

    # before forgetting: both texts are known duplicates
    probe = _docs(spark, [(90, "alpha beta gamma"), (91, "solitary sentinel content")])
    kinds = {
        r["doc_id"]: r["dup_kind"]
        for r in dedup_against_state(spark, probe, state_path, "probe1").collect()
    }
    assert kinds == {90: "exact", 91: "exact"}  # dups never enter state

    # forget doc 1 (partial partition) and doc 3 (empties batch=b2)
    audit = forget_from_state(spark, state_path, [1, 3], id_col="doc_id")
    assert audit["n_rows_forgotten"] == 2
    assert audit["n_partitions_rewritten"] == 1  # b1 keeps doc 2
    assert audit["n_partitions_removed"] == 1  # b2 emptied
    st = read_state(spark, state_path)
    assert {r["doc_id"] for r in st.collect()} == {2}

    # re-ingesting forgotten text is unique again; kept signature still hits
    re = _docs(
        spark,
        [
            (100, "alpha beta gamma"),  # was doc 1 — forgotten
            (101, "gamma alpha beta"),  # near-dup of forgotten text
            (102, "solitary sentinel content"),  # was doc 3 — forgotten
            (103, "delta epsilon zeta"),  # doc 2 still in state
        ],
    )
    kinds = {
        r["doc_id"]: r["dup_kind"]
        for r in dedup_against_state(spark, re, state_path, "b3").collect()
    }
    assert kinds == {100: "unique", 101: "unique", 102: "unique", 103: "exact"}

    # idempotent: nothing left to forget
    again = forget_from_state(spark, state_path, [1, 3], id_col="doc_id")
    assert again == {
        "n_rows_forgotten": 0,
        "n_partitions_rewritten": 0,
        "n_partitions_removed": 0,
    }


def test_forget_on_missing_or_empty_state(spark, state_path):
    from flow_indexer_spark.operators.dedup_state import forget_from_state

    noop = {
        "n_rows_forgotten": 0,
        "n_partitions_rewritten": 0,
        "n_partitions_removed": 0,
    }
    assert forget_from_state(spark, state_path, [1]) == noop  # no state yet
    assert forget_from_state(spark, state_path, []) == noop  # empty forget list
