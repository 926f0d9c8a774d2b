"""Incremental dedup against persisted signature state — O(delta) per batch.

The batch-pairwise operators in :mod:`operators.dedup` answer "which of
THESE docs duplicate each other"; a growing corpus needs the other
question: "which of these NEW docs duplicate anything already ingested",
asked every batch without re-pairing the whole corpus. The reference
answers its version of this with a per-document presence check before
indexing (/root/reference/store/leveldb.go:58-68 ``HasDocument``;
/root/reference/flowindexer/index.go:17-24 makes re-index a no-op) — here
the unit is content, not filename, and "presence" is a persisted
SIGNATURE table: one row per accepted document carrying its exact content
hash and MinHash band values.

Per batch the work is O(batch + matched-state-partitions): the new docs'
signatures are computed in-row, joined against the state on content hash
(exact) and on band buckets (near), classified, and the ACCEPTED docs'
signatures are appended as a batch-keyed partition — the same
append-only-chunk idempotence as the postings salt chunks
(plans/pipeline.py) and the rollup maintenance (telemetry.maintain_rollup):
replaying a batch replaces its own partition wholesale and never touches
other batches, so a crash/replay can neither lose nor double-insert
state. The stored corpus is never rewritten and never self-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.operators.dedup import minhash_signature


def doc_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    rows_per_band: int = 1,
) -> DataFrame:
    """Per-doc dedup signature row: exact content hash + the MinHash band
    values (in-row, no shuffle). This is the schema persisted as state.
    ``rows_per_band`` is the near-match precision knob
    (:func:`operators.dedup.minhash_signature`); it changes band VALUES,
    not the schema, so it is part of the state's identity — the commit
    path records it in ``_meta.json`` and validates on every batch."""
    return df.select(
        F.col(id_col),
        F.md5(text_col).alias("content_hash"),
        *minhash_signature(text_col, n_bands, rows_per_band),
    )


def _melt_bands(sigs: DataFrame, id_col: str, n_bands: int) -> DataFrame:
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"), F.col(f"band{b}").alias("_bkt")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_e"),
    ).select(
        id_col, F.col("_e._band").alias("_band"), F.col("_e._bkt").alias("_bkt")
    )


def classify_against_state(
    new_df: DataFrame,
    state: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_bucket_df: int | None = 1000,
    rows_per_band: int = 1,
) -> DataFrame:
    """Annotate every new-batch row with ``dup_kind``:

    - ``'exact'`` — content hash already in the state, or a non-keeper
      copy within the batch (keeper = min id per hash, as
      :func:`operators.dedup.exact_dedup_keep`);
    - ``'near'`` — not exact, but shares a MinHash band bucket with some
      accepted state doc (banded-LSH against state, not all-pairs);
    - ``'unique'`` — neither; the rows a caller accepts into the corpus.

    Within-batch NEAR duplication is deliberately out of scope — that is
    the batch-pairwise operators' job (minhash_lsh_pairs + clustering);
    state dedup guards the batch against the accumulated corpus. State
    band buckets larger than ``max_bucket_df`` are dropped from near
    matching (the standard degenerate-bucket cap: such buckets are
    boilerplate-valued bands whose matches are overwhelmingly not dups,
    and they would fan a single new doc out B-fold).
    """
    if state is not None:
        stored = sorted(c for c in state.columns if c.startswith("band"))
        if len(stored) != n_bands:
            raise ValueError(
                f"state holds {len(stored)} minhash bands but n_bands="
                f"{n_bands}; matching fewer bands would silently drop "
                "near-dup recall — pass the stored band count"
            )
    sigs = doc_signatures(new_df, id_col, text_col, n_bands, rows_per_band)

    # within-batch exact keeper (one map-side-combined shuffle)
    keepers = (
        sigs.groupBy("content_hash")
        .agg(F.min(id_col).alias("_keeper"))
        .select("content_hash", "_keeper")
    )
    sigs = sigs.join(keepers, "content_hash")

    if state is not None:
        state_hashes = state.select("content_hash").dropDuplicates()
        exact_state = (
            sigs.join(state_hashes, "content_hash", "left_semi")
            .select(F.col(id_col))
            .withColumn("_ex", F.lit(1))
        )
        state_bands = _melt_bands(state, id_col, n_bands).select(
            "_band", "_bkt"
        )
        if max_bucket_df is not None:
            ok = (
                state_bands.groupBy("_band", "_bkt")
                .agg(F.count("*").alias("_df"))
                .filter(F.col("_df") <= max_bucket_df)
                .select("_band", "_bkt")
            )
            state_bands = state_bands.join(ok, ["_band", "_bkt"])
        near_state = (
            _melt_bands(sigs, id_col, n_bands)
            .join(state_bands.dropDuplicates(), ["_band", "_bkt"], "left_semi")
            .select(F.col(id_col))
            .dropDuplicates()
            .withColumn("_nr", F.lit(1))
        )
    else:
        schema_id = sigs.select(id_col)
        exact_state = schema_id.limit(0).withColumn("_ex", F.lit(1))
        near_state = schema_id.limit(0).withColumn("_nr", F.lit(1))

    kind = (
        F.when(
            (F.col(id_col) != F.col("_keeper")) | F.col("_ex").isNotNull(),
            F.lit("exact"),
        )
        .when(F.col("_nr").isNotNull(), F.lit("near"))
        .otherwise(F.lit("unique"))
    )
    return (
        sigs.join(exact_state, id_col, "left")
        .join(near_state, id_col, "left")
        .withColumn("dup_kind", kind)
        .drop("_keeper", "_ex", "_nr")
        .join(new_df, id_col)
        .select(*new_df.columns, "content_hash", "dup_kind")
    )


def dedup_against_state(
    spark,
    new_df: DataFrame,
    state_path: str,
    batch_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_bucket_df: int | None = 1000,
    rows_per_band: int = 1,
) -> DataFrame:
    """Classify a new batch against the persisted state AND commit the
    accepted ('unique') docs' signatures under ``batch=<batch_id>`` —
    dynamic-partition-overwrite, so replaying a batch is exactly
    idempotent (its partition is replaced; no other batch is touched).
    Returns the classified batch (all rows, with ``dup_kind``).
    """
    if not batch_id:
        raise ValueError("batch_id must be a stable non-empty identifier")
    _check_meta(state_path, n_bands, rows_per_band)
    state = read_state(spark, state_path, exclude_batch=batch_id)
    out = classify_against_state(
        new_df, state, id_col, text_col, n_bands, max_bucket_df,
        rows_per_band,
    )
    accepted = out.filter(F.col("dup_kind") == "unique").select(id_col)
    sigs = (
        doc_signatures(new_df, id_col, text_col, n_bands, rows_per_band)
        .join(accepted, id_col, "left_semi")
        .withColumn("batch", F.lit(batch_id))
    )
    (
        sigs.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(state_path)
    )
    return out


def forget_from_state(
    spark,
    state_path: str,
    ids: list,
    id_col: str = "doc_id",
) -> dict:
    """Right-to-be-forgotten for the dedup signature state — the
    companion to ``plans.pipeline.forget_conversations``, which purges
    the routed and postings sinks but cannot know about signature
    tables callers maintain separately. Without this, a forgotten
    document's content hash and MinHash bands REMAIN in state, so a
    future re-submission of the forgotten text would still classify as
    a duplicate — i.e. the engine would keep acting on data it was
    asked to delete. The contract here is full purge: after
    ``forget_from_state``, re-ingesting the same or near-same text is
    classified 'unique' again (covered by
    ``tests/test_dedup_state.py::test_forget_then_reingest``).

    Scale shape mirrors forget_conversations: the forget list rides
    into the state scan as an IN-list predicate; only the ``batch=``
    partitions that actually contain a forgotten id are rewritten
    (dynamic partition overwrite), and partitions left EMPTY by the
    purge are removed directly — dynamic overwrite never rewrites a
    partition absent from the written frame, so an all-forgotten batch
    would otherwise survive untouched. Idempotent: re-running finds no
    rows and rewrites nothing.

    Returns {n_rows_forgotten, n_partitions_rewritten,
    n_partitions_removed}.
    """
    import os
    import shutil

    ids = list(ids)
    noop = {
        "n_rows_forgotten": 0,
        "n_partitions_rewritten": 0,
        "n_partitions_removed": 0,
    }
    if not ids:
        return noop
    state = read_state(spark, state_path)
    if state is None:
        return noop
    hit = F.col(id_col).isin(ids)
    # one small agg over the IN-list scan: forgotten + surviving rows
    # per affected partition (the forget list is a deletion-request
    # batch, so this frame is tiny)
    per_batch = (
        state.filter(
            F.col("batch").isin(
                [
                    r["batch"]
                    for r in state.filter(hit).select("batch").distinct().collect()
                ]
            )
        )
        .groupBy("batch")
        .agg(
            F.sum(hit.cast("bigint")).alias("_forgot"),
            F.sum((~hit).cast("bigint")).alias("_kept"),
        )
        .collect()
    )
    if not per_batch:
        return noop
    rewrite = [r["batch"] for r in per_batch if r["_kept"] > 0]
    remove = [r["batch"] for r in per_batch if r["_kept"] == 0]
    if rewrite:
        (
            state.filter(F.col("batch").isin(rewrite) & ~hit)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(state_path)
        )
    for b in remove:
        # local-FS scope, same as compact_postings; catalog DELETE at S3 scale
        shutil.rmtree(os.path.join(state_path, f"batch={b}"), ignore_errors=True)
    return {
        "n_rows_forgotten": int(sum(r["_forgot"] for r in per_batch)),
        "n_partitions_rewritten": len(rewrite),
        "n_partitions_removed": len(remove),
    }


def _check_meta(state_path: str, n_bands: int, rows_per_band: int) -> None:
    """Record the signature parameters beside the state on first commit
    and reject mismatched later batches: ``rows_per_band`` changes band
    VALUES without changing the schema, so a silent mismatch would
    classify every near-dup 'unique' with no error to catch — the same
    trap the band-count check closes for n_bands."""
    import json
    import os

    meta_path = state_path.rstrip("/") + "_meta.json"
    meta = {"n_bands": n_bands, "rows_per_band": rows_per_band}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f)
        if stored != meta:
            raise ValueError(
                f"state at {state_path} was built with {stored}; "
                f"got {meta} — signature params are part of the state"
            )
    else:
        os.makedirs(os.path.dirname(meta_path) or ".", exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(meta, f)


def _recover_compaction(state_path: str) -> None:
    """Finish a compact_state swap a crash interrupted: if the live path
    is gone but the fully-written staged table exists, promote it (the
    stage write completed before any rename started, so it is always the
    safe choice); stale _old/_compacting leftovers are cleared either
    way. Without this, a crash between the two renames would make the
    next read_state return None and the next batch accept the entire
    accumulated corpus as 'unique'."""
    import os
    import shutil

    staged = state_path.rstrip("/") + "_compacting"
    old = state_path.rstrip("/") + "_old"
    if not os.path.exists(state_path):
        if os.path.exists(staged):
            os.rename(staged, state_path)
        elif os.path.exists(old):
            os.rename(old, state_path)
    shutil.rmtree(old, ignore_errors=True)


def read_state(
    spark, state_path: str, exclude_batch: str | None = None
) -> DataFrame | None:
    """The accumulated signature table, or None before the first batch.
    ``exclude_batch`` drops a batch's own prior partition so a REPLAYED
    batch is not compared against its own earlier (possibly partial)
    commit — the half-written rows a crash left behind must not turn the
    retry's docs into 'exact' self-duplicates.

    Only a genuinely-missing path maps to None (first batch ever, after
    interrupted-compaction recovery); any other read failure propagates —
    treating a transient S3/parquet error as 'no state yet' would accept
    a whole batch of duplicates silently."""
    from pyspark.errors import AnalysisException

    _recover_compaction(state_path)
    try:
        state = spark.read.parquet(state_path)
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            return None
        raise
    if exclude_batch is not None:
        state = state.filter(F.col("batch") != exclude_batch)
    return state


def compact_state(spark, state_path: str, into_batch: str = "compacted") -> None:
    """Fold the per-batch signature partitions into one
    ``batch=<into_batch>`` partition — bounds the partition count the way
    compact_postings/compact_rollup bound chunk counts (the Iceberg
    rewrite_data_files analogue; local-FS staged write-then-swap, crash
    leaves either the old partitions or the complete compacted table).
    Accepted content is unique across batches by construction; replay
    residue collapses deterministically to min doc id per content hash.
    """
    import os
    import shutil

    _recover_compaction(state_path)  # finish any crashed prior swap first
    st = spark.read.parquet(state_path)
    band_cols = sorted(c for c in st.columns if c.startswith("band"))
    folded = (
        st.groupBy("content_hash")
        .agg(
            F.min(st.columns[0]).alias(st.columns[0]),
            *[F.min(c).alias(c) for c in band_cols],
        )
        .select(st.columns[0], "content_hash", *band_cols)
        .withColumn("batch", F.lit(into_batch))
    )
    staged = state_path.rstrip("/") + "_compacting"
    shutil.rmtree(staged, ignore_errors=True)
    folded.write.mode("overwrite").partitionBy("batch").parquet(staged)
    old = state_path.rstrip("/") + "_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(state_path, old)
    os.rename(staged, state_path)
    shutil.rmtree(old, ignore_errors=True)
