"""Inverted-index build: entity -> sorted posting list of (conv_id, turn_idx).

Reference analogue: ``store.AddDocument`` read-modify-write of per-entity
bitsets in LevelDB (/root/reference/store/leveldb.go:70-96, 261-278), with
codecs in store/codec.go. In Spark the index is a **recomputed aggregate**,
not a mutable store: one salted two-phase groupBy produces the whole table,
and Parquet/Iceberg delta+RLE encodings on the sorted arrays replace the
hand-rolled bitset/msgpack codecs (store/codec.go:25-220 — measured ~2-3.5x
there; free here).

Skew: a hot entity present in ~every turn (the dense-bitset case the
reference documents in experiments/convert_to_msgpack.go:10-12) would put
one groupBy key on one reducer. The two-phase salted aggregate bounds the
per-task state: phase 1 groups on (entity, salt) with partial collect_set,
phase 2 merges the <= n_salt partial arrays per entity. Map-side partial
aggregation applies in both phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

POSTING_STRUCT = "struct(conv_id, turn_idx)"


def build_postings(
    extracted: DataFrame,
    *,
    n_salt: int = 16,
    chunk_size: int | None = None,
    chunk_mode: str | None = None,
    assume_unique: bool = True,
) -> DataFrame:
    """Salted skew-aware inverted-index aggregate.

    Input: long-format entity rows (one per (turn, entity), already deduped
    per turn). Output schema:
      entity_class, entity_key, postings: array<struct<conv_id,turn_idx>>,
      ndocs, ts_min, ts_max.

    ``postings`` is sorted by (conv_id, turn_idx) — the stable-turn-ordering
    invariant; array_sort on structs orders by fields left-to-right, which
    matches the reference's sorted doc-id bitsets.

    With ``chunk_size`` set, giant posting lists are split into fixed-size
    chunks (entity_key, chunk_id, postings) to bound row size — the analogue
    of the reference's "partition dbs so unique-ips/day fits" guidance
    (/root/reference/README.md:44-48).

    ``assume_unique=True`` (default) requires the input to carry at most one
    row per (entity_class, entity_key, conv_id, turn_idx) — which
    ``extract_entities`` guarantees via its per-turn dropDuplicates. Salt
    buckets then partition each entity's postings disjointly, so the merge
    is a plain flatten+sort with **no** array_distinct: array_distinct over
    array<struct> is an O(n^2) nested-loop in Spark (no hashing for struct
    elements) and is catastrophic on hot keys — measured 140s vs 5s on an
    8-key x 100k-posting skew case. With ``assume_unique=False`` the dedup
    happens up front as a scalable hash-shuffle dropDuplicates instead.

    ``chunk_mode='salt'`` is the **scale path**: each salt bucket becomes
    its own pre-sorted chunk row (entity_class, entity_key, chunk_id,
    postings) and the final merge groupBy disappears — ONE shuffle total,
    and a hot entity's list is sorted as n_salt parallel ~N/n_salt-element
    sorts instead of one serial N-element sort (the serial tail that caps
    scaling: a key present in ~every turn — the reference's dense-bitset
    case, experiments/convert_to_msgpack.go:10-12 — is 10^12 elements at
    target scale, impossible as one array row anyway). Postings are sorted
    *within* each chunk; chunks of one entity interleave (salt is a hash of
    the doc key), exactly like the reference's per-month DBs interleave
    doc ids across stores. Query/explode semantics are unchanged.
    """
    if chunk_mode == "salt" and chunk_size:
        raise ValueError(
            "chunk_size only applies to chunk_mode=None (merged arrays); "
            "chunk_mode='salt' bounds chunk rows to ~N/n_salt postings by "
            "construction — tune n_salt instead"
        )
    if not assume_unique:
        extracted = extracted.dropDuplicates(
            ["entity_class", "entity_key", "conv_id", "turn_idx"]
        )
    salted = extracted.withColumn(
        "_salt", F.pmod(F.hash("conv_id", "turn_idx"), F.lit(n_salt))
    )
    if chunk_mode == "salt":
        out = (
            salted.groupBy("entity_class", "entity_key", "_salt")
            .agg(
                F.array_sort(F.collect_list(F.expr(POSTING_STRUCT))).alias("postings"),
                F.min("ts").alias("ts_min"),
                F.max("ts").alias("ts_max"),
            )
            .withColumnRenamed("_salt", "chunk_id")
            .withColumn("ndocs", F.size("postings"))
        )
        return out
    partial = salted.groupBy("entity_class", "entity_key", "_salt").agg(
        F.collect_list(F.expr(POSTING_STRUCT)).alias("_p"),
        F.min("ts").alias("_ts_min"),
        F.max("ts").alias("_ts_max"),
    )
    final = partial.groupBy("entity_class", "entity_key").agg(
        F.array_sort(F.flatten(F.collect_list("_p"))).alias("postings"),
        F.min("_ts_min").alias("ts_min"),
        F.max("_ts_max").alias("ts_max"),
    )
    out = final.withColumn("ndocs", F.size("postings"))
    if chunk_size:
        # slice the sorted array into chunks; chunk_id preserves global order
        n_chunks = F.ceil(F.size("postings") / F.lit(chunk_size)).cast("int")
        out = (
            out.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
            .withColumn(
                "postings",
                F.slice("postings", F.col("chunk_id") * chunk_size + 1, chunk_size),
            )
            .withColumn("ndocs", F.size("postings"))
        )
    return out


def entity_totals(postings: DataFrame) -> DataFrame:
    """Per-entity totals over a (possibly chunked) postings table:
    (entity_class, entity_key, ndocs). Cheap second-level aggregate — the
    per-chunk rows are already tiny relative to the corpus."""
    if "chunk_id" not in postings.columns:
        return postings.select("entity_class", "entity_key", "ndocs")
    return postings.groupBy("entity_class", "entity_key").agg(
        F.sum("ndocs").alias("ndocs")
    )


def class_entity_counts_approx(
    routed: DataFrame, rsd: float = 0.02
) -> DataFrame:
    """HLL++ scale path for the per-class unique-entity metric (the
    reference's "Wrote N unique ips" counter, A4 —
    /root/reference/flowindexer/index.go:46-51). The exact
    ``count_distinct`` shuffles every distinct key; ``approx_count_
    distinct`` ships one fixed-size HLL sketch per partition per class —
    constant shuffle bytes at any corpus size, with relative standard
    deviation ``rsd``. Use for monitoring/lineage dashboards; the exact
    path remains the correctness metric."""
    return (
        routed.filter(F.col("entity_key").isNotNull())
        .groupBy("entity_class")
        .agg(
            F.approx_count_distinct("entity_key", rsd).alias("n_entities_approx")
        )
    )


def write_postings(
    postings: DataFrame,
    path: str,
    mode: str = "overwrite",
    layout: str = "range",
    partition_cols: tuple[str, ...] = ("entity_class",),
) -> None:
    """Routed, sorted sink for the postings table.

    Layout = the reference's per-class LevelDB roots + sorted keys
    (/root/reference/example_config.json:5-46, store/leveldb.go:85):
    partitioned by entity_class, files sorted by entity_key so Parquet
    min/max stats (and Iceberg sort order in production) make point/range
    lookups file-skipping scans.

    ``layout='range'``: repartitionByRange keeps one writer per key range
    -> non-overlapping min/max across files (optimal pruning). Costs one
    extra shuffle plus a persist (repartitionByRange samples its input to
    compute bounds; without persistence the sampling pass re-executes the
    whole upstream extract+aggregate job a second time).

    ``layout='local'``: sort within the aggregation's existing hash
    partitions and write directly — no extra shuffle, no persist. Files
    are each sorted but their key ranges overlap across files; point
    lookups still skip via bloom filters + row-group stats, range scans
    prune less sharply. The ingest-throughput-optimal choice; compaction
    (operators.compact, the Iceberg rewrite_data_files analogue) restores
    the range layout offline.
    """
    if layout == "local":
        (
            postings.sortWithinPartitions("entity_class", "entity_key")
            .write.mode(mode)
            .option("parquet.bloom.filter.enabled#entity_key", "true")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        return
    postings.persist()
    try:
        postings.count()
        (
            postings.repartitionByRange("entity_class", "entity_key")
            .sortWithinPartitions("entity_key")
            .write.mode(mode)
            .option("parquet.bloom.filter.enabled#entity_key", "true")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        postings.unpersist()
