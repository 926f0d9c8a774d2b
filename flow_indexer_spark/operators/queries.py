"""Query layer: search / expand / stats / dump.

Reference entry points re-expressed as DataFrame library functions:
- search:  /root/reference/store/leveldb.go:147-205 (point Get / CIDR range
           scan + bitset union) + flowindexer.go:317-327 (fan-out over
           stores — here one partition-pruned table scan).
- expand:  ExpandCIDR /root/reference/store/leveldb.go:116-145.
- stats:   FilenamesToStats /root/reference/flowindexer/flowindexer.go:352-397
           (hits / first / last + two-level time buckets).
- dump:    /root/reference/flowindexer/flowindexer.go:399-420 (re-open
           matched files, emit matching raw lines) — here a semi-join back
           to the transcripts table.

Every function returns a DataFrame (composable, lazily planned); the HTTP
layer of the reference (web.go) is out of engine scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.functions.keys import (
    V4_KEY_LEN,
    V6_KEY_LEN,
    cidr_to_key_range,
    ip_to_key,
)

#: bucket-granularity name -> Spark date_trunc unit; reference supports
#: minute/hour/day/month/year (/root/reference/flowindexer/util.go:92-117)
GRANULARITIES = ("minute", "hour", "day", "month", "year")

#: default group/count pair per coarse bucket — parseBucketParam defaults
#: (/root/reference/flowindexer/util.go:119-145): month->day, day->hour,
#: hour->minute, year->month, minute->minute.
DEFAULT_COUNT_FOR = {
    "year": "month",
    "month": "day",
    "day": "hour",
    "hour": "minute",
    "minute": "minute",
}


def _key_range_filter(query: str):
    """Entity query string -> (predicate on entity_key, entity_class).

    '1.2.3.4' / 'fe80::1'  -> point lookup on the hex key
    '1.2.3.0/24'           -> inclusive between-range + family-length guard
                              (the reference's same-byte-length filter,
                              /root/reference/store/leveldb.go:170-174)
    'tool:NAME'/'role:NAME'-> point lookup in that class
    'tool:PRE*'            -> prefix range scan (the CIDR-range analogue for
                              name-keyed classes; StringStartsWith pushes
                              down to the parquet scan like `between` does)
    """
    for klass in ("tool", "role"):
        prefix = f"{klass}:"
        if query.startswith(prefix):
            name = query[len(prefix):]
            if name.endswith("*"):
                return F.col("entity_key").startswith(name[:-1]), klass
            return F.col("entity_key") == name, klass
    if "/" in query:
        lo, hi = cidr_to_key_range(query)
        family_len = V4_KEY_LEN if len(lo) == V4_KEY_LEN else V6_KEY_LEN
        return (
            F.col("entity_key").between(lo, hi)
            & (F.length("entity_key") == family_len)
        ), "ip"
    key = ip_to_key(query)
    if key is None:
        raise ValueError(f"not an IP/CIDR/tool:/role: query: {query!r}")
    return F.col("entity_key") == key, "ip"


def search(postings: DataFrame, query: str) -> DataFrame:
    """entity (point or CIDR range) -> distinct (conv_id, turn_idx), sorted.

    entity_class equality prunes partitions; the key predicate prunes files
    via Parquet min/max (the table is written sorted by entity_key) — the
    Spark analogue of the reference's LevelDB range iterator.
    """
    pred, klass = _key_range_filter(query)
    return (
        postings.filter((F.col("entity_class") == klass) & pred)
        .select(F.explode("postings").alias("p"))
        .select("p.conv_id", "p.turn_idx")
        .dropDuplicates()
        .orderBy("conv_id", "turn_idx")
    )


def expand(postings: DataFrame, cidr: str) -> DataFrame:
    """CIDR -> sorted distinct entity keys in range (ExpandCIDR analogue).
    Byte order == numeric order by key construction, so a plain orderBy on
    the hex key reproduces the reference's numerically sorted output
    (/root/reference/ipset/ipset.go:96-105)."""
    pred, klass = _key_range_filter(cidr)
    return (
        postings.filter((F.col("entity_class") == klass) & pred)
        .select("entity_key")
        .distinct()
        .orderBy("entity_key")
    )


def search_turns(postings: DataFrame, transcripts: DataFrame, query: str) -> DataFrame:
    """Resolve hits back to full transcript rows (J1/J3): left-semi join on
    the composite natural key, stable (conv_id, turn_idx) order."""
    hits = search(postings, query)
    return transcripts.join(
        hits, on=["conv_id", "turn_idx"], how="left_semi"
    ).orderBy("conv_id", "turn_idx")


def stats(
    postings: DataFrame,
    transcripts: DataFrame,
    query: str,
    group_by: str = "month",
    count: str | None = None,
) -> DataFrame:
    """Two-level time-bucket stats over matched turns.

    Reference semantics (/root/reference/flowindexer/flowindexer.go:368-394):
    group matched docs by coarse bucket, count *distinct* fine buckets within
    each — their sorted single-pass transition counter is exactly
    ``count_distinct(date_trunc(fine, ts))`` per coarse bucket.
    Returns one row per coarse bucket: (bucket, hits) plus total-matched
    min/max available via ``stats_summary``.
    """
    if group_by not in GRANULARITIES or count not in (*GRANULARITIES, None):
        raise ValueError(f"bucket granularity must be one of {GRANULARITIES}")
    if count is None:
        count = DEFAULT_COUNT_FOR[group_by]
    matched = search_turns(postings, transcripts, query)
    return (
        matched.groupBy(F.date_trunc(group_by, "ts").alias("bucket"))
        .agg(F.count_distinct(F.date_trunc(count, "ts")).alias("hits"))
        .orderBy("bucket")
    )


def stats_summary(postings: DataFrame, transcripts: DataFrame, query: str) -> DataFrame:
    """hits / first / last over matched turns (A5,
    /root/reference/flowindexer/flowindexer.go:352-366)."""
    matched = search_turns(postings, transcripts, query)
    return matched.agg(
        F.count("*").alias("hits"),
        F.min("ts").alias("first"),
        F.max("ts").alias("last"),
    )


def dump(
    postings: DataFrame, transcripts: DataFrame, query: str, contains: str | None = None
) -> DataFrame:
    """Matched original rows, optionally re-filtered by substring — the
    reference's grep-matched-files Dump (P6). Returns original transcript
    rows in stable order (per-turn text equality invariant)."""
    rows = search_turns(postings, transcripts, query)
    if contains is not None:
        rows = rows.filter(F.col("text").contains(contains))
    return rows


def multi_entity_search(postings: DataFrame, queries: list[str]) -> DataFrame:
    """AND-search: turns containing ALL the given entities — a cheap Spark
    extension the reference lacks (SURVEY.md §2.6): union hit lists, group
    on the turn key, keep turns hit by every query."""
    hit_sets = None
    for i, q in enumerate(queries):
        h = search(postings, q).withColumn("_q", F.lit(i))
        hit_sets = h if hit_sets is None else hit_sets.unionByName(h)
    return (
        hit_sets.groupBy("conv_id", "turn_idx")
        .agg(F.count_distinct("_q").alias("_n"))
        .filter(F.col("_n") == len(queries))
        .select("conv_id", "turn_idx")
        .orderBy("conv_id", "turn_idx")
    )


def any_entity_search(postings: DataFrame, queries: list[str]) -> DataFrame:
    """OR-search: turns containing ANY of the given entities (U1 union
    semantics across queries instead of across partitions)."""
    hit_sets = None
    for q in queries:
        h = search(postings, q)
        hit_sets = h if hit_sets is None else hit_sets.unionByName(h)
    return hit_sets.dropDuplicates().orderBy("conv_id", "turn_idx")


def exclude_entity_search(
    postings: DataFrame, include: str, exclude: list[str]
) -> DataFrame:
    """NOT-search: turns matching ``include`` but none of ``exclude`` —
    the union of all exclude hit-lists anti-joined ONCE (one shuffle
    instead of k chained anti-joins; the reference has no except operator,
    J2's anti-join shape reused at query time)."""
    hits = search(postings, include)
    if not exclude:
        return hits
    excluded = None
    for q in exclude:
        h = search(postings, q)
        excluded = h if excluded is None else excluded.unionByName(h)
    return hits.join(
        excluded, on=["conv_id", "turn_idx"], how="left_anti"
    ).orderBy("conv_id", "turn_idx")
