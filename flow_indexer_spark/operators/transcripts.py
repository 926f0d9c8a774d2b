"""Transcript-level analytics: conversation rollups, response latency,
entity co-occurrence.

The reference's unit of analysis is the file/document; a transcript
engine also needs conversation-level views (the "document" rolled up
from its turns) and turn-adjacency semantics (what answered what). All
pure DataFrame: one hash aggregate for rollups, one window pass for
adjacency, one capped inverted-index self-join for co-occurrence — the
same topologies as the index build (SURVEY §2 A2) applied to new
questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_rollup(
    transcripts: DataFrame,
    roles: tuple[str, ...] = ("user", "assistant"),
) -> DataFrame:
    """Per-conversation summary: turn counts (total / per listed role),
    time span, distinct tools used. One map-side-combined groupBy — the
    A5 hits/first/last stats (reference
    /root/reference/flowindexer/flowindexer.go:352-366) generalized from
    a query's hit list to every conversation."""
    tool = F.when(F.col("tool").isNotNull() & (F.col("tool") != ""), F.col("tool"))
    role_counts = [
        F.sum((F.col("role") == r).cast("long")).alias(f"n_{r}_turns") for r in roles
    ]
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        *role_counts,
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count_distinct(tool).alias("n_distinct_tools"),
    )


def response_latency(
    transcripts: DataFrame,
    from_role: str = "user",
    to_role: str = "assistant",
) -> DataFrame:
    """Pair each ``from_role`` turn with the IMMEDIATELY NEXT turn in the
    conversation when that turn is ``to_role``, and compute the reply
    delay in seconds. Adjacency via lead() over (conv_id, turn_idx) —
    one shuffle on conv_id, both lead()s in one in-partition sort; a
    per-conversation history fits one task by construction (conversations
    are bounded, unlike users in sessionize)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt_role = F.lead("role").over(w)
    nxt_ts = F.lead("ts").over(w)
    nxt_idx = F.lead("turn_idx").over(w)
    lat_us = F.unix_micros(nxt_ts.cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "ts",
            "role",
            nxt_role.alias("next_role"),
            nxt_idx.alias("next_turn_idx"),
            (lat_us / 1_000_000.0).alias("latency_s"),
        )
        .filter((F.col("role") == from_role) & (F.col("next_role") == to_role))
        .drop("role", "next_role")
    )


def capped_entities(
    entity_rows: DataFrame,
    max_entity_df: int | None = 1000,
) -> DataFrame:
    """Distinct per-turn entity occurrences with the document-frequency
    skew cap applied: entities present in more than ``max_entity_df``
    turns are dropped entirely. Shared by :func:`entity_cooccurrence`
    and the graph analytics built on it (operators/graph.py) so both
    see the identical node universe."""
    e = entity_rows.select(
        "entity_class", "entity_key", "conv_id", "turn_idx"
    ).dropDuplicates()
    if max_entity_df is not None:
        ok = (
            e.groupBy("entity_class", "entity_key")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_entity_df)
            .select("entity_class", "entity_key")
        )
        e = e.join(ok, ["entity_class", "entity_key"])
    return e


def entity_cooccurrence(
    entity_rows: DataFrame,
    max_entity_df: int | None = 1000,
) -> DataFrame:
    """Entity co-occurrence graph: for every pair of entities appearing
    in the SAME turn, count the co-occurring turns. The candidate
    topology is the inverted-index self-join (A2/J3 applied to itself)
    with the same document-frequency skew cap as the dedup paths: an
    entity present in every turn (the hot-key case the salt-chunk
    postings exist for) would pair with everything — entities above
    ``max_entity_df`` turns are excluded from the graph (and at 100 TB
    that exclusion is what bounds the join output).

    Input: long-format rows (entity_class, entity_key, conv_id,
    turn_idx) — extraction output or the routed table. Output:
    (class_a, key_a, class_b, key_b, n_turns), pairs ordered a < b.
    """
    e = capped_entities(entity_rows, max_entity_df)
    a = e.select(
        F.col("entity_class").alias("class_a"),
        F.col("entity_key").alias("key_a"),
        "conv_id",
        "turn_idx",
    )
    b = e.select(
        F.col("entity_class").alias("class_b"),
        F.col("entity_key").alias("key_b"),
        "conv_id",
        "turn_idx",
    )
    return (
        a.join(b, ["conv_id", "turn_idx"])
        .filter(
            (F.col("class_a") < F.col("class_b"))
            | ((F.col("class_a") == F.col("class_b")) & (F.col("key_a") < F.col("key_b")))
        )
        .groupBy("class_a", "key_a", "class_b", "key_b")
        .agg(F.count("*").alias("n_turns"))
    )
