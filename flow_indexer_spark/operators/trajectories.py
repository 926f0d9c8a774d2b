"""Trajectory analytics over conversations: action paths, identical-
trajectory dedup, truncated-prefix subsumption, and prefix-tree fork
mining.

Agent-trajectory training corpora (tool-use episodes, clickstream
demonstrations, multi-turn rollouts) are notoriously redundant in a
way document dedup misses: whole conversations repeat the same ACTION
SEQUENCE (retries, crawler replays, truncated exports of a longer
episode), and sampling them as distinct examples overweights common
paths. The unit of identity here is the ordered per-turn content
sequence — by default the ``role`` column (the action/event type), but
any per-turn expression (a normalized text hash, a tool name) plugs in
via ``content_col``.

Topology notes (100 TB posture):
- A conversation's turns fit one task by construction (transcripts are
  bounded-length conversations, not unbounded user histories — the
  same contract sessions.py relies on), so per-conversation path
  assembly is ONE hash-partitioned exchange on conv_id.
- Prefix strings are O(L^2) transient per conversation inside the
  window stage; they are hashed to fixed-width sha256 hex IMMEDIATELY
  and only the hash flows into the fork/subsumption shuffles. The
  separator is the non-printing unit separator so multi-token contents
  cannot collide ("a|b","c" vs "a","b|c").
- Fork mining groups by (depth, prefix_hash): at worst one row per
  TURN, the same cardinality every window query here already carries.
  No collect to the driver anywhere.

Reference analogue: the reference dedups at file granularity via the
already-indexed anti-join (cmd/index.go:40-57, J2 in SURVEY §2); these
operators are the conversation-level generalization a transcript
corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# non-printing unit separator: content values cannot forge a boundary
SEP = "\x1f"


def _prefix_turns(transcripts: DataFrame, content_col: str) -> DataFrame:
    """Per-turn prefix table: (conv_id, depth, prefix_hash, next_content)
    where depth is the 1-based turn position and prefix_hash identifies
    the content sequence up to and including this turn. One exchange on
    conv_id; both window passes share its sort."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return transcripts.select(
        "conv_id",
        F.row_number().over(w).alias("depth"),
        F.sha2(
            F.concat_ws(SEP, F.collect_list(content_col).over(cum)), 256
        ).alias("prefix_hash"),
        F.lead(content_col).over(w).alias("next_content"),
        F.count("*").over(full).alias("owner_len"),
    )


def action_paths(
    transcripts: DataFrame, content_col: str = "role"
) -> DataFrame:
    """One row per conversation: the ordered content sequence as an
    array, its length, and its sha256 identity. One map-side-combined
    groupBy; ordering is reconstructed from (turn_idx, content) structs
    so the result is deterministic under any input partitioning."""
    path = F.transform(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", F.col(content_col).alias("c")))
        ),
        lambda s: s["c"],
    )
    return transcripts.groupBy("conv_id").agg(
        path.alias("path"),
        F.count("*").alias("path_len"),
        F.sha2(F.concat_ws(SEP, path), 256).alias("path_hash"),
    )


def trajectory_dedup(
    transcripts: DataFrame, content_col: str = "role"
) -> DataFrame:
    """Keep-one-witness dedup of identical action sequences: one row
    per DISTINCT path with how many conversations share it and the
    lexicographically smallest conv_id as the kept witness (the same
    deterministic-witness rule the exact text dedup uses,
    operators/dedup.py). Two exchanges: conv_id, then path_hash."""
    return (
        action_paths(transcripts, content_col)
        .groupBy("path_hash")
        .agg(
            F.first("path_len").alias("path_len"),
            F.count("*").alias("n_conversations"),
            F.min("conv_id").alias("witness_conv_id"),
        )
    )


def prefix_subsumption(
    transcripts: DataFrame, content_col: str = "role"
) -> DataFrame:
    """Truncated-duplicate detection: a conversation is SUBSUMED when
    its complete path appears as a PROPER prefix of a longer
    conversation's path (a cut-off export / retry stub of the fuller
    episode). Returns every conversation with ``subsumed`` and, when
    subsumed, the longest subsuming path length.

    Mechanics: the per-turn prefix table keyed by (depth, prefix_hash)
    is aggregated to the max owning-path length per prefix (the owner
    length rides the SAME window pass that builds the prefixes — no
    extra join); a conversation is subsumed iff the aggregate at (its
    path_len, its path_hash) exceeds its own length. Left join on the
    fixed-width hash key — no path strings cross the shuffle.
    Equal-length duplicates are NOT subsumption (that is
    trajectory_dedup's keep-one-witness job)."""
    paths = action_paths(transcripts, content_col).select(
        "conv_id", "path_len", "path_hash"
    )
    prefix_max = (
        _prefix_turns(transcripts, content_col)
        .groupBy("depth", "prefix_hash")
        .agg(F.max("owner_len").alias("max_owner_len"))
    )
    return (
        paths.join(
            prefix_max,
            (paths["path_len"] == prefix_max["depth"])
            & (paths["path_hash"] == prefix_max["prefix_hash"]),
            "left",
        )
        .select(
            "conv_id",
            paths["path_len"],
            paths["path_hash"],
            (F.coalesce("max_owner_len", F.lit(0)) > F.col("path_len")).alias(
                "subsumed"
            ),
            F.when(
                F.col("max_owner_len") > F.col("path_len"),
                F.col("max_owner_len"),
            ).alias("subsumed_by_len"),
        )
    )


def path_forks(
    transcripts: DataFrame,
    content_col: str = "role",
    min_branches: int = 2,
) -> DataFrame:
    """Prefix-tree fork mining: for every shared prefix, how many
    conversations pass through it and how many DISTINCT continuations
    follow — the decision points of the corpus (where do identically-
    prefixed episodes diverge?). Returns prefixes with at least
    ``min_branches`` distinct next-turn contents, plus how many
    conversations END exactly at the prefix (terminal weight).
    Curation use: sampling weights at fork points keep a trajectory
    mix from collapsing onto the majority branch."""
    if min_branches < 1:
        raise ValueError("min_branches must be >= 1")
    return (
        _prefix_turns(transcripts, content_col)
        .groupBy("depth", "prefix_hash")
        .agg(
            F.count("*").alias("n_conversations"),
            F.count_distinct("next_content").alias("n_branches"),
            F.sum(F.col("next_content").isNull().cast("long")).alias(
                "n_terminal"
            ),
        )
        .where(F.col("n_branches") >= min_branches)
    )
