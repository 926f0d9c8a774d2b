"""Skew diagnostics: measure key-distribution heat before it burns a job.

The pipeline handles skew *reactively* in several places — salted postings
chunks (operators/postings.py), LSH bucket-size caps (operators/dedup.py),
the hot-group prefilter (operators/curation.py per_group_cap). This module
is the *proactive* side: a one-shuffle report of how hot each key actually
is, plus the salt factor the salted paths should use for it — the
flow-indexer analogue is sizing an index before building it
(/root/reference/flowindexer/flowindexer.go stats reporting), generalized
to any key.

Plan shape: groupBy(key).count() — ONE map-side-combined shuffle over
(key, 1) pairs regardless of input width — then a tiny global aggregate
broadcast back for shares, and a TakeOrdered for the top-k. Nothing here
is ever corpus-sized after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Top-k heaviest keys with their share of the corpus, skew factor
    (rows vs the mean key), and the salt fan-out a salted aggregation
    should apply to them (ceil(rows / target_rows_per_task), min 1 —
    the `n_salt` knob of build_postings, sized from data instead of
    guessed). Deterministic order: rows desc, then key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_k <= 0 or target_rows_per_task <= 0:
        raise ValueError("top_k and target_rows_per_task must be positive")
    # concat_ws silently SKIPS nulls, which would merge distinct composite
    # keys like (null,'a') and ('a',null); a per-component sentinel keeps
    # every key distinct and gives a single null key a visible name.
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in key_cols
        ],
    )
    counts = df.groupBy(key.alias("key")).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            (
                F.col("n_rows")
                / (F.col("_total").cast("double") / F.col("_n_keys"))
            ).alias("skew_factor"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / F.lit(target_rows_per_task)),
            )
            .cast("int")
            .alias("n_salt"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_k)
    )
