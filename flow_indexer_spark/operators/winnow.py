"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).

The guarantee the simpler fingerprint families here lack:
`doc_fingerprint` (one hash per doc) misses partial overlap;
`dedup_exact_substring` keeps EVERY k-gram (storage ∝ corpus).
Winnowing selects, from every window of ``w`` consecutive k-gram
hashes, the minimum (rightmost on ties) — guaranteeing any shared
substring of length >= w+k-1 tokens yields at least one shared
fingerprint, with expected density 2/(w+1) instead of 1.

Determinism / portability: the rightmost-min of a window is selected
with ONE integer window MIN via the encoding
``key = h * 2^20 + (2^20-1 - pos)`` (h is the portable 32-bit md5
prefix; documents are assumed under 2^20 grams — a million-token
document belongs in `sliding_window_chunks` first) — min(key) orders by
(h asc, pos desc), so both engines pick the identical fingerprint
with plain integer arithmetic; no struct comparators, no floats
anywhere.

Scale shape: gram rows explode in-row; selection is one window pass
PARTITIONED by doc (frames of ``w`` rows); the shared-pair report
joins on the fingerprint hash with a document-frequency cap — the
postings-join discipline — so a boilerplate fingerprint shared by
half the corpus cannot quadratically explode the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flow_indexer_spark.operators.dedup import md5_int32, tokens

__all__ = ["winnow_fingerprints", "winnow_shared_pairs"]

_POS_BITS = 20
_POS_MOD = 1 << _POS_BITS


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Selected fingerprints (doc, pos, hash): the rightmost-min k-gram
    hash of every full window of ``w`` consecutive grams, distinct per
    document.  Documents with fewer than ``k + w - 1`` tokens (< one
    full window) contribute nothing — the standard convention."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    tok = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
    grams = F.when(
        F.size(tok) >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        F.col(id_col).alias("doc"), F.posexplode(grams).alias("pos", "_g")
    ).select("doc", "pos", md5_int32(F.col("_g")).alias("hash"))
    wd = Window.partitionBy("doc")
    g = g.withColumn("_n", F.count("*").over(wd))
    key = F.col("hash") * _POS_MOD + (_POS_MOD - 1 - F.col("pos"))
    frame = (
        Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = (
        g.withColumn("_key", key)
        .withColumn("_wmin", F.min("_key").over(frame))
        # only FULL windows select (start pos <= n - w)
        .filter(F.col("pos") <= F.col("_n") - w)
        .select(
            "doc",
            (_POS_MOD - 1 - (F.col("_wmin") % _POS_MOD))
            .cast("int")
            .alias("pos"),
            F.shiftright("_wmin", _POS_BITS).cast("bigint").alias("hash"),
        )
        .distinct()
    )
    return sel


def winnow_shared_pairs(
    fingerprints: DataFrame,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (the MOSS plagiarism report): fingerprints held by more than
    ``max_df`` documents are boilerplate and dropped BEFORE the
    self-join (the LSH bucket-cap discipline — without it one
    ubiquitous fingerprint joins half the corpus against itself).
    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b."""
    fp = fingerprints.select("doc", "hash").distinct()
    df_ok = (
        fp.groupBy("hash")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("hash")
    )
    fp = fp.join(df_ok, "hash", "left_semi")
    a = fp.select(F.col("hash"), F.col("doc").alias("doc_a"))
    b = fp.select(F.col("hash"), F.col("doc").alias("doc_b"))
    return (
        a.join(b, "hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
