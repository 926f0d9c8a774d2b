"""Positional token index + phrase search.

Extends the reference's core query — "which documents contain this
entity" (/root/reference/store/leveldb.go:147-205) — to "which documents
contain this exact token PHRASE", the standard next step for an inverted
index over text. The posting value grows from (doc) to (doc, position);
phrase matching becomes position arithmetic instead of substring
scanning, so query cost is proportional to the phrase words' posting
lists, not to the corpus.

Scale shape: ``token_positions`` is one explode (rows = corpus token
count — same volume the entity extractor already shuffles); written
sorted by token, an IN (<phrase words>) filter prunes parquet files via
min/max exactly like the entity index's key-range scans.
``phrase_search`` then needs ONE groupBy over just the phrase words'
occurrence rows: each occurrence of word i at position p votes for a
candidate phrase start p - i, and a start with votes from all k words is
a match — no collect_list, no per-row Python, no self-join chain of
k-1 position joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_positions(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
) -> DataFrame:
    """Flat positional postings: one row per token occurrence with its
    0-based position among the non-empty whitespace tokens. Position is
    assigned BEFORE dropping empties would shift it — split+filter keeps
    relative order, so positions index the filtered token sequence (the
    same sequence both the scan twin and the DuckDB oracle use)."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    return df.select(
        *[F.col(c) for c in id_cols], F.posexplode(toks).alias("pos", "token")
    )


def _phrase_words(phrase: str | list[str]) -> list[str]:
    words = phrase.split() if isinstance(phrase, str) else list(phrase)
    if not words:
        raise ValueError("empty phrase")
    return words


def phrase_search(
    positions: DataFrame,
    phrase: str | list[str],
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Documents (id_cols tuples) containing the exact token phrase.

    Each posting row whose token equals phrase word i contributes a vote
    for phrase start ``pos - i`` (a token appearing at several phrase
    offsets — "a b a" — votes once per offset, via the in-row offsets
    explode). A start position backed by all ``len(phrase)`` distinct
    offsets is a real occurrence: the words sit consecutively. Plan:
    pushed-down IN filter on token (file-pruned when the table is
    token-sorted) -> explode of a tiny literal array -> ONE groupBy on
    (doc, start) with map-side combine -> distinct docs.
    """
    words = _phrase_words(phrase)
    k = len(words)
    offsets = F.array(
        *[
            F.struct(F.lit(w).alias("w"), F.lit(i).alias("i"))
            for i, w in enumerate(words)
        ]
    )
    votes = (
        positions.filter(F.col("token").isin(words))
        .select(
            *[F.col(c) for c in id_cols],
            "pos",
            F.explode(
                F.filter(offsets, lambda e: e["w"] == F.col("token"))
            ).alias("_o"),
        )
        .select(
            *[F.col(c) for c in id_cols],
            (F.col("pos") - F.col("_o.i")).alias("_start"),
            F.col("_o.i").alias("_i"),
        )
        .filter(F.col("_start") >= 0)
    )
    return (
        votes.groupBy(*id_cols, "_start")
        .agg(F.count_distinct("_i").alias("_n"))
        .filter(F.col("_n") == k)
        .select(*id_cols)
        .dropDuplicates()
        .orderBy(*id_cols)
    )


def phrase_search_scan(
    df: DataFrame,
    phrase: str | list[str],
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
) -> DataFrame:
    """Brute-force differential twin: in-row token-array scan, no index.
    exists(start): tokens[start + i] == words[i] for all i. The shape the
    DuckDB oracle mirrors; also the honest baseline the index beats."""
    from flow_indexer_spark.functions.inrow import bind

    words = _phrase_words(phrase)
    k = len(words)

    def _hit(toks: "F.Column") -> "F.Column":
        # token array bound once — slicing the split expression inside
        # the exists lambda would re-split per start position, O(len^2)
        starts = F.sequence(F.lit(1), F.size(toks) - (k - 1))
        match_at = lambda s: F.aggregate(  # noqa: E731
            F.zip_with(
                F.slice(toks, s, k),
                F.array(*[F.lit(w) for w in words]),
                lambda a, b: a == b,
            ),
            F.lit(True),
            lambda acc, x: acc & x,
        )
        return F.when(
            F.size(toks) >= k, F.exists(starts, match_at)
        ).otherwise(F.lit(False))

    hit = bind(F.filter(F.split(text_col, " "), lambda x: x != ""), _hit)
    return df.filter(hit).select(*[F.col(c) for c in id_cols]).orderBy(*id_cols)
