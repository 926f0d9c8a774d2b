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


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 50,
) -> DataFrame:
    """Top adjacent-bigram collocations by pointwise mutual information
    (Church & Hanks 1990; the word2vec phrase-pass scoring family):
    ``pmi = ln( p(w1,w2) / (p(w1) p(w2)) )`` with p() from corpus bigram
    / unigram counts. The phrase-mining pre-pass that decides which
    token pairs the tokenizer or the index should treat as one unit.

    Determinism/parity contract: selection and ordering use ONLY
    integers and strings (``n_pair DESC, w1, w2`` after the
    ``min_count`` floor) — the float score never decides which rows
    appear, so a 1-ulp libm divergence can't change the result set;
    the reported ``pmi`` is one ln of one exactly-representable integer
    ratio, rounded to 10 decimals on both engines.

    Scale shape: one explode to bigrams + two map-side-combined count
    aggs + two joins against the unigram counts (broadcast when the
    vocabulary is small; plain hash joins otherwise — correctness never
    depends on it). No per-row Python, no window over the corpus.
    """
    tok = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    toks = df.select(tok.alias("tok"))
    uni = (
        toks.select(F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    n_words = uni.agg(F.sum("n_w").alias("n")).select("n")
    bi = toks.select(
        F.when(
            F.size("tok") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("tok") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("tok"), i).alias("w1"),
                    F.element_at(F.col("tok"), i + 1).alias("w2"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        .alias("bi")
    )
    pairs = (
        bi.select(F.explode("bi").alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    n_pairs = (
        bi.select(F.size("bi").alias("k")).agg(F.sum("k").alias("np")).select("np")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    scored = (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_words))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") * F.col("n") * F.col("n"))
                    / (F.col("np").cast("double") * F.col("n_w1") * F.col("n_w2"))
                ),
                10,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("n_pair"), "w1", "w2").limit(topk)
