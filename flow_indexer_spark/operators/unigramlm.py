"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece unigram model) trained and applied on the engine —
the other major tokenizer family next to :mod:`tokenize`'s BPE.

Pipeline:
- :func:`unigram_seed_vocab` — the SentencePiece seed step: count every
  substring (length <= ``max_piece_len``) of every corpus word, keep
  the ``seed_size`` most frequent plus every single character, and
  assign each piece the cost -ln(count/total) of its relative
  frequency.
- :func:`unigram_viterbi_segment` — segment text with a piece-cost
  vocabulary: per WORD a Viterbi lattice DP (min total cost over all
  segmentations) expressed entirely as an in-row higher-order-function
  fold — no UDF — then reassembled per document.
- :func:`unigram_hard_em` — hard-EM (Viterbi-EM) refinement: re-segment
  the word table under current costs, recount pieces along the best
  paths, re-normalize. Kudo's trainer uses full forward-backward EM and
  prunes by likelihood loss; hard EM is the standard Viterbi
  approximation (documented simplification) — each iteration is the
  same DP + two count aggregations, so the trajectory is replayable by
  the SQL oracle.

Determinism (the oracle contract): piece costs are rounded to 12 dp so
DuckDB's and the JVM's ln() ulp disagreements cannot flip a lattice
comparison; DP ties break on the segmentation string (struct min =
field-order lexicographic; both engines compare strings as UTF-8
bytes). A character unseen in the vocabulary segments as itself at the
fixed UNK_COST.

Scale shape (100 TB corpus):
- The corpus is reduced ONCE to a distinct-word frequency table (one
  map-side-combined shuffle; sub-linear in corpus size) — training and
  segmentation both run on words, never re-scanning documents: the same
  word-table idiom as tokenize.bpe_train.
- Substring explode is in-row; piece counting is one O(pieces) agg.
- Segmentation joins each distinct word's substrings against the vocab
  (gram-keyed hash join — the vocab is never broadcast wholesale nor
  collected), folds the lattice in-row, and rejoins docs by word. Per
  EM iteration: the same bounded shuffles over the word table.

Reference analogue: flow-indexer reduces documents to per-entity count
tables and answers queries by joining against them
(/root/reference/store/leveldb.go); here the "entities" are subword
pieces and the query is a lattice join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cost assigned to a single character absent from the vocabulary
#: (an <unk> fallback so segmentation is total; SentencePiece reserves
#: an <unk> id the same way)
UNK_COST = 1e6


def _validate(max_piece_len: int, seed_size: int) -> None:
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    if seed_size < 1:
        raise ValueError("seed_size must be >= 1")


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    from flow_indexer_spark.operators.dedup import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("_wc"))
    )


def _substrings(word: Column, max_piece_len: int) -> Column:
    """All substrings of ``word`` with length 1..max_piece_len, one per
    (start, length) position (so a piece occurring twice in one word
    counts twice — SentencePiece's seed counting)."""
    n = F.length(word)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(i, F.least(n, i + F.lit(max_piece_len - 1))),
                lambda j: word.substr(i, j - i + 1),
            ),
        )
    )


def unigram_seed_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 2,
    seed_size: int = 1000,
) -> DataFrame:
    """Seed vocabulary: (piece, piece_count, cost) — the ``seed_size``
    highest-count substrings (count desc, piece asc: deterministic),
    plus every single character regardless of rank (they are never
    prunable — segmentation must stay total), with
    cost = round(-ln(count / total), 12) over the selected set."""
    _validate(max_piece_len, seed_size)
    return _seed_from_words(
        _word_counts(df, text_col), max_piece_len, min_count, seed_size
    )


def _distinct_subs(word: Column, max_piece_len: int) -> Column:
    return F.array_distinct(_substrings(word, max_piece_len))


def _segment_words(
    words: DataFrame, vocab_df: DataFrame, max_piece_len: int
) -> DataFrame:
    """Viterbi-segment every row of a distinct-word table: adds
    ``pieces`` (space-joined best segmentation) and ``seg_cost``
    columns. The lattice fold is pure in-row expression code."""
    L = int(max_piece_len)
    subs = (
        words.select(
            "word",
            F.explode(_distinct_subs(F.col("word"), L)).alias("piece"),
        )
        .join(vocab_df.select("piece", "cost"), ["piece"], "inner")
        .groupBy("word")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("piece", "cost"))
            ).alias("_m")
        )
    )
    # words whose substrings ALL miss the vocab still need an (empty)
    # map so the UNK fallback can carry them
    wm = words.join(subs, ["word"], "left").withColumn(
        "_m",
        F.coalesce(
            "_m", F.map_from_arrays(F.array(), F.array()).cast(
                "map<string,double>"
            )
        ),
    )

    def _best(acc, j):
        lo = F.greatest(F.lit(1), j - F.lit(L - 1))
        cands = F.transform(
            F.sequence(lo, j),
            lambda i: _cand(acc, i, j),
        )
        return F.array_min(
            F.filter(cands, lambda x: x["cost"].isNotNull())
        )

    def _cand(acc, i, j):
        piece = F.col("word").substr(i, j - i + 1)
        prev = F.element_at(acc, i)
        # try_element_at: a missing map key is a legal lattice gap
        # (ANSI-mode element_at would raise MAP_KEY_DOES_NOT_EXIST)
        pc = F.coalesce(
            F.try_element_at(F.col("_m"), piece),
            F.when(j - i + 1 == F.lit(1), F.lit(float(UNK_COST))),
        )
        return F.struct(
            (prev["cost"] + pc).alias("cost"),
            F.when(i == F.lit(1), piece)
            .otherwise(F.concat_ws(" ", prev["seg"], piece))
            .alias("seg"),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(
            F.struct(F.lit(0.0).alias("cost"), F.lit("").alias("seg"))
        ),
        lambda acc, j: F.concat(acc, F.array(_best(acc, j))),
    )
    best = F.element_at(dp, -1)
    return wm.select(
        *[c for c in words.columns],
        best["seg"].alias("pieces"),
        best["cost"].alias("seg_cost"),
    )


def unigram_viterbi_segment(
    df: DataFrame,
    vocab_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Segment every document with a (piece, cost) vocabulary: each
    DISTINCT word is Viterbi-segmented once (the word-table idiom),
    then documents reassemble by joining their token positions back.
    Returns (id, n_words, n_pieces, pieces_text, total_cost) — docs
    with no tokens are dropped; total_cost is rounded to 6 dp (per-word
    costs are exact to 12 dp; the doc sum re-associates)."""
    from flow_indexer_spark.operators.dedup import tokens

    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "word")
    )
    seg = _segment_words(
        toks.select("word").distinct(), vocab_df, max_piece_len
    )
    return (
        toks.join(seg, ["word"], "inner")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size(F.split("pieces", " "))).alias("n_pieces"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda x: x["pieces"],
                ),
            ).alias("pieces_text"),
            F.round(F.sum("seg_cost"), 6).alias("total_cost"),
        )
    )


def unigram_hard_em(
    train_df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 2,
    seed_size: int = 1000,
    iterations: int = 1,
) -> DataFrame:
    """Seed + ``iterations`` rounds of hard (Viterbi) EM: segment the
    word table under the current costs, recount pieces along the best
    paths weighted by word frequency, renormalize. Pieces that no best
    path uses are pruned (SentencePiece's shrinking step, hard-EM
    flavour) — except single characters, which always survive with
    their path counts (or count 0 -> they keep only the UNK role and
    are dropped too, matching the recount exactly). Returns the final
    (piece, piece_count, cost) table."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    words = _word_counts(train_df, text_col).localCheckpoint(eager=True)
    vocab = _seed_from_words(words, max_piece_len, min_count, seed_size)
    for _ in range(int(iterations)):
        seg = _segment_words(words, vocab, max_piece_len)
        counts = (
            seg.select(
                F.explode(F.split("pieces", " ")).alias("piece"), "_wc"
            )
            .groupBy("piece")
            .agg(F.sum("_wc").alias("piece_count"))
        )
        total = counts.agg(F.sum("piece_count").alias("_total"))
        vocab = (
            counts.join(F.broadcast(total))
            .select(
                "piece",
                "piece_count",
                F.round(
                    -F.log(
                        F.col("piece_count").cast("double")
                        / F.col("_total").cast("double")
                    ),
                    12,
                ).alias("cost"),
            )
            .localCheckpoint(eager=True)
        )
    return vocab


def _seed_from_words(
    words: DataFrame, max_piece_len: int, min_count: int, seed_size: int
) -> DataFrame:
    """unigram_seed_vocab's body over an already-built word table."""
    _validate(max_piece_len, seed_size)
    pieces = (
        words.select(
            F.explode(_substrings(F.col("word"), max_piece_len)).alias(
                "piece"
            ),
            "_wc",
        )
        .groupBy("piece")
        .agg(F.sum("_wc").alias("piece_count"))
        .filter(
            (F.col("piece_count") >= min_count) | (F.length("piece") == 1)
        )
    )
    top = pieces.orderBy(F.desc("piece_count"), F.asc("piece")).limit(
        seed_size
    )
    chars = pieces.filter(F.length("piece") == 1)
    vocab = top.union(chars).groupBy("piece").agg(
        F.max("piece_count").alias("piece_count")
    )
    total = vocab.agg(F.sum("piece_count").alias("_total"))
    return vocab.join(F.broadcast(total)).select(
        "piece",
        "piece_count",
        F.round(
            -F.log(
                F.col("piece_count").cast("double")
                / F.col("_total").cast("double")
            ),
            12,
        ).alias("cost"),
    )
