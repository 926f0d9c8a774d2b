"""Text analysis for training-data curation: language ID, quality scores,
token counting, document fingerprinting.

These generalize the reference's per-document metrics (the "Wrote N unique
ips" counter, /root/reference/flowindexer/index.go:46-51) into the
per-document feature columns a corpus pipeline filters on. Everything is
an in-row projection over built-in functions — one scan, no shuffle, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flow_indexer_spark.operators.dedup import tokens

#: tiny high-frequency English function-word list for the heuristics below
STOPWORDS = ["the", "a", "of", "and", "to"]

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count(text_col: str | Column = "text") -> Column:
    return F.size(tokens(text_col))


def bpe_token_count(text_col: str | Column = "text") -> Column:
    """Token count under a BPE-style pre-split regex (native
    regexp_extract_all — JVM-side, the S6 grok pattern family)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def stopword_count(text_col: str | Column = "text", stopwords: list[str] | None = None) -> Column:
    stop = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(text_col), lambda x: F.array_contains(stop, x))).cast(
        "bigint"
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality feature columns: token/char/stopword counts plus the
    derived ratios used for corpus filtering (mean token length, stopword
    ratio). One projection."""
    n_tok = token_count(text_col)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.length(text_col).alias("n_chars_raw"),
        stopword_count(text_col).alias("n_stopwords"),
        (F.length(text_col).cast("double") / F.greatest(n_tok, F.lit(1))).alias(
            "mean_token_len"
        ),
        (
            stopword_count(text_col).cast("double") / F.greatest(n_tok, F.lit(1))
        ).alias("stopword_ratio"),
    )


def lang_id(text_col: str | Column = "text", min_stopwords: int = 2) -> Column:
    """n-gram/function-word language heuristic: >=min_stopwords English
    function words -> 'en_like' else 'other'. (A real model would be a
    pandas-UDF over fasttext; the plumbing — one projection feeding a
    groupBy — is identical.)"""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = F.split(c, " ")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "and", "of"]])
    n = F.size(F.filter(tok, lambda x: F.array_contains(stop, x)))
    return F.when(n >= min_stopwords, "en_like").otherwise("other")


def fingerprint(text_col: str | Column = "text") -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — catches shuffled/duplicated-token copies that exact hash
    misses. (Winnowing/rolling-hash variants slot in the same shape.)"""
    toks = F.array_sort(F.array_distinct(tokens(text_col)))
    return F.md5(F.concat_ws(" ", toks))


def top_distinctive_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k most distinctive terms per document by df-normalized term
    frequency (score = tf / document_frequency — TF-IDF's shape with a
    rational score instead of a log, so both engines compute it as one
    IEEE division with no libm variance).

    Topology: one shuffle for per-doc term counts (map-side combine),
    one for global document frequency, a join on term (broadcastable
    when the vocabulary is small; AQE picks it), and a per-doc top-k
    window — per-doc term sets are bounded by document length, so the
    window partition is never hot. Ties break on term text, making the
    kept set deterministic.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(docfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tf", "df", "score", F.col("_rn").alias("rank"))
    )
