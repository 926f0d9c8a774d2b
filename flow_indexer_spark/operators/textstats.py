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
