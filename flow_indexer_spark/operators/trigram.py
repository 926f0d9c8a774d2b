"""Trigram index: index-accelerated substring and regex search.

The reference's query model is entity-exact: an IP either was extracted
from a document or it wasn't, and ``Dump`` then re-greps the matched
source files for the raw substring (/root/reference/flowindexer/
flowindexer.go:399-420, backend/bro.go:52-72).  That re-grep is a full
scan of every matched file.  The standard way to make *arbitrary
substring* search index-accelerated — without knowing the query
vocabulary at ingest time — is a **character-trigram index** (Google
Code Search, R. Cox, "Regular Expression Matching with a Trigram
Index", 2012; same design in Zoekt and PostgreSQL pg_trgm): every
document posts the set of 3-grams of its text; a literal query of
length >= 3 can only match documents that contain EVERY trigram of the
literal, so candidates come from an AND over |q|-2 posting lists and
only candidates are verified against the raw text.

Scale shape:

- **Build** is one explode + one salted group-by — identical shape to
  the entity postings build (operators/postings.py), because a trigram
  IS an entity with ``entity_class='trigram3'``.  The distinct-trigram
  universe is bounded by alphabet**3, so the index has few keys and a
  skewed df distribution — exactly the hot-key case the salted
  aggregate exists for.
- **Search** filters the exploded postings to the query's trigrams
  (an IN over <= a few dozen literals — pushed into the parquet scan),
  so the shuffled volume is the *query trigrams'* rows, never the
  corpus.  The AND is one group-by counting distinct required grams.
- **Verify** joins the candidate ids back to the corpus (left-semi)
  and applies the exact predicate — false positives from the trigram
  abstraction are removed, so results are EXACT, which is what lets an
  independent full-scan oracle check the whole path.

The regex front-end implements the useful core of Cox's query
derivation for a restricted pattern language: top-level alternation
(``|``) over sequences of literals separated by ``.*`` gaps.  Each
alternative demands the union of its literals' trigram sets (AND);
alternatives OR together.  An alternative with no trigram >= 3 chars
degrades to a full scan of the corpus (flagged, never silent).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

#: regex metacharacters outside the supported literal / ``.*`` / ``|``
#: subset.  ``.`` is only legal as part of ``.*``.
_UNSUPPORTED = re.compile(r"[\[\]\(\)\{\}\+\?\^\$\\]")


def char_trigrams(text_col: str | Column = "text") -> Column:
    """Distinct character 3-grams of a string, in row (no shuffle).

    Documents shorter than 3 chars produce an empty array.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - 2),
        lambda i: c.substr(i, F.lit(3)),
    )
    # sequence(1, n) flips to a DESCENDING [1, 0] when n < 1 (step is
    # inferred from the endpoints), so short strings need an explicit
    # empty-array branch rather than a greatest() clamp.
    return F.when(F.length(c) >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def trigram_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded trigram index: one row per (gram, document).

    This long format is the queryable form (the AND is a group-by over
    it); the stored form would go through
    ``postings.build_postings`` with ``entity_class='trigram3'`` —
    a trigram is just an entity, so the whole storage/compaction/
    incremental-merge machinery applies unchanged.
    """
    return df.select(
        F.col(id_col), F.explode(char_trigrams(text_col)).alias("gram")
    )


def trigram_df_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", topk: int = 10
) -> DataFrame:
    """Document frequency of the hottest trigrams — the index's skew
    report (hot grams are the useless ones; Zoekt prunes its query set
    by exactly this statistic).  Returns (gram, df) by df desc."""
    return (
        trigram_postings(df, id_col, text_col)
        .groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("df"))
        .orderBy(F.col("df").desc(), F.col("gram").asc())
        .limit(topk)
    )


def _literal_grams(literal: str) -> set[str]:
    return {literal[i : i + 3] for i in range(len(literal) - 2)}


def _candidates(
    index: DataFrame, id_col: str, required: set[str]
) -> DataFrame:
    """Documents whose trigram set contains EVERY required gram."""
    hits = index.filter(F.col("gram").isin(sorted(required)))
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("gram").alias("_ng"))
        .filter(F.col("_ng") == len(required))
        .select(id_col)
    )


def substring_search(
    df: DataFrame,
    literal: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact substring search, trigram-accelerated.

    Returns the ``id_col`` of every document whose text contains
    ``literal``.  Queries shorter than 3 characters carry no trigram
    evidence and fall back to the direct scan (still exact — just not
    index-pruned), mirroring pg_trgm's behaviour for short patterns.
    """
    if not literal:
        raise ValueError("empty literal")
    verify = df.filter(F.col(text_col).contains(literal)).select(id_col)
    required = _literal_grams(literal)
    if not required:
        return verify
    idx = index if index is not None else trigram_postings(df, id_col, text_col)
    cand = _candidates(idx, id_col, required)
    return (
        df.join(cand, id_col, "left_semi")
        .filter(F.col(text_col).contains(literal))
        .select(id_col)
    )


def regex_required_grams(pattern: str) -> list[set[str]]:
    """Derive the trigram query from a restricted regex.

    Supported grammar (Cox 2012's core):
        alt  := seq ('|' seq)*
        seq  := literal ('.*' literal)*
    Returns one required-gram set per alternative (AND within, OR
    across).  An empty set means that alternative cannot be pruned and
    forces a full scan.  Unsupported metacharacters raise ValueError —
    a constrained surface that errors loudly beats one that silently
    drops the index.
    """
    if _UNSUPPORTED.search(pattern):
        raise ValueError(
            f"unsupported regex metacharacter in {pattern!r}: the trigram "
            "planner accepts literals, '.*' gaps, and top-level '|' only"
        )
    if "." in pattern.replace(".*", ""):
        raise ValueError(
            f"bare '.' in {pattern!r}: only '.*' gaps are plannable"
        )
    alts = []
    for seq in pattern.split("|"):
        required: set[str] = set()
        for literal in seq.split(".*"):
            required |= _literal_grams(literal)
        alts.append(required)
    return alts


def regex_search(
    df: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Regex search over the restricted pattern language, trigram-
    accelerated and exactly verified with the engine's native regex
    (``rlike`` — partial match, same semantics as DuckDB's
    ``regexp_matches``).
    """
    alts = regex_required_grams(pattern)
    verify = F.col(text_col).rlike(pattern)
    if any(not a for a in alts):
        # some alternative is unprunable -> index can't exclude anything
        return df.filter(verify).select(id_col)
    idx = index if index is not None else trigram_postings(df, id_col, text_col)
    cand = _candidates(idx, id_col, alts[0])
    for a in alts[1:]:
        cand = cand.union(_candidates(idx, id_col, a))
    cand = cand.distinct()
    return df.join(cand, id_col, "left_semi").filter(verify).select(id_col)
