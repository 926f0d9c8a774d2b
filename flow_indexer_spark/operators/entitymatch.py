"""Fuzzy entity matching and canonicalization.

The reference folds every textual IP representation into one canonical
key space before indexing (ipv4/ipv6 parse → fixed-width key,
/root/reference/ipset/set.go + backend extractors), so "the same entity
spelled two ways" never splits a posting list.  A transcript corpus has
the same problem for *arbitrary* string entities — tool names, user
handles, entity mentions — where the variants are typos and Unicode
spelling differences rather than IP notations.  This module supplies the
two canonicalizers a 100 TB pipeline needs:

- **FastSS deletion-neighborhood matching** (Bocek, Hunt, Stiller 2007,
  "Fast Similarity Search in Large Dictionaries"): two strings are within
  edit distance *k* only if their depth-*k* deletion neighborhoods
  intersect.  Blocking therefore becomes an equi-join on deleted-variant
  keys — no cross join — followed by an exact ``levenshtein`` verify
  (JVM-native, whole-stage codegen).  Variant generation is an in-row
  higher-order function (``transform`` over ``sequence``), so the
  candidate stage is one explode + one shuffle on the variant key.
  Skew guard: ``max_variant_df`` drops degenerate variant buckets (very
  short strings share deletion variants with everything) the same way
  the n-gram/LSH dedup paths cap posting frequency.

- **Unicode fold-key dedup**: lower-case + accent folding as a pure
  in-row ``translate`` (no Python, no normalization UDF), giving an
  equi-joinable canonical key.  The DuckDB oracle uses its independent
  ``strip_accents`` implementation, so agreement is evidence the fold
  table is right, not a shared-code tautology.

Canonical-id assignment reuses the alternating large/small-star
connected-components fold from :mod:`flow_indexer_spark.operators.dedup`
(Kiveris et al. 2014) so fuzzy-match graphs collapse in O(log n) rounds
at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flow_indexer_spark.operators.dedup import connected_components


def deletion_variants(col: str | Column, max_deletions: int = 1) -> Column:
    """Depth-``max_deletions`` deletion neighborhood of a string, the
    string itself included — an ``array<string>`` built entirely in-row.

    Depth 1 is ``transform(sequence(1, length(s)), i -> delete char i)``;
    deeper levels re-apply the same fold to the previous frontier and
    union.  The array is deduplicated so repeated characters don't inflate
    the explode.
    """
    c = F.col(col) if isinstance(col, str) else col
    if max_deletions < 1:
        raise ValueError(f"max_deletions must be >= 1, got {max_deletions}")

    def _delete_each(s: Column) -> Column:
        # all strings formed by deleting exactly one character of s
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1),
                F.substr(s, i + 1, F.length(s)),
            ),
        )

    frontier = F.array(c)
    out = F.array(c)
    for _ in range(max_deletions):
        frontier = F.array_distinct(F.flatten(F.transform(frontier, _delete_each)))
        out = F.array_union(out, frontier)
    return out


def fastss_match(
    query_df: DataFrame,
    vocab_df: DataFrame,
    query_col: str = "term",
    vocab_col: str = "term",
    max_dist: int = 1,
    min_len: int = 2,
    max_variant_df: int | None = None,
) -> DataFrame:
    """All (query term, vocab term) pairs within edit distance
    ``max_dist``, found by deletion-neighborhood blocking + exact
    levenshtein verify.

    Plan shape: two in-row variant expansions → explode → equi-join on
    the variant key → distinct candidate pairs → native ``levenshtein``
    filter.  Strings shorter than ``min_len`` are dropped (their deletion
    neighborhoods are near-universal keys); ``max_variant_df`` optionally
    drops variant buckets seen on more than that many vocab terms — the
    skew cap for hub variants, same contract as ``max_entity_df`` in the
    co-occurrence graph.
    """
    q = (
        query_df.select(F.col(query_col).alias("q"))
        .filter(F.length("q") >= min_len)
        .distinct()
        .select("q", F.explode(deletion_variants("q", max_dist)).alias("v"))
    )
    w = (
        vocab_df.select(F.col(vocab_col).alias("w"))
        .filter(F.length("w") >= min_len)
        .distinct()
        .select("w", F.explode(deletion_variants("w", max_dist)).alias("v"))
    )
    if max_variant_df is not None:
        keep = (
            w.groupBy("v")
            .agg(F.count_distinct("w").alias("vdf"))
            .filter(F.col("vdf") <= max_variant_df)
            .select("v")
        )
        w = w.join(keep, "v")
    cand = q.join(w, "v").select("q", "w").distinct()
    return (
        cand.withColumn("dist", F.levenshtein("q", "w"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("q").alias(query_col + "_q" if query_col == vocab_col else query_col),
            F.col("w").alias(vocab_col),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def fuzzy_canonical_ids(
    df: DataFrame,
    col: str = "term",
    max_dist: int = 1,
    min_len: int = 2,
    max_variant_df: int | None = None,
) -> DataFrame:
    """Canonical spelling per term: FastSS self-match within
    ``max_dist`` → connected components → lexicographic-min
    representative per component.

    Returns ``(term, canonical, is_canonical)`` for every distinct input
    term (singletons map to themselves).  The CC fold is the star
    algorithm, so a web-scale variant graph collapses in O(log n)
    shuffles; component labels are min-strings, deterministic.
    """
    terms = df.select(F.col(col).alias("term")).filter(
        F.length("term") >= min_len
    ).distinct()
    pairs = fastss_match(
        terms, terms, "term", "term", max_dist=max_dist,
        min_len=min_len, max_variant_df=max_variant_df,
    ).filter(F.col("term_q") != F.col("term"))
    comp = connected_components(
        pairs.select(F.col("term_q").alias("src"), F.col("term").alias("dst")),
        "src",
        "dst",
    )
    return (
        terms.join(comp.withColumnRenamed("node", "term"), "term", "left")
        .select(
            "term",
            F.coalesce("component", "term").alias("canonical"),
            (F.coalesce("component", "term") == F.col("term")).alias("is_canonical"),
        )
    )


#: accent fold table (latin-1 + latin-extended vowels/consonants the corpus
#: can realistically contain); applied AFTER lower-casing.  Deliberately
#: diacritics-only: 'ø' is a distinct letter (no combining decomposition in
#: NFKD), so neither this table nor an NFKD-based fold maps it to 'o' — the
#: DuckDB ``strip_accents`` oracle agrees on that boundary.
_ACCENTED = "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
_FOLDED = "aaaaaaceeeeiiiinooooouuuuyy"
assert len(_ACCENTED) == len(_FOLDED)


def fold_key(col: str | Column) -> Column:
    """Case + accent fold key: ``translate(lower(s), accented, plain)``.
    Pure in-row, JVM-side; the equi-join/group key for Unicode-insensitive
    dedup.  (Full NFKD is a library job; this table covers the latin
    repertoire the synthetic corpus and typical log text use, and the
    oracle cross-checks it against an independent ``strip_accents``.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.lower(c), _ACCENTED, _FOLDED)


def fold_key_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group documents by case/accent fold key; keeper = min id per group.

    Returns ``(id, keeper_id, group_size, n_spellings)`` — ``n_spellings``
    counts distinct raw spellings inside the group (1 means the group is
    an exact-dup group, >1 means the fold actually merged variants).
    One hash aggregate + one broadcast-size window; no Python.
    """
    keyed = df.select(F.col(id_col), F.col(text_col).alias("_raw")).withColumn(
        "_fk", fold_key("_raw")
    )
    groups = keyed.groupBy("_fk").agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").alias("group_size"),
        F.count_distinct("_raw").alias("n_spellings"),
    )
    return keyed.join(groups, "_fk").select(
        F.col(id_col),
        "keeper_id",
        F.col("group_size").cast("bigint").alias("group_size"),
        F.col("n_spellings").cast("bigint").alias("n_spellings"),
    )
