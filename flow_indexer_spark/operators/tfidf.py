"""TF-IDF document vectors and lexical cosine similarity pairs.

The classic IR vector model (Salton & Buckley 1988; the lnc weighting
family): w(d,t) = ln(1+tf) * ln(N/df), document similarity = cosine.
It complements the embedding-cosine near-dup family with the LEXICAL
similarity signal — no model required, explainable term overlap — and
the MinHash family with a graded score instead of a set resemblance.

Scale shape:

- Weights live on an inverted-index layout (term -> (doc, w)) — the
  postings discipline.  df and N are one aggregate each; the idf
  factor joins back by broadcast (vocab-sized).
- Candidate pairs come from the index itself (docs sharing a term),
  with a df cap dropping stopword-grade terms BEFORE the self-join —
  without it one ubiquitous term joins half the corpus to itself.
  The dot product is then ONE groupBy over the joined postings.
- Norms are per-doc aggregates re-attached to the tiny pair table.

Cross-engine determinism: weights are quantized to a 1e-6 integer
lattice (round(ln(1+tf) * ln(N/df) * 1e6) as bigint), so dot products
and squared norms are EXACT integer sums — order-free at any
parallelism; the only trailing floats are sqrt (IEEE-exact on both
engines) and one rounded division per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.operators.dedup import tokens

__all__ = ["tfidf_weights", "tfidf_cosine_pairs"]

_W_GRID = 1_000_000


def tfidf_weights(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Inverted-index TF-IDF weights: (token, doc, w) with
    w = round(ln(1+tf) * ln(N/df) * 1e6) as bigint (terms present in
    every document get w = 0 and are kept — the df cap at pair time
    is the latency knob, not a semantics change)."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token")
        )
        .groupBy("doc", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    n = docs.select(F.col(id_col)).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .select(
            "token",
            "doc",
            F.round(
                F.log(F.lit(1.0) + F.col("tf"))
                * F.log(F.col("n_docs") / F.col("df"))
                * _W_GRID
            )
            .cast("bigint")
            .alias("w"),
        )
    )


def tfidf_cosine_pairs(
    weights: DataFrame,
    min_cosine: float = 0.3,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs with cosine >= ``min_cosine`` over the lattice
    weights: (doc_a, doc_b, dot, norm_a, norm_b, cosine), doc_a <
    doc_b.  ``max_df`` drops terms shared by more than that many docs
    from CANDIDATE GENERATION and the dot product both (stopword-grade
    terms carry near-zero idf weight anyway; the cap bounds the
    self-join fan-out, the same discipline as the LSH bucket cap)."""
    df_ok = (
        weights.groupBy("token")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("token")
    )
    wok = weights.join(df_ok, "token", "left_semi")
    norms = wok.groupBy("doc").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("norm2")
    )
    a = wok.select("token", F.col("doc").alias("doc_a"), F.col("w").alias("wa"))
    b = wok.select("token", F.col("doc").alias("doc_b"), F.col("w").alias("wb"))
    dots = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("bigint").alias("dot"))
    )
    out = (
        dots.join(
            norms.withColumnsRenamed({"doc": "doc_a", "norm2": "norm_a"}),
            "doc_a",
        )
        .join(
            norms.withColumnsRenamed({"doc": "doc_b", "norm2": "norm_b"}),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "dot",
            "norm_a",
            "norm_b",
            F.round(
                F.col("dot") / (F.sqrt("norm_a") * F.sqrt("norm_b")), 9
            ).alias("cosine"),
        )
    )
    return out.filter(F.col("cosine") >= F.lit(min_cosine))
