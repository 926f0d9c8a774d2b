"""Multinomial naive Bayes: language/source classification trained
on-engine.

`textstats.py` ships a gradient-descent logistic head over dense
features; the complementary classical baseline for TEXT is multinomial
naive Bayes over token counts (McCallum & Nigam 1998) — the standard
first gate for language-ID refinement, source attribution, and cheap
topic routing, trainable in two aggregations with no iteration at all.

Model: P(c | d) ∝ P(c) * prod_t P(t | c)^{n_td}, with Laplace
smoothing alpha: P(t|c) = (n_tc + alpha) / (tot_c + alpha*V), V = the
training vocabulary size.  Tokens unseen for a class score the
smoothed default alpha / (tot_c + alpha*V).

Determinism contract: every probability is ln() of an exact rational
(bigint counts; alpha an integer-valued float) — a single libm call
per row, no fold.  Scoring folds per-(doc, class) term lists in
SORTED token order (`aggregate(array_sort(collect_list(...)))`, the
diagnostics.py PSI pattern) mirroring the oracle's ``SUM(term ORDER BY
token)``; the argmax compares scores ROUNDED to ``dp`` first (ties →
smaller class name), so a 1-ulp libm divergence between JVM and
DuckDB can never flip a prediction.

Scale shape: training is two groupBy aggregations (one shuffle each,
both map-side combined).  Scoring fans each doc token row out by the
C classes (a broadcast of the tiny class table — C-bounded, the same
shape as the broadcast enrich stage) and left-joins the model on
(class, token); the model is |V|*C rows, broadcastable for real
vocabularies after a df-style frequency cap.  The per-(doc, class)
sorted fold materializes one doc's tokens per row — bounded by doc
length, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["nb_train", "nb_score", "nb_predict"]


def nb_train(
    tokens: DataFrame,
    class_col: str,
    doc_col: str,
    token_col: str,
    count_col: str,
    alpha: float = 1.0,
    dp: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Train from per-(doc, token) count rows.  Returns ``(model,
    classes)``:

    * model:   (cls, token, n, log_prob) — n the class token count,
      log_prob = ln((n+alpha)/(tot_c+alpha*V)) rounded to ``dp``;
    * classes: (cls, n_docs, tot_tokens, log_prior, log_default) —
      log_prior over the training doc counts, log_default the unseen-
      token score, both rounded.
    """
    t = tokens.select(
        F.col(class_col).alias("cls"),
        F.col(doc_col).alias("_doc"),
        F.col(token_col).alias("token"),
        F.col(count_col).cast("bigint").alias("_n"),
    )
    vocab = t.select("token").distinct().agg(
        F.count("*").cast("bigint").alias("_V")
    )
    per_class = t.groupBy("cls").agg(
        F.count_distinct("_doc").cast("bigint").alias("n_docs"),
        F.sum("_n").cast("bigint").alias("tot_tokens"),
    )
    n_docs_all = per_class.agg(
        F.sum("n_docs").cast("bigint").alias("_D")
    )
    classes = (
        per_class.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs_all))
        .select(
            "cls",
            "n_docs",
            "tot_tokens",
            F.round(
                F.log(F.col("n_docs") / F.col("_D").cast("double")), dp
            ).alias("log_prior"),
            F.round(
                F.log(
                    F.lit(alpha)
                    / (F.col("tot_tokens") + alpha * F.col("_V"))
                ),
                dp,
            ).alias("log_default"),
        )
    )
    model = (
        t.groupBy("cls", "token")
        .agg(F.sum("_n").cast("bigint").alias("n"))
        .join(
            F.broadcast(
                classes.select("cls", "tot_tokens").crossJoin(vocab)
            ),
            "cls",
        )
        .select(
            "cls",
            "token",
            "n",
            F.round(
                F.log(
                    (F.col("n") + alpha)
                    / (F.col("tot_tokens") + alpha * F.col("_V"))
                ),
                dp,
            ).alias("log_prob"),
        )
    )
    return model, classes


def nb_score(
    doc_tokens: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    doc_col: str,
    token_col: str,
    count_col: str,
    dp: int = 9,
) -> DataFrame:
    """Per-(doc, cls) log-posterior scores (unnormalized):
    log_prior + sum_t n_td * log_prob(t|c), unseen tokens at
    log_default.  The fold runs in sorted token order and the result
    is rounded to ``dp`` — see the module determinism contract.
    Returns (doc, cls, score).
    """
    d = doc_tokens.select(
        F.col(doc_col).alias("doc"),
        F.col(token_col).alias("token"),
        F.col(count_col).cast("bigint").alias("_n"),
    )
    fan = d.crossJoin(
        F.broadcast(classes.select("cls", "log_default"))
    ).join(
        F.broadcast(model.select("cls", "token", "log_prob")),
        ["cls", "token"],
        "left",
    )
    terms = fan.select(
        "doc",
        "cls",
        "token",
        (
            F.col("_n")
            * F.coalesce(F.col("log_prob"), F.col("log_default"))
        ).alias("_term"),
    )
    folded = terms.groupBy("doc", "cls").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "_term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_term"],
        ).alias("_s")
    )
    return folded.join(
        F.broadcast(classes.select("cls", "log_prior")), "cls"
    ).select(
        "doc",
        "cls",
        F.round(F.col("log_prior") + F.col("_s"), dp).alias("score"),
    )


def nb_predict(scores: DataFrame) -> DataFrame:
    """argmax over the rounded per-(doc, cls) scores, ties to the
    smaller class name.  Returns (doc, predicted, score)."""
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc", F.col("cls").alias("predicted"), "score")
    )
