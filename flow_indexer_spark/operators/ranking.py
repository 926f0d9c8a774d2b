"""Ranked retrieval: BM25 scoring over the token index.

The reference's query surface is boolean — a document either contains
the entity or it doesn't (/root/reference/store/leveldb.go:147-205).
A corpus/search pipeline also needs RANKED lookup: score documents for
a multi-term query and return the best k. BM25 (Robertson/Spärck Jones;
the Lucene +1 idf variant so scores stay positive) is the standard.

Scale shape: the only per-corpus work is one explode filtered to the
query's terms — the IN filter pushes into the scan, so the shuffled
volume is the query terms' occurrence rows, not the corpus. Document
frequency for the query terms and average document length are tiny
aggregates (avgdl is one row, broadcast by AQE in the cross join). The
final top-k is a TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.operators.dedup import tokens


def bm25_search(
    df: DataFrame,
    query: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-words query by BM25.

    score(d) = sum over query terms t of
        ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
        * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

    Repeated query terms count once (a bag-of-words query set). Returns
    (id_col, score) ordered by score desc, id tiebreak asc.
    """
    words = sorted(set(query.split() if isinstance(query, str) else query))
    if not words:
        raise ValueError("empty query")

    toks = tokens(text_col)
    base = df.select(
        F.col(id_col), F.size(toks).alias("_dl"), F.explode(toks).alias("_t")
    ).filter(F.col("_t").isin(words))
    tf = base.groupBy(id_col, "_t").agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    stats = df.agg(
        F.count("*").alias("_n"),
        F.avg(F.size(toks)).alias("_avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tfnorm = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf")
        + F.lit(k1)
        * (F.lit(1 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", idf * tfnorm)
        .groupBy(id_col)
        .agg(F.sum("_s").alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topk)
    )


def rrf_fuse(
    rankings: DataFrame,
    k0: int = 60,
    topk: int | None = None,
    dp: int = 9,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    over any number of rankers: input long-form (list_id, item, rank
    starting at 1), output (item, n_lists, rrf_score) with
    rrf_score = sum over lists of 1/(k0 + rank) — the standard way to
    combine BM25 with embedding ANN without score calibration (ranks
    only, so incomparable score scales never touch).

    Determinism: each term is one division of exact integers; the
    per-item fold runs in sorted list_id order (oracle: ``SUM(term
    ORDER BY list_id)``), rounded to ``dp``; output ordering is
    (score DESC, item) so equal-score items are stable.  Scale: one
    groupBy on item (fold width = number of rankers, a constant);
    ``topk`` turns the global sort into TakeOrderedAndProject.
    """
    terms = rankings.select(
        F.col("item"),
        F.col("list_id").alias("_l"),
        (1.0 / (k0 + F.col("rank"))).alias("_term"),
    )
    fused = terms.groupBy("item").agg(
        F.count("*").cast("bigint").alias("n_lists"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_l", "_term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_term"],
            ),
            dp,
        ).alias("rrf_score"),
    )
    out = fused.orderBy(F.desc("rrf_score"), F.asc("item"))
    return out.limit(topk) if topk else out
