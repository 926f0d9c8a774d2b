"""Speculative-decoding draft analytics: n-gram draft model +
acceptance-rate evaluation.

Serving-side speculative decoding (Leviathan et al. 2023; and the
"prompt lookup" / n-gram draft variants shipped in vLLM and
TGI) drafts the next token from a cheap model and lets the target
model accept or reject.  The *data-side* question a corpus engine can
answer exactly is: **if the draft model is the corpus bigram argmax,
what fraction of next-tokens would it predict correctly?** — the
acceptance ceiling of an n-gram drafter on this corpus, per source.
That is a pure count/join computation, so it belongs in the engine
(the reference's per-document indexer answers "which docs contain
entity X", backend/bro.go + store/leveldb.go; this answers "which
continuation follows context X, and how often is it right").

Scale shape:

- The model build is ONE groupBy over exploded bigrams (map-side
  partial aggregation collapses repeats before the shuffle) followed
  by a per-context argmax window.  The window partitions by context
  token, so parallelism is vocab-wide and no partition exceeds the
  distinct-continuation count of one context.
- The evaluation joins positions against the model on the context
  token.  The model has exactly one row per context (<= vocab rows,
  orders of magnitude smaller than the corpus position stream), so
  the join is broadcast-able; at 100 TB the position stream never
  shuffles.
- Determinism: the argmax tie-break is (count DESC, draft token ASC)
  — total order, no floats anywhere until the final rate, which is
  a single rounded division per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flow_indexer_spark.operators.dedup import tokens

__all__ = ["bigram_draft_model", "draft_acceptance"]


def _bigram_pairs(
    docs: DataFrame, id_col: str, text_col: str, carry: list[str] = ()
) -> DataFrame:
    """(doc, [carry...], context, actual) for every adjacent token
    pair, built in-row (no posexplode self-join): zip the token array
    against its own tail, then explode once.  ``carry`` columns ride
    along so callers never re-join the corpus to recover them."""
    tok = tokens(text_col)
    pairs = F.when(
        F.size(tok) >= 2,
        F.zip_with(
            F.slice(tok, 1, F.size(tok) - 1),
            F.slice(tok, 2, F.size(tok) - 1),
            lambda a, b: F.struct(a.alias("context"), b.alias("actual")),
        ),
    ).otherwise(F.array().cast("array<struct<context:string,actual:string>>"))
    return docs.select(
        F.col(id_col).alias("doc"), *carry, F.explode(pairs).alias("p")
    ).select("doc", *carry, "p.context", "p.actual")


def bigram_draft_model(
    docs: DataFrame, id_col: str, text_col: str, min_count: int = 1
) -> DataFrame:
    """Corpus bigram argmax table: (context, draft, n) — for each
    context token, the most frequent continuation (ties broken by the
    lexicographically smallest draft token — a total, engine-portable
    order).  ``min_count`` drops rare contexts whose argmax is noise."""
    counts = (
        _bigram_pairs(docs, id_col, text_col)
        .groupBy("context", F.col("actual").alias("draft"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("context").orderBy(F.desc("n"), F.asc("draft"))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("n") >= min_count))
        .drop("_rk")
    )


def draft_acceptance(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_count: int = 1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-``group_col`` acceptance report of the corpus-bigram drafter:

    - ``n_positions``: adjacent-pair positions evaluated,
    - ``n_accepted``: positions where the drafted continuation equals
      the actual next token,
    - ``acceptance_rate``: the ratio, rounded to 9 dp (the only float).

    The model is trained on the SAME corpus (the in-sample acceptance
    ceiling — what the drafter could at best achieve when its counts
    come from the traffic it drafts for)."""
    model = bigram_draft_model(docs, id_col, text_col, min_count=min_count)
    if broadcast_model:
        model = F.broadcast(model)
    pos = _bigram_pairs(docs, id_col, text_col, carry=[group_col])
    hit = F.when(F.col("draft") == F.col("actual"), 1).otherwise(0)
    return (
        pos.join(model, "context", "left")
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_positions"),
            F.sum(hit).cast("bigint").alias("n_accepted"),
        )
        .withColumn(
            "acceptance_rate",
            F.round(F.col("n_accepted") / F.col("n_positions"), 9),
        )
    )
