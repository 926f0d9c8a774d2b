"""Slowly-changing-dimension (type 2) build and temporal lookup.

The reference's enrichment dims are static lookups (the tool registry /
role taxonomy broadcast in operators/enrich.py, mirroring flow-indexer's
per-index naming); a production log pipeline's dimensions CHANGE — a
user's plan tier, a tool's owning team — and facts must join the
version that was true AT EVENT TIME, not the latest.  Kimball's SCD
type 2 is the standard answer: each key keeps a history of versions
with ``[valid_from, valid_to)`` intervals.

``scd2_build`` derives that history from a raw change log in one
window pass per key (ONE shuffle on the key, no self-join):

1. order each key's observations by (ts, tiebreaker);
2. drop no-op observations (attributes equal to the previous row —
   change DETECTION, so a noisy upstream that re-asserts the same
   value hourly doesn't mint versions);
3. ``valid_from`` = observation ts, ``valid_to`` = next change's ts
   (NULL while current), plus ``version`` ordinal and ``is_current``.

``scd2_lookup`` is the temporal join: fact rows attach the dimension
version with the latest ``valid_from <= fact_ts``.  It delegates to
:func:`flow_indexer_spark.operators.joins.asof_join` — an SCD2 lookup
IS a backward as-of join against ``valid_from`` (the union+window
plan: one shuffle, zero candidate blowup, no interval cross-join), so
the half-open interval semantics come for free and a hot dimension key
costs one task's sort, same ceiling as any per-key window.

Both stages are exact window/join algebra — fully Catalyst-visible,
whole-stage-codegen, SQL-oracle-twinned (``scd2_dimension_build`` /
``scd2_temporal_lookup`` in ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flow_indexer_spark.operators.joins import asof_join


def scd2_build(
    changelog: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 version intervals.

    Returns (key, *attrs, valid_from, valid_to, version, is_current);
    ``valid_to`` is NULL on the open (current) version and intervals
    are half-open ``[valid_from, valid_to)``.  ``tiebreak`` orders
    same-timestamp observations (last one wins the instant); required
    for determinism if (key, ts) is not unique.
    """
    if not attrs:
        raise ValueError("attrs must be non-empty")
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # first row per key always opens a version; later rows only when ANY
    # attribute differs from the previous observation (null-safe: a
    # null->null attribute is NOT a change)
    prev_same = [F.lag(a).over(w).eqNullSafe(F.col(a)) for a in attrs]
    any_diff = ~prev_same[0]
    for c in prev_same[1:]:
        any_diff = any_diff | ~c
    is_change = F.lag(F.lit(1)).over(w).isNull() | any_diff

    ch = changelog.withColumn("_chg", is_change).filter(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return ch.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
    dim_prefix: str = "d_",
) -> DataFrame:
    """Attach the dimension version valid at each fact's timestamp.

    ``dim`` is :func:`scd2_build` output.  Facts earlier than the key's
    first version (or with unknown keys) keep NULL dimension columns —
    left-outer, never row-dropping.  One shuffle (as-of union+window).
    """
    return asof_join(
        facts,
        dim,
        on=key,
        left_ts=fact_ts,
        right_ts="valid_from",
        direction="backward",
        right_prefix=dim_prefix,
    )
