"""Temporal joins Spark lacks natively: as-of join and interval (range)
join, both shaped to survive 100 TB.

The reference's only temporal operation is bucketing doc timestamps into
coarse/fine histogram buckets (/root/reference/flowindexer/flowindexer.go:368-394);
a log/training pipeline also needs to ALIGN two timestamped streams:
"the most recent config/rate/label row at or before this event" (as-of)
and "every event inside this session/incident window" (interval). Neither
is an equi-join, and the naive theta-join plan Spark picks for them
(BroadcastNestedLoopJoin / cartesian + filter) is quadratic.

Scale design:
- ``asof_join`` is the union-then-window plan: tag both sides, union,
  ONE shuffle on the key, and ``last(..., ignorenulls=True)`` over an
  ordered in-partition sort carries the latest right row forward onto
  each left row. No candidate pairs ever materialize — cost is
  sort-merge of |L|+|R| rows, same as a groupBy over the key. (Same
  topology Flink/kdb use for as-of; pandas merge_asof is the per-key
  in-memory analogue.)
- ``interval_join`` equi-joins on (key, fixed-width time bucket):
  intervals explode into only the buckets they overlap, points live in
  exactly one bucket, so each candidate (point, interval) pair appears
  at most once and the exact containment filter runs after a normal
  shuffled hash join — never a nested-loop. Degenerate wide intervals
  are capped (and counted) the same way the LSH dedup paths cap
  degenerate buckets (operators/dedup.py max_bucket_df pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_L, _R = 1, 0  # union side tags; at equal ts the right row sorts first


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: for every left row, attach the single right row
    with the latest ``right_ts <= left_ts`` (direction='backward',
    inclusive) or earliest ``right_ts >= left_ts`` ('forward') for the
    same ``on`` key. Unmatched left rows keep nulls (left-outer
    semantics). ``tolerance_seconds`` voids matches farther than the
    bound. Right columns come back prefixed with ``right_prefix``
    (``right_ts`` included, as ``{prefix}{right_ts}``).

    Ties inside the right side (two right rows with identical (key, ts))
    resolve to the row that sorts last on the remaining right columns —
    pass a pre-deduped right side for full determinism.

    One shuffle, zero candidate-pair blowup; a hot key costs one task's
    sort (same ceiling as any per-key window — pre-split hot keys by
    coarse time bucket if a single key exceeds a task).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("_r")
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(_R).alias("_side"),
        payload,
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(_L).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left.columns],
    )
    u = r.select(*l.columns[:4]).unionByName(l, allowMissingColumns=True)

    # backward: ascending (ts, side) — right row at equal ts precedes the
    # left row, so `last` over the preceding frame sees it (inclusive).
    # forward: same frame over the reversed sort.
    if direction == "backward":
        w = Window.partitionBy("_k").orderBy(F.asc("_t"), F.asc("_side"))
    else:
        w = Window.partitionBy("_k").orderBy(F.desc("_t"), F.asc("_side"))
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = F.last("_r", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == _L)

    if tolerance_seconds is not None:
        mts = F.col(f"_m.{right_ts}").cast("timestamp")
        delta = F.unix_micros(F.col("_t")) - F.unix_micros(mts)
        if direction == "forward":
            delta = -delta
        out = out.withColumn(
            "_m",
            F.when(delta <= tolerance_seconds * 1_000_000, F.col("_m")),
        )

    keep = [F.col(c) for c in left.columns]
    keep += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return out.select(*keep)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    inclusive_end: bool = False,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join of point rows onto every interval row of the same key
    whose ``[start, end)`` (or ``[start, end]`` with ``inclusive_end``)
    contains the point. Output: all point columns + all non-key interval
    columns (caller disambiguates name clashes by renaming up front).

    ``bucket_seconds`` trades explosion for join width — pick it near the
    typical interval span so most intervals land in 1–2 buckets.
    Intervals wider than ``max_buckets_per_interval`` buckets are dropped
    (count them up front if that matters); without the cap one unbounded
    interval row would fan out across the whole calendar.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    b = bucket_seconds * 1_000_000

    p = points.withColumn("_b", F.floor(us(point_ts) / b))
    nb = (F.floor(us(end_col) / b) - F.floor(us(start_col) / b) + 1).cast("int")
    iv = (
        intervals.filter(F.col(start_col) <= F.col(end_col))
        .filter(nb <= max_buckets_per_interval)
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(us(start_col) / b), F.floor(us(end_col) / b)
                )
            ),
        )
    )
    ivr = iv.select(
        F.col(on).alias("_ik"),
        "_b",
        *[F.col(c).alias(c) for c in intervals.columns if c != on],
    )
    cond = (F.col(on) == F.col("_ik")) & (p["_b"] == ivr["_b"])
    j = p.join(ivr, cond, "inner").drop("_b", "_ik")
    pt = F.col(point_ts).cast("timestamp")
    en = F.col(end_col).cast("timestamp")
    lo = pt >= F.col(start_col).cast("timestamp")
    hi = pt <= en if inclusive_end else pt < en
    return j.filter(lo & hi)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe large-large equi-join: row-identical to
    ``left.join(right, on, how)``, but each join key's rows are spread
    across ``n_salt`` shuffle partitions instead of landing on one task.

    The classic salting pattern for the case AQE's skew-join split can't
    fix (one key so hot that even a split partition is one task's work,
    or a build side too big to broadcast): the left (big, skewed) side
    gets a DETERMINISTIC salt — hash of ``salt_from`` columns (default:
    all non-key left columns) mod n_salt, never ``rand()`` so retries
    and resumed stages recompute the same salt — and the right side is
    replicated n_salt times via a generated salt sequence, so the join
    on (key..., salt) sees every pair exactly once.

    Cost model: right side shuffles n_salt× its bytes; left side spreads
    evenly. Use when |right| * n_salt << |left|'s hot-key mass. ``how``
    supports inner/left joins (each left row carries exactly one salt,
    and every salt value exists on the replicated right, so left-outer
    semantics are preserved).

    The reference hits the same wall with hot IPs: one entity key whose
    posting list dwarfs the rest (store/leveldb.go:261-278 serializes
    per-key); build_postings salts the aggregate the same way
    (operators/postings.py) — this is the join-shaped twin.
    """
    on = [on] if isinstance(on, str) else list(on)
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    salt_cols = salt_from or [c for c in left.columns if c not in on]
    if not salt_cols:
        raise ValueError("no salt_from columns and left has only key columns")
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt)).cast(
            "int"
        ),
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return l.join(r, on + ["_salt"], how).drop("_salt")
