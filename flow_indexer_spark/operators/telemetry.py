"""Telemetry rollups over event streams: cohort newness and per-class
daily anomaly baselines.

The reference answers "when was this entity seen" per query (hits/first/
last, /root/reference/flowindexer/flowindexer.go:352-366). A telemetry
pipeline also needs the corpus-wide inversions of that question: how
many entities were seen *for the first time* each day (new vs
returning), and is today's per-class volume anomalous against its own
trailing baseline. Both are two-shuffle DataFrame plans with map-side
combine; the window partitions are (class) x (days) — tiny and never
hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def new_vs_returning(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Per-bucket counts of entities seen for the first time vs seen
    before: first-seen bucket per entity (one groupBy-min over the id —
    the A5 ``first`` stat computed for EVERY entity at once), then the
    distinct (entity, bucket) pairs classified against it. Output:
    (bucket, n_new, n_returning) sorted by bucket."""
    bucket = F.date_trunc(granularity, ts_col)
    first_seen = events.groupBy(F.col(id_col).alias("_id")).agg(
        F.min(bucket).alias("_first")
    )
    daily = (
        events.select(F.col(id_col).alias("_id"), bucket.alias("bucket"))
        .dropDuplicates()
    )
    return (
        daily.join(first_seen, "_id")
        .groupBy("bucket")
        .agg(
            F.sum((F.col("bucket") == F.col("_first")).cast("long")).alias("n_new"),
            F.sum((F.col("bucket") > F.col("_first")).cast("long")).alias(
                "n_returning"
            ),
        )
        .orderBy("bucket")
    )


def retention_matrix(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Classic retention triangle: cohort = the bucket an entity was
    first seen in; for every (cohort, bucket-offset) cell, how many of
    that cohort's entities were active. Offset 0 is the cohort bucket
    itself (n_active there = cohort size). Same two-shuffle plan as
    :func:`new_vs_returning` — first-seen min per entity, then the
    distinct (entity, bucket) pairs classified against it; the division
    to bucket offsets is exact because both sides are truncated to the
    same granularity."""
    per = {"day": 1, "week": 7}
    if granularity not in per:
        raise ValueError(f"granularity must be one of {sorted(per)}")
    bucket = F.date_trunc(granularity, ts_col)
    first_seen = events.groupBy(F.col(id_col).alias("_id")).agg(
        F.min(bucket).alias("cohort")
    )
    active = (
        events.select(F.col(id_col).alias("_id"), bucket.alias("_b"))
        .dropDuplicates()
    )
    offset = (
        F.datediff(F.col("_b"), F.col("cohort")) / per[granularity]
    ).cast("int")
    return (
        active.join(first_seen, "_id")
        .groupBy("cohort", offset.alias("offset"))
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort", "offset")
    )


def rollup_counts(
    events: DataFrame,
    class_col: str = "event_type",
    ts_col: str = "ts",
    granularity: str = "day",
    all_label: str = "ALL",
) -> DataFrame:
    """Multi-granularity rollup in ONE pass: per-(class, bucket) counts,
    per-class subtotals, and the grand total via ``DataFrame.rollup`` —
    Spark's Expand turns the rollup into a single shuffle with map-side
    partial aggregation instead of three separate groupBys (the
    hypertable-rollup analogue of the reference's two-level bucket
    histogram, /root/reference/flowindexer/flowindexer.go:352-366).
    Subtotal rows mark the rolled-up column with ``all_label`` (the data
    itself is never null there, so the sentinel is unambiguous)."""
    bucket = F.date_trunc(granularity, ts_col)
    return (
        events.rollup(F.col(class_col).alias("klass"), bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("klass", F.lit(all_label)).alias("klass"),
            F.coalesce(F.col("bucket").cast("string"), F.lit(all_label)).alias(
                "bucket"
            ),
            "n",
        )
        .orderBy("klass", "bucket")
    )


def pivot_matrix(
    events: DataFrame,
    class_col: str = "event_type",
    ts_col: str = "ts",
    classes: list[str] | None = None,
    granularity: str = "day",
) -> DataFrame:
    """Bucket x class count matrix (one column per class). Passing the
    explicit ``classes`` list is the scale contract: without it Spark runs
    an extra distinct-values job over the full input just to learn the
    column set. Absent combinations come back 0, not null, so the matrix
    is dense. One shuffle (pivot aggregates map-side like any groupBy)."""
    if not classes:
        raise ValueError("classes must be the explicit pivot value list")
    bucket = F.date_trunc(granularity, ts_col).alias("bucket")
    wide = (
        events.groupBy(bucket)
        .pivot(class_col, classes)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "bucket",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in classes],
    ).orderBy("bucket")


def maintain_rollup(
    spark,
    delta: DataFrame,
    rollup_path: str,
    batch_id: str,
    class_col: str = "event_type",
    ts_col: str = "ts",
    granularity: str = "day",
) -> None:
    """Continuous-aggregate maintenance: fold a DELTA of events into a
    stored per-(class, bucket) count table with O(delta) work — the
    aggregate-level twin of the postings incremental merge
    (plans/pipeline.py O(delta) salt-chunk append; reference semantics:
    in-place posting union, /root/reference/store/leveldb.go:261-278).

    Layout is append-only CHUNKS partitioned by ``batch_id``: each batch
    writes ONLY its own per-(class, bucket) partial counts under
    ``batch=<id>`` via dynamic partition overwrite, and ``read_rollup``
    sums the chunks at read time. That makes maintenance exactly
    idempotent under every failure mode: re-running a batch (after a
    crash mid-write, a lost checkpoint, or an accidental double
    submit) REPLACES its own partition wholesale and never touches any
    other batch's rows — there is no read-modify-write of shared state
    to double-count through. Work per batch = one map-side-combined
    shuffle over delta rows; stored history is never read.

    Late data needs no special path — an old day's row simply lands as
    that batch's partial for the old bucket and the read-time sum folds
    it in. Query-time cost grows with batch count; ``compact_rollup``
    folds history into a single chunk (same pattern as
    operators/compact.py for postings).
    """
    if not batch_id:
        raise ValueError("batch_id must be a stable non-empty identifier")
    bucket = F.date_trunc(granularity, ts_col).cast("date").cast("string")
    agg = (
        delta.groupBy(F.col(class_col).alias("klass"), bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .withColumn("batch", F.lit(batch_id))
    )
    (
        agg.coalesce(1)  # chunk is bucket-cardinality-sized, never corpus-sized
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(rollup_path)
    )


def read_rollup(spark, rollup_path: str) -> DataFrame:
    """The maintained rollup as (klass, bucket, n): read-time sum of the
    per-batch chunks (bucket cardinality × batch count rows — tiny)."""
    return (
        spark.read.parquet(rollup_path)
        .groupBy("klass", F.col("bucket").cast("string").alias("bucket"))
        .agg(F.sum("n").alias("n"))
    )


def compact_rollup(spark, rollup_path: str, into_batch: str = "compacted") -> None:
    """Fold all existing chunks into one ``batch=<into_batch>`` chunk and
    drop the originals — bounds read_rollup's chunk count the way
    compact_postings bounds posting chunks. Staged write-then-swap: the
    folded chunk is written to a sibling dir first, so a crash leaves
    either the old chunks or the complete compacted table."""
    import shutil

    folded = (
        spark.read.parquet(rollup_path)
        .groupBy("klass", "bucket")
        .agg(F.sum("n").alias("n"))
        .withColumn("batch", F.lit(into_batch))
    )
    staged = rollup_path.rstrip("/") + "_compacting"
    shutil.rmtree(staged, ignore_errors=True)  # stale from a prior crash
    folded.coalesce(1).write.mode("overwrite").partitionBy("batch").parquet(staged)
    old = rollup_path.rstrip("/") + "_old"
    shutil.rmtree(old, ignore_errors=True)
    import os

    os.rename(rollup_path, old)
    os.rename(staged, rollup_path)
    shutil.rmtree(old, ignore_errors=True)


def daily_anomaly(
    events: DataFrame,
    class_col: str = "event_type",
    ts_col: str = "ts",
    granularity: str = "day",
    trailing: int = 7,
) -> DataFrame:
    """Per-class daily volume against its own trailing-N baseline:
    count per (class, bucket), trailing mean over the PRECEDING
    ``trailing`` buckets (current excluded — today must not dilute its
    own baseline), and the volume ratio. Ratio is null for a class's
    first bucket (no history — callers filter or alert on >x thresholds).
    The window partition is one class's day series: bounded by the
    calendar, so a hot class costs nothing extra."""
    bucket = F.date_trunc(granularity, ts_col)
    counts = events.groupBy(
        F.col(class_col).alias("klass"), bucket.alias("bucket")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("klass")
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    avg_t = F.avg("n").over(w)
    return counts.select(
        "klass",
        "bucket",
        "n",
        avg_t.alias("trailing_avg"),
        (F.col("n").cast("double") / avg_t).alias("ratio"),
    ).orderBy("klass", "bucket")


def cube_report(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    all_label: str = "ALL",
) -> DataFrame:
    """Every marginal of a d-dimensional corpus report in ONE pass:
    ``DataFrame.cube`` computes all 2^d groupings (per (lang, source),
    per lang, per source, grand total) through a single Expand +
    map-side-combined shuffle — the data is scanned once, not 2^d
    times. Rolled-up dimensions carry ``all_label``, distinguished from
    genuine NULL data values via ``grouping()`` (unlike rollup_counts'
    sentinel-only approach, a null-valued dim here stays visibly
    'None'). The sibling of :func:`rollup_counts`, which covers only
    the d+1 hierarchical prefixes.
    Output: dims + (n_rows, total_value, avg_value)."""
    if not dims:
        raise ValueError("dims must be non-empty")
    v = F.col(value_col).cast("long")
    return (
        df.cube(*[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(v).alias("total_value"),
            (F.sum(v) / F.count(F.lit(1))).alias("avg_value"),
            *[F.grouping(d).alias(f"_g_{d}") for d in dims],
        )
        .select(
            *[
                F.when(F.col(f"_g_{d}") == 1, F.lit(all_label))
                .otherwise(F.col(d).cast("string"))
                .alias(d)
                for d in dims
            ],
            "n_rows",
            "total_value",
            "avg_value",
        )
        .orderBy(*dims)
    )


def cusum_changepoints(
    series: DataFrame,
    group_cols: list[str],
    bucket_col: str,
    count_col: str,
    drift_k: float = 0.5,
    threshold_h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page, Biometrika 1954)
    over a pre-aggregated per-bucket count series.

    The textbook recursion S_t = max(0, S_{t-1} + z_t) is not a window
    function — but it has an exact prefix identity: with C_t = sum of
    z_1..z_t,  S_t = C_t - min(0, min_{j<=t} C_j).  Both terms ARE
    window functions (running sum + running min), so the whole detector
    is two window passes per direction inside ONE shuffle on the group
    key — no recursion, no UDF, no driver loop, and at 100 TB each
    series costs one task's sort exactly like every other per-key
    window here.

    Standardization is drift-free across engines by construction: the
    baseline mean and population variance come from EXACT integer sums
    (sum, sum-of-squares over bigint counts), their ratio is one double
    division, and sqrt is IEEE-correctly-rounded — so z_t =
    round((x_t - mean)/std - k, 9) is bit-identical on Spark and the
    SQL oracle with NO per-step tolerance. Constant series (std = 0)
    standardize to z = -k.

    Returns one row per input bucket: group cols + (bucket, n, z_hi,
    z_lo, cusum_hi, cusum_lo, alarm) where cusum_hi detects upward
    level shifts, cusum_lo downward, and alarm = either side crossing
    ``threshold_h`` (in sigma units).
    """
    g = [F.col(c) for c in group_cols]
    n = F.col(count_col).cast("bigint")
    stats = series.groupBy(*g).agg(
        F.count("*").cast("bigint").alias("_cnt"),
        F.sum(n).alias("_s1"),
        F.sum(n * n).alias("_s2"),
    )
    mean = F.col("_s1").cast("double") / F.col("_cnt")
    var = F.col("_s2").cast("double") / F.col("_cnt") - mean * mean
    stats = stats.select(
        *g, mean.alias("_mean"), F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std")
    )
    j = series.join(stats, group_cols)
    zraw = F.when(
        F.col("_std") > 0.0, (n - F.col("_mean")) / F.col("_std")
    ).otherwise(F.lit(0.0))
    z_hi = F.round(zraw - drift_k, 9)
    z_lo = F.round(-zraw - drift_k, 9)
    w = (
        Window.partitionBy(*g)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = j.select(
        *g,
        F.col(bucket_col),
        n.alias("n"),
        z_hi.alias("z_hi"),
        z_lo.alias("z_lo"),
    )
    # two chained window passes over the SAME (partition, order) spec —
    # one Exchange, consecutive Window operators, no second shuffle
    j = j.select(
        "*",
        F.sum("z_hi").over(w).alias("_c_hi"),
        F.sum("z_lo").over(w).alias("_c_lo"),
    )
    s_hi = F.round(
        F.col("_c_hi") - F.least(F.lit(0.0), F.min("_c_hi").over(w)), 9
    )
    s_lo = F.round(
        F.col("_c_lo") - F.least(F.lit(0.0), F.min("_c_lo").over(w)), 9
    )
    return j.select(
        *g,
        F.col(bucket_col),
        "n",
        "z_hi",
        "z_lo",
        s_hi.alias("cusum_hi"),
        s_lo.alias("cusum_lo"),
        ((s_hi > threshold_h) | (s_lo > threshold_h)).alias("alarm"),
    )


def ewma_truncated(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    lags: int = 8,
    dp: int = 9,
) -> DataFrame:
    """Per-series exponentially weighted moving average with an
    EXPLICIT truncation horizon: ewma_t = sum_{l=0..L-1} w_l * x_{t-l}
    / sum_{l present} w_l, with w_l = alpha*(1-alpha)^l — the
    recency-weighted baseline `daily_anomaly`'s flat trailing mean
    lacks.

    Truncation is the point, not a compromise: the exact recursive
    EWMA is an infinite-tail state recursion (the CUSUM prefix-min
    trick does not apply — this recursion is contracting, not
    max-based), while a FIXED lag horizon makes the operator one
    window pass with L lag() terms — a finite expression both engines
    evaluate term-for-term identically (weights are python-float
    literals, the L-term sum one left-associated chain, so no fold
    order exists to pin).  At alpha=0.5, L=8 the dropped tail weighs
    2^-8 of the total.  Rows near the series start renormalize over
    the lags that exist (the standard adjusted/finite-history EWMA).

    Returns (series, t, value, ewma).  ONE window shuffle partitioned
    by series; everything else is in-row arithmetic.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    w = Window.partitionBy(part_col).orderBy(order_col)
    v = F.col(value_col).cast("double")
    num = None
    den = None
    for l in range(lags):
        wl = alpha * (1.0 - alpha) ** l
        x = F.lag(v, l).over(w) if l else v
        t = F.coalesce(x, F.lit(0.0)) * F.lit(wl)
        h = F.when(x.isNotNull(), F.lit(wl)).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = h if den is None else den + h
    return df.select(
        F.col(part_col).alias("series"),
        F.col(order_col).alias("t"),
        F.col(value_col).alias("value"),
        F.round(num / den, dp).alias("ewma"),
    )


def sliding_active_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    dp: int = 9,
) -> DataFrame:
    """Per-day exact DAU, trailing-``window_days`` WAU, and the
    DAU/WAU stickiness ratio.

    Exact sliding distinct does not decompose into per-day partials
    (distinct is not sum-mergeable), so the scalable exact form is the
    EXPLODE-TO-WINDOW trick: each (user, day) pair fans out to the
    ``window_days`` trailing windows it is visible in — a constant-
    factor Expand (x W) on the already-deduplicated (user, day) table,
    never on raw events — followed by one count_distinct shuffle per
    window end.  (The approximate path for big W is the mergeable HLL
    in `operators/sketches.py`; this exact path is the audit twin.)

    Windows with no *ending-day* activity still appear whenever any
    activity falls inside them (window ends enumerate from the fan-out,
    so a fully-silent corpus day between active days is present with
    dau = 0 only if some earlier day reaches it — the convention the
    SQL twin reproduces; day keys never invent rows the data does not
    imply).

    Returns (day, dau, wau, stickiness) ordered by day.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ud = (
        events.select(
            F.col(user_col).alias("user"),
            F.col(ts_col).cast("date").alias("day"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    dau = ud.groupBy("day").agg(
        F.count_distinct("user").cast("bigint").alias("dau")
    )
    offsets = F.array(*[F.lit(i) for i in range(window_days)])
    fan = ud.select(
        "user",
        F.explode(
            F.transform(offsets, lambda i: F.date_add(F.col("day"), i))
        ).alias("wend"),
    )
    wau = fan.groupBy(F.col("wend").alias("day")).agg(
        F.count_distinct("user").cast("bigint").alias("wau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            "wau",
            F.round(
                F.coalesce("dau", F.lit(0)) / F.col("wau").cast("double"),
                dp,
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def seasonal_dow_index(
    events: DataFrame,
    class_col: str,
    ts_col: str,
    dp: int = 9,
) -> DataFrame:
    """Per-class day-of-week seasonal index: mean daily count on each
    weekday divided by the class's overall mean daily count — the
    profile that separates "Mondays are always 2x" from a genuine
    anomaly before `daily_anomaly`/`cusum_changepoints` fire.

    index(c, dow) = (n_cdow / days_cdow) / (n_c / days_c)
                  = (n_cdow * days_c) / (days_cdow * n_c)

    — ONE division of exact bigint products (the algebra keeps it a
    single rational).  Day-of-week numbering is ISO (1 = Monday ...
    7 = Sunday), explicitly pinned because engines disagree by
    default.  Days are counted as DISTINCT ACTIVE days per cell (a
    day with zero events contributes no row and no denominator — the
    active-day convention, mirrored by the oracle).

    Returns (class, dow, n_events, n_days, mean_daily, index) ordered.
    Scale: one (class, day) aggregate, then a tiny (class, dow)
    aggregate + per-class totals broadcast back.
    """
    per_day = events.groupBy(
        F.col(class_col).alias("cls"),
        F.col(ts_col).cast("date").alias("_day"),
    ).agg(F.count("*").cast("bigint").alias("_n"))
    # ISO dow: Spark dayofweek() is 1=Sunday..7=Saturday; pin to ISO
    per_day = per_day.withColumn(
        "dow", ((F.dayofweek("_day") + 5) % 7 + 1).cast("int")
    )
    cell = per_day.groupBy("cls", "dow").agg(
        F.sum("_n").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    tot = per_day.groupBy("cls").agg(
        F.sum("_n").cast("bigint").alias("_tn"),
        F.count("*").cast("bigint").alias("_td"),
    )
    j = cell.join(F.broadcast(tot), "cls")
    return j.select(
        F.col("cls").alias("class"),
        "dow",
        "n_events",
        "n_days",
        F.round(
            F.col("n_events") / F.col("n_days").cast("double"), dp
        ).alias("mean_daily"),
        F.round(
            (F.col("n_events") * F.col("_td"))
            / (F.col("n_days") * F.col("_tn")).cast("double"),
            dp,
        ).alias("index"),
    ).orderBy("class", "dow")


def cuped_report(
    events: DataFrame,
    user_col: str,
    value_col: str,
    pre_cond: Column,
    post_cond: Column,
    cents: int = 100,
    dp: int = 9,
) -> DataFrame:
    """CUPED variance reduction report (Deng, Xu, Kohavi & Walker,
    WSDM 2013): using each unit's PRE-period metric X as the control
    covariate for its post-period metric Y, the adjusted estimator
    Y - theta*(X - E[X]) with theta = cov(X,Y)/var(X) keeps the mean
    and cuts the variance by corr(X,Y)^2 — the standard lever that
    lets an A/B test on this telemetry reach significance with
    1/(1-rho^2) less traffic.

    This computes, from EXACT integer sufficient statistics (values
    quantized to integer cents at the ROW level, so every per-user sum
    and every moment is an order-free bigint/decimal sum):
    ``n_users``, ``theta``, ``corr``, ``var_reduction`` (= rho^2), and
    ``mean_post`` — one groupBy(user) + one global aggregate; floats
    appear only in the final divisions.  Units with no pre-period
    activity contribute X = 0 (the standard convention: CUPED stays
    unbiased for any fixed covariate)."""
    v = F.round(F.col(value_col) * cents).cast("bigint")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.sum(F.when(pre_cond, v).otherwise(0)).alias("x"),
        F.sum(F.when(post_cond, v).otherwise(0)).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # degenerate guards: var(X)=0 means the covariate carries no
    # information (theta/corr/reduction 0 by convention); var(Y)=0
    # means there is no variance to reduce (corr 0)
    corr = F.when(
        (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    ).otherwise(F.lit(0.0))
    theta = F.when(vx > 0, cov / vx).otherwise(F.lit(0.0))
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(theta, dp).alias("theta"),
        F.round(corr, dp).alias("corr"),
        F.round(corr * corr, dp).alias("var_reduction"),
        F.round(
            F.col("sy").cast("double") / (F.col("n") * F.lit(float(cents))),
            dp,
        ).alias("mean_post"),
    )
