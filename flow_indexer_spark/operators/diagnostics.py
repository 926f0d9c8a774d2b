"""Skew diagnostics: measure key-distribution heat before it burns a job.

The pipeline handles skew *reactively* in several places — salted postings
chunks (operators/postings.py), LSH bucket-size caps (operators/dedup.py),
the hot-group prefilter (operators/curation.py per_group_cap). This module
is the *proactive* side: a one-shuffle report of how hot each key actually
is, plus the salt factor the salted paths should use for it — the
flow-indexer analogue is sizing an index before building it
(/root/reference/flowindexer/flowindexer.go stats reporting), generalized
to any key.

Plan shape: groupBy(key).count() — ONE map-side-combined shuffle over
(key, 1) pairs regardless of input width — then a tiny global aggregate
broadcast back for shares, and a TakeOrdered for the top-k. Nothing here
is ever corpus-sized after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Top-k heaviest keys with their share of the corpus, skew factor
    (rows vs the mean key), and the salt fan-out a salted aggregation
    should apply to them (ceil(rows / target_rows_per_task), min 1 —
    the `n_salt` knob of build_postings, sized from data instead of
    guessed). Deterministic order: rows desc, then key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_k <= 0 or target_rows_per_task <= 0:
        raise ValueError("top_k and target_rows_per_task must be positive")
    # concat_ws silently SKIPS nulls, which would merge distinct composite
    # keys like (null,'a') and ('a',null); a per-component sentinel keeps
    # every key distinct and gives a single null key a visible name.
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in key_cols
        ],
    )
    counts = df.groupBy(key.alias("key")).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            (
                F.col("n_rows")
                / (F.col("_total").cast("double") / F.col("_n_keys"))
            ).alias("skew_factor"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / F.lit(target_rows_per_task)),
            )
            .cast("int")
            .alias("n_salt"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_k)
    )


def distribution_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 8,
    threshold: float = 0.25,
) -> DataFrame:
    """Population-Stability-Index drift report: how far each group's
    distribution of ``value_col`` sits from the REST of the corpus — the
    per-source drift gate a training pipeline runs on every snapshot
    (is src17's length/quality profile suddenly unlike everyone else?).

    PSI = sum over bins of (p_group - p_rest) * ln(p_group/p_rest),
    over ``n_bins`` equal-width bins spanning the corpus min..max, with
    +0.5 Laplace smoothing per bin so empty bins stay finite. The
    comparison is leave-one-out (group vs corpus-minus-group), not
    group vs pooled corpus: pooling would dilute the reference with the
    outlier's own mass and flag every OTHER group as the blend shifts.
    Common operating points: < 0.1 stable, 0.1-0.25 moderate, > 0.25
    drifted (the default threshold) — applied ON TOP of a per-group
    sampling noise floor (see below), because the textbook thresholds
    assume populations, not 25-row samples.

    Output: (group, n_rows, psi, noise_floor, drifted).


    Scale: ONE map-side-combined shuffle over (group, bin) pairs does
    all the corpus-sized work; the grid that follows (every group x
    every bin, zero-filled so empty bins contribute their smoothed
    term) is |groups| * n_bins rows. The per-group sum folds an
    array_sort'ed in-row array — a deterministic summation order, so
    the report is bit-stable run to run (and engine to engine: the
    DuckDB oracle twin sums with ORDER BY bin).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    v = F.col(value_col).cast("double")
    edges = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    binned = df.select(F.col(group_col).alias("grp"), v.alias("_v")).join(
        F.broadcast(edges)
    )
    span = F.col("_hi") - F.col("_lo")
    raw_bin = F.when(span > 0, F.floor((F.col("_v") - F.col("_lo")) / span * n_bins)).otherwise(F.lit(0))
    cnt = (
        binned.select(
            "grp",
            F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))
            .cast("int")
            .alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        cnt.select("grp")
        .distinct()
        .select(
            "grp",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
        .join(cnt, ["grp", "bin"], "left")
        .select("grp", "bin", F.coalesce("c", F.lit(0)).alias("c"))
    )
    from pyspark.sql import Window

    n_grp = F.sum("c").over(Window.partitionBy("grp"))
    n_bin = F.sum("c").over(Window.partitionBy("bin"))
    n_all = F.sum("c").over(Window.partitionBy())
    half_k = n_bins / 2.0
    p_g = (F.col("c") + 0.5) / (F.col("_ng") + half_k)
    # leave-one-out reference: this bin/total minus the group's own mass
    p_r = (F.col("_gb") - F.col("c") + 0.5) / (
        F.col("_N") - F.col("_ng") + half_k
    )
    terms = grid.select(
        "grp",
        "bin",
        "c",
        n_grp.alias("_ng"),
        n_bin.alias("_gb"),
        n_all.alias("_N"),
    ).select(
        "grp",
        "bin",
        "c",
        "_ng",
        "_N",
        ((p_g - p_r) * F.log(p_g / p_r)).alias("_term"),
    )
    folded = terms.groupBy("grp").agg(
        F.first("_ng").alias("n_rows"),
        F.first("_N").alias("_N"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "_term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_term"],
        ).alias("psi"),
    )
    # Sampling noise floor: under NO drift, PSI is approximately a
    # scaled chi-square — E[PSI] ≈ (n_bins-1) * (1/n_group + 1/n_rest)
    # (each direction of the symmetrized divergence contributes a
    # chi-square/2n). Small groups therefore show large PSI from noise
    # alone (25 rows x 8 bins -> ~0.3, above every textbook threshold),
    # so the drift flag demands psi > threshold + 2*floor: the 2x
    # absorbs the floor's own dispersion, and a group too small to
    # measure (floor -> inf) can never be flagged — you cannot infer
    # drift from a handful of rows.
    n_rest = F.col("_N") - F.col("n_rows")
    floor = (
        F.lit(float(n_bins - 1))
        * (
            1.0 / F.col("n_rows")
            + F.when(n_rest > 0, 1.0 / n_rest).otherwise(F.lit(float("inf")))
        )
    )
    return folded.select(
        F.col("grp").alias(group_col),
        "n_rows",
        "psi",
        floor.alias("noise_floor"),
        (F.col("psi") > threshold + 2 * floor).alias("drifted"),
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    dp: int = 9,
) -> DataFrame:
    """First-digit (Benford 1938) audit of a positive numeric column —
    the classic fabricated/defaulted-data smell test for telemetry
    amounts and counts: organic multiplicative quantities follow
    P(d) = log10(1 + 1/d); constant-injected or truncated feeds don't.

    Rows with value <= 0 are excluded (no leading digit).  Returns one
    row per observed leading digit: (digit, n_obs, frac_obs, p_benford,
    n_expected, chi2_term) ordered by digit — chi2_term =
    (n_obs - n*p)^2 / (n*p), so sum(chi2_term) ~ chi2(8) under the
    law.  Per-digit statistics are ratios of exact bigints against a
    log10 literal each — no cross-digit float fold; callers needing
    the scalar chi2 sum the 9 rows (sorted) themselves.

    Scale shape: leading-digit extraction is in-row string math on the
    bigint; then ONE map-side-combined groupBy over <= 9 groups.
    """
    v = F.col(value_col).cast("bigint")
    d = df.filter(v > 0).select(
        F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
    )
    per = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n_obs"))
    tot = per.agg(F.sum("n_obs").cast("bigint").alias("_n"))
    p = F.log10(1.0 + 1.0 / F.col("digit"))
    exp_n = F.col("_n") * p
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("_n").cast("double"), dp).alias(
                "frac_obs"
            ),
            F.round(p, dp).alias("p_benford"),
            F.round(exp_n, dp).alias("n_expected"),
            F.round(
                (F.col("n_obs") - exp_n) * (F.col("n_obs") - exp_n) / exp_n,
                dp,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def concentration_report(
    df: DataFrame,
    group_col: str,
    dp: int = 9,
) -> DataFrame:
    """One-row concentration audit of a categorical mix (training
    sources, routed entity classes): is the corpus dominated by a few
    groups?  Returns (n_groups, n_rows, hhi, entropy, entropy_norm,
    gini):

    * hhi      — Herfindahl-Hirschman sum of squared shares,
                 sum(n_i^2)/N^2: ONE exact bigint numerator.
    * entropy  — -sum p_i ln p_i (nats), folded in sorted group order
                 (oracle: SUM(term ORDER BY group)); entropy_norm
                 divides by ln(k) (NULL for k = 1).
    * gini     — from the exact integer identity over ascending counts
                 x_(1..k):  G = 2*sum(i*x_(i)) / (k*N) - (k+1)/k.
                 Ties in counts cannot perturb sum(i*x_(i)) (equal
                 values swap between equal-weight positions), so the
                 statistic is deterministic without a tie-break.

    Scale: one groupBy over the group key; everything after is k rows
    (the serial rank window over k groups is free — group cardinality
    is mix-sized, not corpus-sized).
    """
    from pyspark.sql import Window

    per = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    tot = per.agg(F.sum("x").cast("bigint").alias("_N"))
    ranked = (
        per.withColumn("_i", F.row_number().over(Window.orderBy("x", "g")))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_t",
            -(F.col("x") / F.col("_N").cast("double"))
            * F.log(F.col("x") / F.col("_N").cast("double")),
        )
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("x").cast("bigint").alias("n_rows"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("_sq"),
        F.sum(F.col("_i") * F.col("x")).cast("bigint").alias("_iwx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("g", "_t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_t"],
        ).alias("_ent"),
    )
    k = F.col("n_groups").cast("double")
    N = F.col("n_rows").cast("double")
    return agg.select(
        "n_groups",
        "n_rows",
        F.round(F.col("_sq") / (N * N), dp).alias("hhi"),
        F.round(F.col("_ent"), dp).alias("entropy"),
        F.when(
            F.col("n_groups") > 1, F.round(F.col("_ent") / F.log(k), dp)
        ).alias("entropy_norm"),
        F.round(
            2.0 * F.col("_iwx") / (k * N) - (k + 1.0) / k, dp
        ).alias("gini"),
    )


def lexical_js_divergence(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    dp: int = 9,
    grid: int = 1_000_000_000,
) -> DataFrame:
    """Per-group Jensen-Shannon divergence between the group's unigram
    distribution p and the corpus distribution q — the LEXICAL drift
    gate beside ``distribution_drift``'s numeric PSI (is one source's
    vocabulary usage diverging from the corpus it feeds?).  JS is
    symmetric and bounded by ln 2, so thresholds are portable across
    corpora — the property PSI lacks.

    The textbook sum runs over the union of vocabularies, which would
    need a groups x vocab cross join to materialize the zeros.  The
    zero-side mass is instead folded algebraically: for a token absent
    from the group, p = 0 and m = q/2, so its q-side term is
    q*ln(q/(q/2)) = q*ln2 — summing to ``ln2 * (1 - Q_g)`` where
    ``Q_g`` is the corpus mass of the tokens the group DOES use (an
    exact integer ratio).  Only (group, token) rows that exist are
    ever touched: one exploded groupBy + a broadcast join of the
    vocab-sized corpus counts.

    Cross-engine determinism: each present-token term is quantized to
    the 1/``grid`` integer lattice and summed as bigints (order-free
    exact addition); the closed-form zero-mass term and the final
    blend are single rounded expressions.
    """
    from flow_indexer_spark.operators.dedup import tokens

    tok = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(text_col)).alias("token"),
        )
    )
    per_grp_tok = tok.groupBy("grp", "token").agg(
        F.count("*").cast("bigint").alias("n_gt")
    )
    per_grp = per_grp_tok.groupBy("grp").agg(
        F.sum("n_gt").cast("bigint").alias("n_g")
    )
    corpus_tok = per_grp_tok.groupBy("token").agg(
        F.sum("n_gt").cast("bigint").alias("n_t")
    )
    total = corpus_tok.agg(F.sum("n_t").cast("bigint").alias("n_total"))
    j = (
        per_grp_tok.join(F.broadcast(corpus_tok), "token")
        .join(F.broadcast(per_grp), "grp")
        .join(F.broadcast(total))
    )
    p = F.col("n_gt") / F.col("n_g")
    q = F.col("n_t") / F.col("n_total")
    m = (p + q) / 2.0
    g = float(grid)
    term_p = F.round(p * F.log(p / m) * g).cast("bigint")
    term_q = F.round(q * F.log(q / m) * g).cast("bigint")
    agg = j.groupBy("grp").agg(
        F.max("n_g").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(term_p).alias("_sp"),
        F.sum(term_q).alias("_sq"),
        F.sum("n_t").cast("bigint").alias("_qnum"),
        F.max("n_total").alias("_ntot"),
    )
    zero_mass = F.log(F.lit(2.0)) * (
        F.lit(1.0) - F.col("_qnum") / F.col("_ntot")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_distinct",
        F.round(
            0.5 * (F.col("_sp") / g + F.col("_sq") / g + zero_mass), dp
        ).alias("js_divergence"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    dp: int = 9,
) -> DataFrame:
    """Spearman rank correlation between two columns, EXACT up to one
    final rounded division — the monotone-association gate between two
    scoring signals (does the cheap heuristic rank like the expensive
    model?) that Pearson-on-raw-values gets wrong under any nonlinear
    calibration difference.

    Tie handling is the standard average rank, kept integral by
    doubling: R = 2*cum_below + cnt + 1 (an exact bigint per distinct
    value).  Spearman is then Pearson over (Rx, Ry):

        rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    with every S an exact DECIMAL(38,0) sum of integer products —
    order-free at any parallelism; the only floats are the final
    sqrt/division (IEEE-identical on both engines).

    Shape: one groupBy per column over DISTINCT values + a window over
    the distinct-value table (cardinality = score grid, not corpus),
    ranks joined back by broadcast, one global aggregate.  Returns one
    row: (n, rho)."""
    from pyspark.sql import Window

    def _ranks(col: str):
        per = df.groupBy(F.col(col).alias("v")).agg(
            F.count("*").cast("bigint").alias("c")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return per.select(
            "v",
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    j = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .join(
            F.broadcast(_ranks(x_col).withColumnsRenamed({"v": "x", "r2": "rx"})),
            "x",
        )
        .join(
            F.broadcast(_ranks(y_col).withColumnsRenamed({"v": "y", "r2": "ry"})),
            "y",
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec("rx")).alias("sx"),
        F.sum(dec("ry")).alias("sy"),
        F.sum(dec("rx") * dec("rx")).alias("sxx"),
        F.sum(dec("ry") * dec("ry")).alias("syy"),
        F.sum(dec("rx") * dec("ry")).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "n",
        F.round(num / F.sqrt(dx * dy), dp).alias("rho"),
    )
