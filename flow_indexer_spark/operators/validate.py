"""Declarative data-quality audit: Deequ-style rule checks in ONE pass.

A 100 TB ingest needs a gate between "the job wrote rows" and "the rows
are usable": null-rate, domain membership, range, regex shape, cross-
field consistency, key uniqueness — evaluated as counts over the whole
corpus, not sampled. The reference's analogue is its per-document error
accumulation surfaced in stats responses
(/root/reference/flowindexer/flowindexer.go:391-393, tested
flowindexer_test.go:205-228): bad rows are counted and REPORTED, never
silently dropped. This module generalizes that into a rule table.

Scale design: every row-local rule compiles to one conditional-sum
column inside a SINGLE aggregate over the input — one scan, map-side
partial aggregation, a one-row result regardless of input size — then
the row is unpivoted driver-free into the long (rule, counts) report.
Key-uniqueness cannot be row-local; it costs exactly one groupBy
shuffle per key set and reduces to the same report schema, so the full
audit of R rules + U unique-key checks is 1 scan + U shuffles, never
R scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --- rule constructors: (name, boolean Column, min_pass_rate) --------------

Rule = tuple[str, Column, float]


def rule(name: str, cond: Column, min_pass_rate: float = 1.0) -> Rule:
    """An arbitrary row-level predicate. NULL evaluations count as
    failures (a comparison against a null is not evidence of health)."""
    if not 0.0 <= min_pass_rate <= 1.0:
        raise ValueError("min_pass_rate must be in [0, 1]")
    return (name, F.coalesce(cond, F.lit(False)), float(min_pass_rate))


def not_null(col: str, min_pass_rate: float = 1.0) -> Rule:
    return rule(f"not_null({col})", F.col(col).isNotNull(), min_pass_rate)


def non_empty(col: str, min_pass_rate: float = 1.0) -> Rule:
    return rule(
        f"non_empty({col})", F.length(F.col(col)) > 0, min_pass_rate
    )


def in_range(
    col: str, lo: float, hi: float, min_pass_rate: float = 1.0
) -> Rule:
    return rule(
        f"in_range({col},{lo:g},{hi:g})",
        (F.col(col) >= lo) & (F.col(col) <= hi),
        min_pass_rate,
    )


def in_set(col: str, values: list, min_pass_rate: float = 1.0) -> Rule:
    shown = ",".join(str(v) for v in values[:4]) + (
        ",..." if len(values) > 4 else ""
    )
    return rule(
        f"in_set({col},[{shown}])", F.col(col).isin(values), min_pass_rate
    )


def matches(col: str, pattern: str, min_pass_rate: float = 1.0) -> Rule:
    return rule(
        f"matches({col})", F.col(col).rlike(pattern), min_pass_rate
    )


_REPORT_COLS = ("rule", "n_rows", "n_pass", "n_fail", "pass_rate", "ok")


def validate(
    df: DataFrame,
    rules: list[Rule],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Run the audit. Returns one report row per rule:
    (rule, n_rows, n_pass, n_fail, pass_rate, ok) — ``ok`` is
    n_pass >= ceil(min_pass_rate * n_rows), so min_pass_rate=1.0 means
    "no failures tolerated".

    ``unique_keys``: each entry is a column list that must identify rows
    uniquely; reported as ``unique(col,...)`` rows where n_fail counts
    every row belonging to a duplicated key (the rows an exact-dedup
    pass would have to adjudicate).
    """
    if not rules and not unique_keys:
        raise ValueError("validate needs at least one rule or unique key")
    reports = []
    if rules:
        names = [n for n, _, _ in rules]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate rule names: {names}")
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(cond.cast("long")).alias(f"_r{i}")
            for i, (_, cond, _) in enumerate(rules)
        ]
        one = df.agg(*aggs)
        # unpivot the one-row aggregate into the long report, keeping
        # everything on the executor side (no collect)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.coalesce(F.col(f"_r{i}"), F.lit(0)).alias("n_pass"),
                    F.lit(min_rate).alias("_min_rate"),
                )
                for i, (name, _, min_rate) in enumerate(rules)
            ]
        )
        reports.append(
            one.select(F.col("_n"), F.explode(pairs).alias("p")).select(
                F.col("p.rule").alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col("p.n_pass").alias("n_pass"),
                (F.col("_n") - F.col("p.n_pass")).alias("n_fail"),
                _rate(F.col("p.n_pass"), F.col("_n")).alias("pass_rate"),
                (
                    F.col("p.n_pass")
                    >= F.ceil(F.col("p._min_rate") * F.col("_n"))
                ).alias("ok"),
            )
        )
    for keys in unique_keys or []:
        name = f"unique({','.join(keys)})"
        counts = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).alias("_c")
        )
        agg = counts.agg(
            F.coalesce(F.sum("_c"), F.lit(0)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("_c") == 1, F.col("_c")).otherwise(0)),
                F.lit(0),
            ).alias("n_pass"),
        )
        reports.append(
            agg.select(
                F.lit(name).alias("rule"),
                "n_rows",
                "n_pass",
                (F.col("n_rows") - F.col("n_pass")).alias("n_fail"),
                _rate(F.col("n_pass"), F.col("n_rows")).alias("pass_rate"),
                (F.col("n_rows") == F.col("n_pass")).alias("ok"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(*_REPORT_COLS)


def _rate(n_pass: Column, n: Column) -> Column:
    return F.when(n > 0, n_pass / n.cast("double")).otherwise(F.lit(1.0))


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over quasi-identifier columns:
    every row must be indistinguishable from >= k-1 others on the QI
    tuple. Returns the equivalence-class SIZE DISTRIBUTION — one row
    per group size with how many classes have that size, whether that
    size violates k, and (when ``sensitive_col`` is given) the minimum
    l-diversity (distinct sensitive values) among classes of that size,
    the companion gate against homogeneity attacks.

    The privacy dual of :mod:`redact`'s PII scrubbing: redaction
    removes direct identifiers, this audits whether the remaining
    quasi-identifiers still single people out. Shape: two
    map-side-combined aggregates (QI classes, then size histogram) —
    the output is bounded by the number of DISTINCT class sizes, so
    it collects safely at any corpus scale.
    """
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l_div"))
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    out_aggs = [
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("group_size").alias("n_rows"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("l_div").alias("min_l_diversity"))
    return (
        classes.groupBy("group_size")
        .agg(*out_aggs)
        .withColumn("violates_k", (F.col("group_size") < k).cast("int"))
    )


def k_anonymity_suppress(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Rows that SURVIVE k-anonymity suppression: drop every row whose
    QI equivalence class has fewer than k members (the minimal
    row-suppression fix; generalization hierarchies are a policy layer
    above this). One agg + one semi-join on the QI tuple."""
    keep = (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= k)
        .select(*qi_cols)
    )
    return df.join(keep, on=list(qi_cols), how="left_semi")
