"""Log template extraction: collapse variable tokens, count the shapes.

A log/telemetry pipeline's first analytical question is "what KINDS of
lines are these?" — the reference answers it per-entity (which docs
contain this IP); the corpus-level dual is which *templates* the lines
instantiate and how often (Drain/LogMine-style log pattern mining,
reduced to its scalable core: deterministic masking instead of an
iterative parse tree, so the whole operator is one in-row projection
plus one map-side-combined groupBy).

Masking rules (applied in fixed order, all RE2-safe so the DuckDB
oracle twin runs the identical expressions): IPs → <IP>, long hex ids →
<HEX>, numbers → <N>. What survives is the constant skeleton of the
line; lines sharing a skeleton are the same event type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (pattern, replacement) in application order — IP before <N> so an IP's
#: octets aren't first shredded into four <N> tokens. The hex rule
#: requires an actual letter with >=7 hex chars after it (total length
#: >= 8): a pure digit run must fall through to <N>, otherwise the same
#: event shape would mask to '<N>' or '<HEX>' depending on id magnitude
#: and fragment the census.
MASK_RULES: list[tuple[str, str]] = [
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\b[0-9]{0,15}[a-fA-F][0-9a-fA-F]{7,}\b", "<HEX>"),
    (r"[0-9]+(\.[0-9]+)?", "<N>"),
]


def mask_line(text_col: str | Column = "text") -> Column:
    """The template skeleton of one line (in-row, zero shuffle)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, repl in MASK_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def log_templates(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Template census: (template, n_lines, example) sorted by count desc.

    `example` is the lexicographically-smallest raw line of the template
    (deterministic across runs/engines). One shuffle: the groupBy on the
    masked skeleton, partially aggregated map-side — template cardinality
    is event-type-sized (thousands), never corpus-sized, so the result is
    always small no matter the input. ``min_count`` drops one-off shapes
    (unmaskable variability) from the census."""
    masked = df.select(
        mask_line(text_col).alias("template"), F.col(text_col).alias("_raw")
    )
    return (
        masked.groupBy("template")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("_raw").alias("example"),
        )
        .filter(F.col("n_lines") >= min_count)
        .orderBy(F.desc("n_lines"), "template")
    )
