"""Entity redaction / PII scrubbing over transcript text.

The reference's whole purpose is FINDING entities (IPs) in logs
(/root/reference/flowindexer/flowindexer.go, backend/*.go); a
training-data pipeline needs the dual operation: REMOVING those
entities from text before the text ships to a model. This module
applies the same entity-class regexes as the extract stage
(functions/extractors.py) as in-row ``regexp_replace`` projections —
pure JVM codegen, zero shuffle, zero Python — so redaction scales with
the scan and never becomes its own stage.

Determinism contract: redaction is a pure function of the text, so
re-runs and backfills produce byte-identical clean text — the property
that keeps downstream dedup hashes stable across pipeline versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: entity-class -> (pattern, placeholder). Patterns are written in the
#: RE2-compatible subset (no backrefs/lookaround) so the DuckDB oracle
#: twin runs the exact same expressions. Coverage mirrors the extract
#: stage's entity families (functions/extractors.py IP_PATTERN covers
#: v4 AND v6): 'ip6' handles colon-hex addresses, 'hexid' is
#: case-insensitive and open-ended (a 65+-char hex run is still a
#: secret), and class application order is sorted name order — email,
#: hexid, ip, ip6 — which is safe because ip6's colon-separated groups
#: are at most 4 hex chars (never a hexid match) and '<HEXID>'
#: placeholders contain no pattern-matchable characters.
DEFAULT_PATTERNS: dict[str, tuple[str, str]] = {
    "ip": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    "ip6": (r"\b(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f:]{1,40}", "<IP6>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "hexid": (r"\b[0-9A-Fa-f]{32,}\b", "<HEXID>"),
}


def redact_text(
    text_col: str | Column = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> Column:
    """Composable redacted-text expression: each class's matches replaced
    by its placeholder, applied in deterministic (sorted-class) order so
    overlapping patterns resolve identically everywhere."""
    patterns = patterns if patterns is not None else DEFAULT_PATTERNS
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name in sorted(patterns):
        pat, repl = patterns[name]
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_entities(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-row scrub report: the input columns minus ``text_col``, plus
    ``clean_text`` and one ``n_<class>`` match count per entity class
    (counted BEFORE replacement, via ``regexp_count`` semantics —
    ``size(regexp_extract_all(...))`` — so the counts audit exactly what
    was removed). Single in-row projection; the whole thing lives inside
    one WholeStageCodegen span over the scan."""
    patterns = patterns if patterns is not None else DEFAULT_PATTERNS
    keep = [c for c in df.columns if c != text_col]
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, (pat, _r) in sorted(patterns.items())
    ]
    return df.select(
        *keep,
        redact_text(text_col, patterns).alias("clean_text"),
        *counts,
    )
