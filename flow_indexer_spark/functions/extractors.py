"""Entity extraction — the grok/regex parse stage.

Reference analogues:
- syslog backend: one alternation regex (IPv4 + IPv6 forms) applied to every
  line, all matches collected (/root/reference/backend/syslog.go:16-58).
- bro_json backend: per-line JSON field decode
  (/root/reference/backend/bro_json.go:25-58).
- backend registry: name -> extractor factory
  (/root/reference/backend/backend.go:12-30).

Spark design: extraction is **native** ``regexp_extract_all`` (JVM-side,
whole-stage codegen) producing candidate token arrays, exploded and then
validated/normalized. Only IPv6 canonicalization needs Python, as an
Arrow-batched pandas UDF. A pandas-UDF implementation of the same
extraction exists purely for the differential test (the reference keeps two
nfdump implementations and cross-checks them,
/root/reference/backend/nfdump_test.go:30-55).

The same ``IP_PATTERN`` string is used by both engines (java.util.regex and
Python ``re``); it deliberately over-matches IPv6 candidates and lets
``ipaddress``-based validation drop fakes, so the pattern stays portable.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from flow_indexer_spark.functions.keys import normalize_ip_udf

# --- patterns (portable: Java regex + Python re) -------------------------

_IPV4 = r"(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
_IPV6 = (
    r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"  # full 8-group
    r"|(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}"  # :: in middle
    r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"  # trailing ::
    r"|::[Ff][Ff][Ff][Ff]:" + _IPV4 +  # v4-mapped
    r"|::(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,6})?"  # leading :: / bare ::
)
# Boundaries: an IP token may not be preceded/followed by word chars, dots
# or colons (rejects 1.2.3.4.5 and embedded substrings) — the reference's
# \b-style guards in backend/syslog.go:16-22.
IP_PATTERN = r"(?<![\w.:])(?:" + _IPV4 + "|" + _IPV6 + r")(?![\w.:])"

TOOL_MARKER_PATTERN = r"<tool:([A-Za-z0-9_\-.]+)>"
ROLE_MARKER_PATTERN = r"(?<![\w@])@([a-z][a-z0-9_]*)"

ENTITY_COLS = ["entity_class", "entity_key", "entity_raw"]


def extract_ip_candidates_native(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text -> exploded candidate IP tokens (native, JVM-side)."""
    return df.withColumn(
        "entity_raw", F.explode(F.regexp_extract_all(F.col(text_col), F.lit(IP_PATTERN), F.lit(0)))
    )


@pandas_udf(ArrayType(StringType()))
def _extract_ips_pandas(text: pd.Series) -> pd.Series:
    """Differential twin of the native path (same pattern, Python re)."""
    rx = re.compile(IP_PATTERN)
    return text.map(lambda t: rx.findall(t) if isinstance(t, str) else [])


def extract_ip_candidates_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("entity_raw", F.explode(_extract_ips_pandas(F.col(text_col))))


def extract_entities(
    df: DataFrame,
    *,
    use_pandas_ip_extractor: bool = False,
    carry_cols: tuple[str, ...] = ("conv_id", "turn_idx", "role", "text", "tool", "ts"),
) -> DataFrame:
    """transcripts -> long-format entity rows, deduped per turn.

    Output: carry_cols + (entity_class, entity_key, entity_raw).

    - class 'ip':   IP-like tokens in ``text``; key = fixed-width hex
      (invalid candidates dropped — the empty-field guard,
      /root/reference/backend/syslog.go:50-56).
    - class 'tool': the ``tool`` column (plain name, or JSON payload with a
      ``tool`` field — bro_json analogue) plus ``<tool:NAME>`` markers in text.
    - class 'role': the ``role`` column plus ``@marker`` tokens in text.

    Per-turn dedup (= the reference's per-document ipset,
    /root/reference/ipset/ipset.go:56-76) is a dropDuplicates on the full
    key — Catalyst plans it as a partial+final hash aggregate.
    """
    base = df.select(*carry_cols)

    ip_extract = (
        extract_ip_candidates_pandas(base) if use_pandas_ip_extractor else extract_ip_candidates_native(base)
    )
    ips = (
        ip_extract.withColumn("entity_key", normalize_ip_udf(F.col("entity_raw")))
        .filter(F.col("entity_key").isNotNull())
        .withColumn("entity_class", F.lit("ip"))
    )

    tool_col = F.when(
        F.col("tool").startswith("{"), F.get_json_object(F.col("tool"), "$.tool")
    ).otherwise(F.col("tool"))
    tools_col_df = base.withColumn("entity_raw", tool_col).filter(
        F.col("entity_raw").isNotNull() & (F.col("entity_raw") != "")
    )
    tools_marker_df = base.withColumn(
        "entity_raw",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(TOOL_MARKER_PATTERN), F.lit(1))),
    )
    tools = (
        tools_col_df.unionByName(tools_marker_df)
        .withColumn("entity_key", F.col("entity_raw"))
        .withColumn("entity_class", F.lit("tool"))
    )

    roles_col_df = base.withColumn("entity_raw", F.col("role")).filter(
        F.col("entity_raw").isNotNull() & (F.col("entity_raw") != "")
    )
    roles_marker_df = base.withColumn(
        "entity_raw",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(ROLE_MARKER_PATTERN), F.lit(1))),
    )
    roles = (
        roles_col_df.unionByName(roles_marker_df)
        .withColumn("entity_key", F.col("entity_raw"))
        .withColumn("entity_class", F.lit("role"))
    )

    out = ips.unionByName(tools).unionByName(roles)
    # per-turn distinct entity set (A1)
    return out.dropDuplicates(["conv_id", "turn_idx", "entity_class", "entity_key"])
