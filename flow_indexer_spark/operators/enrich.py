"""Broadcast hash-join enrichment against lookup dimensions.

The reference's per-indexer config (name/backend tagging,
/root/reference/flowindexer/flowindexer.go:26-37) generalizes here to
proper dimension joins: a tool registry and a role taxonomy, both tiny,
both broadcast — no shuffle of the fact side, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich(
    df: DataFrame,
    tool_registry: DataFrame | None = None,
    role_taxonomy: DataFrame | None = None,
) -> DataFrame:
    """Left-join dims (broadcast). Unknown tools/roles keep null enrich cols
    — the left-join null path is a tested fixture case (FIXTURES.md §2)."""
    out = df
    if tool_registry is not None:
        out = out.join(F.broadcast(tool_registry), on="tool", how="left")
    if role_taxonomy is not None:
        out = out.join(F.broadcast(role_taxonomy), on="role", how="left")
    return out
