"""Pure pandas/re oracle: an independent reimplementation of the pipeline
semantics (reference behavior re-derived from first principles, not from
the Spark code) used to golden-check the Spark results — the role the
reference's hand-written expected counts play in its backend tests
(/root/reference/backend/bro_test.go:10-41)."""

from __future__ import annotations

import ipaddress
import json
import re

import pandas as pd

from flow_indexer_spark.functions.extractors import (
    IP_PATTERN,
    ROLE_MARKER_PATTERN,
    TOOL_MARKER_PATTERN,
)

_ip_rx = re.compile(IP_PATTERN)
_tool_rx = re.compile(TOOL_MARKER_PATTERN)
_role_rx = re.compile(ROLE_MARKER_PATTERN)


def _norm_ip(tok: str) -> str | None:
    try:
        return ipaddress.ip_address(tok).packed.hex()
    except ValueError:
        return None


def extract_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """transcripts pdf -> long entity rows (conv_id, turn_idx, entity_class,
    entity_key), deduped per turn. Row-at-a-time on purpose: slow but
    obviously correct."""
    rows = []
    for r in pdf.itertuples():
        seen = set()

        def add(klass, key):
            if key and (klass, key) not in seen:
                seen.add((klass, key))
                rows.append(
                    {
                        "conv_id": r.conv_id,
                        "turn_idx": r.turn_idx,
                        "entity_class": klass,
                        "entity_key": key,
                    }
                )

        for tok in _ip_rx.findall(r.text or ""):
            add("ip", _norm_ip(tok))
        tool = r.tool or ""
        if tool.startswith("{"):
            try:
                tool = json.loads(tool).get("tool") or ""
            except ValueError:
                tool = ""
        add("tool", tool or None)
        for tok in _tool_rx.findall(r.text or ""):
            add("tool", tok)
        add("role", r.role or None)
        for tok in _role_rx.findall(r.text or ""):
            add("role", tok)
    return pd.DataFrame(rows)


def postings_oracle(entities: pd.DataFrame) -> dict[tuple[str, str], list[tuple[str, int]]]:
    """entity rows -> {(class, key): sorted [(conv_id, turn_idx), ...]}"""
    out: dict[tuple[str, str], set] = {}
    for r in entities.itertuples():
        out.setdefault((r.entity_class, r.entity_key), set()).add((r.conv_id, r.turn_idx))
    return {k: sorted(v) for k, v in out.items()}
