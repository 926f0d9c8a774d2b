"""Multi-pattern literal scan: Aho-Corasick in one pass over the text.

Reference analogue: the Dump verb's per-query substring grep
(/root/reference/backend/bro.go:52-72 ``FilterLine`` — one
``strings.Contains`` per query per line).  That is O(P) passes for P
patterns; a blocklist / PII-term / contamination-probe dictionary at
training-data scale has thousands of patterns, so the scan must be
**one pass per document regardless of P** — the Aho-Corasick automaton
(Aho & Corasick 1975), the same structure ClamAV/Snort/fgrep use.

Two implementations, differential-tested (the reference keeps dual
implementations of its nfdump parser and cross-checks them,
backend/nfdump.go:16-99 — same discipline):

- ``multi_pattern_scan`` — the scale path: the automaton is built once
  on the driver (O(sum of pattern lengths)), shipped in the closure,
  and each Arrow batch scans text char-by-char through goto/fail
  links.  Per-document cost O(len + hits), independent of P.
- ``multi_pattern_scan_native`` — the small-P path and oracle twin:
  pure in-row higher-order functions (one position-enumeration per
  pattern), O(P * len) but zero Python, fully Catalyst-visible.

Both count **overlapping** occurrences (every end position: "aaa"
contains "aa" twice) and report the first match position (1-based),
so the two paths and the DuckDB oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def build_automaton(patterns: list[str]) -> dict:
    """Aho-Corasick automaton as plain dicts (picklable for the
    executor closure).  States are ints; 0 is the root.

    Returns {"goto": list[dict[ch,int]], "fail": list[int],
    "out": list[list[int]], "patterns": list[str]} where ``out[s]``
    holds indexes into ``patterns`` of every pattern ending at state s.
    """
    pats = list(patterns)
    if not pats or any(not p for p in pats):
        raise ValueError("patterns must be a non-empty list of non-empty strings")
    if len(set(pats)) != len(pats):
        raise ValueError("duplicate patterns")
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for pi, p in enumerate(pats):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pi)
    # BFS failure links; merge output sets down the fail chain
    fail = [0] * len(goto)
    queue = list(goto[0].values())
    for s in queue:
        fail[s] = 0
    i = 0
    while i < len(queue):
        s = queue[i]
        i += 1
        for ch, t in goto[s].items():
            queue.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    return {"goto": goto, "fail": fail, "out": out, "patterns": pats}


def scan_text(auto: dict, text: str) -> dict[int, tuple[int, int]]:
    """Single AC pass: {pattern_index: (n_matches, first_pos_1based)}."""
    goto, fail, out, pats = auto["goto"], auto["fail"], auto["out"], auto["patterns"]
    hits: dict[int, list[int]] = {}
    s = 0
    for pos, ch in enumerate(text):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pi in out[s]:
            rec = hits.get(pi)
            start = pos - len(pats[pi]) + 2  # 1-based
            if rec is None:
                hits[pi] = [1, start]
            else:
                rec[0] += 1
    return {pi: (n, first) for pi, (n, first) in hits.items()}


_SCHEMA_SUFFIX = [
    StructField("pattern", StringType()),
    StructField("n_matches", LongType()),
    StructField("first_pos", IntegerType()),
]


def multi_pattern_scan(
    df: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-pass AC scan: (id, pattern, n_matches, first_pos) for every
    document/pattern pair with >= 1 (overlap-counted) occurrence."""
    auto = build_automaton(patterns)
    id_field = df.schema[id_col]
    schema = StructType([StructField(id_col, id_field.dataType)] + _SCHEMA_SUFFIX)
    pats = auto["patterns"]

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            ids, ps, ns, firsts = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for pi, (n, first) in scan_text(auto, text).items():
                    ids.append(did)
                    ps.append(pats[pi])
                    ns.append(n)
                    firsts.append(first)
            yield pd.DataFrame(
                {id_col: ids, "pattern": ps, "n_matches": ns, "first_pos": firsts}
            )

    return df.select(id_col, text_col).mapInPandas(scan, schema)


def multi_pattern_scan_native(
    df: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """In-row twin: explode the pattern array, enumerate every start
    position, count overlap-exact matches.  O(P * len) work per row —
    right when P is small, and entirely JVM-side."""
    build_automaton(patterns)  # reuse its validation
    t = F.col(text_col)
    pat = F.col("pattern")
    positions = F.filter(
        F.sequence(F.lit(1), F.greatest(F.length(t) - F.length(pat) + 1, F.lit(0))),
        lambda i: t.substr(i, F.length(pat)) == pat,
    )
    exploded = df.select(
        id_col, text_col, F.explode(F.array(*[F.lit(p) for p in sorted(set(patterns))])).alias("pattern")
    ).filter(F.length(t) >= F.length(pat))
    return (
        exploded.withColumn("_pos", positions)
        .filter(F.size("_pos") > 0)
        .select(
            id_col,
            "pattern",
            F.size("_pos").cast("long").alias("n_matches"),
            F.element_at("_pos", 1).cast("int").alias("first_pos"),
        )
    )
