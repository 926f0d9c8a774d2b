"""Deterministic synthetic transcript generator (seeded) — the analogue of
the reference's ``loggen`` tool (/root/reference/loggen/loggen.go:9-50),
re-targeted at the transcript schema from BASELINE.json's input_hint:
(conv_id, turn_idx, role, text, tool, ts).

Controlled entity distribution (FIXTURES.md §1):
- one HOT IPv4 in ~85% of turns (skew / dense-bitset case,
  /root/reference/experiments/convert_to_msgpack.go:10-12),
- a medium pool in ~10% of turns,
- unique one-off IPs,
- mixed IPv4+IPv6 in the same text (family separation,
  /root/reference/store/leveldb.go:170-174),
- adversarial tokens whose byte encodings collide with the reference's
  internal markers: 100.111.99.58 encodes to bytes 'doc:' and
  109.97.120.95 to 'max_id'[:4] (/root/reference/store/store_test.go:33-39),
- zero-entity turns and '#'-comment-style turns
  (/root/reference/backend/bro.go:30,41).

Pure pandas -> spark.createDataFrame; everything derives from (seed, index)
so goldens are stable across runs and machines.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

HOT_IP = "10.0.0.1"
ADVERSARIAL_IPS = ["100.111.99.58", "109.97.120.95"]  # spell 'doc:' / 'max_'
ADVERSARIAL_TOOLS = ["doc:", "max_id", "postings"]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "browser", "python_exec", "file_read", "calculator", "ghost_tool"]
MEDIUM_IPS = [f"192.168.{i}.{i + 1}" for i in range(20)]
V6_POOL = [
    "2001:db8::1",
    "2001:db8::2",
    "fe80::dead:beef",
    "::1",
    "2001:db8:85a3::8a2e:370:7334",
]


def make_transcripts_pdf(n_conversations: int = 40, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    t0 = datetime(2015, 4, 1, tzinfo=timezone.utc)
    rows = []
    for c in range(n_conversations):
        conv_id = f"conv-{c:06d}"
        n_turns = rng.randint(1, 20)
        # conversations spread over >2 months so month/day buckets are non-trivial
        conv_start = t0 + timedelta(days=rng.randint(0, 75), hours=rng.randint(0, 23))
        for t in range(n_turns):
            role = ROLES[rng.randrange(len(ROLES))]
            ts = conv_start + timedelta(minutes=31 * t, seconds=rng.randint(0, 59))
            kind = rng.random()
            words = []
            tool = ""
            if kind < 0.05:
                # comment-style / zero-entity turn
                text = "# fields ts id.orig_h id.resp_h — header-like noise"
            elif kind < 0.10:
                text = "plain prose with no entities at all, just words"
            else:
                if rng.random() < 0.85:
                    words.append(f"src host {HOT_IP} contacted")
                if rng.random() < 0.10:
                    words.append(f"peer {MEDIUM_IPS[rng.randrange(len(MEDIUM_IPS))]}")
                if rng.random() < 0.05:
                    words.append(f"one-off 172.16.{(c * 7) % 256}.{(t * 13) % 256}")
                if rng.random() < 0.08:
                    words.append(f"v6 {V6_POOL[rng.randrange(len(V6_POOL))]} seen")
                if rng.random() < 0.03:
                    words.append(f"edge {ADVERSARIAL_IPS[rng.randrange(2)]} case")
                if rng.random() < 0.15:
                    tname = TOOLS[rng.randrange(len(TOOLS))]
                    words.append(f"invoking <tool:{tname}> now")
                if rng.random() < 0.10:
                    words.append(f"ping @{ROLES[rng.randrange(len(ROLES))]} marker")
                # fake-IP distractors: versions, timestamps, overlong quads
                if rng.random() < 0.10:
                    words.append("version 1.2.3.4.5 at 10:27:26 build 999.999.999.999")
                text = " ".join(words) if words else "fallback words only"
                if rng.random() < 0.20:
                    tname = TOOLS[rng.randrange(len(TOOLS))]
                    if rng.random() < 0.5:
                        tool = tname
                    else:
                        tool = f'{{"tool": "{tname}", "args": {{"q": "x"}}}}'
                if rng.random() < 0.02:
                    tool = ADVERSARIAL_TOOLS[rng.randrange(len(ADVERSARIAL_TOOLS))]
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts.replace(tzinfo=None),
                }
            )
    return pd.DataFrame(rows)


def make_transcripts(spark: SparkSession, n_conversations: int = 40, seed: int = 42) -> DataFrame:
    pdf = make_transcripts_pdf(n_conversations, seed)
    df = spark.createDataFrame(pdf)
    return df.withColumn("turn_idx", df["turn_idx"].cast("int"))


def make_dims(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """tool_registry / role_taxonomy dims. 'ghost_tool' appears in
    transcripts but not here (left-join null path); 'never_used' is a dim
    row never referenced (FIXTURES.md §2)."""
    # pandas/Arrow LocalRelations: broadcast-dim builds re-evaluate their
    # source per action, and the pickled-list path pays a Python-worker
    # launch each time (see sources/manifest._local_manifest_df)
    tool_registry = spark.createDataFrame(
        pd.DataFrame(
            [
                ("search", "search", "infra-team"),
                ("browser", "search", "infra-team"),
                ("python_exec", "exec", "runtime-team"),
                ("file_read", "file", "runtime-team"),
                ("calculator", "exec", "runtime-team"),
                ("never_used", "misc", "nobody"),
            ],
            columns=["tool", "tool_class", "owner"],
        )
    )
    role_taxonomy = spark.createDataFrame(
        pd.DataFrame(
            [
                ("user", "human"),
                ("assistant", "model"),
                ("system", "infra"),
                ("tool", "infra"),
            ],
            columns=["role", "role_class"],
        )
    )
    return tool_registry, role_taxonomy
