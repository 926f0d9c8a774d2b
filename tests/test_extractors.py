"""Extraction tests: golden counts on fixed strings, differential
native-vs-pandas (nfdump-pair analogue,
/root/reference/backend/nfdump_test.go:30-55), oracle equality on the full
seeded fixture."""

import pandas as pd
import pytest

from flow_indexer_spark.functions.extractors import extract_entities
from tests.oracle import extract_oracle


def _mini_df(spark, texts, role="user", tool=""):
    rows = [
        {"conv_id": "c0", "turn_idx": i, "role": role, "text": t, "tool": tool,
         "ts": pd.Timestamp("2020-01-01")}
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    return df.withColumn("turn_idx", df["turn_idx"].cast("int"))


def _keys(df, klass):
    return sorted(
        r.entity_key
        for r in df.filter(df.entity_class == klass).select("entity_key").collect()
    )


GOLDEN_CASES = [
    # (text, expected distinct IP keys) — golden-count style (bro=12 analogue)
    ("host 1.2.3.4 talked to 5.6.7.8", ["01020304", "05060708"]),
    ("dup 1.2.3.4 and again 1.2.3.4", ["01020304"]),
    ("v6 2001:db8::1 here", ["20010db8000000000000000000000001"]),
    ("mapped ::ffff:1.2.3.4 ok", ["00000000000000000000ffff01020304"]),
    ("bare :: loopback", ["00000000000000000000000000000000"]),
    ("overlong 1.2.3.4.5 skipped", []),
    ("clock 10:27:26 not an ip", []),
    ("octet 999.1.2.3 invalid", []),
    ("edge 0.0.0.0 and 255.255.255.255", ["00000000", "ffffffff"]),
    ("# comment 1.2.3.4 still counts", ["01020304"]),
    ("full fe80:0:0:0:0:0:dead:beef form", ["fe8000000000000000000000deadbeef"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN_CASES)
def test_ip_extraction_golden(spark, text, expected):
    df = extract_entities(_mini_df(spark, [text]))
    assert _keys(df, "ip") == expected


def test_tool_extraction_plain_json_marker(spark):
    df = _mini_df(
        spark,
        ["calling <tool:browser> and <tool:search> now", "no markers"],
        tool='{"tool": "python_exec", "args": {"q": 1}}',
    )
    out = extract_entities(df)
    assert _keys(out, "tool") == ["browser", "python_exec", "python_exec", "search"]


def test_role_extraction_column_and_marker(spark):
    df = _mini_df(spark, ["ping @assistant please"], role="user")
    out = extract_entities(df)
    assert _keys(out, "role") == ["assistant", "user"]


def test_differential_native_vs_pandas(spark, transcripts):
    cols = ["conv_id", "turn_idx", "entity_class", "entity_key"]
    a = sorted(map(tuple, extract_entities(transcripts).select(*cols).collect()))
    b = sorted(
        map(
            tuple,
            extract_entities(transcripts, use_pandas_ip_extractor=True)
            .select(*cols)
            .collect(),
        )
    )
    assert a == b
    assert len(a) > 0


def test_extraction_matches_pandas_oracle(spark, transcripts, transcripts_pdf):
    cols = ["conv_id", "turn_idx", "entity_class", "entity_key"]
    got = sorted(map(tuple, extract_entities(transcripts).select(*cols).collect()))
    want = sorted(map(tuple, extract_oracle(transcripts_pdf)[cols].itertuples(index=False)))
    assert got == want


def test_zero_entity_turns_produce_role_only(spark):
    # a prose-only turn still contributes its role column entity
    df = _mini_df(spark, ["plain words only"], role="system")
    out = extract_entities(df)
    assert _keys(out, "ip") == []
    assert _keys(out, "tool") == []
    assert _keys(out, "role") == ["system"]


def test_differential_hybrid_vs_pure_python_normalize(spark, transcripts):
    """The hybrid JVM-v4/Python-v6 normalizer must equal the all-Python
    ipaddress path on the full fixture (nfdump two-implementations
    analogue, /root/reference/backend/nfdump_test.go:30-55)."""
    from pyspark.sql import functions as F

    from flow_indexer_spark.functions.extractors import (
        IP_PATTERN,
        normalize_ip_array_udf,
        normalize_ip_candidates,
    )

    cands = F.regexp_extract_all(
        F.coalesce(F.col("text"), F.lit("")), F.lit(IP_PATTERN), F.lit(0)
    )
    df = transcripts.select(
        "conv_id",
        "turn_idx",
        F.array_sort(normalize_ip_candidates(cands)).alias("hybrid"),
        F.array_sort(normalize_ip_array_udf(cands)).alias("python"),
    )
    assert df.filter(F.col("hybrid") != F.col("python")).count() == 0
