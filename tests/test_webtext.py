"""webtext operators: Luhn truth table vs a python reference, URL
canonicalization properties, HTML entity single-decode, Gopher edges."""

import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.webtext import (
    canonical_url,
    extract_html,
    gopher_flags,
    html_text,
    luhn_valid,
    pii_scan,
    url_dedup,
)


def _py_luhn(s: str) -> bool:
    tot = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        tot += d
    return tot % 10 == 0


def test_luhn_matches_python_reference(spark):
    # classic test numbers + neighbours + every-length sweep
    nums = [
        "4111111111111111", "4111111111111112", "378282246310005",
        "6011111111111117", "6011111111111118", "5500000000000004",
        "1234567812345670", "0000000000000", "0000000000001",
    ] + [str(10**n + 7) for n in range(12, 19)]
    df = spark.createDataFrame([(n,) for n in nums], "s string")
    got = {
        r["s"]: r["v"]
        for r in df.select("s", luhn_valid(F.col("s")).alias("v")).collect()
    }
    assert got == {n: _py_luhn(n) for n in nums}


def test_pii_scan_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "pay 4111 1111 1111 1111 or 4111-1111-1111-1112 now"),
            (2, "ssn 123-45-6789 call 555-867-5309"),
            (3, "plain text 12345"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["n_cc_candidates"] == 2 and rows[1]["n_cc_valid"] == 1
    assert rows[2]["n_cc_candidates"] == 0
    assert rows[2]["n_ssn"] == 1 and rows[2]["n_phone"] == 1
    assert [rows[i]["has_pii"] for i in (1, 2, 3)] == [1, 1, 0]


def test_canonical_url_known_and_idempotent(spark):
    cases = [
        # messy -> expected canonical
        ("HTTPS://WWW.Ex.COM:443/A//?utm_source=x&b=2&a=1&gclid=z#f",
         "https://ex.com/A?a=1&b=2"),
        ("http://ex.com:80", "http://ex.com/"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),
        ("https://ex.com/p/?fbclid=abc", "https://ex.com/p"),
        ("https://ex.com/?", "https://ex.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    # idempotence: canonical(canonical(u)) == canonical(u)
    again = [
        r["c"]
        for r in df.select(
            canonical_url(canonical_url("url")).alias("c")
        ).collect()
    ]
    assert again == got


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.ex.com/p?a=1"),
            (2, "https://ex.com:443/p/?a=1"),
            (3, "https://ex.com/q"),
        ],
        "doc_id int, url string",
    )
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert rows["https://ex.com/p?a=1"]["n_dup"] == 2
    assert rows["https://ex.com/p?a=1"]["keeper_id"] == 1
    assert rows["https://ex.com/q"]["n_dup"] == 1


def test_html_entities_single_decode(spark):
    # '&amp;lt;' must decode to '&lt;' (one level), never '<'
    df = spark.createDataFrame(
        [("<p>&amp;lt; &amp; &lt;</p>",)], "html string"
    )
    (got,) = df.select(html_text("html").alias("t")).collect()
    assert got["t"] == "&lt; & <"


def test_html_strips_script_and_style(spark):
    h = (
        '<head><style>b {c: d}</style></head><body>'
        '<script>if (1 < 2) { alert("</p>") }</script>keep</body>'
    )
    df = spark.createDataFrame([(1, h)], "doc_id int, html string")
    (row,) = extract_html(df).collect()
    assert row["clean_text"] == "keep"
    assert row["title"] == ""


def test_gopher_flags_edges(spark):
    text_ok = ("the cat sits and that dogs have fun with mats of june " * 6)
    df = spark.createDataFrame(
        [(1, text_ok), (2, ""), (3, "• a\n• b\n• c"), (4, "so…\nno…\nyes")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_flags(df).collect()}
    assert rows[1]["keep"] == 1
    assert rows[2]["n_words"] == 0 and rows[2]["keep"] == 0
    assert rows[3]["f_bullet_lines"] == 0  # 3/3 bullet lines > 0.9
    assert rows[4]["f_ellipsis_lines"] == 0  # 2/3 ellipsis-ended > 0.3
