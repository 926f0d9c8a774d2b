"""Entity redaction: hand-computed scrub fixtures (the inverse of the
extract stage the reference tests in
/root/reference/flowindexer/flowindexer_test.go — entities FOUND there
must be REMOVED here)."""

from __future__ import annotations

from flow_indexer_spark.operators.redact import redact_entities, redact_text
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_redact_ip_email_hexid(spark):
    d = _docs(
        spark,
        [
            "from 10.1.2.3 to 192.168.0.1 done",
            "mail bob@example.com and a.b+c@sub.domain.org",
            "token " + "a1" * 16 + " end",  # 32 hex chars
            "clean text no entities",
        ],
    )
    rows = {r["doc_id"]: r for r in redact_entities(d).collect()}
    assert rows[0]["clean_text"] == "from <IP> to <IP> done"
    assert (rows[0]["n_ip"], rows[0]["n_email"], rows[0]["n_hexid"]) == (2, 0, 0)
    assert rows[1]["clean_text"] == "mail <EMAIL> and <EMAIL>"
    assert rows[1]["n_email"] == 2
    assert rows[2]["clean_text"] == "token <HEXID> end"
    assert rows[2]["n_hexid"] == 1
    assert rows[3]["clean_text"] == "clean text no entities"
    assert (rows[3]["n_ip"], rows[3]["n_email"], rows[3]["n_hexid"]) == (0, 0, 0)


def test_redact_deterministic_and_pure(spark):
    d = _docs(spark, ["a 1.2.3.4 b"])
    one = d.select(redact_text("text").alias("c")).first()["c"]
    two = d.select(redact_text("text").alias("c")).first()["c"]
    assert one == two == "a <IP> b"


def test_redact_keeps_other_columns(spark):
    d = _docs(spark, ["x 1.2.3.4"]).withColumn("lang", F.lit("en"))
    out = redact_entities(d)
    assert set(out.columns) == {
        "doc_id", "lang", "clean_text", "n_email", "n_hexid", "n_ip", "n_ip6"
    }
    assert out.first()["lang"] == "en"


def test_redact_ipv6_uppercase_and_long_hex(spark):
    """Coverage parity with the extract stage: IPv6, uppercase hex ids,
    and hex runs longer than 64 chars must all be scrubbed."""
    d = _docs(
        spark,
        [
            "peer 2001:db8:0:1::c0a8:1 connected",
            "token " + "A1" * 16 + " end",        # 32 uppercase hex
            "long " + "a1" * 40 + " end",          # 80-char hex run
        ],
    )
    rows = {r["doc_id"]: r for r in redact_entities(d).collect()}
    assert rows[0]["clean_text"] == "peer <IP6> connected"
    assert rows[0]["n_ip6"] == 1
    assert rows[1]["clean_text"] == "token <HEXID> end"
    assert rows[2]["clean_text"] == "long <HEXID> end"
