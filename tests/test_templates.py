"""Log template mining: hand-computed masking fixtures; the sf0.01
oracle twin runs in test_entry_contract.py."""

from __future__ import annotations

from flow_indexer_spark.operators.templates import log_templates, mask_line


def _lines(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_mask_order_ip_before_number(spark):
    d = _lines(spark, ["conn from 10.1.2.3 port 443 took 1.5s id deadbeef99"])
    got = d.select(mask_line("text").alias("m")).first()["m"]
    # IP masked whole (not four <N>), float masked as one <N>, hex id masked
    assert got == "conn from <IP> port <N> took <N>s id <HEX>"


def test_template_census_counts_and_example(spark):
    d = _lines(
        spark,
        [
            "user 1 logged in",
            "user 42 logged in",
            "user 7 logged in",
            "disk 9 full",
            "disk 3 full",
            "one-off line",
        ],
    )
    rows = log_templates(d).collect()
    assert [(r["template"], r["n_lines"]) for r in rows] == [
        ("user <N> logged in", 3),
        ("disk <N> full", 2),
        ("one-off line", 1),
    ]
    # example = lexicographically smallest raw line (deterministic)
    assert rows[0]["example"] == "user 1 logged in"
    assert rows[1]["example"] == "disk 3 full"


def test_template_census_min_count(spark):
    d = _lines(spark, ["a 1", "a 2", "b 1"])
    rows = log_templates(d, min_count=2).collect()
    assert [(r["template"], r["n_lines"]) for r in rows] == [("a <N>", 2)]
