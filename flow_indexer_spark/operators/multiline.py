"""Multiline record reassembly — the log-shipper 'multiline codec'.

Every log pipeline (Logstash/Fluentd multiline, Vector's `multiline`
transform; flow-indexer sidesteps it only because bro TSV is strictly
one-record-per-line) needs to stitch continuation lines — stack
traces, wrapped messages, tool output spilled across rows — back onto
the record that started them before the parse stage sees it.  The
transcript analogue: a turn's payload split across several rows.

Semantics: within a stream (``part_col``), ordered by ``order_col``,
every row where ``is_start_col`` is true BEGINS a record; subsequent
non-start rows belong to it.  Orphan continuations before the first
start form record 0 (kept, flagged via ``has_start = false`` — a
pipeline drops or dead-letters them by filtering, it never silently
loses lines).

Determinism: record ids are exact running counts; the reassembled text
concatenates lines in explicit ``order_col`` order (sorted in-row
fold; oracle twin ``string_agg(line, E'\\n' ORDER BY ord)``).

Scale shape: ONE window pass partitioned by stream (the running
is-start count — the sessionize cumsum idiom), then one groupBy
(stream, record).  A record's lines are materialized as one row at the
group stage — bounded by record length (a stack trace), never by
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["reassemble_multiline"]


def reassemble_multiline(
    df: DataFrame,
    part_col: str,
    order_col: str,
    line_col: str,
    is_start_col: str,
) -> DataFrame:
    """Returns (stream, record_id, start_order, n_lines, has_start,
    record_text) — one row per reassembled record."""
    d = df.select(
        F.col(part_col).alias("stream"),
        F.col(order_col).alias("_o"),
        F.col(line_col).alias("_l"),
        F.col(is_start_col).cast("boolean").alias("_s"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn(
        "record_id", F.sum(F.col("_s").cast("bigint")).over(w)
    )
    return (
        d.groupBy("stream", "record_id")
        .agg(
            F.min("_o").alias("start_order"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.max(F.col("_s").cast("int")).cast("boolean").alias(
                "has_start"
            ),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_o", "_l"))),
                    lambda x: x["_l"],
                ),
            ).alias("record_text"),
        )
    )
