"""Streaming dedup: re-deliveries of the same (conv_id, turn_idx) within
the watermark horizon are dropped across micro-batch ticks, first row
wins, and state survives checkpoint restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flow_indexer_spark.streaming.dedup import run_dedup_tick

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(spark, rows):
    return spark.createDataFrame(
        [
            Row(conv_id=c, turn_idx=i, text=t, ts=T0 + dt.timedelta(minutes=m))
            for c, i, t, m in rows
        ],
        SCHEMA,
    )


def test_dedup_drops_redeliveries_across_ticks(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    batch1 = [
        ("c1", 0, "first", 0),
        ("c1", 0, "dup-same-batch", 1),   # same key, later event time
        ("c1", 1, "turn1", 2),
        ("c2", 0, "other-conv", 3),
    ]
    _rows(spark, batch1).coalesce(1).write.mode("append").parquet(src)
    run_dedup_tick(spark, src, ckpt, out, SCHEMA, watermark="2 hours")

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 3
    assert got[("c1", 0)] == "first"  # first delivery wins

    # tick 2 (checkpoint restart): replay of ("c1", 0) within the
    # watermark horizon is dropped; a genuinely new turn passes.
    batch2 = [
        ("c1", 0, "replayed", 4),
        ("c3", 0, "new", 5),
    ]
    _rows(spark, batch2).coalesce(1).write.mode("append").parquet(src)
    run_dedup_tick(spark, src, ckpt, out, SCHEMA, watermark="2 hours")

    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got2) == 4
    assert got2[("c1", 0)] == "first"      # replay dropped
    assert got2[("c3", 0)] == "new"


def test_dedup_state_expires_past_watermark(spark, tmp_path):
    """A key re-delivered AFTER the watermark passed it is re-emitted —
    the documented bounded-state contract (older replays belong to the
    manifest layer). This pins that state really is TTL'd, i.e. memory is
    O(watermark window), not O(history)."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    _rows(spark, [("c1", 0, "first", 0), ("w", 9, "wm-push", 600)]).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_dedup_tick(spark, src, ckpt, out, SCHEMA, watermark="10 minutes")

    # watermark is now ~590 min past c1/t0's event time -> its state is gone
    _rows(spark, [("c1", 0, "late-replay", 601)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_dedup_tick(spark, src, ckpt, out, SCHEMA, watermark="10 minutes")

    texts = sorted(
        r["text"]
        for r in spark.read.parquet(out)
        .where("conv_id = 'c1' AND turn_idx = 0")
        .collect()
    )
    assert texts == ["first", "late-replay"]


def test_content_dedup_ticks_and_checkpoint_loss(spark, tmp_path):
    """Cross-tick CONTENT dedup vs the persisted signature state: a doc
    re-delivered in a later tick (new id, same text) is dropped; losing
    the checkpoint and re-draining the source converges to the same
    duplicate-free output instead of re-emitting."""
    import shutil

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flow_indexer_spark.streaming.dedup import run_content_dedup_tick

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def write(rows):
        spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows]).coalesce(
            1
        ).write.mode("append").parquet(src)

    def texts():
        return sorted(r["text"] for r in spark.read.parquet(out).collect())

    write([(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    run_content_dedup_tick(spark, src, ckpt, state, out, schema,
                           max_bucket_df=None)
    assert texts() == ["alpha beta gamma", "delta epsilon zeta"]

    # tick 2: one fresh doc + one re-delivery of doc 1 under a NEW id
    write([(10, "omega psi chi"), (11, "alpha beta gamma")])
    run_content_dedup_tick(spark, src, ckpt, state, out, schema,
                           max_bucket_df=None)
    assert texts() == [
        "alpha beta gamma", "delta epsilon zeta", "omega psi chi",
    ]

    # checkpoint loss: every file re-delivered as one super-batch; the
    # content-level state keeps the output duplicate-free
    shutil.rmtree(ckpt)
    run_content_dedup_tick(spark, src, ckpt, state, out, schema,
                           max_bucket_df=None)
    assert texts() == [
        "alpha beta gamma", "delta epsilon zeta", "omega psi chi",
    ]
