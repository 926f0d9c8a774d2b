"""Streaming sketch rollup: ticks append batch-keyed sketch chunks;
estimates match a one-shot batch build; batch-id idempotence bounds
replay; and — unlike additive counts — the DISTINCT estimates are
self-healing under row duplication (union is idempotent), so even a
checkpoint-loss replay that double-represents rows across chunks keeps
them exact."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flow_indexer_spark.operators.sketches import (
    maintain_sketch_rollup,
    read_sketch_rollup,
    rollup_estimates,
    sketch_rollup,
)
from flow_indexer_spark.streaming.rollup import stream_sketch_rollup

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_type=e, user_id=u, ts=T0 + dt.timedelta(hours=h),
                value=float(u) * 1.5)
            for e, u, h in rows
        ],
        SCHEMA,
    )


def _est(spark, df):
    return {
        r.event_type: (r.n_events, int(r.distinct_ids_est), r.value_p50)
        for r in rollup_estimates(df, quantiles=(0.5,)).collect()
    }


def test_stream_sketch_rollup_matches_batch_across_ticks(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [("click", 1, 0), ("click", 2, 1), ("view", 1, 30)]
    b2 = [("click", 3, 2), ("click", 1, 3), ("view", 2, 31)]
    _events(spark, b1).coalesce(1).write.mode("append").parquet(src)
    stream_sketch_rollup(spark, src, out, ckpt, SCHEMA)
    _events(spark, b2).coalesce(1).write.mode("append").parquet(src)
    stream_sketch_rollup(spark, src, out, ckpt, SCHEMA)

    got = _est(spark, read_sketch_rollup(spark, out))
    want = _est(spark, sketch_rollup(_events(spark, b1 + b2)))
    assert set(got) == set(want) == {"click", "view"}
    for et in want:
        assert got[et][0] == want[et][0]  # additive counts exact
        assert got[et][1] == want[et][1]  # tiny sets: HLL exact
        assert abs(got[et][2] - want[et][2]) < 1e-9


def test_maintain_replay_same_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    rows = _events(spark, [("click", 1, 0), ("click", 2, 1)])
    maintain_sketch_rollup(spark, rows, out, "b1")
    before = _est(spark, read_sketch_rollup(spark, out))
    maintain_sketch_rollup(spark, rows, out, "b1")  # replay: same chunk
    assert _est(spark, read_sketch_rollup(spark, out)) == before
    assert (
        spark.read.parquet(out).select("batch").distinct().count() == 1
    )


def test_checkpoint_loss_distinct_estimates_self_heal(spark, tmp_path):
    """Lose the checkpoint after TWO ticks: the full source replays as
    stream-0, so tick 2's rows are now represented in BOTH the replayed
    stream-0 chunk and the surviving stream-1 chunk. Additive n_events
    double-counts those rows (documented; the exact rollup has the same
    failure and needs content-keyed recovery) — but the HLL/Theta union
    and KLL quantiles are INVARIANT under duplication, so every
    distinct-count and quantile answer stays exactly correct."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [("click", 1, 0), ("click", 2, 1)]
    b2 = [("click", 3, 2), ("click", 2, 3)]
    _events(spark, b1).coalesce(1).write.mode("append").parquet(src)
    stream_sketch_rollup(spark, src, out, ckpt, SCHEMA)
    _events(spark, b2).coalesce(1).write.mode("append").parquet(src)
    stream_sketch_rollup(spark, src, out, ckpt, SCHEMA)
    clean = _est(spark, read_sketch_rollup(spark, out))

    shutil.rmtree(ckpt)
    stream_sketch_rollup(spark, src, out, ckpt, SCHEMA)  # full replay
    healed = _est(spark, read_sketch_rollup(spark, out))

    assert healed["click"][1] == clean["click"][1] == 3  # distinct exact
    assert abs(healed["click"][2] - clean["click"][2]) < 1e-9  # quantile
    assert healed["click"][0] == clean["click"][0] + len(b2)  # documented
