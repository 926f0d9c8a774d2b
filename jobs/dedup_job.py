"""spark-submit entry point for INCREMENTAL corpus dedup.

Where curate_job dedups a corpus against itself in one batch, this job
grows a corpus over time: each run classifies a NEW batch of documents
against the persisted signature state (operators/dedup_state.py),
appends the accepted docs to the corpus, commits their signatures under
the batch id (replay-idempotent), and reports per-kind counts.

    python -m zipfile -c /tmp/flow_indexer_spark.zip flow_indexer_spark
    spark-submit --py-files /tmp/flow_indexer_spark.zip jobs/dedup_job.py \
        --input /path/to/new_docs_parquet \
        --state /path/to/sig_state \
        --output /path/to/corpus \
        --batch-id 2026-08-17 \
        [--n-bands 4] [--rows-per-band 1] [--max-bucket-df 1000]

    # streaming: drain new files each tick, exactly-once via checkpoint
    spark-submit ... jobs/dedup_job.py --streaming \
        --input <dir> --state <state> --output <out> \
        --checkpoint <ckpt>

    # maintenance: fold per-batch state partitions into one
    spark-submit ... jobs/dedup_job.py --compact --state <state>

Local smoke:

    python jobs/dedup_job.py --input <parquet> --state /tmp/st \
        --output /tmp/corpus --batch-id b1 --cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="incremental corpus dedup job")
    ap.add_argument("--input", help="new-batch documents parquet (or stream dir)")
    ap.add_argument("--state", required=True, help="signature state path")
    ap.add_argument("--output", help="accepted-docs corpus root")
    ap.add_argument("--batch-id", help="stable batch identifier (batch mode)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-bands", type=int, default=4)
    ap.add_argument("--rows-per-band", type=int, default=1)
    ap.add_argument("--max-bucket-df", type=int, default=1000)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--checkpoint", help="checkpoint dir (streaming mode)")
    ap.add_argument("--compact", action="store_true", help="compact state and exit")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit on cluster)")
    args = ap.parse_args()

    from flow_indexer_spark.session import get_spark

    spark = get_spark(
        app_name="flow-indexer-dedup",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )

    if args.compact:
        from flow_indexer_spark.operators.dedup_state import compact_state

        compact_state(spark, args.state)
        print(json.dumps({"mode": "compact", "state": args.state}))
        spark.stop()
        return

    if args.streaming:
        if not (args.input and args.output and args.checkpoint):
            ap.error("--streaming needs --input, --output and --checkpoint")
        from flow_indexer_spark.streaming.dedup import run_content_dedup_tick

        schema = spark.read.parquet(args.input).schema
        run_content_dedup_tick(
            spark, args.input, args.checkpoint, args.state, args.output,
            schema, args.id_col, args.text_col, args.n_bands,
            args.max_bucket_df, args.rows_per_band,
        )
        print(json.dumps({"mode": "streaming", "output": args.output}))
        spark.stop()
        return

    if not (args.input and args.output and args.batch_id):
        ap.error("batch mode needs --input, --output and --batch-id")
    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.dedup_state import dedup_against_state

    batch = spark.read.parquet(args.input)
    out = dedup_against_state(
        spark, batch, args.state, args.batch_id, args.id_col,
        args.text_col, args.n_bands, args.max_bucket_df,
        args.rows_per_band,
    )
    (
        out.filter(F.col("dup_kind") == "unique")
        .drop("content_hash", "dup_kind")
        .withColumn("batch", F.lit(args.batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(args.output)
    )
    counts = {
        r["dup_kind"]: r["n"]
        for r in out.groupBy("dup_kind").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({"mode": "batch", "batch_id": args.batch_id,
                      "counts": counts, "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
