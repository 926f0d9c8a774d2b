"""spark-submit entry point for the incremental lexical-drift monitor.

Each invocation is one scheduled TICK (Trigger.AvailableNow over a
directory of document parquet files): drift of every new batch against
the accumulated reference token counts, then an idempotent epoch-keyed
commit of those counts into the state (streaming/drift.py).  Records
append to ``<state>/drift_log.jsonl``; stdout gets ONE JSON line with
the latest record so a scheduler can gate on it (``--max-js`` makes a
drifted tick exit nonzero, the audit_job discipline).

    spark-submit --py-files flow_indexer_spark.zip jobs/drift_job.py \
        --input /path/to/docs_parquet_dir --state /path/to/drift_state \
        [--max-js 0.4] [--resident 60]

Local smoke run:

    python jobs/drift_job.py --input <dir> --state /tmp/drift --cpus 8

Cost model per tick: O(new-batch tokens + vocab) — one exploded
groupBy over the delta plus one outer join against the vocab-sized
reference; history is never rescanned.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="flow_indexer_spark drift monitor")
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--state", required=True, help="drift state dir")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--max-js", type=float, default=None,
                    help="exit 1 when the tick's drift exceeds this")
    ap.add_argument("--resident", type=int, default=None, metavar="SECONDS",
                    help="stay resident with a processing-time trigger")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from flow_indexer_spark.session import get_spark
    from flow_indexer_spark.streaming.drift import stream_drift

    spark = get_spark(
        app_name="drift-monitor",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.resident:
            q = stream_drift(
                spark, args.input, args.state,
                processing_time=f"{args.resident} seconds",
                text_col=args.text_col,
            )
            q.awaitTermination()
            return
        stream_drift(spark, args.input, args.state, text_col=args.text_col)
        log_path = os.path.join(args.state, "drift_log.jsonl")
        rec: dict = {"ticked": False}
        if os.path.exists(log_path):
            with open(log_path) as f:
                lines = f.read().strip().splitlines()
            if lines:
                rec = json.loads(lines[-1])
                rec["ticked"] = True
        print(json.dumps(rec, sort_keys=True))
        if (
            args.max_js is not None
            and rec.get("js_divergence") is not None
            and rec["js_divergence"] > args.max_js
        ):
            sys.exit(1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
