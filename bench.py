"""Benchmark harness.

Default mode (what the driver runs): boots one session on
``local[$SPARK_GRAFT_CPUS]``, times the headline operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), measures the
end-to-end ingest pipeline (parse -> enrich-shape extract -> postings
index) in turns/sec, then evidences the BASELINE north_rule scaling
criterion by re-running the identical pipeline in two child processes at
local[N] and local[4N] (N=8 -> 32 by default) on the same input and
reporting efficiency = (tps_4N / tps_N) / 4. Prints ONE JSON line.

Child mode (internal): ``python bench.py --child --cpus K`` measures only
the pipeline at that parallelism and prints a small JSON line.

The pipeline input is the sf events table synthesized into transcripts
(deterministic, same as __spark_entry__.synth_transcripts) and replicated
``SPARK_GRAFT_BENCH_MULT`` times (default 10 -> 1M turns at sf0.1) so the
measurement is compute-bound rather than session-overhead-bound.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "10"))
SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "8"))


def _session(cpus: int):
    from flow_indexer_spark.session import get_spark

    s = get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _bench_pipeline(spark, sf_dir: str, mult: int, cpus: int) -> dict:
    """End-to-end parse -> enrich -> route -> index measurement (turns/sec):
    the full run_ingest (routed sink + postings index + manifest)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from flow_indexer_spark.plans.pipeline import PipelineConfig, run_ingest

    t = entry_mod.synth_transcripts(spark, sf_dir)
    if mult > 1:
        # replicate deterministically; rep joins conv_id so replicas form
        # distinct conversations (keeps key cardinality realistic)
        rep = spark.range(mult).select(F.col("id").alias("rep"))
        t = t.crossJoin(rep).withColumn(
            "conv_id", F.concat_ws("-", "conv_id", "rep")
        ).drop("rep")
    # the tiny source parquet yields 1-2 input splits; spread like a real
    # multi-file table. Fixed partition count (not cpu-derived) so the N and
    # 4N scaling runs process byte-identical inputs.
    t = t.repartition(128).cache()
    n_turns = t.count()  # materialize input outside the timed window

    # warmup pass (JIT + python workers) on a small slice, untimed
    warm = t.limit(20_000)
    run_ingest(spark, warm, PipelineConfig(output_root=tempfile.mkdtemp(prefix="bench_warm_")))

    # best-of-3: JVM JIT, GC timing, and file-commit jitter dominate at this
    # toy scale; the fastest run is the least-noise estimate of the plan cost
    best = None
    for _ in range(3):
        out_root = tempfile.mkdtemp(prefix="bench_out_")
        cfg = PipelineConfig(output_root=out_root)
        t0 = time.monotonic()
        metrics = run_ingest(spark, t, cfg)
        wall = time.monotonic() - t0
        shutil.rmtree(out_root, ignore_errors=True)
        assert metrics["n_turns"] == n_turns
        if best is None or wall < best[0]:
            best = (wall, metrics)
    t.unpersist()
    wall, metrics = best
    return {
        "n_turns": n_turns,
        "n_entities": metrics["n_entities"],
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "stage_ms": metrics["stage_ms"],
    }


def _bench_queries(spark, sf_dir: str) -> dict:
    """Headline operator queries (forced via count/collect)."""
    import __spark_entry__ as entry_mod

    names = [
        "token_postings",
        "token_search",
        "pipeline_routed_counts",
        "props_regex_extract",
        "stats_two_level_buckets",
        "enrich_broadcast_dims",
        "tpch_q1_agg",
        "topk_revenue_orders",
        "dedup_exact",
        "minhash_lsh_buckets",
        "ann_topk_cosine",
    ]
    qs = entry_mod.queries()
    out = {}
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).collect()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _child(cpus: int) -> None:
    spark = _session(cpus)
    res = _bench_pipeline(spark, SF_DIR, MULT, cpus)
    spark.stop()
    print(json.dumps({"cpus": cpus, **res}))


def _run_child(cpus: int) -> dict:
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--child", "--cpus", str(cpus)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--no-scaling", action="store_true")
    args = ap.parse_args()

    if args.child:
        _child(args.cpus)
        return

    spark = _session(args.cpus)
    queries = _bench_queries(spark, SF_DIR)
    pipeline = _bench_pipeline(spark, SF_DIR, MULT, args.cpus)
    spark.stop()

    result = {
        "metric": "end-to-end parse->index->route throughput (turns/sec)",
        "value": pipeline["wall_s"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "n_turns": pipeline["n_turns"],
        "turns_per_sec": pipeline["turns_per_sec"],
        "cpus": args.cpus,
    }

    if not args.no_scaling:
        lo = _run_child(SCALING_N)
        hi = _run_child(SCALING_N * 4)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
        result["scaling"] = {
            "n_cpus": lo["cpus"],
            "n_turns_per_sec": lo["turns_per_sec"],
            "4n_cpus": hi["cpus"],
            "4n_turns_per_sec": hi["turns_per_sec"],
            "efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
