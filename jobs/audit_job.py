"""spark-submit entry point for the corpus audit gate:
quality rules -> uniqueness -> per-source drift -> skew report.

The read-only companion to curate_job: run the declarative data-quality
audit (operators/validate.py), the leave-one-out PSI drift report
(operators/diagnostics.py), and the hot-key skew report over a
documents-shaped table, and emit ONE JSON line a scheduler can gate a
downstream run on (any failed rule or drifted source -> nonzero exit
with --strict). The reference surfaces exactly this kind of health
record in its stats responses (/root/reference/flowindexer/
flowindexer.go:391-393) — here it is a standalone job so a 100 TB
ingest can be gated without touching the pipeline.

    spark-submit --py-files flow_indexer_spark.zip jobs/audit_job.py \
        --input /path/to/documents_parquet \
        [--value-col n_chars] [--group-col source] [--unique doc_id] \
        [--lang-allow en,de,fr,es] [--strict]

Local smoke run:

    python jobs/audit_job.py --input <parquet> --cpus 8

Cost model: the rule audit is ONE scan (conditional-sum aggregate),
uniqueness and drift are one shuffle each, the skew report one more —
a fixed four-pass budget regardless of how many rules are configured.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="flow_indexer_spark audit job")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--value-col", default="n_chars")
    ap.add_argument(
        "--lang-allow",
        default=None,
        metavar="L1,L2,...",
        help="langs considered in-domain for the lang rule (omit = skip)",
    )
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument(
        "--lang-min-rate",
        type=float,
        default=0.7,
        help="min pass rate for the lang rule",
    )
    ap.add_argument(
        "--drift-threshold", type=float, default=0.25, help="PSI drift flag"
    )
    ap.add_argument("--drift-bins", type=int, default=8)
    ap.add_argument("--skew-top-k", type=int, default=10)
    ap.add_argument(
        "--strict",
        action="store_true",
        help="exit 1 when any rule fails or any group drifts",
    )
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit on cluster)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.diagnostics import (
        distribution_drift,
        skew_report,
    )
    from flow_indexer_spark.operators.validate import (
        in_set,
        non_empty,
        not_null,
        rule,
        validate,
    )
    from flow_indexer_spark.session import get_spark

    spark = get_spark(
        app_name="flow-indexer-audit",
        master=f"local[{args.cpus}]" if args.cpus else None,
        shuffle_partitions=args.cpus if args.cpus else None,
    )
    df = spark.read.parquet(args.input)

    rules = [
        not_null(args.text_col),
        non_empty(args.text_col),
        not_null(args.id_col),
        rule(
            f"value_nonnegative({args.value_col})",
            F.col(args.value_col) >= 0,
        ),
    ]
    if args.lang_allow:
        rules.append(
            in_set(
                args.lang_col,
                args.lang_allow.split(","),
                min_pass_rate=args.lang_min_rate,
            )
        )
    report = validate(df, rules, unique_keys=[[args.id_col]]).collect()
    drift = distribution_drift(
        df,
        args.value_col,
        args.group_col,
        n_bins=args.drift_bins,
        threshold=args.drift_threshold,
    ).collect()
    skew = skew_report(df, [args.group_col], top_k=args.skew_top_k).collect()

    failed = sorted(r.rule for r in report if not r.ok)
    drifted = sorted(r[args.group_col] for r in drift if r.drifted)
    print(
        json.dumps(
            {
                "input": args.input,
                "n_rows": report[0].n_rows if report else 0,
                "rules": {
                    r.rule: {
                        "n_pass": r.n_pass,
                        "n_fail": r.n_fail,
                        "pass_rate": round(r.pass_rate, 6),
                        "ok": bool(r.ok),
                    }
                    for r in report
                },
                "drift": {
                    r[args.group_col]: {
                        "n_rows": r.n_rows,
                        "psi": round(r.psi, 6),
                        "noise_floor": round(r.noise_floor, 6),
                        "drifted": bool(r.drifted),
                    }
                    for r in drift
                },
                "skew_top": [
                    {"key": r.key, "n_rows": r.n_rows, "n_salt": r.n_salt}
                    for r in skew
                ],
                "failed_rules": failed,
                "drifted_groups": drifted,
                "ok": not failed and not drifted,
            }
        )
    )
    if args.strict and (failed or drifted):
        sys.exit(1)


if __name__ == "__main__":
    main()
