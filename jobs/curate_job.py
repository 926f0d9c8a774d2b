"""spark-submit entry point for corpus curation:
redact -> trim -> dedup -> boilerplate -> mix -> cap -> split.

The training-data companion to ingest_job: take a documents table,
optionally scrub PII/entities and trim length outliers, drop exact +
near duplicates (keeper per connected near-dup cluster) and
boilerplate-heavy docs, cap any one source's contribution, assign
deterministic train/val/test splits, and write the curated corpus
partitioned by split.

    spark-submit --py-files flow_indexer_spark.zip jobs/curate_job.py \
        --input /path/to/documents_parquet \
        --output /path/to/curated \
        [--jaccard 0.5] [--ngram 3] [--source-cap 100000] \
        [--train 0.9 --val 0.05 --test 0.05]

Local smoke run:

    python jobs/curate_job.py --input <parquet> --output /tmp/curated --cpus 8

Every stage is a documented scale path: exact dedup is one hash shuffle,
near-dup candidates are inverted-index joins with a document-frequency
skew cap, clustering is O(log n) star rounds, the source cap ships at
most n rows per group per map task (WindowGroupLimit), and the split is
an in-row hash — no rand(), no driver loops, rerun-stable end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="flow_indexer_spark curation job")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="curated corpus output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--ngram", type=int, default=3, help="near-dup shingle size")
    ap.add_argument("--jaccard", type=float, default=0.5, help="near-dup threshold")
    ap.add_argument(
        "--max-ngram-df", type=int, default=1000, help="n-gram skew cap (candidate gen)"
    )
    ap.add_argument(
        "--source-cap", type=int, default=None, help="max docs per source (omit = no cap)"
    )
    ap.add_argument(
        "--mix",
        action="append",
        default=None,
        metavar="SOURCE=FRACTION",
        help="deterministic per-source keep rate (repeatable), e.g. "
        "--mix crawl=0.3 --mix forums=0.8; unlisted sources keep 1.0",
    )
    ap.add_argument(
        "--pack-budget",
        type=int,
        default=None,
        metavar="TOKENS",
        help="emit concat-and-chunk packing columns (shard, pack_id, "
        "offset) for this token budget; omit to skip",
    )
    ap.add_argument("--pack-shards", type=int, default=64)
    ap.add_argument("--train", type=float, default=0.9)
    ap.add_argument("--val", type=float, default=0.05)
    ap.add_argument("--test", type=float, default=0.05)
    ap.add_argument(
        "--decontaminate",
        type=float,
        default=None,
        metavar="RATIO",
        help="drop eval-split docs whose train n-gram contamination ratio "
        "is >= RATIO (e.g. 0.2); omit to skip the check",
    )
    ap.add_argument(
        "--decontaminate-ngram",
        type=int,
        default=8,
        help="n-gram size for the contamination check (longer than the "
        "near-dup shingle: leakage evidence needs long exact spans)",
    )
    ap.add_argument(
        "--redact",
        action="store_true",
        help="scrub PII/entity patterns (IP, email, hex ids) from the text "
        "column BEFORE dedup, so dedup hashes are computed on clean text",
    )
    ap.add_argument(
        "--quantile-band",
        default=None,
        metavar="LO:HI",
        help="keep only docs inside the corpus's [LO, HI] quantile band of "
        "--quantile-col (e.g. 0.05:0.99 trims length outliers)",
    )
    ap.add_argument("--quantile-col", default="n_chars")
    ap.add_argument(
        "--max-boilerplate",
        type=float,
        default=None,
        metavar="RATIO",
        help="drop docs whose corpus-common n-gram fraction is >= RATIO "
        "(boilerplate/footer detection); omit to skip",
    )
    ap.add_argument(
        "--boilerplate-df",
        type=int,
        default=50,
        help="a gram is 'common' when it occurs in more than this many docs",
    )
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit on cluster)")
    args = ap.parse_args()

    band = None
    if args.quantile_band:  # validate BEFORE the Spark session boots
        lo, sep, hi = args.quantile_band.partition(":")
        if not sep or not lo or not hi:
            ap.error("--quantile-band must be LO:HI, e.g. 0.05:0.99")
        try:
            band = (float(lo), float(hi))
        except ValueError:
            ap.error(f"--quantile-band: not numbers: {args.quantile_band!r}")

    from pyspark.sql import functions as F

    from flow_indexer_spark.session import get_spark
    from flow_indexer_spark.operators.curation import hash_split, per_group_cap
    from flow_indexer_spark.operators.dedup import (
        exact_dedup_keep,
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    spark = get_spark(
        app_name="flow-indexer-curate",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # 0a. PII/entity redaction first, so every later hash (dedup, split,
    # packing) is computed over the text that actually ships
    if args.redact:
        from flow_indexer_spark.operators.redact import redact_text

        docs = docs.withColumn(args.text_col, redact_text(args.text_col))

    # 0b. length/score outlier trim by the corpus's own quantiles
    if band:
        from flow_indexer_spark.operators.curation import quantile_band_filter

        docs = quantile_band_filter(docs, args.quantile_col, band[0], band[1])

    # 1. exact dedup (hash groupBy keeper)
    docs = exact_dedup_keep(docs, args.id_col, args.text_col)

    # 2. near-dup clusters -> keepers only
    pairs = ngram_jaccard_pairs(
        docs,
        args.id_col,
        args.text_col,
        n=args.ngram,
        threshold=args.jaccard,
        max_ngram_df=args.max_ngram_df,
    )
    clusters = near_dup_clusters(docs, pairs, args.id_col)
    docs = docs.join(
        clusters.filter("is_keeper").select(args.id_col), args.id_col, "left_semi"
    )

    # 2b. corpus-level boilerplate drop (optional)
    if args.max_boilerplate is not None:
        from flow_indexer_spark.operators.curation import boilerplate_fraction

        heavy = (
            boilerplate_fraction(
                docs, n=args.ngram, min_df=args.boilerplate_df,
                id_col=args.id_col, text_col=args.text_col,
            )
            .filter(F.col("boilerplate_ratio") >= args.max_boilerplate)
            .select(args.id_col)
        )
        docs = docs.join(heavy, args.id_col, "left_anti")

    # 3a. per-source rate mix (optional): deterministic hash subsample
    if args.mix:
        from flow_indexer_spark.operators.curation import stratified_sample

        fractions = {}
        for spec in args.mix:
            name, _, frac = spec.partition("=")
            fractions[name] = float(frac)
        docs = stratified_sample(docs, args.source_col, fractions, id_col=args.id_col)

    # 3b. per-source quota (optional)
    if args.source_cap:
        docs = per_group_cap(
            docs, args.source_col, n=args.source_cap, id_col=args.id_col,
            prefilter=True,
        )

    # 4. deterministic split assignment
    weights = {"train": args.train, "val": args.val, "test": args.test}
    curated = hash_split(docs, args.id_col, weights)

    # 4b. optional packing layout: stamp (shard, pack_id, offset) so the
    # training loader can slice fixed-token sequences without re-shuffling
    if args.pack_budget:
        from flow_indexer_spark.operators.curation import pack_sequences

        layout = pack_sequences(
            curated, args.pack_budget, id_col=args.id_col,
            text_col=args.text_col, n_shards=args.pack_shards,
        ).select(args.id_col, "shard", "pack_id", "offset")
        curated = curated.join(layout, args.id_col)

    # 5. optional eval decontamination: drop val/test docs whose n-gram
    # overlap with ANY train doc reaches the threshold (eval leakage)
    n_decontaminated = 0
    if args.decontaminate is not None:
        from flow_indexer_spark.operators.curation import cross_split_contamination

        dirty = (
            cross_split_contamination(
                curated, args.id_col, args.text_col, n=args.decontaminate_ngram
            )
            .filter(F.col("contamination_ratio") >= args.decontaminate)
            .select(args.id_col)
        )
        n_decontaminated = dirty.count()
        curated = curated.join(dirty, args.id_col, "left_anti")

    curated.write.mode("overwrite").partitionBy("split").parquet(args.output)

    out = spark.read.parquet(args.output)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "n_input": n_input,
                "n_curated": sum(per_split.values()),
                "n_decontaminated": n_decontaminated,
                "per_split": per_split,
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
