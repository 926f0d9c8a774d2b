"""Physical-plan regression pins: the architecture claims in PLANS.md,
asserted. A future edit that silently adds a shuffle to a scan-speed
operator, degrades a broadcast join to sort-merge, or drops extraction
out of Arrow should fail HERE, not in a 100 TB run."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F


def _nodes(df) -> list[str]:
    """Physical-plan node names from `.explain('formatted')` (the `(n)
    NodeName` detail lines — each node exactly once)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.findall(r"^\(\d+\) (\S+)", buf.getvalue(), re.M)


def _count(df, name: str) -> int:
    return sum(1 for n in _nodes(df) if n == name)


def _shuffles(df) -> int:
    return _count(df, "Exchange")  # BroadcastExchange is a distinct name


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 3}", "alpha beta gamma delta") for i in range(100)],
        "doc_id long, source string, text string",
    )


def test_extraction_is_one_pipelined_stage(spark, transcripts):
    """PLANS.md §1: extract is zero shuffles with exactly one Arrow-batched
    Python site (IPv6 canonicalization) — never row-at-a-time Python."""
    from flow_indexer_spark.functions.extractors import extract_entities

    ext = extract_entities(transcripts)
    assert _shuffles(ext) == 0
    assert _count(ext, "ArrowEvalPython") == 1
    assert _count(ext, "BatchEvalPython") == 0


def test_salt_postings_is_one_exchange(spark, transcripts):
    """PLANS.md §2: the salt-chunked index build aggregates through ONE
    shuffle regardless of corpus size."""
    from flow_indexer_spark.functions.extractors import extract_entities
    from flow_indexer_spark.operators.postings import build_postings

    post = build_postings(extract_entities(transcripts), n_salt=8,
                          chunk_mode="salt")
    assert _shuffles(post) == 1


def test_enrich_broadcasts_both_dims(spark, transcripts, dims):
    """PLANS.md §4: dims go broadcast; the fact side never shuffles and
    no join degrades to sort-merge."""
    from flow_indexer_spark.functions.extractors import extract_entities
    from flow_indexer_spark.operators.enrich import enrich

    tool_registry, role_taxonomy = dims
    e = enrich(extract_entities(transcripts), tool_registry, role_taxonomy)
    assert _count(e, "BroadcastHashJoin") == 2
    assert _count(e, "SortMergeJoin") == 0
    assert _shuffles(e) == 0


def test_mix_to_token_budget_never_shuffles_the_corpus(docs):
    """PLANS.md §3g: the only shuffle is the sources-sized totals agg;
    fractions come back via broadcast."""
    from flow_indexer_spark.operators.curation import mix_to_token_budget

    out = mix_to_token_budget(docs, 100, {"s0": 1.0})
    assert _shuffles(out) == 1
    assert _count(out, "BroadcastHashJoin") == 1
    assert _count(out, "SortMergeJoin") == 0


def test_in_row_operators_add_zero_exchanges(docs):
    """Scan-speed projections must stay scan-speed: quality scoring,
    redaction, chunking, int8 quantization."""
    from flow_indexer_spark.operators.curation import sliding_window_chunks
    from flow_indexer_spark.operators.redact import redact_entities
    from flow_indexer_spark.operators.textstats import quality_score

    assert _shuffles(quality_score(docs, {"stopword_ratio": 1.0})) == 0
    assert _shuffles(redact_entities(docs)) == 0
    assert _shuffles(sliding_window_chunks(docs, size=3, stride=2)) == 0


def test_topk_is_take_ordered_not_global_sort(spark):
    """ANN top-k must compile to TakeOrderedAndProject — a global Sort of
    the corpus would be a scale regression."""
    from flow_indexer_spark.operators.similarity import topk_cosine

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    out = topk_cosine(emb, [1.0, 0.0, 0.0], k=5)
    assert _count(out, "TakeOrderedAndProject") == 1
    assert _count(out, "Sort") == 0


def test_dsir_weights_scans_corpus_exactly_three_times(docs):
    """DSIR: two bucket-distribution scans + one per-doc feature scan.
    The totals are window sums over the <=buckets-row table — a naive
    agg+cross-join doubles the corpus-scale gram explodes to five scans
    (measured before the fix)."""
    from flow_indexer_spark.operators.curation import dsir_weights

    out = dsir_weights(docs, docs.filter(F.col("doc_id") % 2 == 0))
    scans = sum(1 for n in _nodes(out) if n.startswith("LocalTableScan") or n.startswith("Scan"))
    assert scans == 3, _nodes(out)


def test_kmeans_assign_broadcasts_centroids(spark):
    """The E-step must broadcast the k x dims table — the vector corpus
    never shuffles and no join degrades to sort-merge."""
    from flow_indexer_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_seeds,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.25]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_seeds(emb, k=3)
    out = assign_to_centroids(emb, cents)
    assert _count(out, "BroadcastNestedLoopJoin") == 1  # k-row cross join
    assert _count(out, "SortMergeJoin") == 0


def test_context_length_sweep_is_single_agg_exchange(docs):
    """One hash exchange for the |lengths|-row agg; the trailing orderBy
    range exchange sorts |lengths| rows, not the corpus."""
    from flow_indexer_spark.operators.tokenize import context_length_sweep

    out = context_length_sweep(docs, (8, 16))
    assert _shuffles(out) == 2  # agg + tiny final sort
    assert _count(out, "SortMergeJoin") == 0


def test_logreg_step_is_one_exchange_broadcast_weights(spark, docs):
    """fit_logreg loop body: the gradient is ONE partial-agg exchange
    collapsing to a dims+1 row; the weight vector enters and leaves by
    broadcast (1-row nested-loop joins) — the corpus side never
    shuffles and nothing drops to row-at-a-time Python."""
    from flow_indexer_spark.operators.textstats import _logreg_step

    x = docs.selectExpr(
        "CAST(doc_id AS DOUBLE) AS f_a",
        "CAST(length(text) AS DOUBLE) AS f_b",
        "CAST(doc_id % 2 AS DOUBLE) AS _y",
    )
    w = spark.range(1).select(
        F.lit(0.0).alias("_w_f_a"),
        F.lit(0.0).alias("_w_f_b"),
        F.lit(0.0).alias("_w__bias"),
    )
    out = _logreg_step(x, w, ["f_a", "f_b"], lr=0.5, round_dp=8)
    assert _shuffles(out) == 1
    assert _count(out, "BroadcastNestedLoopJoin") == 2
    assert _count(out, "SortMergeJoin") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_semdedup_joins_on_cluster_label_only(spark):
    """semdedup: assignment is materialized ONCE (localCheckpoint — the
    consumers read the checkpointed RDD, not re-executions of the
    broadcast-assign subtree); the pairwise stage is ONE label-keyed
    exchange into a single Arrow-batched gram-matrix kernel
    (FlatMapGroupsInPandas — the deliberate Python site, BLAS per
    cluster, replacing the interpreted per-pair HOF cosine), and the
    output flag join adds the rest — 3 exchanges total, none
    corpus-wide more than once."""
    from flow_indexer_spark.operators.dedup import semdedup
    from flow_indexer_spark.operators.similarity import kmeans_seeds

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(emb, kmeans_seeds(emb, 4), threshold=0.9)
    nodes = _nodes(out)
    assert sum(1 for n in nodes if n == "Exchange") == 3, nodes
    assert _count(out, "FlatMapGroupsInPandas") == 1
    # every scan is the in-memory checkpointed assignment, not parquet
    assert all(not n.startswith("ScanParquet") for n in nodes)
    assert _count(out, "BatchEvalPython") == 0


def test_embedding_near_pairs_is_blocked_gram_kernel(spark):
    """embedding_near_pairs: the exact all-pairs baseline runs as a
    blocked gram matrix — ONE (block_i, block_j)-keyed exchange into a
    single Arrow-batched BLAS kernel (FlatMapGroupsInPandas), with the
    block membership an in-row literal explode. No cartesian product,
    no per-pair interpreted HOF cosine (the pattern measured ~20x slower
    in semdedup, PLANS.md §3i)."""
    from flow_indexer_spark.operators.dedup import embedding_near_pairs

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_near_pairs(emb, threshold=0.9)
    nodes = _nodes(out)
    assert _count(out, "FlatMapGroupsInPandas") == 1
    assert _shuffles(out) == 1, nodes
    assert _count(out, "CartesianProduct") == 0
    assert _count(out, "BroadcastNestedLoopJoin") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_hard_negatives_is_broadcast_anchor_blas_scan(spark):
    """hard_negatives: anchors pack to ONE broadcast row, scoring is a
    single Arrow-batched MapInPandas BLAS kernel with map-side top-k
    pruning, and the only corpus-wide Exchange is the per-(anchor,kind)
    rank window over the pruned candidates — never a corpus shuffle to
    score, never a per-pair interpreted HOF cosine."""
    from flow_indexer_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [(i, i % 3, [float(i % 7), float(i % 5), 1.0]) for i in range(60)],
        "vec_id long, label int, embedding array<double>",
    )
    anchors = emb.filter(F.col("vec_id") < 2)
    out = hard_negatives(emb, anchors, k_neg=3)
    nodes = _nodes(out)
    assert _count(out, "MapInPandas") == 1, nodes
    assert _count(out, "BroadcastNestedLoopJoin") == 1  # the 1-row anchor pack
    assert _shuffles(out) <= 2, nodes  # anchor-pack agg + the rank window
    assert _count(out, "CartesianProduct") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_pq_encode_never_shuffles_the_vector_table(spark):
    """PQ encode: the packed codebook collapses to ONE broadcast row and
    codes are a pure in-row argmin — the corpus side reaches the output
    through a single 1-row BroadcastNestedLoopJoin with no sort-merge
    join and no Python; every Exchange in the plan aggregates the
    constant k*dims codebook table, never the vectors."""
    from flow_indexer_spark.operators.similarity import pq_encode, pq_seeds

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.25, float(i % 3)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_seeds(emb, m=2, k=3, dims=4)
    out = pq_encode(emb, cb, m=2, dims=4)
    assert _count(out, "BroadcastNestedLoopJoin") == 1
    assert _count(out, "SortMergeJoin") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_pq_topk_is_lut_scan_plus_takeordered(spark):
    """ADC search: one broadcast LUT row + in-row fold + top-k — the
    codes table itself is never exchanged (TakeOrderedAndProject merges
    per-partition top-k on the driver)."""
    from flow_indexer_spark.operators.similarity import (
        pq_encode,
        pq_seeds,
        pq_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.25, float(i % 3)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_seeds(emb, m=2, k=3, dims=4)
    codes = pq_encode(emb, cb, m=2, dims=4)
    out = pq_topk(codes, cb, [0.5, 1.0, 0.25, 2.0], k=5, m=2)
    nodes = _nodes(out)
    assert "TakeOrderedAndProject" in nodes
    assert _count(out, "SortMergeJoin") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_bpe_segment_is_broadcast_rules_over_distinct_words(spark, docs):
    """bpe_segment: the rule list packs to ONE broadcast row and the
    nested merge fold is in-row — the only corpus-side exchange is the
    distinct-words agg; no sort-merge join, no Python."""
    from flow_indexer_spark.operators.tokenize import bpe_segment, bpe_train

    rules = bpe_train(docs, 2)
    out = bpe_segment(docs, rules)
    assert _count(out, "BroadcastNestedLoopJoin") == 1
    assert _count(out, "SortMergeJoin") == 0
    assert _count(out, "BatchEvalPython") == 0


def test_sketch_rollup_is_one_exchange_objhash(spark):
    """sketches.sketch_rollup: scan -> partial ObjectHashAggregate (map
    tasks fold rows into local sketch states) -> ONE exchange of
    fixed-size binaries -> final merge. No Python, no sort-merge join,
    and shuffle volume independent of row count."""
    from flow_indexer_spark.operators.sketches import (
        rollup_estimates,
        sketch_rollup,
    )

    ev = spark.range(1000).select(
        (F.col("id") % 7).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    r = sketch_rollup(ev)
    assert _shuffles(r) == 1
    assert _count(r, "ObjectHashAggregate") == 2  # partial + final
    assert _count(r, "BatchEvalPython") == 0
    # estimates run on the rollup only: exactly one more exchange
    assert _shuffles(rollup_estimates(r)) == 2


def test_video_frame_sampling_is_narrow_arrow_stage(spark):
    """mp4codec.video_frame_features: one Arrow-batched mapInPandas over
    the payload table's existing partitioning — zero Exchanges (a video's
    frames never leave its task) and no row-at-a-time Python."""
    from flow_indexer_spark.operators.mp4codec import (
        make_mp4_media,
        video_frame_features,
    )

    out = video_frame_features(make_mp4_media(spark, 8), every_n=2)
    # the fixture generator's repartition is the input's layout, not the
    # operator's: the frame stage itself must add no Exchange beyond it
    assert _shuffles(out) == 1  # make_mp4_media's own repartition only
    assert _count(out, "MapInPandas") == 2  # synth + frame stage
    assert _count(out, "BatchEvalPython") == 0


def test_rrf_topk_is_take_ordered(spark):
    """rrf_fuse with topk must compile to TakeOrderedAndProject, never
    a global Sort of the fused table."""
    from flow_indexer_spark.operators.ranking import rrf_fuse

    rankings = spark.createDataFrame(
        [("l1", f"d{i}", i + 1) for i in range(50)]
        + [("l2", f"d{i}", 50 - i) for i in range(50)],
        "list_id string, item string, rank int",
    )
    out = rrf_fuse(rankings, topk=10)
    assert _count(out, "TakeOrderedAndProject") == 1
    assert _count(out, "Sort") == 0


def test_auc_prefix_has_no_global_sort_of_scores(spark):
    """roc_auc's banded prefix: the only unpartitioned window is the
    <=n_bands band-total pass; the per-score running sum must be
    partitioned by band (parallel), and no Sort node may act as a
    global (non-window) sort of the full per-score table."""
    from flow_indexer_spark.operators.evalmetrics import roc_auc

    pts = spark.createDataFrame(
        [(i % 2, (i * 37 % 101) / 101.0) for i in range(200)],
        "label int, score double",
    )
    out = roc_auc(pts, "label", "score")
    nodes = _nodes(out)
    # two Window nodes total: band prefix (tiny, serial) + banded
    # per-score prefix (partitioned); a third would mean a regression
    assert sum(1 for n in nodes if n == "Window") == 2


def test_label_propagation_never_collects_neighborhoods(spark):
    """LPA's argmax is a windowed row_number — a hub's candidate rows
    stay rows; no collect_list/ObjectHashAggregate may appear."""
    from flow_indexer_spark.operators.graph import label_propagation

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "u bigint, v bigint"
    )
    out = label_propagation(e, n_rounds=2)
    assert _count(out, "ObjectHashAggregate") == 0


def test_specdec_model_broadcasts_to_position_stream(docs):
    """specdec.draft_acceptance: the bigram model (one row per context)
    reaches the corpus position stream as a BroadcastHashJoin — the
    100 TB position stream itself never shuffles for the join (the
    model build's groupBy+window shuffles are model-sized)."""
    from flow_indexer_spark.operators.specdec import draft_acceptance

    rep = draft_acceptance(docs, "doc_id", "text", group_col="source")
    assert _count(rep, "BroadcastHashJoin") == 1
    assert _count(rep, "SortMergeJoin") == 0


def test_bleu_stats_clip_without_joins(docs):
    """genmetrics.ngram_overlap_stats: clipping is least(c, r) inside
    one gram-keyed aggregation — NO join anywhere in the plan, and the
    wide report is conditional aggregation (no Expand/pivot)."""
    from flow_indexer_spark.operators.genmetrics import ngram_overlap_stats

    pairs = docs.select(
        F.col("doc_id").alias("pair"),
        F.col("text").alias("cand"),
        F.col("text").alias("ref"),
    )
    stats = ngram_overlap_stats(pairs, "pair", "cand", "ref")
    nodes = _nodes(stats)
    assert not any("Join" in n for n in nodes)
    assert "Expand" not in nodes


def test_js_divergence_broadcasts_vocab_aggregates(docs):
    """diagnostics.lexical_js_divergence: the vocab-sized corpus counts
    and the tiny per-group totals reach the (group, token) rows by
    broadcast — the exploded token table shuffles once for its own
    groupBy, never sort-merge-joins."""
    from flow_indexer_spark.operators.diagnostics import lexical_js_divergence

    rep = lexical_js_divergence(docs, "source", "text")
    assert _count(rep, "SortMergeJoin") == 0
    assert _count(rep, "BroadcastHashJoin") >= 2


def test_priority_sample_is_one_window_no_global_sort(docs):
    """curation.priority_sample: one group-partitioned window over the
    exact-integer priority; no global Sort (only window-local sorts
    under the partitioned Exchange)."""
    from flow_indexer_spark.operators.curation import priority_sample

    sel = priority_sample(docs, "source", "doc_id", "doc_id", k=3)
    nodes = _nodes(sel)
    assert _shuffles(sel) == 1  # the window partition exchange
    assert "Window" in nodes


def test_containment_caps_before_selfjoin(docs):
    """dedup.containment_pairs: the df-capped shingle index self-joins
    on the gram key (shuffle join on gram), sizes arrive by broadcast;
    no BroadcastNestedLoopJoin anywhere."""
    from flow_indexer_spark.operators.dedup import containment_pairs

    pairs = containment_pairs(docs, "doc_id", "text", k=2)
    assert _count(pairs, "BroadcastNestedLoopJoin") == 0


def test_plsa_estep_broadcasts_phi(docs):
    """plsa.plsa_em: the E-step joins nd with theta (co-partitioned
    hash join) and PHI BY BROADCAST — the vocab-parameter table never
    forces a corpus shuffle; responsibilities stay bigint (no float
    aggregation nodes needed for the M-step numerators)."""
    from flow_indexer_spark.operators.plsa import doc_term_counts, plsa_em

    nd = doc_term_counts(docs, "doc_id", "text")
    theta, phi = plsa_em(nd, k=3, n_iter=1, checkpoint=False)
    # theta after one iteration: the E-step reaches phi by broadcast
    # hash join; the only other joins are the doc-co-partitioned
    # nd-theta join (sort-merge on doc) and 1-row normalizer
    # cross-broadcasts (BNLJ with a single-row build side — constant
    # cost at any scale)
    assert _count(theta, "BroadcastHashJoin") >= 1
    assert _count(theta, "SortMergeJoin") <= 1


def test_spearman_windows_run_on_distinct_value_grid(docs):
    """diagnostics.spearman_correlation: rank windows order the
    DISTINCT-value tables, ranks re-attach by broadcast — the corpus
    rows never pass through a global Sort."""
    from flow_indexer_spark.operators.diagnostics import spearman_correlation

    pts = docs.select(
        F.length("text").alias("x"), (F.col("doc_id") % 7).alias("y")
    )
    rho = spearman_correlation(pts, "x", "y")
    assert _count(rho, "BroadcastHashJoin") == 2
    assert _count(rho, "SortMergeJoin") == 0


def test_cuped_is_two_aggregates_no_join(docs):
    """telemetry.cuped_report: one groupBy(user) + one global fold —
    no join anywhere; every moment partial-aggregates map-side."""
    from flow_indexer_spark.operators.telemetry import cuped_report

    ev = docs.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") % 2).alias("period"),
        F.length("text").cast("double").alias("value"),
    )
    rep = cuped_report(
        ev, "u", "value",
        pre_cond=F.col("period") == 0, post_cond=F.col("period") == 1,
    )
    nodes = _nodes(rep)
    assert not any("Join" in n for n in nodes)
    assert sum(1 for n in nodes if n == "HashAggregate") >= 2


def test_km_curve_window_is_duration_grid_only(spark):
    """survival.km_curve: after the per-subject aggregate, every
    window runs over the day grid (grid-sized, not corpus-sized) and
    the plan has no join."""
    from flow_indexer_spark.operators.survival import km_curve

    ev = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 20:02d}", "purchase" if i % 3 == 0 else "v")
         for i in range(60)],
        "user_id bigint, d string, event_type string",
    ).select("user_id", F.col("d").cast("timestamp").alias("ts"),
             "event_type")
    km = km_curve(ev, "user_id", "ts", F.col("event_type") == "purchase")
    assert not any("Join" in n for n in _nodes(km))


def test_hll_build_is_one_exchange_no_python(docs):
    """membership.hll_build: the register table materializes with ONE
    shuffle (the j-keyed MAX agg, partial-aggregated map-side) and no
    Python stage — the whole hash/shift/rank pipeline is JVM codegen;
    hll_estimate adds only broadcast-sized reductions."""
    from flow_indexer_spark.operators.membership import (
        hll_build,
        hll_estimate,
    )

    reg = hll_build(docs.select(F.col("doc_id").alias("key")), "key", p=8)
    nodes = _nodes(reg)
    assert sum(1 for n in nodes if n == "Exchange") == 1
    assert not any("Python" in n for n in nodes)
    est = hll_estimate(reg, p=8)
    assert not any("Python" in n for n in _nodes(est))
    assert not any("SortMergeJoin" in n for n in _nodes(est))
