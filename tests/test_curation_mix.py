"""Token-budget mixing, training order, and duplicated-span coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.curation import (
    mix_to_token_budget,
    training_order,
)
from flow_indexer_spark.operators.dedup import duplicated_spans


@pytest.fixture(scope="module")
def mix_docs(spark):
    rows = []
    i = 0
    for src, n_docs, words in (("a", 60, 10), ("b", 30, 10), ("c", 10, 10)):
        for _ in range(n_docs):
            rows.append(
                Row(
                    doc_id=i,
                    source=src,
                    text=" ".join(f"w{i}x{j}" for j in range(words)),
                )
            )
            i += 1
    return spark.createDataFrame(rows).cache()


def test_mix_budget_downsamples_oversupplied_source(mix_docs):
    # source a holds 600 tokens, target share 0.5 of a 600-token budget
    # = 300 tokens -> fraction 0.5; source b target 300/300 -> kept whole;
    # source c has no share -> dropped entirely.
    out = mix_to_token_budget(
        mix_docs, budget=600, shares={"a": 0.5, "b": 0.5}
    )
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "c" not in per
    assert per["b"] == 30  # fraction clamps at 1.0
    # hash sampling at fraction 0.5 over 60 docs: binomial noise only
    assert 18 <= per.get("a", 0) <= 42
    fr = dict(
        out.select("source", "mix_fraction").distinct().collect()
    )
    assert fr["b"] == 1.0
    assert abs(fr["a"] - 0.5) < 1e-12


def test_mix_budget_deterministic_and_monotone(mix_docs):
    lo = mix_to_token_budget(mix_docs, budget=300, shares={"a": 1.0})
    hi = mix_to_token_budget(mix_docs, budget=450, shares={"a": 1.0})
    lo_ids = {r["doc_id"] for r in lo.collect()}
    lo_ids2 = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids == lo_ids2  # rerun-stable
    assert lo_ids <= hi_ids  # raising the budget only ADDS rows


def test_mix_budget_rejects_bad_args(mix_docs):
    with pytest.raises(ValueError):
        mix_to_token_budget(mix_docs, budget=0, shares={"a": 1.0})
    with pytest.raises(ValueError):
        mix_to_token_budget(mix_docs, budget=10, shares={"a": 0.0})


def test_training_order_is_a_permutation_matching_global_sort(mix_docs):
    out = training_order(mix_docs, n_buckets=8).collect()
    n = mix_docs.count()
    ranks = sorted(r["order_rank"] for r in out)
    assert ranks == list(range(n))  # total order, no gaps or dupes
    # two-phase rank must equal the naive global (hash, id) sort
    by_rank = [r["doc_id"] for r in sorted(out, key=lambda r: r["order_rank"])]
    from flow_indexer_spark.operators.dedup import md5_int32

    naive = [
        r["doc_id"]
        for r in mix_docs.select(
            "doc_id",
            md5_int32(
                F.concat(F.lit("order"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "doc_id")
        .collect()
    ]
    assert by_rank == naive
    # order is uncorrelated with doc_id order (a shuffle, not identity)
    assert by_rank != sorted(by_rank)


def test_training_order_rejects_non_power_of_two(mix_docs):
    with pytest.raises(ValueError):
        training_order(mix_docs, n_buckets=12)


@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    rows = [
        # docs 0 and 1 share a verbatim 10-token run inside distinct text
        Row(doc_id=0, text="alpha beta " + shared + " gamma delta"),
        Row(doc_id=1, text="one two three " + shared),
        # doc 2: unique text, no cross-doc window
        Row(doc_id=2, text=" ".join(f"u{j}" for j in range(20))),
        # doc 3: shorter than k -> excluded from output
        Row(doc_id=3, text="tiny doc"),
        # doc 4: repeats ITS OWN window twice but shares nothing -> not dup
        Row(doc_id=4, text=" ".join(["r1 r2 r3 r4 r5 r6 r7 r8"] * 2)),
    ]
    return spark.createDataFrame(rows).cache()


def test_duplicated_spans_flags_shared_run_exactly(span_docs):
    out = {r["doc_id"]: r.asDict() for r in duplicated_spans(span_docs, k=8).collect()}
    assert set(out) == {0, 1, 2, 4}  # doc 3 too short
    # the shared 10-token run yields 3 shared 8-windows; doc 0 has it at
    # token positions 3..12 (1-based) -> 10 covered tokens
    assert out[0]["dup_windows"] == 3
    assert out[0]["covered_tokens"] == 10
    assert out[1]["dup_windows"] == 3
    assert out[1]["covered_tokens"] == 10
    assert out[1]["dup_fraction"] == pytest.approx(10 / 13)
    assert out[2]["dup_windows"] == 0 and out[2]["covered_tokens"] == 0
    # within-doc repetition alone is NOT cross-doc duplication
    assert out[4]["dup_windows"] == 0


def test_duplicated_spans_interval_union_merges_overlaps(spark):
    # three docs all sharing one long run: overlapping dup windows must
    # union to the run length, not sum to windows * k
    run = " ".join(f"s{j}" for j in range(12))
    rows = [Row(doc_id=i, text=f"pre{i} " + run + f" post{i}") for i in range(3)]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r.asDict() for r in duplicated_spans(df, k=8).collect()}
    for i in range(3):
        assert out[i]["dup_windows"] == 5  # 12 - 8 + 1
        assert out[i]["covered_tokens"] == 12  # union, not 5*8


def test_mix_budget_shares_are_absolute_not_normalized(mix_docs):
    # a lone share of 0.5 allocates HALF the budget, not all of it
    out = mix_to_token_budget(mix_docs, budget=600, shares={"a": 0.5})
    fr = dict(out.select("source", "mix_fraction").distinct().collect())
    assert abs(fr["a"] - 0.5) < 1e-12  # 0.5*600/600, NOT 1.0
    with pytest.raises(ValueError):
        mix_to_token_budget(mix_docs, budget=600, shares={"a": 0.8, "b": 0.6})
    with pytest.raises(ValueError):
        mix_to_token_budget(mix_docs, budget=600, shares={"a": -0.1, "b": 0.5})


def test_corpus_diff_classifies_all_kinds(spark):
    from flow_indexer_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="will change"),
         Row(doc_id=3, text="will vanish")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="changed!"),
         Row(doc_id=4, text="brand new")]
    )
    out = {r["doc_id"]: r["change"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_temperature_mix_tau_one_is_natural_proportions(mix_docs):
    from flow_indexer_spark.operators.curation import temperature_mix

    # tau=1: share_i = t_i / total, so fraction_i = budget/total for all
    out = temperature_mix(mix_docs, budget=500, tau=1.0)
    fr = dict(out.select("source", "mix_fraction").distinct().collect())
    for s in ("a", "b", "c"):
        assert abs(fr[s] - 500 / 1000) < 1e-12


def test_temperature_mix_low_tau_lifts_low_resource(mix_docs):
    from flow_indexer_spark.operators.curation import temperature_mix

    # sources hold a=600, b=300, c=100 tokens. tau=0.5 shares are
    # sqrt-proportional: c's share (~0.193) exceeds its natural 0.1,
    # so at budget=1000 c (and b) are kept whole while a is downsampled.
    out = temperature_mix(mix_docs, budget=1000, tau=0.5)
    fr = dict(out.select("source", "mix_fraction").distinct().collect())
    z = 600**0.5 + 300**0.5 + 100**0.5
    assert abs(fr["a"] - (600**0.5 / z) * 1000 / 600) < 1e-12
    assert fr["a"] < 1.0
    assert fr["b"] == 1.0 and fr["c"] == 1.0

    with pytest.raises(ValueError):
        temperature_mix(mix_docs, budget=0, tau=0.5)
    with pytest.raises(ValueError):
        temperature_mix(mix_docs, budget=100, tau=0.0)


@pytest.fixture(scope="module")
def dsir_docs(spark):
    # two disjoint-vocabulary populations: 'sci' docs vs 'web' docs
    rows = []
    for i in range(40):
        v = "proton neutrino quark boson" if i % 2 == 0 else "click buy cheap deal"
        rows.append(Row(doc_id=i, text=f"{v} {v}"))
    return spark.createDataFrame(rows).cache()


def test_dsir_weights_rank_target_like_docs_higher(dsir_docs):
    from flow_indexer_spark.operators.curation import dsir_weights

    target = dsir_docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 10))
    out = {r["doc_id"]: r.asDict() for r in dsir_weights(dsir_docs, target).collect()}
    # every science doc outscores every web doc
    sci = [out[i]["logw"] for i in range(0, 40, 2)]
    web = [out[i]["logw"] for i in range(1, 40, 2)]
    assert min(sci) > max(web)
    # n_feats = unigrams + bigrams = 8 + 7
    assert all(out[i]["n_feats"] == 15 for i in out)


def test_dsir_sample_is_deterministic_softmax_draw(dsir_docs):
    from flow_indexer_spark.operators.curation import dsir_sample, dsir_weights

    target = dsir_docs.filter(F.col("doc_id") % 2 == 0)
    w = dsir_weights(dsir_docs, target)
    s1 = sorted(r["doc_id"] for r in dsir_sample(w, 12).collect())
    s2 = sorted(r["doc_id"] for r in dsir_sample(w, 12).collect())
    assert len(s1) == 12 and s1 == s2  # rerun-stable
    # weights dominate hash noise here: the draw should be mostly target docs
    assert sum(1 for i in s1 if i % 2 == 0) >= 10
    with pytest.raises(ValueError):
        dsir_sample(w, 0)


def test_dsir_weights_validates_params(dsir_docs):
    from flow_indexer_spark.operators.curation import dsir_weights

    with pytest.raises(ValueError):
        dsir_weights(dsir_docs, dsir_docs, max_n=0)
    with pytest.raises(ValueError):
        dsir_weights(dsir_docs, dsir_docs, alpha=0.0)


# --- upsample_epochs ---------------------------------------------------------


def test_upsample_epochs_counts_and_determinism(spark):
    from flow_indexer_spark.operators.curation import upsample_epochs

    docs = spark.createDataFrame(
        [(i, "books" if i % 2 == 0 else "web", f"d{i}") for i in range(200)],
        "doc_id long, source string, text string",
    )
    out = upsample_epochs(docs, {"books": 2.5, "web": 1.0}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for i in range(200):
        eps = sorted(by_doc[i])
        assert eps == list(range(len(eps)))  # contiguous 0-based copies
        if i % 2 == 1:
            assert len(eps) == 1
        else:
            assert len(eps) in (2, 3)
    n_books = sum(len(v) for d, v in by_doc.items() if d % 2 == 0)
    assert 2.0 * 100 < n_books < 3.0 * 100  # ~2.5 epochs
    # deterministic rerun
    again = upsample_epochs(docs, {"books": 2.5, "web": 1.0}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_upsample_epochs_zero_drops_and_validates(spark):
    import pytest as _pytest

    from flow_indexer_spark.operators.curation import upsample_epochs

    docs = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, source string, text string"
    )
    out = upsample_epochs(docs, {"a": 0.0}).collect()
    assert [(r["doc_id"], r["epoch"]) for r in out] == [(2, 0)]
    with _pytest.raises(ValueError):
        upsample_epochs(docs, {"a": -1.0})


def test_upsample_epochs_is_scan_speed(spark):
    """Zero shuffles: factors fold into the projection, copies come from
    an in-row guarded sequence+explode."""
    import contextlib
    import io
    import re

    from flow_indexer_spark.operators.curation import upsample_epochs

    docs = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, text string"
    )
    out = upsample_epochs(docs, {"a": 1.5})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    nodes = re.findall(r"^\(\d+\) (\S+)", buf.getvalue(), re.M)
    assert "Exchange" not in nodes
