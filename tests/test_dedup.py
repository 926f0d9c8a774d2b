"""Dedup / similarity / textstats / sessionization operator tests.

Mirrors the reference's differential-test strategy
(/root/reference/backend/nfdump_test.go:30-55): every approximate /
bucketed path is cross-checked against an exact brute-force twin on the
same data, plus golden hand-built cases.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.dedup import (
    embedding_near_pairs,
    exact_dedup_groups,
    exact_dedup_keep,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    sign_lsh_near_pairs,
    simhash,
    simhash_near_pairs,
    token_ngrams,
)
from flow_indexer_spark.operators.sessions import (
    session_stats,
    session_stats_native,
    sessionize,
)
from flow_indexer_spark.operators.similarity import topk_cosine, topk_cosine_bucketed
from flow_indexer_spark.operators.textstats import quality_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),  # exact dup
        Row(doc_id=3, text="the quick brown fox jumps over the sleepy dog"),  # near dup
        Row(doc_id=4, text="completely different content about spark engines"),
        Row(doc_id=5, text="tiny"),  # < 3 tokens
        Row(doc_id=6, text="dog lazy the over jumps fox brown quick the"),  # shuffled 1
    ]
    return spark.createDataFrame(rows).cache()


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs).collect()
    by_hash = {r["text_hash"]: r for r in groups}
    assert len(by_hash) == 5  # 1&2 collapse
    dup = [r for r in groups if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["keeper"] == 1
    kept = {r["doc_id"] for r in exact_dedup_keep(docs).collect()}
    assert kept == {1, 3, 4, 5, 6}


def test_minhash_lsh_finds_exact_and_shuffled_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}
    # identical token sets hash identically in every band
    assert (1, 2) in pairs
    assert (1, 6) in pairs and (2, 6) in pairs  # shuffled copy: same token set
    assert all(5 not in p for p in pairs)  # tiny doc shares no min-hash


def test_banded_lsh_bucket_cap_bounds_candidates(spark):
    """Skew guard: one degenerate bucket (many docs with the SAME text ->
    identical minhash bands AND identical simhash) must not explode into
    B^2 candidate pairs — buckets above max_bucket_df are dropped, distinct
    pairs still found among them."""
    from pyspark.sql import Row

    boiler = [Row(doc_id=i, text="lorem ipsum boilerplate footer text") for i in range(40)]
    distinct = [
        Row(doc_id=100, text="genuinely unique first content alpha beta"),
        Row(doc_id=101, text="genuinely unique first content alpha beta"),  # dup of 100
        Row(doc_id=102, text="entirely different second subject gamma delta"),
    ]
    df = spark.createDataFrame(boiler + distinct)

    # uncapped: the boilerplate bucket alone yields C(40,2)=780 pairs
    uncapped = minhash_lsh_pairs(df, max_bucket_df=None).count()
    assert uncapped >= 780

    capped = minhash_lsh_pairs(df, max_bucket_df=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs          # real dup in a small bucket survives
    assert not any(a < 40 and b < 40 for a, b in pairs)  # degenerate bucket dropped
    assert capped.count() < 40          # bounded, nowhere near B^2

    # same guard on the simhash path
    sigs = simhash(df)
    sim_capped = simhash_near_pairs(sigs, max_hamming=3, max_bucket_df=10)
    sim_pairs = {(r["id_a"], r["id_b"]) for r in sim_capped.collect()}
    assert (100, 101) in sim_pairs
    assert not any(a < 40 and b < 40 for a, b in sim_pairs)
    sim_uncapped = simhash_near_pairs(sigs, max_hamming=3, max_bucket_df=None).count()
    assert sim_uncapped >= 780


def test_simhash_identity_and_locality(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[6]  # token-set based: order-insensitive
    ham_near = bin(sigs[1] ^ sigs[3]).count("1")
    ham_far = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_near < ham_far  # one-token edit is closer than disjoint text


def test_simhash_banded_pairs_complete_vs_bruteforce(spark, docs):
    """Pigeonhole: with 4 bands, banded candidates cover ALL pairs at
    hamming <= 3 — compare against the O(n^2) exact join."""
    sigs = simhash(docs).cache()
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["h"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute
    sigs.unpersist()


def test_token_ngrams_short_doc_guard(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a b c d")]
    )
    rows = {r["doc_id"]: r["g"] for r in df.select("doc_id", token_ngrams("text", 3).alias("g")).collect()}
    assert rows[1] == []
    assert rows[2] == ["a b c", "b c d"]


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0  # near dup
    assert all(4 not in k and 5 not in k for k in pairs)


def test_ngram_prefix_differential_vs_baseline(spark, docs):
    """Prefix filtering is LOSSLESS: on the golden docs and on a
    pseudo-random overlapping corpus, ngram_jaccard_pairs_prefix must
    return exactly the capless inverted-index baseline's pairs — at
    several thresholds, including ones that make prefixes minimal."""
    from flow_indexer_spark.operators.dedup import ngram_jaccard_pairs_prefix

    def pairset(out):
        return {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in out.collect()}

    # overlapping sliding-window corpus: doc i = words i..i+7 -> a chain
    # of near-dups with varying jaccard, plus exact dups and tiny docs
    words = [f"w{(k * 7919) % 23}" for k in range(40)]
    rows = [Row(doc_id=i, text=" ".join(words[i : i + 8])) for i in range(30)]
    rows += [
        Row(doc_id=100, text=" ".join(words[0:8])),  # exact dup of doc 0
        Row(doc_id=101, text="a b"),                  # < n tokens
        Row(doc_id=102, text=""),                     # empty
    ]
    rand = spark.createDataFrame(rows)

    for df in (docs, rand):
        for t in (0.3, 0.5, 0.8):
            base = ngram_jaccard_pairs(df, threshold=t, max_ngram_df=None)
            pref = ngram_jaccard_pairs_prefix(df, threshold=t)
            assert pairset(pref) == pairset(base), f"threshold={t}"


def test_ngram_prefix_bucket_cap(spark):
    """Optional prefix-bucket cap bounds candidates on a corpus of literal
    near-dups (whose prefixes all collide) while keeping small groups."""
    from flow_indexer_spark.operators.dedup import ngram_jaccard_pairs_prefix

    boiler = [Row(doc_id=i, text="same exact boilerplate text everywhere here") for i in range(30)]
    other = [
        Row(doc_id=100, text="distinct subject alpha beta gamma delta"),
        Row(doc_id=101, text="distinct subject alpha beta gamma epsilon"),
    ]
    df = spark.createDataFrame(boiler + other)
    capped = ngram_jaccard_pairs_prefix(df, threshold=0.3, max_bucket_df=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 30 and b < 30 for a, b in pairs)


def test_ngram_jaccard_df_cap_drops_boilerplate(spark):
    """Every doc shares the same boilerplate 3-gram; with the df cap below
    the doc count, no candidates survive (the skew guard)."""
    rows = [Row(doc_id=i, text=f"common header line unique{i} tail{i} z{i}") for i in range(10)]
    df = spark.createDataFrame(rows)
    assert ngram_jaccard_pairs(df, threshold=0.0, max_ngram_df=5).count() == 0


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16))
    vecs = list(base)
    # near-dup of vec 0: perturb only dims 8.. so the 8 sign-LSH bucket bits
    # are untouched (perturbing dim 0 — value 0.0012 — flips the bucket: a
    # real recall miss, which test_sign_lsh_subset_of_exact tolerates but
    # the positive-case assertion must not depend on)
    near = base[0].copy()
    near[8:] += rng.normal(scale=0.01, size=8)
    vecs.append(near)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v], label=i % 2)
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows).cache()


def test_embedding_near_pairs_exact(emb):
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_pairs(emb, threshold=0.95).collect()}
    assert pairs == {(0, 6)}


def test_sign_lsh_subset_of_exact_and_finds_near_dup(emb):
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_pairs(emb, threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in sign_lsh_near_pairs(emb, threshold=0.5).collect()}
    assert lsh <= exact
    # a perturbed copy keeps every coordinate sign w.h.p. -> same bucket
    assert (0, 6) in lsh


def test_topk_cosine_matches_numpy(emb):
    import numpy as np

    rows = emb.collect()
    probe = [float(x) for x in rows[0]["embedding"]]
    got = [r["vec_id"] for r in topk_cosine(emb, probe, k=3).collect()]
    m = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    q = np.array(probe)
    sims = sorted(
        ((v @ q) / (np.linalg.norm(v) * np.linalg.norm(q)), -i)
        for i, v in m.items()
    )[::-1]
    want = [-i for _, i in sims[:3]]
    assert got == want


def test_topk_bucketed_contains_near_neighbors(emb):
    probe = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    got = [r["vec_id"] for r in topk_cosine_bucketed(emb, probe, k=3, n_bits=8).collect()]
    assert got[0] == 0 and 6 in got  # self + perturbed copy both in probe bucket


def test_sessionize_golden(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        Row(user_id=1, ts=mk(0)),
        Row(user_id=1, ts=mk(10)),   # same session
        Row(user_id=1, ts=mk(50)),   # 40min gap -> new session
        Row(user_id=1, ts=mk(60)),
        Row(user_id=2, ts=mk(5)),    # other user independent
    ]
    df = spark.createDataFrame(rows)
    sess = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert sess == {
        (1, mk(0)): 0,
        (1, mk(10)): 0,
        (1, mk(50)): 1,
        (1, mk(60)): 1,
        (2, mk(5)): 0,
    }
    stats = {r["user_id"]: r for r in session_stats(df, gap_minutes=30).collect()}
    assert stats[1]["n_sessions"] == 2
    assert stats[1]["max_session_events"] == 2
    assert stats[1]["total_events"] == 4
    assert stats[2]["n_sessions"] == 1


def test_sessionize_duplicate_ts_rows_frame(spark):
    """Duplicate (user, ts) rows: with the explicit ROWS frame the running
    sum increments once per row in order, so tied rows at a session start
    split as first-row-opens / peers-join (the RANGE default would give all
    tied rows the post-increment id AND double-count new_sess on ties)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        Row(user_id=1, ts=mk(0)),
        Row(user_id=1, ts=mk(0)),    # exact tie at stream start
        Row(user_id=1, ts=mk(50)),   # gap -> new session
        Row(user_id=1, ts=mk(50)),   # tie inside session 1 (lag=0 gap)
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        r["session_id"] for r in sessionize(df, gap_minutes=30).collect()
    )
    assert got == [0, 0, 1, 1]
    stats = session_stats(df, gap_minutes=30).collect()[0]
    assert stats["n_sessions"] == 2 and stats["total_events"] == 4


def test_connected_components_golden(spark):
    """Path chain (worst case for label propagation), triangle, and a
    2-node component; min node id becomes the component label."""
    from flow_indexer_spark.operators.dedup import connected_components

    edges = [
        # path 1-2-3-4-5 (diameter 4 -> needs the star rounds to fold)
        (1, 2), (2, 3), (3, 4), (4, 5),
        # triangle 10-11-12 with duplicate + reversed edges
        (10, 11), (11, 12), (12, 10), (11, 10),
        # pair
        (20, 21),
    ]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_differential_union_find(spark):
    """Pseudo-random graph vs a plain python union-find oracle."""
    from flow_indexer_spark.operators.dedup import connected_components

    edges = []
    for i in range(300):
        a = (i * 7919) % 97
        b = (i * 104729 + 13) % 97
        if a != b:
            edges.append((a, b))
    parent = list(range(97))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in edges:
        for n in (a, b):
            want[n] = find(n)
    # canonicalize oracle labels to min-of-component
    comp_min = {}
    for n, c in want.items():
        comp_min[c] = min(comp_min.get(c, n), n)
    want = {n: comp_min[c] for n, c in want.items()}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == want


def test_near_dup_clusters_keeper(spark):
    from flow_indexer_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 4)], ["id_a", "id_b"])
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (1, True), 2: (1, False), 3: (3, True),
        4: (1, False), 5: (5, True),
    }


def test_session_stats_native_differential(spark):
    """Dual-implementation cross-check (nfdump-pair analogue): lag+cumsum
    vs native session_window must agree — including on gaps EXACTLY at
    the threshold, where the +1us gapDuration adjustment converts
    session_window's exclusive window end into the inclusive gap rule."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    rows = []
    # deterministic pseudo-random gaps straddling the 30-min threshold
    for user in range(1, 6):
        t = 0
        for i in range(40):
            t += ((user * 7919 + i * 104729) % 3600) + 1
            rows.append(Row(user_id=user, ts=mk(t)))
    # exact-threshold gap (1800s): inclusive rule merges -> one session
    rows += [Row(user_id=99, ts=mk(0)), Row(user_id=99, ts=mk(1800))]
    # one microsecond past the threshold -> splits
    rows += [
        Row(user_id=98, ts=mk(0)),
        Row(user_id=98, ts=mk(1800) + dt.timedelta(microseconds=1)),
    ]
    df = spark.createDataFrame(rows)
    key = lambda rs: {  # noqa: E731
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["total_events"])
        for r in rs
    }
    a = key(session_stats(df, gap_minutes=30).collect())
    b = key(session_stats_native(df, gap_minutes=30).collect())
    assert a == b
    assert a[99] == (1, 2, 2)  # threshold gap merged
    assert a[98] == (2, 1, 2)  # threshold+1us split


def test_repetition_features_golden(spark):
    """Hand-computed Gopher-signal goldens: repeated lines, a dominant
    2-gram with overlapping occurrences, short/empty edge docs."""
    from flow_indexer_spark.operators.textstats import repetition_features

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),      # "a b" x3 (overlap), "b a" x2
            Row(doc_id=2, text="x\ny\nx\n"),         # repeated line
            Row(doc_id=3, text="solo"),              # 1 token -> no grams
            Row(doc_id=4, text=""),                  # empty
            Row(doc_id=5, text="p q r"),             # all grams unique
        ]
    )
    r = {x["doc_id"]: x for x in repetition_features(docs, n=2).collect()}

    # doc 1: grams sorted = [a b, a b, a b, b a, b a]; text len 11
    assert r[1]["top_ngram"] == "a b" and r[1]["top_ngram_count"] == 3
    assert math.isclose(r[1]["top_ngram_char_fraction"], 9 / 11)
    # rep chars: "a b" 3*3=9 + "b a" 2*3=6 -> 15
    assert math.isclose(r[1]["rep_ngram_char_fraction"], 15 / 11)
    assert r[1]["n_lines"] == 1 and r[1]["dup_line_fraction"] == 0.0

    # doc 2: lines [x, y, x] -> 1/3 dup by count and by chars
    assert r[2]["n_lines"] == 3
    assert math.isclose(r[2]["dup_line_fraction"], 1 / 3)
    assert math.isclose(r[2]["dup_line_char_fraction"], 1 / 3)

    for d in (3, 4):
        assert r[d]["top_ngram_count"] == 0 and r[d]["top_ngram"] == ""
        assert r[d]["rep_ngram_char_fraction"] == 0.0
    # unique grams: top gram is the lexicographically-smallest ("p q"),
    # count 1, nothing repeated
    assert r[5]["top_ngram"] == "p q" and r[5]["top_ngram_count"] == 1
    assert r[5]["rep_ngram_char_fraction"] == 0.0


def test_quality_features_ratios(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="the cat sat on the mat")])
    r = quality_features(df).head()
    assert r["n_tokens"] == 6
    assert r["n_stopwords"] == 2  # 'the' twice
    assert math.isclose(r["stopword_ratio"], 2 / 6)
    assert math.isclose(r["mean_token_len"], len("the cat sat on the mat") / 6)


def test_top_distinctive_terms_golden(spark):
    from flow_indexer_spark.operators.textstats import top_distinctive_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana banana common"),
            (2, "cherry common common"),
            (3, "apple common"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
        for r in top_distinctive_terms(docs, k=2).collect()
    }
    # banana: tf=2 df=1 -> 2.0 beats apple tf=1 df=2 -> 0.5
    assert got[(1, 1)] == ("banana", 2, 1)
    assert got[(1, 2)] == ("apple", 1, 2)
    # cherry: tf=1 df=1 -> 1.0 beats common tf=2 df=3 -> 0.667
    assert got[(2, 1)] == ("cherry", 1, 1)
    assert got[(3, 1)] == ("apple", 1, 2)  # 0.5 > common 1/3


def test_session_length_percentiles_golden(spark):
    import datetime as dt

    from flow_indexer_spark.operators.sessions import session_length_percentiles

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    # sessions of sizes 1, 2, 3, 4 (gaps of 100 min split them)
    rows, t = [], 0
    for size in (1, 2, 3, 4):
        t += 100
        for j in range(size):
            rows.append(Row(user_id=1, ts=mk(t)))
            t += 1
    df = spark.createDataFrame(rows)
    r = session_length_percentiles(df, gap_minutes=30).head()
    assert r["p50"] == 2.5  # interpolated between 2 and 3
    assert r["max_events"] == 4


def test_label_centroids_matches_numpy(spark):
    import numpy as np

    from flow_indexer_spark.operators.similarity import label_centroids

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (0, [3.0, 2.0, 1.0]),
        (1, [10.0, 0.0, -10.0]),
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    got = {
        (r["label"], r["dim"]): r["centroid"]
        for r in label_centroids(df).collect()
    }
    want0 = np.mean([[1, 2, 3], [3, 2, 1]], axis=0)
    for d in range(3):
        assert abs(got[(0, d)] - want0[d]) < 1e-12
        assert got[(1, d)] == [10.0, 0.0, -10.0][d]


def test_quality_score_matches_manual_sigmoid(spark):
    import math

    from pyspark.sql import Row

    from flow_indexer_spark.operators.textstats import (
        quality_features,
        quality_score,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox and the dog"),
            Row(doc_id=2, text="zzzzzzzzzzzz qqqqqqqqq xxxxxxxxxxx"),
        ]
    )
    w = {"stopword_ratio": 3.0, "mean_token_len": -0.2}
    out = {r["doc_id"]: r for r in quality_score(docs, w, bias=0.1).collect()}
    feats = {r["doc_id"]: r for r in quality_features(docs).collect()}
    for i in (1, 2):
        z = 0.1 + 3.0 * feats[i]["stopword_ratio"] - 0.2 * feats[i]["mean_token_len"]
        assert out[i]["quality_score"] == pytest.approx(1 / (1 + math.exp(-z)))
    # stopword-rich English scores above consonant noise with these weights
    assert out[1]["quality_score"] > out[2]["quality_score"]

    kept = quality_score(
        docs, w, bias=0.1, keep_threshold=out[2]["quality_score"] + 1e-9
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]

    with pytest.raises(ValueError):
        quality_score(docs, {"no_such_feature": 1.0})


def test_bigram_lm_scores_manual(spark):
    import math

    from pyspark.sql import Row

    from flow_indexer_spark.operators.textstats import bigram_lm_scores

    train = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b c"), Row(doc_id=2, text="a b")]
    )
    # train bigrams: (a,b)x3 (b,a)x1 (b,c)x1; C1: a=3, b=2; V=|{b,a,c}|=3
    score = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b c"),   # seen + unseen-successor pair
            Row(doc_id=11, text="z z"),     # fully unseen context
            Row(doc_id=12, text="solo"),    # < 2 tokens -> no row
        ]
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(train, score, alpha=0.5).collect()}
    assert set(out) == {10, 11}
    V, a = 3, 0.5
    lp_ab = math.log((3 + a) / (3 + a * V))
    lp_bc = math.log((1 + a) / (2 + a * V))
    exp_avg = (lp_ab + lp_bc) / 2
    assert out[10]["n_bigrams"] == 2
    assert out[10]["avg_logp"] == pytest.approx(exp_avg)
    assert out[10]["ppl"] == pytest.approx(math.exp(-exp_avg))
    # unseen everything: alpha / (0 + alpha*V)
    lp_zz = math.log(a / (a * V))
    assert out[11]["avg_logp"] == pytest.approx(lp_zz)
    # reference-like text scores lower perplexity than noise
    assert out[10]["ppl"] < out[11]["ppl"]


def test_minhash_rows_per_band_precision_knob(spark):
    from pyspark.sql import Row

    from flow_indexer_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        Row(doc_id=0, text="alpha beta gamma delta"),
        Row(doc_id=1, text="delta gamma beta alpha"),   # same token set
        Row(doc_id=2, text="omega psi chi phi"),        # disjoint
        # half-overlapping with doc 0: matches at permissive r=1 for SOME
        # band with decent odds, but the structural assertions below do
        # not depend on whether it does
        Row(doc_id=3, text="alpha beta nu xi"),
    ]
    df = spark.createDataFrame(rows)

    def pairs(n_bands, r):
        return {
            (p["id_a"], p["id_b"])
            for p in minhash_lsh_pairs(
                df, n_bands=n_bands, rows_per_band=r, max_bucket_df=None
            ).collect()
        }

    # identical token sets match at EVERY precision level
    for nb, r in ((4, 1), (2, 2), (1, 4)):
        assert (0, 1) in pairs(nb, r)
        # disjoint docs never pair with anything
        assert not any(2 in p for p in pairs(nb, r))
    # fixed hash-function budget: raising r only REMOVES pairs
    assert pairs(1, 4) <= pairs(2, 2) <= pairs(4, 1)


def test_minhash_rows_per_band_null_for_empty_docs(spark):
    from pyspark.sql import Row

    from flow_indexer_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text=" "), Row(doc_id=2, text="a b")]
    )
    out = df.select("doc_id", *minhash_signature("text", 2, 2)).collect()
    bands = {r["doc_id"]: (r["band0"], r["band1"]) for r in out}
    # empty docs must yield NULL bands (null never joins) — md5('') would
    # silently bucket every empty doc together
    assert bands[0] == (None, None)
    assert bands[1] == (None, None)
    assert None not in bands[2]


# --- duplicate_segment_removal (C4-style corpus line dedup) -------------------


def test_segment_removal_keeps_one_witness_and_rebuilds_in_order(spark):
    from flow_indexer_spark.operators.dedup import duplicate_segment_removal

    rows = [
        Row(doc_id=1, text="a b c x y z"),      # 2 segments: 'a b c', 'x y z'
        Row(doc_id=2, text="p q r a b c"),      # 'a b c' repeats -> doc 1 pos 0 wins
        Row(doc_id=3, text="a b c a b c"),      # both segments lose to doc 1
        Row(doc_id=4, text="u v"),              # one partial segment
    ]
    out = {
        r["doc_id"]: r
        for r in duplicate_segment_removal(
            spark.createDataFrame(rows), k=3
        ).collect()
    }
    assert out[1].text_deduped == "a b c x y z"
    assert (out[1].n_segments, out[1].n_segments_kept) == (2, 2)
    assert out[2].text_deduped == "p q r"
    assert (out[2].n_segments, out[2].n_segments_kept) == (2, 1)
    assert 3 not in out  # emptied documents drop out, as C4 drops pages
    assert out[4].text_deduped == "u v"  # trailing partial segment survives


def test_segment_removal_within_doc_repetition_counts(spark):
    """freq counts occurrences, not distinct docs: a segment repeated
    twice inside ONE document keeps only its first occurrence."""
    from flow_indexer_spark.operators.dedup import duplicate_segment_removal

    rows = [Row(doc_id=7, text="m n o m n o q r s")]
    (r,) = duplicate_segment_removal(spark.createDataFrame(rows), k=3).collect()
    assert r.text_deduped == "m n o q r s"
    assert (r.n_segments, r.n_segments_kept) == (3, 2)


def test_segment_removal_hash_path_identical(spark, docs):
    from flow_indexer_spark.operators.dedup import duplicate_segment_removal

    a = duplicate_segment_removal(docs, k=3, by_hash=False)
    b = duplicate_segment_removal(docs, k=3, by_hash=True)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_segment_removal_empty_and_whitespace_docs(spark):
    from flow_indexer_spark.operators.dedup import duplicate_segment_removal

    rows = [Row(doc_id=1, text=""), Row(doc_id=2, text="   "),
            Row(doc_id=3, text="solo words here")]
    out = duplicate_segment_removal(spark.createDataFrame(rows), k=3).collect()
    assert [r.doc_id for r in out] == [3]


def test_segment_removal_k1_is_corpus_word_dedup(spark):
    from flow_indexer_spark.operators.dedup import duplicate_segment_removal

    rows = [Row(doc_id=1, text="w w v"), Row(doc_id=2, text="v u")]
    out = {
        r["doc_id"]: r
        for r in duplicate_segment_removal(
            spark.createDataFrame(rows), k=1
        ).collect()
    }
    assert out[1].text_deduped == "w v"  # first w and the winning v
    assert out[2].text_deduped == "u"

    with pytest.raises(ValueError):
        duplicate_segment_removal(spark.createDataFrame(rows), k=0)
