"""kcore + label_propagation: hand-computed graphs, convergence pins,
determinism."""

from __future__ import annotations

import os

import pytest

from flow_indexer_spark.operators.graph import kcore, label_propagation

SF_SMALL = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.001")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def test_kcore_peels_tail_keeps_triangle(spark):
    # triangle {1,2,3} + tail 3-4-5: 2-core = the triangle (4 and 5
    # peel in cascade: 5 first, then 4)
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["degree"] for r in kcore(e, k=2, n_rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_too_high_k_empties(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    assert kcore(e, k=3, n_rounds=2).count() == 0
    # k=2 keeps the whole triangle
    assert kcore(e, k=2, n_rounds=2).count() == 3


def test_kcore_rejects_bad_k(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="k must be"):
        kcore(e, k=0)


def test_kcore_fixture_converges_within_round_budget(spark):
    """The registered graph_kcore query runs 6 rounds; the peel must be
    a fixpoint by then (so the answer IS the true 3-core, not a
    truncation). Oracle equality is round-matched either way — this
    pins the stronger semantic claim."""
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet"))
        .filter(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    r6 = sorted(map(tuple, kcore(edges, k=3, n_rounds=6).collect()))
    r7 = sorted(map(tuple, kcore(edges, k=3, n_rounds=7).collect()))
    assert r6 == r7 and len(r6) > 0


def test_lpa_two_triangles_with_bridge(spark):
    # two triangles joined by one bridge edge: communities split at the
    # bridge; min-label tie-breaks make the trajectory hand-computable
    e = _edges(
        spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    )
    out = {
        r["node"]: (r["community"], r["community_size"])
        for r in label_propagation(e, n_rounds=4).collect()
    }
    assert out == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        4: (3, 3),
        5: (3, 3),
        6: (3, 3),
    }


def test_lpa_deterministic_across_runs(spark):
    # star graph oscillates under synchronous LPA (bipartite flip) —
    # fixed rounds still give ONE well-defined deterministic answer
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    a = sorted(map(tuple, label_propagation(e, n_rounds=2).collect()))
    b = sorted(map(tuple, label_propagation(e, n_rounds=2).collect()))
    assert a == b
    # round-2 state: center flipped back to 0, leaves carry 0 -> ... the
    # exact synchronous trajectory: l1 = {0:1, leaves:0}, l2 = {0:0,
    # leaves:1}
    out = {r[0]: r[1] for r in a}
    assert out[0] == 0 and all(out[i] == 1 for i in (1, 2, 3, 4))


def test_lpa_clique_converges_to_min_label(spark):
    e = _edges(spark, [(7, 8), (7, 9), (8, 9)])
    out = {r["node"]: r["community"] for r in label_propagation(e, 4).collect()}
    assert set(out.values()) == {7}


def test_personalized_pagerank_seed_semantics(spark):
    from pyspark.sql import functions as F

    from flow_indexer_spark.operators.graph import pagerank

    nodes = spark.createDataFrame(
        [("e", "a"), ("e", "b"), ("e", "c"), ("e", "iso")],
        "node_class string, node_key string",
    )
    edges = spark.createDataFrame(
        [("e", "a", "e", "b", 1.0), ("e", "b", "e", "c", 1.0),
         ("e", "c", "e", "a", 1.0)],
        "src_class string, src_key string, dst_class string, "
        "dst_key string, weight double",
    )
    seeds = spark.createDataFrame(
        [("e", "a", 1)], "node_class string, node_key string, weight bigint"
    )
    pr = {
        r["node_key"]: r["pagerank"]
        for r in pagerank(nodes, edges, n_iter=4, seeds=seeds).collect()
    }
    # the isolated non-seed node gets NO teleport and NO in-edges: 0
    assert pr["iso"] == 0.0
    # all cycle nodes reachable from the seed carry positive mass
    assert pr["a"] > 0 and pr["b"] > 0 and pr["c"] > 0
    # python mirror of the seeded recurrence, bit-exact
    s = {"a": 1.0, "b": 0.0, "c": 0.0, "iso": 0.0}
    ref = dict(s)
    nxt = {"a": "b", "b": "c", "c": "a"}
    for _ in range(4):
        inc = {k: 0.0 for k in ref}
        for u, v in nxt.items():
            inc[v] += ref[u] * 1.0 / 1.0
        ref = {k: (1.0 - 0.85) * s[k] + 0.85 * inc[k] for k in ref}
    for k in ref:
        assert pr[k] == ref[k], k
    # a seed set disjoint from the nodes is a caller error
    import pytest as _pt

    bad = spark.createDataFrame(
        [("e", "zz", 1)], "node_class string, node_key string, weight bigint"
    )
    with _pt.raises(ValueError, match="seed"):
        pagerank(nodes, edges, n_iter=1, seeds=bad)


def test_modularity_two_triangles(spark):
    """Known value: two triangles joined by one bridge edge, communities
    = the triangles -> Q = 70/196."""
    from flow_indexer_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"),
         ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d")],
        "u string, v string",
    )
    comm = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t1"),
         ("d", "t2"), ("e", "t2"), ("f", "t2")],
        "node string, community string",
    )
    r = modularity(edges, comm).collect()[0]
    assert r["n_communities"] == 2 and r["n_edges"] == 7
    assert r["intra_edges"] == 6
    assert r["modularity"] == round(70 / 196, 9)


def test_entity_ppr_seed_rule_survives_df_cap(spark):
    """Round-4 scale bug class: the registered entity_ppr query must
    return rows at sf0.1, where every role value's document frequency
    exceeds capped_entities' max_entity_df=5000 and the whole 'role'
    class is dropped from the node set.  The old seed rule (node_class
    == 'role') produced an empty seed set exactly there and killed the
    driver bench (BENCH_r04 rc=1); the fix draws seeds FROM the capped
    node set (16 smallest ip keys), non-empty at every scale factor."""
    import os

    import __spark_entry__ as entry_mod

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):  # driver hosts always have it
        import pytest

        pytest.skip("sf0.1 testdata not present")
    df = entry_mod.queries()["entity_ppr"](spark, sf_dir)
    head = df.limit(5).collect()
    assert len(head) == 5
    assert {r["entity_class"] for r in head} <= {"ip", "role", "tool"}


def test_connected_components_hand_graph(spark):
    """Two chains, one triangle-with-tail, and the fixpoint guard."""
    from flow_indexer_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),          # chain of 4
         ("p", "q"),                                   # pair
         ("x", "y"), ("x", "z"), ("y", "z"), ("z", "w")],  # triangle+tail
        "u string, v string",
    )
    got = {r["node"]: (r["component"], r["component_size"])
           for r in connected_components(edges).collect()}
    assert got == {
        "a": ("a", 4), "b": ("a", 4), "c": ("a", 4), "d": ("a", 4),
        "p": ("p", 2), "q": ("p", 2),
        "w": ("w", 4), "x": ("w", 4), "y": ("w", 4), "z": ("w", 4),
    }
    # a long chain exceeding the round budget must fail LOUD
    import pytest

    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(10)],
        "u string, v string",
    )
    with pytest.raises(ValueError, match="converge"):
        connected_components(chain, max_rounds=3)


def test_connected_components_matches_union_find(spark):
    """Random sparse graph vs a plain-python union-find mirror."""
    import random

    from flow_indexer_spark.operators.graph import connected_components

    rnd = random.Random(42)
    n = 120
    edges = sorted(
        {
            tuple(sorted((f"v{rnd.randrange(n):03d}", f"v{rnd.randrange(n):03d}")))
            for _ in range(90)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expect = {}
    comp_members = {}
    for x in list(parent):
        comp_members.setdefault(find(x), []).append(x)
    for root, members in comp_members.items():
        cid = min(members)
        for m in members:
            expect[m] = (cid, len(members))
    df = spark.createDataFrame(edges, "u string, v string")
    got = {r["node"]: (r["component"], r["component_size"])
           for r in connected_components(df).collect()}
    assert got == expect
