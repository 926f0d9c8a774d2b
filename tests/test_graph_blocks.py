"""pagerank (operators/graph.py) and LPM block enrichment
(operators/ipblocks.py) unit tests against independent references."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.graph import pagerank, undirected_edges
from flow_indexer_spark.operators.ipblocks import block_table, lpm_enrich


def _nodes(spark, names):
    return spark.createDataFrame(
        pd.DataFrame([("e", n) for n in names], columns=["node_class", "node_key"])
    )


def _edges(spark, triples):
    return spark.createDataFrame(
        pd.DataFrame(
            [("e", s, "e", d, w) for s, d, w in triples],
            columns=["src_class", "src_key", "dst_class", "dst_key", "weight"],
        )
    )


def _numpy_pagerank(names, triples, damping=0.85, n_iter=3):
    n = len(names)
    idx = {x: i for i, x in enumerate(names)}
    outw = {s: 0 for s in names}
    for s, _d, w in triples:
        outw[s] += w
    pr = {x: 1.0 / n for x in names}
    for _ in range(n_iter):
        contrib = {x: [] for x in names}
        for s, d, w in triples:
            contrib[d].append((s, pr[s] * w / outw[s]))
        pr = {
            x: (1.0 - damping) / n
            + damping * sum(c for _s, c in sorted(contrib[x]))
            for x in names
        }
    del idx
    return pr


def test_pagerank_matches_reference_recurrence(spark):
    names = ["a", "b", "c", "d"]  # d is isolated (teleport-only mass)
    triples = [("a", "b", 2), ("b", "a", 2), ("a", "c", 1), ("c", "a", 1)]
    got = {
        r["node_key"]: r["pagerank"]
        for r in pagerank(_nodes(spark, names), _edges(spark, triples)).collect()
    }
    want = _numpy_pagerank(names, triples)
    assert set(got) == set(want)
    for k in names:
        assert got[k] == pytest.approx(want[k], abs=1e-15), k
    # hub 'a' outranks leaves; isolated 'd' holds only teleport mass
    assert got["a"] > got["b"] > got["d"]
    assert got["d"] == pytest.approx(0.15 / 4, abs=1e-15)


def test_pagerank_mass_conservation_no_dangling(spark):
    # every node has out-edges -> total mass stays 1 each iteration
    names = ["a", "b", "c"]
    triples = [("a", "b", 1), ("b", "c", 3), ("c", "a", 2), ("a", "c", 1)]
    total = (
        pagerank(_nodes(spark, names), _edges(spark, triples), n_iter=4)
        .agg(F.sum("pagerank"))
        .head()[0]
    )
    assert total == pytest.approx(1.0, abs=1e-12)


def test_undirected_edges_symmetrizes(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [("e", "a", "e", "b", 5)],
            columns=["class_a", "key_a", "class_b", "key_b", "n_turns"],
        )
    )
    rows = {
        (r["src_key"], r["dst_key"], r["weight"])
        for r in undirected_edges(pairs).collect()
    }
    assert rows == {("a", "b", 5), ("b", "a", 5)}


def test_pagerank_rejects_empty_or_no_iters(spark):
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(_nodes(spark, ["a"]), _edges(spark, [("a", "a", 1)]), n_iter=0)


def test_pagerank_scale_path_agrees_and_drops_collect_list(spark):
    """deterministic=False (the production/100 TB path) must (a) agree
    with the sorted-fold oracle path within float-rounding (<1e-12
    relative — the two differ only in double summation order), and
    (b) contain NO per-destination array materialization: its plan has
    no collect_list / ObjectHashAggregate, so a mega-hub's in-edges
    combine map-side instead of widening one reducer row."""
    names = [f"n{i}" for i in range(12)]
    # hub topology: everyone points at n0 (the skew case the kwarg is for)
    triples = [(f"n{i}", "n0", i + 1) for i in range(1, 12)]
    triples += [("n0", "n1", 3), ("n3", "n4", 2), ("n4", "n3", 2)]
    det = pagerank(_nodes(spark, names), _edges(spark, triples), n_iter=4)
    fast_df = pagerank(
        _nodes(spark, names), _edges(spark, triples), n_iter=4,
        deterministic=False,
    )
    a = {r["node_key"]: r["pagerank"] for r in det.collect()}
    b = {r["node_key"]: r["pagerank"] for r in fast_df.collect()}
    assert set(a) == set(b)
    for k in a:
        assert b[k] == pytest.approx(a[k], rel=1e-12), k
    fast_plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in fast_plan
    assert "ObjectHashAggregate" not in fast_plan
    det_plan = det._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in det_plan  # the oracle path keeps the fold


# --- LPM block enrichment ---------------------------------------------------

BLOCKS = [
    ("net-10", "10.0.0.0/8"),
    ("net-10-hot", "10.7.0.0/16"),
    ("rfc1918-192", "192.168.0.0/16"),
    ("v6-doc", "2001:db8::/32"),
]


def test_block_table_prefixes():
    rows = {r["name"]: r for r in block_table(BLOCKS)}
    assert rows["net-10"]["prefix"] == "0a" and rows["net-10"]["prefix_len"] == 8
    assert rows["net-10-hot"]["prefix"] == "0a07"
    assert rows["v6-doc"]["prefix"] == "20010db8" and rows["v6-doc"]["key_len"] == 32


def test_block_table_rejects():
    with pytest.raises(ValueError, match="nibble-aligned"):
        block_table([("odd", "8.0.0.0/5")])
    with pytest.raises(ValueError, match="duplicate block name"):
        block_table([("x", "10.0.0.0/8"), ("x", "11.0.0.0/8")])
    with pytest.raises(ValueError):
        block_table([("bad", "10.0.0.1/8")])  # host bits set, strict


def test_lpm_enrich_longest_prefix_wins(spark):
    keys = [
        "0a070001",                          # 10.7.0.1  -> /16 beats /8
        "0a080001",                          # 10.8.0.1  -> /8
        "c0a80101",                          # 192.168.1.1 -> /16
        "7f000001",                          # 127.0.0.1 -> no block
        "20010db8" + "0" * 23 + "1",         # 2001:db8::1 -> v6 /32
        "fe800000" + "0" * 23 + "1",         # fe80::1 -> no block
    ]
    df = spark.createDataFrame(pd.DataFrame({"entity_key": keys}))
    got = {
        r["entity_key"]: (r["block_name"], r["prefix_len"])
        for r in lpm_enrich(df, BLOCKS).collect()
    }
    assert got["0a070001"] == ("net-10-hot", 16)
    assert got["0a080001"] == ("net-10", 8)
    assert got["c0a80101"] == ("rfc1918-192", 16)
    assert got["7f000001"] == (None, None)
    assert got["20010db8" + "0" * 23 + "1"] == ("v6-doc", 32)
    assert got["fe800000" + "0" * 23 + "1"] == (None, None)
    assert len(got) == len(keys)  # left join keeps unmatched rows


def test_lpm_enrich_v4_prefix_never_matches_v6_key(spark):
    # a v6 key whose hex STARTS like the v4 block prefix must not match
    df = spark.createDataFrame(
        pd.DataFrame({"entity_key": ["0a" + "0" * 30]})
    )
    got = lpm_enrich(df, [("net-10", "10.0.0.0/8")]).head()
    assert got["block_name"] is None


def test_lpm_enrich_plan_is_broadcast_only(spark):
    df = spark.createDataFrame(pd.DataFrame({"entity_key": ["0a070001"]}))
    plan = lpm_enrich(df, BLOCKS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lpm_inrow_differential_and_plan(spark):
    import random

    from flow_indexer_spark.operators.ipblocks import lpm_enrich_inrow

    rng = random.Random(7)
    keys = list(
        {
            "%08x" % rng.getrandbits(32) for _ in range(300)
        }
        | {"%032x" % rng.getrandbits(128) for _ in range(100)}
        | {"0a070001", "0a080001", "c0a80101", "20010db8" + "0" * 24}
    )
    df = spark.createDataFrame(pd.DataFrame({"entity_key": sorted(keys)}))
    a = lpm_enrich(df, BLOCKS).orderBy("entity_key").collect()
    b = lpm_enrich_inrow(df, BLOCKS).orderBy("entity_key").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    # pure projection: no joins or exchanges at all
    plan = (
        lpm_enrich_inrow(df, BLOCKS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_lpm_inrow_duplicate_prefix_tiebreak_matches_join_path(spark):
    from flow_indexer_spark.operators.ipblocks import lpm_enrich_inrow

    dup = [("alpha", "10.0.0.0/8"), ("zeta", "10.0.0.0/8")]
    df = spark.createDataFrame(pd.DataFrame({"entity_key": ["0a000001"]}))
    a = lpm_enrich(df, dup).head()
    b = lpm_enrich_inrow(df, dup).head()
    assert a["block_name"] == b["block_name"] == "zeta"
