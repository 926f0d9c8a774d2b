"""Weighted-graph centrality over entity graphs.

The reference's query model stops at "which documents contain this
entity"; a training-data pipeline also wants "which entities MATTER" —
ranking the co-occurrence graph (operators/transcripts.py
entity_cooccurrence) surfaces hub tools/roles/IPs for curation and
skew diagnosis (the hot keys the salted postings exist for are exactly
the high-centrality nodes).

``pagerank`` is the standard damped power iteration (Page et al. 1999)
run a FIXED number of rounds — fixed K keeps the computation a finite
DataFrame plan on both engines, so the DuckDB oracle is the same
recurrence unrolled K times, and convergence tolerance never enters
the equality contract.

Scale shape: each iteration is one join of the rank vector against the
edge list (shuffle bounded by |E|) plus one aggregation onto the
destination key (shuffle bounded by |V|). No driver-side state beyond
the node count; the plan composes K times and AQE handles the joins.
Skew: a mega-hub destination concentrates its in-edges on one reducer
— bounded upstream by entity_cooccurrence's ``max_entity_df`` cap,
the same knob that bounds the pair join itself.

Float determinism: with ``deterministic=True`` (default — the oracle
path) per-node contribution sums fold in sorted ``(src_class,
src_key)`` order via ``aggregate(array_sort(collect_list(...)))`` —
the diagnostics.py PSI pattern — so the double-precision trajectory is
bit-identical to the oracle's ``SUM(term ORDER BY src_class,
src_key)``. That fold materializes a destination's whole in-edge array
on one reducer (bounded here by ``max_entity_df``, but a mega-hub at
production scale is exactly the row you can't afford to widen), so
``deterministic=False`` swaps in plain ``F.sum`` — partial-aggregating,
partition-order-dependent within double-precision rounding (last-bit
wobble, agreement pinned to <1e-12 relative in test_graph_blocks) —
the path a 100 TB run should use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NODE_COLS = ("node_class", "node_key")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 3,
    deterministic: bool = True,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Damped (optionally PERSONALIZED) PageRank over a weighted
    DIRECTED edge list.

    ``nodes``: (node_class, node_key) — every rankable node, including
    isolated ones (they keep teleport-only mass). ``edges``:
    (src_class, src_key, dst_class, dst_key, weight); for an undirected
    graph pass both directions (see :func:`undirected_edges`).

    Uniform (``seeds=None``):  pr_0(v) = 1/N;
    pr_k(v) = (1-d)/N + d * sum_u pr_{k-1}(u) * w(u,v) / outw(u)

    Personalized (Haveliwala, WWW 2002): ``seeds`` =
    (node_class, node_key, weight) restricts the teleport vector to
    s(v) = weight/sum(weights) (0 off-seed): pr_0 = s,
    pr_k(v) = (1-d)*s(v) + d * sum(...) — rank relative to the seed
    set, the 'entities related to X' query.  The seed table is tiny
    and joins the node set by broadcast.

    Dangling nodes (no out-edges) leak their damped mass — the
    simplified textbook variant; the oracle mirrors it exactly.
    Returns (node_class, node_key, pagerank).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    # Materialize the loop invariants ONCE: every iteration's plan
    # references nodes and the weighted edge list, and Spark re-executes
    # shared subtrees per plan reference — without this, a K-iteration
    # run recomputes the caller's whole upstream (extraction, the
    # co-occurrence self-join) K+1 times (measured 8.3 -> 5.9 s for the
    # sf0.1 entity graph at K=3; -> 3.6 s once the caller also
    # materializes the shared entity set feeding BOTH inputs). Same
    # pattern as GraphX/bpe_train: iterative algorithms checkpoint
    # their working set.
    if seeds is not None:
        total = seeds.agg(F.sum("weight").alias("_tw"))
        nodes = (
            nodes.join(
                F.broadcast(
                    seeds.join(F.broadcast(total)).select(
                        "node_class",
                        "node_key",
                        (F.col("weight") / F.col("_tw")).alias("_s"),
                    )
                ),
                ["node_class", "node_key"],
                "left",
            )
            .select(
                "node_class",
                "node_key",
                F.coalesce(F.col("_s"), F.lit(0.0)).alias("_s"),
            )
        )
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")
    if seeds is not None and nodes.agg(F.sum("_s")).first()[0] == 0.0:
        raise ValueError("no seed overlaps the node set")
    teleport = (1.0 - damping) / n

    out_w = edges.groupBy("src_class", "src_key").agg(
        F.sum("weight").alias("_outw")
    )
    e = edges.join(out_w, ["src_class", "src_key"]).localCheckpoint(eager=True)

    tele = (
        F.lit(1.0 - damping) * F.col("_s")
        if seeds is not None
        else F.lit(teleport)
    )
    pr = nodes.select(
        F.col("node_class"),
        F.col("node_key"),
        (F.col("_s") if seeds is not None else F.lit(1.0 / n)).alias("pr"),
    )
    for _ in range(n_iter):
        joined = e.join(
            pr,
            (e["src_class"] == pr["node_class"]) & (e["src_key"] == pr["node_key"]),
        )
        term = F.col("pr") * F.col("weight") / F.col("_outw")
        if deterministic:
            contribs = joined.select(
                F.col("dst_class"),
                F.col("dst_key"),
                F.struct("src_class", "src_key", term.alias("c")).alias("_s"),
            )
            summed = contribs.groupBy("dst_class", "dst_key").agg(
                F.aggregate(
                    F.array_sort(F.collect_list("_s")),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("_sum")
            )
        else:
            # scale path: partial-aggregating hash sum — no per-
            # destination array, a hub's in-edges combine map-side
            summed = joined.select(
                F.col("dst_class"), F.col("dst_key"), term.alias("_c")
            ).groupBy("dst_class", "dst_key").agg(F.sum("_c").alias("_sum"))
        pr = nodes.join(
            summed,
            (nodes["node_class"] == summed["dst_class"])
            & (nodes["node_key"] == summed["dst_key"]),
            "left",
        ).select(
            nodes["node_class"],
            nodes["node_key"],
            (
                tele + F.lit(damping) * F.coalesce(F.col("_sum"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("node_class", "node_key", F.col("pr").alias("pagerank"))


def triangle_census(edges: DataFrame) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over an
    undirected simple graph given as canonical edges (u, v) with u < v,
    one row per edge.

    Algorithm: degree-ordered orientation (Chiba & Nishizeki 1985 /
    Schank & Wagner 2005, the 'compact-forward' scheme every
    distributed triangle counter uses): orient each edge from the
    lower-(degree, id) endpoint to the higher, then a wedge (a->b,
    a->c) closes iff the oriented edge (b->c) exists.  Every triangle
    is enumerated exactly once, and — the scale property — wedge
    generation is bounded by sum(min_deg(u,v) per edge) = O(E^1.5)
    instead of sum(deg^2): a celebrity hub fans IN, never OUT, so no
    reducer ever materializes a hub's full neighborhood square.  Two
    self-joins on the oriented edge list (shuffles bounded by wedges
    and E), one explode, one groupBy.

    Returns (node, degree, n_triangles, clustering) for every node,
    clustering = 2*T / (deg*(deg-1)) rounded to 9 (0.0 for deg < 2).
    The SQL oracle counts the same triangles with the plain u<v<w
    three-way join — orientation changes the plan, never the census.
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
        .localCheckpoint(eager=True)
    )
    # orientation rank: (degree, node) — total order, ties impossible
    e = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("degree", "_du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv")),
            "v",
        )
    )
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)

    # every triangle has a unique min-rank apex `a`; the b < c filter
    # halves the symmetric wedge pair, and the closing edge is probed by
    # its id-canonical form so the probe is a plain two-key hash join
    # (an OR of both orientations would fall to a nested-loop join)
    w1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "a").filter(F.col("b") < F.col("c"))
    closer = oriented.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    )
    tri = wedges.join(closer, ["b", "c"]).select("a", "b", "c")

    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def kcore(edges: DataFrame, k: int, n_rounds: int = 8) -> DataFrame:
    """k-core membership (Seidman 1983) over an undirected simple graph
    given as canonical (u, v) edges with u < v: iteratively peel nodes
    of degree < k; what survives is the maximal subgraph where every
    node keeps >= k neighbors (the "dense core" a curation pass keeps
    when thinning an entity graph, and the standard cohesion filter
    before community detection).

    Runs a FIXED ``n_rounds`` of synchronous peeling — like
    :func:`pagerank`, fixed rounds keep the computation a finite plan
    the DuckDB oracle unrolls verbatim; when the peel converges within
    the budget (test-pinned for the fixtures) the result IS the true
    k-core, and all arithmetic is exact integers either way.  Returns
    (node, degree) — degree within the surviving subgraph — for nodes
    whose final degree >= k.

    Scale shape per round: one degree aggregate (shuffle bounded by
    |E|) + two LEFT SEMI joins restricting the edge list to surviving
    endpoints; lineage truncated per round with an eager
    localCheckpoint so the K-round plan never compounds.  Peeling only
    ever REMOVES rows, so round cost is monotonically nonincreasing —
    the opposite of the wedge blowup triangle_census guards against.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select("u", "v")
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("_d"))
        )
        alive = deg.filter(F.col("_d") >= k).select("node")
        e = (
            e.join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    final_deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return final_deg.filter(F.col("degree") >= k)


def label_propagation(edges: DataFrame, n_rounds: int = 4) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al. 2007)
    over an undirected simple graph of canonical (u, v) edges,
    determinized: every node starts labeled with its own id; each round
    every node adopts the most frequent label among its NEIGHBORS, ties
    broken by the smallest label — no randomness, so a fixed
    ``n_rounds`` gives one well-defined answer on both engines (the
    classic random-order async variant is irreproducible by design;
    synchronous + min-tie-break is the determinization every
    distributed implementation (e.g. GraphX/GraphFrames LPA) ships).

    Returns (node, community, community_size) — community = the final
    label, an actual member node's id.

    Scale shape per round: one |E|-bounded join of the label vector
    against the (doubled) edge list, one groupBy (node, label), and a
    per-node window for the deterministic argmax — partitioned by node,
    so fully parallel; a hub node's candidate rows are bounded by its
    degree (never materialized as one array).  Labels checkpointed per
    round.  Isolated nodes (none arise from an edge list, but callers
    may union extra nodes later) would keep their own label.
    """
    from pyspark.sql import Window

    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("_cnt"), F.asc("label"))
    for _ in range(n_rounds):
        cand = both.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        counts = cand.groupBy("node", "label").agg(F.count("*").alias("_cnt"))
        new = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        labels = (
            nodes.join(new.withColumnRenamed("label", "_nl"), "node", "left")
            .select(
                "node", F.coalesce("_nl", F.col("node")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node",
        F.col("label").alias("community"),
        "community_size",
    )


def undirected_edges(pairs: DataFrame) -> DataFrame:
    """Canonical a<b co-occurrence pairs (entity_cooccurrence output:
    class_a/key_a/class_b/key_b/n_turns) -> both directed edges."""
    fwd = pairs.select(
        F.col("class_a").alias("src_class"),
        F.col("key_a").alias("src_key"),
        F.col("class_b").alias("dst_class"),
        F.col("key_b").alias("dst_key"),
        F.col("n_turns").alias("weight"),
    )
    rev = pairs.select(
        F.col("class_b").alias("src_class"),
        F.col("key_b").alias("src_key"),
        F.col("class_a").alias("dst_class"),
        F.col("key_a").alias("dst_key"),
        F.col("n_turns").alias("weight"),
    )
    return fwd.unionByName(rev)


def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over an undirected
    simple graph (Newman & Girvan 2004): Q = sum_c [e_c/m -
    (d_c/2m)^2] — THE standard 'is this partition better than chance'
    score, closing the loop on label_propagation (communities without
    a quality number are a demo, not an operator).

    Exact integer form: Q = (4m * intra - sum_c d_c^2) / (4 m^2) —
    intra-community edge count and per-community degree sums are plain
    aggregates; the squares run in DECIMAL(38,0) so the single final
    division is the only float.  Two label joins on the edge list +
    two groupBys; nothing quadratic, no collect.

    ``edges``: canonical (u, v), u < v, one row per edge.
    ``communities``: (node, community).  Returns one row:
    (n_communities, n_edges, intra_edges, modularity)."""
    lab = communities.select("node", "community")
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    dc = (
        deg.join(lab, "node")
        .groupBy("community")
        .agg(F.sum("d").cast("bigint").alias("dsum"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dstats = dc.agg(
        F.count("*").cast("bigint").alias("n_communities"),
        F.sum(dec("dsum") * dec("dsum")).alias("_sd2"),
    )
    intra = (
        edges.join(
            lab.withColumnsRenamed({"node": "u", "community": "_cu"}), "u"
        )
        .join(
            lab.withColumnsRenamed({"node": "v", "community": "_cv"}), "v"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_edges"),
            F.sum(F.when(F.col("_cu") == F.col("_cv"), 1).otherwise(0))
            .cast("bigint")
            .alias("intra_edges"),
        )
    )
    j = intra.join(F.broadcast(dstats))
    m = F.col("n_edges").cast("decimal(38,0)")
    num = (
        F.lit(4).cast("decimal(38,0)") * m * F.col("intra_edges")
        - F.col("_sd2")
    ).cast("double")
    den = (F.lit(4).cast("decimal(38,0)") * m * m).cast("double")
    return j.select(
        "n_communities",
        "n_edges",
        "intra_edges",
        F.round(num / den, 9).alias("modularity"),
    )


def connected_components(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Connected components of an undirected simple graph given as
    canonical (u, v) edges, u < v — min-label propagation run to
    FIXPOINT: every node starts labeled with its own id; each round a
    node's label becomes min(own, neighbors'); converged when no label
    changed.  The component id is therefore the lexicographically
    smallest member's id — deterministic and oracle-expressible (the
    DuckDB twin is a recursive CTE computing min reachable id).

    Completes the graph family (triangles/k-core/LPA/modularity/
    PageRank): components are what near-dup CLUSTERS are — the dedup
    keeper rule 'one representative per connected component of the
    match graph' is exactly this operator downstream of any pairwise
    matcher (minhash/simhash/embedding/entity matches).

    Returns (node, component, component_size).  Nodes are taken from
    the edge list; a caller with isolated nodes unions them afterwards
    (their component is themselves).

    Scale shape: per round one |E|-bounded join of the label vector
    against the doubled edge list, one map-side-combined MIN agg onto
    the destination, one node-keyed join; labels localCheckpoint per
    round (the kcore/bpe_train iterative discipline).  Rounds needed =
    graph diameter — right for the low-diameter entity graphs here;
    a high-diameter graph (long chains) wants the two-phase
    large-star/small-star scheme (Kiveris et al., SoCC 2014, O(log^2)
    rounds), which trades this operator's oracle-exact simplicity for
    round count.  The driver-side state is ONE scalar per round (the
    changed count — an aggregate action, not a collect of rows).
    Raises ValueError if not converged within ``max_rounds``: loud,
    never silently partial."""
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    both = both.localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("label"))
    converged = False
    for _ in range(max_rounds):
        nbr_min = (
            both.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("_nl"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") != F.col("_old")).count()
        labels = stepped.drop("_old")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the budget — use a star-contraction "
            "scheme for high-diameter graphs)"
        )
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("component_size")
    )
    return labels.join(sizes, "label").select(
        "node", F.col("label").alias("component"), "component_size"
    )
