"""Similarity search over an embedding column (array<float>).

The reference's closest analogue is its range query (CIDR scan over sorted
keys, /root/reference/store/leveldb.go:154-189): "find neighbors of a probe
in key space". Here key space is a vector space; the sorted-key range scan
generalizes to bucketed candidate pruning.

Two paths, same contract:
- :func:`topk_cosine` — exact brute force. O(n) dots per probe; correct
  baseline; fine when the probe set is small and the corpus scan is
  column-pruned to (id, vector).
- :func:`topk_cosine_bucketed` — coordinate-sign LSH prune with multiprobe
  fallback; the 100 TB path (scan only matching buckets; bucket id is a
  partition column of the stored table so Catalyst prunes files).

All dot products are in-row ``zip_with``/``aggregate`` folds — JVM
codegen, no Python, no shuffle until the final top-k (a TakeOrdered on k
rows per partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flow_indexer_spark.operators.dedup import sign_lsh_bucket


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def topk_cosine(
    emb: DataFrame,
    probe_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal probe vector.

    The probe is a literal array column (no join at all); ``orderBy.limit``
    compiles to TakeOrderedAndProject — each partition keeps k rows, the
    driver merges, so no full sort and no wide shuffle.
    """
    q = F.array(*[F.lit(float(x)) for x in probe_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.withColumn("cosine", cosine(v, q))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def topk_cosine_bucketed(
    emb: DataFrame,
    probe_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose sign-LSH bucket is
    within ``multiprobe_hamming`` bit flips of the probe's bucket
    (multiprobe widens recall; 1 + n_bits buckets scanned at distance<=1).
    With the table partitioned by bucket, the ``isin`` filter becomes
    partition pruning — the scan touches ~(1+n_bits)/2^n_bits of the data.
    """
    probe_bucket = 0
    for j in range(n_bits):
        if probe_vec[j] > 0:
            probe_bucket |= 1 << j
    buckets = {probe_bucket}
    if multiprobe_hamming >= 1:
        for j in range(n_bits):
            buckets.add(probe_bucket ^ (1 << j))
    q = F.array(*[F.lit(float(x)) for x in probe_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.withColumn("_bkt", sign_lsh_bucket(vec_col, n_bits))
        .filter(F.col("_bkt").isin(*sorted(buckets)))
        .withColumn("cosine", cosine(v, q))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def l2_normalize(v: Column) -> Column:
    """Unit-normalize a vector in-row (cosine becomes a plain dot after
    this — the standard pre-step before ANN index build). Zero vectors
    pass through unchanged rather than dividing by zero. The norm is
    bound once (functions/inrow.py) — referencing it in the transform
    body would recompute the dot product per element, O(dim^2)."""
    from flow_indexer_spark.functions.inrow import bind

    def _scaled(vv: Column) -> Column:
        return bind(
            F.sqrt(_dot(vv, vv)),
            lambda norm: F.when(norm == 0.0, vv).otherwise(
                F.transform(vv, lambda x: x / norm)
            ),
        )

    return bind(v, _scaled)


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization for embedding storage: per-vector
    scale = max |x|, q_i = floor(x_i * 127 / scale + 0.5) — 4x smaller
    columns and SIMD-friendly dot products downstream, the standard
    storage layout for billion-vector ANN corpora.

    Everything is an in-row transform (JVM codegen, zero shuffle, chunks
    at scan speed). The rounding is written as an explicit floor(+0.5)
    instead of round() so every engine (and the DuckDB oracle twin)
    computes the identical half-up result — round()'s half-case mode
    differs across engines. Zero vectors quantize to all zeros.
    Output: (id, scale, qvec:array<int>, mae) where mae is the mean
    absolute dequantization error |x - q*scale/127|.
    """
    from flow_indexer_spark.functions.inrow import bind

    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
    # scale bound once — referencing the array_max expression inside the
    # quantize lambda would recompute it per element, O(dim^2)
    q = bind(
        scale,
        lambda s: F.when(s == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
            F.transform(
                v,
                lambda x: F.floor(x.cast("double") * 127.0 / s + 0.5).cast("int"),
            )
        ),
    )
    d = df.select(F.col(id_col), scale.alias("scale"), q.alias("qvec"), v.alias("_v"))
    errs = F.zip_with(
        "_v", "qvec", lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale") / 127.0)
    )
    mae = F.aggregate(errs, F.lit(0.0), lambda s, x: s + x) / F.size("qvec")
    return d.select(id_col, "scale", "qvec", mae.alias("mae"))


def write_bucketed_embeddings(
    emb: DataFrame, path: str, vec_col: str = "embedding", n_bits: int = 8
) -> None:
    """Materialize the IVF-style layout: embeddings partitioned by sign
    bucket so bucketed probes are file-pruned scans (the analogue of the
    postings table's sorted entity_key layout)."""
    (
        emb.withColumn("bucket", sign_lsh_bucket(vec_col, n_bits))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid in long format (label, dim, centroid) — the
    IVF coarse-quantizer training step (and the class-prototype build
    for prototype-based classification/dedup).

    posexplode melts vectors to (label, dim, value) rows, then ONE
    groupBy(label, dim) average with map-side partial aggregation —
    shuffle bytes O(labels x dims), never O(vectors). Long format is
    deliberate: it keeps the result engine-portable (array re-assembly
    is a presentation step: groupBy(label).agg(array_agg ordered by
    dim)) and lets downstream joins prune to the dims they need.
    """
    melted = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"),
    )
    return melted.groupBy("label", "dim").agg(F.avg("val").alias("centroid"))


def assign_to_centroids(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (the IVF partitioner / one k-means
    E-step): each vector gets the centroid with max cosine similarity.

    ``centroids`` is the long-format output of :func:`label_centroids`
    (label, dim, centroid). It re-assembles to one array per label
    in-row (sort_array over (dim, value) structs — dims stay aligned),
    then **broadcasts**: the per-vector work is an in-row loop over k
    centroid arrays (zip_with dot products) with NO shuffle of the
    vector table at all. max_by picks the argmax; ties break on lower
    label id for determinism.
    """
    packed = (
        centroids.groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s["centroid"],
            ).alias("cvec")
        )
    )
    v = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    from pyspark.sql.functions import broadcast

    joined = v.join(broadcast(packed))
    sim = cosine(F.col("_v"), F.col("cvec"))
    scored = joined.select(
        F.col(id_col), F.col("label"), sim.alias("sim")
    )
    return scored.groupBy(id_col).agg(
        F.max_by(F.struct("sim", F.col("label")), F.struct("sim", -F.col("label")))[
            "label"
        ].alias("assigned_label"),
        F.max("sim").alias("sim"),
    )


def ivf_topk(
    emb: DataFrame,
    probe: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF (inverted-file) ANN search — the scale path that completes
    :func:`label_centroids` / :func:`assign_to_centroids`: rank the
    per-list centroids against the probe, keep the top ``nprobe`` lists,
    and compute exact cosine only inside those lists. With the table
    written partitioned by ``list_col`` (write_bucketed_embeddings'
    layout idea), the broadcast list-filter becomes partition pruning:
    the scan touches ~nprobe/n_lists of the corpus instead of all of it,
    which is the entire point of IVF at 10^9+ vectors.

    ``probe`` is a ONE-ROW DataFrame holding ``vec_col`` (compose:
    ``emb.filter(id == q)``) — it travels by broadcast cross join, never
    a driver collect. The centroid ranking sorts a lists-sized table
    (tiny); the final top-k is TakeOrderedAndProject. Returns
    (id, list, cosine) for the k best, ids-ordered on ties.
    """
    pv = probe.select(F.col(vec_col).cast("array<double>").alias("_q"))
    cents = label_centroids(emb, list_col, vec_col)
    packed = cents.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("_cvec")
    )
    sel = (
        packed.join(F.broadcast(pv))
        .withColumn("_sim", cosine(F.col("_cvec"), F.col("_q")))
        .orderBy(F.desc("_sim"), "label")
        .limit(nprobe)
        .select(F.col("label").alias(list_col))
    )
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.join(F.broadcast(sel), list_col)
        .join(F.broadcast(pv))
        .withColumn("cosine", cosine(v, F.col("_q")))
        .select(id_col, list_col, "cosine")
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def kmeans_seeds(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> DataFrame:
    """Deterministic k-means init: the k vectors first in md5-hash order
    (a rand()-free uniform draw, reproducible across engines/backfills),
    labeled 0..k-1 in that order, returned in the long (label, dim,
    centroid) format :func:`assign_to_centroids` consumes. The
    single-partition row_number window is over k rows post-limit — a
    constant, never the corpus.
    """
    from pyspark.sql import Window

    from flow_indexer_spark.operators.dedup import md5_int32

    if k <= 0:
        raise ValueError("k must be positive")
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    seeds = (
        emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            h.alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(k)
    )
    w = Window.orderBy("_h", id_col)
    lab = seeds.select((F.row_number().over(w) - 1).alias("label"), "_v")
    return lab.select(
        "label", F.posexplode("_v").alias("dim", "centroid")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> DataFrame:
    """Spherical k-means (cosine) Lloyd iterations as pure DataFrame ops —
    the IVF coarse-quantizer TRAINER that :func:`label_centroids` /
    :func:`ivf_topk` assume pre-existing list labels for.

    Per iteration: E-step = :func:`assign_to_centroids` (centroids
    broadcast, NO shuffle of the vector table), M-step =
    :func:`label_centroids` (one groupBy(label, dim), shuffle bytes
    O(k x dims)). Clusters that lose every member keep their previous
    centroid (left-anti carryover) so k never silently shrinks. The
    k x dims centroid table is ``localCheckpoint``-ed each round to
    truncate the otherwise exponentially nesting lineage — the same
    driver-free pattern MLlib uses, minus its driver collect.

    Returns the trained centroids in long (label, dim, centroid) format;
    compose with :func:`assign_to_centroids` for final assignments and
    :func:`ivf_topk` for search.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    cents = kmeans_seeds(emb, k, id_col, vec_col, salt)
    for _ in range(n_iter):
        assign = assign_to_centroids(emb, cents, id_col, vec_col)
        labeled = emb.join(
            assign.select(id_col, F.col("assigned_label").alias("_lab")),
            id_col,
        )
        new = label_centroids(labeled, "_lab", vec_col)
        missing = cents.join(
            new.select("label").distinct(), "label", "left_anti"
        )
        cents = new.unionByName(missing).localCheckpoint(eager=True)
    return cents


def hard_negatives(
    emb: DataFrame,
    anchors: DataFrame,
    k_neg: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training pair mining: for each anchor, the single
    nearest SAME-label vector (the positive) plus the ``k_neg`` nearest
    DIFFERENT-label vectors (hard negatives — the near-misses that teach
    a retriever its decision boundary; random negatives are too easy).

    ``anchors`` (a small probe set) is **broadcast**, so candidate
    scoring never shuffles the corpus; the single shuffle is the
    per-(anchor, kind) top-k window over the batch-pruned candidates.
    At 10^9+ vectors, prune candidates FIRST (sign-LSH bucket filter or
    :func:`ivf_topk` lists) and feed the pruned set here — the ranking
    topology is unchanged.

    Scoring runs as an Arrow-batched BLAS kernel (``mapInPandas``): the
    packed anchor matrix broadcasts as ONE row, each corpus batch does a
    single ``V @ A.T`` matmul, and the kernel emits only its per-batch
    top (1 positive + k_neg negatives) per anchor — map-side top-k
    pruning, so the window shuffle carries O(batches × anchors × k_neg)
    rows instead of O(corpus × anchors). (The earlier per-pair
    higher-order-function cosine evaluated interpreted per element —
    the pattern measured ~20× slower than the gram kernel in semdedup,
    PLANS.md §3i.) The global window then ranks the pruned candidates
    exactly: per-batch top-k keeps use the identical (sim DESC, id ASC)
    comparator, so pruning never drops a global winner.

    Returns (anchor_id, id, kind 'positive'|'negative', rank) — ids
    only; float sims are engine-rounding bait.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as _pd  # noqa: PLC0415
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql.types import (  # noqa: PLC0415
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    if k_neg < 1:
        raise ValueError("k_neg must be >= 1")
    packed = anchors.groupBy().agg(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("aid"),
                F.col(label_col).cast("string").alias("alab"),
                F.col(vec_col).cast("array<double>").alias("q"),
            )
        ).alias("_anchors")
    )
    src = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("string").alias("_lab"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).crossJoin(F.broadcast(packed))

    id_type = src.schema["_id"].dataType
    mid_schema = StructType(
        [
            StructField("anchor_id", id_type, False),
            StructField("_cid", id_type, False),
            StructField("kind", StringType(), False),
            StructField("_sim", DoubleType(), False),
        ]
    )
    kn = int(k_neg)

    def _score_batches(it):
        aids = alabs = Qn = None
        for pdf in it:
            if not len(pdf):
                continue
            if aids is None:
                alist = pdf["_anchors"].iloc[0]
                aids = np.array([a["aid"] for a in alist])
                alabs = np.array([a["alab"] for a in alist], dtype=object)
                Q = np.array([list(a["q"]) for a in alist], dtype=np.float64)
                qn = np.linalg.norm(Q, axis=1)
                qn[qn == 0] = 1.0
                Qn = Q / qn[:, None]
            ids = pdf["_id"].to_numpy()
            labs = pdf["_lab"].to_numpy()
            V = np.array(pdf["_v"].tolist(), dtype=np.float64)
            nv = np.linalg.norm(V, axis=1)
            nv[nv == 0] = 1.0
            S = (V / nv[:, None]) @ Qn.T  # (batch, n_anchors)
            out_a, out_c, out_k, out_s = [], [], [], []
            for j in range(len(aids)):
                # identical comparator to the global window: sim DESC, id ASC
                order = np.lexsort((ids, -S[:, j]))
                n_pos = n_neg = 0
                for i in order:
                    if ids[i] == aids[j]:
                        continue
                    if labs[i] == alabs[j]:
                        if n_pos >= 1:
                            continue
                        n_pos += 1
                        kind = "positive"
                    else:
                        if n_neg >= kn:
                            if n_pos >= 1:
                                break
                            continue
                        n_neg += 1
                        kind = "negative"
                    out_a.append(aids[j])
                    out_c.append(ids[i])
                    out_k.append(kind)
                    out_s.append(S[i, j])
            yield _pd.DataFrame(
                {"anchor_id": out_a, "_cid": out_c, "kind": out_k, "_sim": out_s}
            )

    pruned = src.mapInPandas(_score_batches, mid_schema)
    w = Window.partitionBy("anchor_id", "kind").orderBy(
        F.desc("_sim"), F.col("_cid")
    )
    ranked = pruned.withColumn("rank", F.row_number().over(w))
    keep = F.when(F.col("kind") == "positive", 1).otherwise(k_neg)
    return ranked.filter(F.col("rank") <= keep).select(
        "anchor_id", F.col("_cid").alias(id_col), "kind", "rank"
    )


# --- product quantization (PQ) ----------------------------------------------
#
# The third leg of the vector-compression stack next to quantize_int8
# (scalar) and ivf_topk (coarse partitioning): split each vector into m
# subvectors, vector-quantize each subspace against its own k-codeword
# codebook (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"), store m small ints per vector (m bytes at k<=256 vs 4*dims
# float bytes), and answer queries with asymmetric distance (ADC): one
# m x k lookup table per query, built once, summed per candidate.
# The reference's fixed-width byte keys (ipset/ipset.go:23-37) are the
# spiritual ancestor: a domain value compressed to a tiny comparable code.


def _l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance as an in-row fold (JVM codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _pq_check(m: int, k: int, dims: int) -> int:
    if m < 1 or k < 1 or dims < 1:
        raise ValueError("m, k, dims must be positive")
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must be divisible by m ({m})")
    return dims // m


def pq_seeds(
    emb: DataFrame,
    m: int,
    k: int,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
) -> DataFrame:
    """Deterministic PQ codebook init: the k vectors first in md5-hash
    order (same rand()-free rule as kmeans_seeds), each sliced into m
    subvectors — codebook[j][label] = seed_vec[j*dims/m : (j+1)*dims/m].
    Long format (subspace, label, dim, centroid); dim is the index
    WITHIN the subspace."""
    sub = _pq_check(m, k, dims)
    from pyspark.sql import Window

    from flow_indexer_spark.operators.dedup import md5_int32

    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    seeds = (
        emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            h.alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(k)
    )
    lab = seeds.select(
        (F.row_number().over(Window.orderBy("_h", id_col)) - 1).alias("label"),
        "_v",
    )
    sliced = lab.select(
        "label",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(F.col("_v"), j * sub + 1, sub),
            )
        ).alias("subspace", "_sv"),
    )
    return sliced.select(
        "subspace", "label", F.posexplode("_sv").alias("dim", "centroid")
    )


def _pack_codebooks(codebooks: DataFrame) -> DataFrame:
    """(subspace, label, dim, centroid) -> (subspace, cbs) where cbs is
    the label-ordered array of centroid arrays. Aggregates a k*dims-row
    table — constant-size, never the corpus."""
    per_label = codebooks.groupBy("subspace", "label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("_cvec")
    )
    return per_label.groupBy("subspace").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("label", "_cvec"))),
            lambda s: s["_cvec"],
        ).alias("cbs")
    )


def _argmin_label(sv: Column, cbs: Column) -> Column:
    """0-based index of the L2-nearest codeword (first/lowest label wins
    ties) — a pure in-row expression over the packed codebook array.
    Both the subvector and the distance array are bound once
    (functions/inrow.py): ``sv`` may be a slice expression the caller
    builds per subspace (re-evaluated per codeword otherwise), and the
    distance array feeds two consumers (position + min) that would
    otherwise each recompute the whole fold."""
    from flow_indexer_spark.functions.inrow import bind

    return bind(
        sv,
        lambda s: bind(
            F.transform(cbs, lambda c: _l2sq(s, c)),
            lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
        ),
    )


def pq_fit(
    emb: DataFrame,
    m: int,
    k: int,
    dims: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
) -> DataFrame:
    """Train PQ codebooks: per-subspace L2 Lloyd iterations, ALL m
    subspaces trained in the same pass — each iteration is ONE corpus
    scan (in-row slice to (id, subspace, subvec)), a broadcast join of
    the m*k packed codebooks with an in-row argmin E-step (the corpus
    never shuffles to be assigned), and ONE groupBy(subspace, label,
    dim) mean M-step whose shuffle is O(k * dims) regardless of corpus
    size. Codewords that lose every member carry over (left-anti), and
    the constant-size codebook table is localCheckpoint-ed per round —
    the kmeans_fit discipline applied per-subspace.

    n_iter=0 returns the deterministic seeds (the SQL-expressible
    variant the driver oracle uses)."""
    sub = _pq_check(m, k, dims)
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    cb = pq_seeds(emb, m, k, dims, id_col, vec_col, salt)
    if n_iter == 0:
        return cb
    sv = emb.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(
                    F.col(vec_col).cast("array<double>"), j * sub + 1, sub
                ),
            )
        ).alias("subspace", "_sv"),
    )
    for _ in range(n_iter):
        packed = _pack_codebooks(cb)
        asg = sv.join(F.broadcast(packed), "subspace").select(
            "subspace",
            _argmin_label(F.col("_sv"), F.col("cbs")).alias("label"),
            "_sv",
        )
        new = asg.select(
            "subspace", "label", F.posexplode("_sv").alias("dim", "_val")
        ).groupBy("subspace", "label", "dim").agg(F.avg("_val").alias("centroid"))
        missing = cb.join(
            new.select("subspace", "label").distinct(),
            ["subspace", "label"],
            "left_anti",
        )
        cb = new.unionByName(missing).localCheckpoint(eager=True)
    return cb


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its m-code array — the PQ compression step.

    The packed codebooks collapse to ONE row (array[m][k][dims/m]) and
    broadcast; codes are a pure in-row expression (per subspace: slice,
    L2 fold over k codewords, argmin) — ZERO shuffles of the vector
    table, so encoding composes into any scan at scan speed. Output
    (id, codes array<int>); at k<=256 the stored table is m bytes/vector.
    """
    sub = _pq_check(m, 1, dims)
    books = _pack_codebooks(codebooks).groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("subspace", "cbs"))),
            lambda s: s["cbs"],
        ).alias("_books")
    )
    v = F.col(vec_col).cast("array<double>")
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _argmin_label(
            F.slice(v, j * sub + 1, sub), F.element_at(F.col("_books"), j + 1)
        ),
    )
    return emb.crossJoin(F.broadcast(books)).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    probe_vec: list[float],
    k: int = 10,
    m: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-coded table: the query
    builds one m x k lookup table lut[j][label] = ||q_j - codeword||^2
    (a constant-size agg over the codebook table, broadcast as ONE row),
    and each candidate's distance is an in-row fold
    sum_j lut[j][codes[j]] — no vector data touched at query time, no
    shuffle, and orderBy.limit compiles to TakeOrderedAndProject.
    Returns (id, adc_dist) ascending."""
    q = [float(x) for x in probe_vec]
    sub_counts = codebooks.select("subspace").distinct().count()
    m = m if m is not None else sub_counts
    if m < 1:
        raise ValueError("m must be >= 1")
    sub = len(q) // m
    if sub * m != len(q):
        raise ValueError(f"probe dims ({len(q)}) not divisible by m ({m})")
    packed = _pack_codebooks(codebooks)
    qsub = F.slice(
        F.array(*[F.lit(x) for x in q]), F.col("subspace") * sub + 1, sub
    )
    lut = packed.select(
        "subspace",
        F.transform(F.col("cbs"), lambda c: _l2sq(qsub, c)).alias("_d"),
    )
    lut1 = lut.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("subspace", "_d"))),
            lambda s: s["_d"],
        ).alias("_lut")
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("_lut"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        ),
    )
    return (
        codes_df.crossJoin(F.broadcast(lut1))
        .select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), id_col)
        .limit(k)
    )


def centroid_distance_report(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    c: int = 3,
) -> DataFrame:
    """Per-label embedding-outlier audit: squared distance of every
    vector to its OWN label centroid, gated by the robust median/MAD
    rule — the mislabeled-or-garbage detector for embedding tables
    (a vector far from its class prototype is a labeling error, an
    encoder glitch, or genuinely novel content; all three deserve a
    look before the class feeds contrastive training).

    Returns one row per label: (label, n, med, mad, n_outliers) with
    the distance quantized to ``scale`` (micro-units) so the
    median/MAD arithmetic is EXACT integers (`operators/robust.py`
    discipline); distances themselves fold (x_d - c_d)^2 terms in
    dimension order (oracle: SUM(term ORDER BY dim)).

    Scale shape: one (label, dim) aggregate for centroids — shuffle
    O(labels x dims), never O(vectors) — one (label, dim) equi-join
    back (dim-long rows), one (label, id) fold, then the per-label
    median windows.  No vector is ever compared to another vector:
    this is the O(n) audit beside the O(n^2)-shaped near-dup family.
    """
    from flow_indexer_spark.operators.robust import median_mad_outliers

    long = emb.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = long.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    j = long.join(cent, ["label", "dim"])
    term = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    dist = (
        j.select("label", "id", "dim", term.alias("_t"))
        .groupBy("label", "id")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("dim", "_t"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["_t"],
                ),
                9,
            ).alias("dist2")
        )
    )
    q = dist.select(
        "label",
        "id",
        F.round(F.col("dist2") * scale).cast("bigint").alias("qd"),
    )
    flagged = median_mad_outliers(q.select("label", "qd"), "label", "qd", c=c)
    return (
        flagged.groupBy(F.col("group").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("med").cast("bigint").alias("med"),
            F.min("mad").cast("bigint").alias("mad"),
            F.sum(F.col("is_outlier").cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )


def matryoshka_fidelity(
    pairs: DataFrame,
    a_col: str = "va",
    b_col: str = "vb",
    dims: tuple = (4, 8, 16),
    full_dim: int | None = None,
) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al., NeurIPS 2022):
    how faithful is pair cosine at PREFIX dimensions d to the full-
    dimension cosine?  The go/no-go gate before serving truncated
    embeddings (d << D is a 1/(D/d) memory/bandwidth cut in ANN).

    Per prefix d: ``n_pairs``, ``mae`` and ``max_abs_err`` of
    |cos_d - cos_full| over all pairs (pairs whose prefix norm is zero
    on either side are excluded for that d — cosine undefined).

    Everything is IN-ROW (slice + zip_with + a left-fold aggregate per
    dot/norm — dimension-ordered, so the float trajectory is identical
    on any engine that folds in index order) and the per-pair error
    quantizes to a 1e-9 integer lattice before the mean — the
    order-free exact-sum discipline."""
    if not dims:
        raise ValueError("dims must be non-empty")

    def _fold(col: Column) -> Column:
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    def _dot(a: Column, b: Column, d: int | None) -> Column:
        if d is not None:
            a, b = F.slice(a, 1, d), F.slice(b, 1, d)
        return _fold(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))

    a0, b0 = F.col(a_col), F.col(b_col)
    full_cos = _dot(a0, b0, full_dim) / (
        F.sqrt(_dot(a0, a0, full_dim)) * F.sqrt(_dot(b0, b0, full_dim))
    )
    entries = []
    for d in dims:
        na, nb = _dot(a0, a0, d), _dot(b0, b0, d)
        cos_d = _dot(a0, b0, d) / (F.sqrt(na) * F.sqrt(nb))
        err = F.round(F.abs(cos_d - full_cos) * 1e9).cast("bigint")
        entries.append(
            F.when(
                (na > 0) & (nb > 0),
                F.struct(F.lit(d).alias("dim"), err.alias("err_u")),
            )
        )
    exploded = pairs.select(
        F.explode(
            F.filter(F.array(*entries), lambda s: s.isNotNull())
        ).alias("e")
    ).select("e.dim", "e.err_u")
    return (
        exploded.groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("err_u") / (F.count("*") * F.lit(1e9)), 9
            ).alias("mae"),
            F.round(F.max("err_u") / F.lit(1e9), 9).alias("max_abs_err"),
        )
    )
