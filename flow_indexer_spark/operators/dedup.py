"""Deduplication suite for training-data pipelines.

The reference dedups *entities within a document* (ipset hash-set,
/root/reference/ipset/ipset.go:56-76) and *documents within a store*
(HasDocument, /root/reference/store/leveldb.go:58-68). A 100 TB corpus
pipeline needs the document-level generalizations of those: exact
content dedup, MinHash/LSH and SimHash near-dup, n-gram Jaccard, and
embedding-cosine near-dup. All are pure DataFrame compositions — one
hash-shuffle each, no Python in the hot path.

Hash portability: every hash used here is derived from ``md5`` so the
DuckDB oracle twins in ``__spark_entry__`` compute bit-identical values
(Spark ``conv(substring(md5(x),1,8),16,10)`` == DuckDB
``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``). At production scale you'd
swap in ``xxhash64`` for speed; the topology is unchanged.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokens, empties dropped (the empty-field guard,
    /root/reference/backend/syslog.go:50-56)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, " "), lambda x: x != "")


def md5_int32(c: Column) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5 as a bigint."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def fan_out(df: DataFrame, min_tasks: int | None = None) -> DataFrame:
    """Ensure enough map-side tasks before compute-heavy per-row work.

    A parquet scan parallelizes at row-group granularity: a source
    delivered as a few large row groups (or gzip files) caps the whole
    tokenize/shingle/explode stage at that task count no matter how many
    cores exist — measured 2.5-3x wall on the gram aggregation when the
    documents table arrived as ONE row group (the residual is fixed job
    overhead at this toy scale; the gap widens with per-row cost and
    input size). If the input has fewer partitions
    than the session's default parallelism, shuffle the (cheap,
    pre-explosion) rows once so the expensive projection runs wide;
    no-op on healthy inputs (at 100 TB every table has thousands of
    splits, so this never fires there).
    """
    sc = df.sparkSession.sparkContext
    target = min_tasks or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --- exact dedup -----------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with the
    keeper id (min id — stable) and copy count. Map-side partial agg makes
    this one shuffle of (hash, id) pairs regardless of corpus size."""
    return (
        df.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def exact_dedup_keep(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The surviving rows after exact dedup (keeper per content hash).
    Window-free: aggregate keepers then semi-join — no global sort, and the
    join key (id) is high-cardinality/unskewed."""
    keepers = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signature(
    text_col: str | Column = "text",
    n_bands: int = 4,
    rows_per_band: int = 1,
) -> list[Column]:
    """MinHash band signature over whitespace-token shingles, in-row
    (transform + array_min): no shuffle. Hash function j of token t is
    md5('b{j}' || t); band b combines the minima of its ``rows_per_band``
    consecutive hash functions (j = b*r .. b*r+r-1) into one value that
    collides only when ALL r minima collide — the classic banding
    precision knob: the match threshold is ~(1/n_bands)^(1/r), so r=1 is
    extremely permissive (any single shared minimum) and r=4 demands
    near-identical token sets. On homogeneous corpora (small shared
    vocabulary) r=1 banding buckets nearly everything together; raise r
    before raising ``max_bucket_df``. r=1 keeps the raw minimum as the
    band value (bit-compatible with the stored signatures and DuckDB
    oracles predating the knob). Empty docs yield null bands — null
    never joins, preserved for r>1 by null-propagating concat."""
    tok = tokens(text_col)

    def mh(j: int) -> Column:
        return F.array_min(
            F.transform(tok, lambda x: F.md5(F.concat(F.lit(f"b{j}"), x)))
        )

    if rows_per_band < 1:
        raise ValueError("rows_per_band must be >= 1")
    if rows_per_band == 1:
        return [mh(b).alias(f"band{b}") for b in range(n_bands)]
    out = []
    for b in range(n_bands):
        parts: list[Column] = []
        for r in range(rows_per_band):
            if parts:
                parts.append(F.lit("|"))
            parts.append(mh(b * rows_per_band + r))
        out.append(F.md5(F.concat(*parts)).alias(f"band{b}"))
    return out


def _banded_candidate_pairs(
    bands: DataFrame, max_bucket_df: int | None
) -> DataFrame:
    """Shared banded-LSH candidate join over melted (_id, _band, _bkt)
    rows: ONE self-join on (band, bucket) covers every band (vs a union of
    per-band joins — k fewer shuffles), with the skew guard the n-gram
    path pioneered (``max_ngram_df``, :func:`ngram_jaccard_pairs`): a
    degenerate bucket of B docs (boilerplate/near-empty texts all hashing
    to one band value) would emit B^2 candidate rows, so buckets larger
    than ``max_bucket_df`` are dropped from candidate generation entirely.
    (Pairs whose every shared band is that common are overwhelmingly not
    near-dups; at 100 TB the cap is what keeps the join output bounded.)"""
    if max_bucket_df is not None:
        ok = (
            bands.groupBy("_band", "_bkt")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_bucket_df)
            .select("_band", "_bkt")
        )
        bands = bands.join(ok, ["_band", "_bkt"])
    left = bands.select(F.col("_id").alias("id_a"), "_band", "_bkt")
    right = bands.select(F.col("_id").alias("id_b"), "_band", "_bkt")
    return (
        left.join(right, ["_band", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_bucket_df: int | None = 1000,
    rows_per_band: int = 1,
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing ANY band bucket. The classic
    shingle->minhash->band->bucket-join, melted to one self-join across all
    bands (shuffle on band hash — uniform by construction except for the
    degenerate buckets ``max_bucket_df`` drops). ``rows_per_band`` is the
    precision knob (see :func:`minhash_signature`) — the structural
    guarantee is monotone: with the hash-function budget held fixed
    (n_bands*rows_per_band), every pair found at higher r is also found
    at lower r. Returns (id_a, id_b) with id_a < id_b."""
    sigs = fan_out(df).select(
        F.col(id_col).alias("_id"),
        *minhash_signature(text_col, n_bands, rows_per_band),
    )
    bands = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"), F.col(f"band{b}").alias("_bkt")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_e"),
    ).select("_id", F.col("_e._band").alias("_band"), F.col("_e._bkt").alias("_bkt"))
    return _banded_candidate_pairs(bands, max_bucket_df)


# --- SimHash ---------------------------------------------------------------

def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-doc SimHash fingerprint: for each bit j, sum +1/-1 votes of each
    distinct token's hash bit j; bit j of the signature = (vote > 0).

    Entirely in-row (transform over the token array + fold over bit
    positions) — a single projection, no shuffle, whole-stage codegen.
    Output: (id_col, simhash:bigint).
    """
    tok = F.array_distinct(tokens(text_col))
    h = F.transform(tok, lambda x: md5_int32(x))
    votes = [
        F.aggregate(
            h,
            F.lit(0),
            lambda acc, th: acc
            + F.when(th.bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1),
        )
        for j in range(bits)
    ]
    sig = None
    for j, v in enumerate(votes):
        bit = F.when(v > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("bigint")
        sig = bit if sig is None else sig + bit
    return fan_out(df).select(F.col(id_col), sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
    n_bands: int = 4,
    max_bucket_df: int | None = 1000,
) -> DataFrame:
    """Banded SimHash near-pair generation: split the signature into
    ``n_bands`` contiguous bands; by pigeonhole, two sigs within
    ``max_hamming <= n_bands - 1`` bits share at least one exact band, so
    one melted equality self-join across bands finds all such pairs
    without a cross join. Exact Hamming filter applied after the candidate
    join. ``max_bucket_df`` caps degenerate band buckets (see
    :func:`_banded_candidate_pairs`) — note dropped buckets trade recall
    for bounded work, exactly like the n-gram ``max_ngram_df`` guard."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    s = sigs.select(F.col(id_col).alias("_id"), F.col("simhash"))
    bands = s.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("_bkt"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_e"),
    ).select("_id", F.col("_e._band").alias("_band"), F.col("_e._bkt").alias("_bkt"))
    cand = _banded_candidate_pairs(bands, max_bucket_df)
    sa = s.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sim_a"))
    sb = s.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sim_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming64(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- n-gram Jaccard --------------------------------------------------------

def token_ngrams(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct token n-grams as joined strings (in-row). Guarded for short
    docs: Spark's sequence(1, 0) counts DOWN ([1,0]), so the gram transform
    only applies when the doc has >= n tokens. The token array is bound
    once (functions/inrow.py) — referencing ``tokens(text)`` directly in
    the lambda body would re-split the text per gram index, O(len^2)."""
    from flow_indexer_spark.functions.inrow import bind

    def _grams(tok: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
        grams = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n)))
        )
        return F.when(F.size(tok) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return bind(tokens(text_col), _grams)


def token_ngram_hashes(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct token n-grams as 64-bit hashes WITHOUT materializing the
    joined gram strings: each token is xxhash64'd once, and a gram's hash
    is a rotate-xor fold over its n token hashes — pure long arithmetic,
    no per-gram string allocation (measured ~1.9x on the n=8 boilerplate
    scan). Same distinctness semantics as ``xxhash64(token_ngrams(...))``
    up to 64-bit collisions (~|G|^2/2^64, same bound already accepted for
    the string-hash path); values differ, so use only where downstream
    math depends on gram IDENTITY, not on a specific hash function (all
    current callers — Jaccard over hash sets, df counts — qualify).
    Token and token-hash arrays are bound once (functions/inrow.py) —
    the sliding-window slice would otherwise re-tokenize+re-hash per
    gram index, O(len^2)."""
    from flow_indexer_spark.functions.inrow import bind

    mix = lambda acc, h: (
        F.shiftleft(acc, 7).bitwiseOR(F.shiftrightunsigned(acc, 57))
    ).bitwiseXOR(h)

    def _over_hashes(tok: Column) -> Column:
        def _grams(th: Column) -> Column:
            idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
            gh = F.transform(
                idx,
                lambda i: F.aggregate(
                    F.slice(th, i, n), F.lit(0).cast("long"), mix
                ),
            )
            return F.when(F.size(tok) >= n, F.array_distinct(gh)).otherwise(
                F.array().cast("array<long>")
            )

        return bind(F.transform(tok, lambda x: F.xxhash64(x)), _grams)

    return bind(tokens(text_col), _over_hashes)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_ngram_df: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by token-n-gram Jaccard similarity.

    Candidate generation is an inverted-index self-join on shared n-grams
    (the same posting-list idea as the entity index, A2); Jaccard is then
    computed exactly from the two in-row n-gram sets. ``max_ngram_df``
    drops n-grams appearing in more than that many docs from candidate
    generation — the skew guard: a boilerplate n-gram shared by 1M docs
    would otherwise create a 10^12-row join. (Pairs whose every shared
    n-gram is that common are not near-dups at any sane threshold.)
    """
    grams = fan_out(df).select(
        F.col(id_col).alias("_id"), token_ngrams(text_col, n).alias("_grams")
    )
    exploded = grams.select("_id", F.explode("_grams").alias("_g"))
    if max_ngram_df is not None:
        rare = (
            exploded.groupBy("_g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_ngram_df)
            .select("_g")
        )
        exploded = exploded.join(rare, "_g")
    cand = (
        exploded.alias("l")
        .join(exploded.alias("r"), "_g")
        .filter(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates()
    )
    ga = grams.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Lossless scale path for :func:`ngram_jaccard_pairs`: AllPairs/PPJoin
    prefix filtering (Bayardo et al. WWW'07; Xiao et al. WWW'08).

    The plain inverted-index candidate join is quadratic in per-gram
    document frequency: every doc pair sharing ANY gram becomes a
    candidate, so sub-cap boilerplate grams still dominate the join
    output. Prefix filtering prunes without losing a single pair:

    * Order every doc's gram set by a global canonical order — ascending
      document frequency, ties on gram text (rarest first, the AllPairs
      heuristic that makes prefixes maximally selective).
    * A pair with Jaccard >= t must share >= ceil(t/(1+t)*(|A|+|B|))
      grams, which (with the size filter below) is >= ceil(t*|A|); by the
      pigeonhole prefix-filtering principle the pair then shares a gram
      within each doc's first |G| - ceil(t*|G|) + 1 ordered grams. Only
      those PREFIX grams enter the candidate join — a high-df gram lands
      in a prefix only for docs where it is among their rarest grams, so
      skew self-limits instead of needing a recall-losing df cap.
    * Size filter inside the join: min(|A|,|B|) >= t*max(|A|,|B|) (a
      valid pair can't differ in size by more than the threshold allows).
    * PPJoin positional filter: a pair needs overlap
      alpha = ceil(t/(1+t)*(|A|+|B|)); a prefix collision at (0-based)
      positions (pa, pb) can contribute at most
      min(|A|-pa, |B|-pb) total overlap (this gram + everything after
      it), so collisions with a bound below alpha are discarded. The
      pair's FIRST shared prefix gram gives the loosest (valid) bound,
      and the any-collision-passes + dropDuplicates composition keeps
      exactly the pairs whose first collision passes — lossless.
    * Exact Jaccard verification on the surviving candidates, identical
      to the baseline.

    Grams are 64-bit-hashed before any shuffle — string-free, via
    :func:`token_ngram_hashes` (per-token xxhash64 + rotate-xor fold, no
    per-gram string allocation): join keys and the verify-stage arrays
    move as longs, not n-token strings (~3x less shuffle volume, integer
    compares). Jaccard over hashed sets equals Jaccard over the string
    sets unless two distinct grams of the same document collide in 64
    bits — odds ~|G|^2/2^64, ignored.

    Topology: TWO gram-stream exchanges, not three. Document frequency
    is a count window over ``partitionBy(gram)`` (one exchange — same
    reducer-skew profile as the agg+join it replaces, since a mega-common
    gram's rows co-locate either way), and the canonical position +
    doc size come from ``row_number``/``count`` windows sharing ONE
    ``partitionBy(doc)`` exchange (bounded by doc size, never skewed).
    The join-df-back + groupBy-collect_list-sort-re-explode round trip
    of the textbook MapReduce AllPairs layout is gone: the prefix filter
    is a per-row predicate on the windowed position, and the verify-stage
    gram arrays come straight from the in-row build. Then the prefix
    self-join (shuffle on gram) and the verify joins as before. The
    candidate set is typically orders of magnitude smaller than the
    plain inverted-index join — the difference between "finishes" and
    "does not" at 100 TB.

    ``max_bucket_df`` optionally caps prefix-bucket sizes like
    :func:`_banded_candidate_pairs` (recall tradeoff, default off): it
    only matters when the corpus holds huge groups of literal near-dups,
    whose pair OUTPUT is itself quadratic — run exact dedup first.
    """
    from pyspark.sql import Window

    t = float(threshold)
    grams = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.array_sort(token_ngram_hashes(text_col, n)).alias("_grams"),
    ).filter(F.size("_grams") > 0)
    exploded = grams.select("_id", F.explode("_grams").alias("_g"))
    by_doc = Window.partitionBy("_id")
    annotated = exploded.withColumn(
        "_df", F.count("*").over(Window.partitionBy("_g"))
    ).select(
        "_id",
        "_g",
        F.count("*").over(by_doc).alias("_sz"),
        # 0-based canonical position: df ascending, hashed gram text as
        # the tiebreak (grams are distinct within a doc — deterministic)
        (F.row_number().over(by_doc.orderBy("_df", "_g")) - F.lit(1)).alias(
            "_p"
        ),
    )
    sz = F.col("_sz")
    # prefix length |G| - ceil(t*|G|) + 1; the -1e-9 keeps an FP product
    # that lands epsilon above an exact integer from inflating the ceil
    # (which would shorten the prefix and silently drop pairs)
    plen = (
        sz
        - F.ceil(F.lit(t) * sz.cast("double") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pre = annotated.filter(F.col("_p") < plen).select("_id", "_sz", "_p", "_g")
    if max_bucket_df is not None:
        ok = (
            pre.groupBy("_g")
            .agg(F.count("*").alias("_bdf"))
            .filter(F.col("_bdf") <= max_bucket_df)
            .select("_g")
        )
        pre = pre.join(ok, "_g")
    a = pre.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sa"),
        F.col("_p").alias("_pa"), "_g",
    )
    b = pre.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_sb"),
        F.col("_p").alias("_pb"), "_g",
    )
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("_sa") + F.col("_sb")).cast("double")
        - F.lit(1e-9)
    )
    overlap_bound = F.least(
        F.col("_sa") - F.col("_pa"), F.col("_sb") - F.col("_pb")
    )
    cand = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("_sa", "_sb").cast("double")
            >= F.lit(t) * F.greatest("_sa", "_sb").cast("double")
        )
        .filter(overlap_bound >= alpha)
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    ga = grams.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- near-dup clusters (connected components over candidate pairs) ---------

def _cc_large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every neighbor v > u links to min(N(u) ∪ {u})."""
    n = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = n.groupBy("u").agg(F.min("v").alias("minv"))
    m = F.least(F.col("minv"), F.col("u"))
    return (
        n.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges u >= v; every smaller neighbor (and
    u itself) links to min(smaller-neighbors ∪ {u})."""
    n = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = n.groupBy("u").agg(F.min("v").alias("minv"))
    relink = n.join(mins, "u").select(
        F.col("v").alias("u"), F.col("minv").alias("v")
    )
    self_link = mins.select("u", F.col("minv").alias("v"))
    return (
        relink.union(self_link)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list via alternating
    large-star / small-star rounds (Kiveris et al., "Connected Components
    in MapReduce and Beyond" — the standard shuffle-based CC that
    converges in O(log n) rounds regardless of component diameter, unlike
    naive min-label propagation which needs O(diameter) rounds and dies
    on path-shaped dup chains).

    Per round: two groupBy-min + join shuffles, both keyed on node id
    (high cardinality, unskewed after the first round collapses stars).
    ``localCheckpoint`` truncates the lineage each round so the plan stays
    O(1) deep; convergence is detected by an edge-set checksum
    (count + bit_xor of xxhash64 — xor is order-independent and cannot
    overflow under ANSI mode), one lightweight action per round.

    Returns (node, component) where component = min node id reachable.
    Nodes with no edges don't appear (callers union isolated ids back —
    see :func:`near_dup_clusters`).
    """
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(d: DataFrame):
        r = d.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).head()
        return (r["n"], r["h"])

    prev = _sig(e)
    for _ in range(max_iter):
        e = _cc_small_star(_cc_large_star(e)).localCheckpoint()
        cur = _sig(e)
        if cur == prev:
            break
        prev = cur
    # at convergence every edge is (node -> component min); roots map to
    # themselves. groupBy-min is a no-op then, but keeps the result well-
    # defined if max_iter was hit before convergence.
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    return nodes.groupBy("node").agg(F.min("component").alias("component"))


def near_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Fold near-dup candidate ``pairs`` (from any generator: minhash_lsh_
    pairs, simhash_near_pairs, ngram_jaccard_pairs, embedding pairs) into
    clusters and pick one keeper per cluster — the step that turns pair
    lists into an actual deduped corpus.

    Returns every doc with (cluster_id, is_keeper): docs untouched by any
    pair are their own singleton cluster; keeper = min id in cluster
    (stable/deterministic — swap in a quality-score argmax by joining a
    score column and window-free max like exact_dedup_keep if desired).
    One broadcast-size join against the CC output (components ≈ number of
    dup-involved docs, a small fraction of the corpus at 100 TB).
    """
    comp = connected_components(pairs, src, dst, max_iter).withColumnRenamed(
        "node", id_col
    )
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


# --- embedding cosine near-dup ---------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact cosine near-dup pairs — the correctness baseline that checks
    EVERY pair (at scale use :func:`sign_lsh_near_pairs` to bucket
    first). Computed as a blocked gram matrix: vectors hash into
    ``n_blocks`` blocks, each of the n_blocks*(n_blocks+1)/2 block pairs
    becomes one applyInPandas group that runs a single BLAS matmul
    (rectangular across blocks, triangular within). Same-pair coverage
    is exact — a pair lands in exactly the (min(blk), max(blk)) group —
    and replication is x n_blocks, the standard blocked all-pairs
    tradeoff. The earlier formulation (crossJoin + higher-order-function
    cosine) evaluated the HOF lambdas interpreted per element per pair —
    the pattern measured ~20x slower than the gram kernel in semdedup
    (PLANS.md §3i). Per-group memory is (n/n_blocks)^2 * 8 B; raise
    ``n_blocks`` with corpus size (work stays n^2 total, spread over
    more, smaller groups)."""
    import pandas as _pd  # noqa: PLC0415

    from pyspark.sql.types import (  # noqa: PLC0415
        DoubleType,
        StructField,
        StructType,
    )

    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    memb = v.select(
        "_id",
        "_v",
        "_blk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.least("_blk", F.lit(c)).alias("_bi"),
                        F.greatest("_blk", F.lit(c)).alias("_bj"),
                    )
                    for c in range(n_blocks)
                ]
            )
        ).alias("_bp"),
    ).select("_id", "_v", "_blk", "_bp._bi", "_bp._bj")

    id_type = dict(zip(v.schema.names, v.schema.fields))["_id"].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type, False),
            StructField("id_b", id_type, False),
            StructField("cosine", DoubleType(), False),
        ]
    )
    thr = float(threshold)

    def _block_pairs(key, pdf):
        bi, bj = key

        def _mat(sub: _pd.DataFrame):
            if not len(sub):
                return np.empty(0), np.zeros((0, 0))
            sub = sub.sort_values("_id")
            ids = sub["_id"].to_numpy()
            V = np.array(sub["_v"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            return ids, V / norms[:, None]

        out_a, out_b, out_c = [], [], []
        if bi == bj:
            ids, Vn = _mat(pdf)
            G = Vn @ Vn.T
            r, c = np.nonzero(np.triu(G >= thr, k=1))
            for x, y in zip(r, c):  # ids ascending -> id_a < id_b
                out_a.append(ids[x])
                out_b.append(ids[y])
                out_c.append(G[x, y])
        else:
            ia, An = _mat(pdf[pdf["_blk"] == bi])
            ib, Bn = _mat(pdf[pdf["_blk"] == bj])
            if len(ia) and len(ib):
                G = An @ Bn.T
                r, c = np.nonzero(G >= thr)
                for x, y in zip(r, c):  # block ids are hash-ordered: normalize
                    a, b = ia[x], ib[y]
                    if b < a:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(G[x, y])
        return _pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return memb.groupBy("_bi", "_bj").applyInPandas(_block_pairs, out_schema)


def sign_lsh_bucket(vec_col: str | Column = "embedding", n_bits: int = 8) -> Column:
    """Coordinate-sign LSH bucket id: bit j = sign(vec[j]). Deterministic,
    engine-portable, and a valid random-hyperplane family when upstream
    embeddings are mean-centered (axis-aligned hyperplanes)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = None
    for j in range(n_bits):
        bit = F.when(F.element_at(c, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def sign_lsh_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
) -> DataFrame:
    """Bucketed near-dup pairs: exact cosine computed only within each sign
    bucket. Recall < 1 (pairs straddling a hyperplane are missed) but the
    candidate count drops ~2^n_bits-fold; this is the 100 TB path."""
    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        sign_lsh_bucket(vec_col, n_bits).alias("_bkt"),
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bkt")
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_bkt")
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        F.sqrt(_dot(F.col("_va"), F.col("_va"))) * F.sqrt(_dot(F.col("_vb"), F.col("_vb")))
    )
    return (
        a.join(b, "_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def duplicated_spans(
    df: DataFrame,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document exact duplicated-substring coverage — the
    distributed stand-in for suffix-array substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    any shared verbatim run of >= k tokens between two documents
    necessarily shares a length-k token window, so rolling k-token
    window fingerprints (stride 1) find every such run with zero false
    negatives at the k-window granularity. Unlike the Jaccard/MinHash
    family (whole-document similarity), this catches a news article
    quoting three verbatim paragraphs of an otherwise-unrelated page —
    the case set-similarity misses and the one that measurably inflates
    memorization.

    A window is *duplicated* iff its fingerprint occurs in >= 2 DISTINCT
    documents (within-document repetition is textstats.repetition_features'
    job). Per document the duplicated windows' token intervals
    [pos, pos+k-1] are unioned exactly — sorted starts folded left with an
    (covered, last_end) accumulator, in-row — giving the fraction of the
    doc's tokens inside some cross-doc verbatim run.

    Topology: in-row window hashing (no shuffle), one partial-agg shuffle
    for fingerprint document-frequency, one join back on fingerprint
    (skew-safe: a fingerprint's fan-out is its true df, and the df>=2
    filter keeps the dup set sparse), one per-doc aggregation. Returns
    (id, n_tokens, n_windows, dup_windows, covered_tokens, dup_fraction)
    for every doc with >= k tokens.
    """
    if k <= 1:
        raise ValueError("k must be > 1")
    tok = tokens(text_col)
    base = fan_out(df).select(
        F.col(id_col).alias("_id"), tok.alias("_tok"), F.size(tok).alias("_n")
    ).filter(F.col("_n") >= k)
    wins = base.select(
        "_id",
        "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n") - (k - 1))).alias("pos"),
        "_tok",
    ).select(
        "_id",
        "_n",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("_tok", F.col("pos"), k))).alias("_w"),
    )
    dup = (
        wins.groupBy("_w")
        .agg(F.count_distinct("_id").alias("_d"))
        .filter(F.col("_d") >= 2)
        .select("_w")
    )
    folded = (
        wins.join(dup, "_w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("dup_windows"),
            F.sort_array(F.collect_set("pos")).alias("_starts"),
        )
        .withColumn(
            "covered_tokens",
            F.aggregate(
                "_starts",
                F.struct(
                    F.lit(0).cast("bigint").alias("cov"),
                    F.lit(0).cast("bigint").alias("end"),
                ),
                lambda acc, s: F.struct(
                    (
                        acc["cov"]
                        + F.greatest(
                            F.lit(0).cast("bigint"),
                            (s + F.lit(k - 1)).cast("bigint")
                            - F.greatest(acc["end"], (s - 1).cast("bigint")),
                        )
                    ).alias("cov"),
                    F.greatest(
                        acc["end"], (s + F.lit(k - 1)).cast("bigint")
                    ).alias("end"),
                ),
                lambda acc: acc["cov"],
            ),
        )
        .drop("_starts")
    )
    return (
        base.select("_id", "_n")
        .join(folded, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("bigint").alias("n_tokens"),
            (F.col("_n") - (k - 1)).cast("bigint").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("bigint").alias(
                "dup_windows"
            ),
            F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias(
                "covered_tokens"
            ),
            (
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("_n").cast("double")
            ).alias("dup_fraction"),
        )
    )


def semdedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    an embedding column with the O(n^2) pairwise cosine confined to
    k-means clusters — the scale lever is k (cluster population ~n/k, so
    pairwise work is ~n^2/k spread across k independent cluster
    partitions; the paper runs k=50k on LAION).

    ``centroids`` is a long-format (label, dim, centroid) table (from
    :func:`~flow_indexer_spark.operators.similarity.kmeans_seeds` or
    :func:`~flow_indexer_spark.operators.similarity.kmeans_fit`).
    Dedup rule (deterministic, id-ordered): a vector is dropped when SOME
    lower-id vector in the same cluster has cosine >= threshold with it.
    Among kept vectors no same-cluster pair reaches the threshold, and
    every dropped vector names a lower-id witness — both pinned by
    property test.

    Topology: assignment broadcasts the k x dims centroid table (the
    vector corpus never shuffles to be assigned); the pairwise stage is a
    self-join keyed on assigned_label — skew is bounded by the largest
    cluster, which is exactly what raising k controls; the witness set
    comes back as a left join on id (flag, not filter, so callers keep
    the audit trail). The reference's whole-corpus ipset presence check
    (/root/reference/ipset/ipset.go:56-76) generalizes here to
    "presence of a semantically-equal earlier document".

    Returns every input id with (assigned_label, keep, dup_of) where
    dup_of is the smallest qualifying witness id (null when kept).
    """
    from flow_indexer_spark.operators.similarity import assign_to_centroids

    asg = assign_to_centroids(emb, centroids, id_col, vec_col).select(
        id_col, "assigned_label"
    )
    # materialize (id, vec, label) ONCE: the table feeds three consumers
    # (both self-join sides + the output) and Spark re-executes the whole
    # broadcast-assignment subtree per consumer otherwise (measured: 3
    # corpus scans -> 1). Same lineage-truncation idiom as kmeans_fit.
    v = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .join(asg.select(F.col(id_col).alias("_id"), "assigned_label"), "_id")
        .localCheckpoint(eager=True)
    )
    # Pairwise stage: per-cluster BLAS gram matrix via applyInPandas —
    # the SemDeDup paper's own kernel. The JVM alternative (self-join on
    # label + higher-order-function cosine per pair) evaluates the HOF
    # lambdas interpreted, per element, per pair: measured 7 s for
    # 2k x 64d vectors at k=4 vs ~0.3 s here (pairs x dims interpreted
    # evals vs one C-side matmul per cluster). Memory is bounded by
    # column blocks of the gram matrix; the population lever stays k.
    import pandas as _pd  # noqa: PLC0415

    from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

    id_type = dict(zip(v.schema.names, v.schema.fields))["_id"].dataType
    w_schema = StructType(
        [
            StructField("id_b", id_type, False),
            StructField("dup_of", id_type, False),
        ]
    )
    thr = float(threshold)

    def _witness(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        V = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        out_b, out_w = [], []
        block = 1024
        for s in range(0, len(ids), block):
            stop = min(s + block, len(ids))
            G = Vn @ Vn[s:stop].T  # (n, block)
            for j in range(s, stop):
                cand = np.nonzero(G[:j, j - s] >= thr)[0]
                if cand.size:
                    # ids ascending -> first hit IS the min witness id
                    out_b.append(ids[j])
                    out_w.append(ids[cand[0]])
        return _pd.DataFrame({"id_b": out_b, "dup_of": out_w})

    witnesses = v.groupBy("assigned_label").applyInPandas(_witness, w_schema)
    return (
        v.join(witnesses, v["_id"] == witnesses["id_b"], "left")
        .select(
            F.col("_id").alias(id_col),
            "assigned_label",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def duplicate_segment_removal(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    by_hash: bool = False,
) -> DataFrame:
    """C4-style corpus-level duplicate-segment removal (Raffel et al.
    2020, §2.2: "we discarded all but one of any three-sentence span
    occurring more than once in the data set"): split every document
    into consecutive non-overlapping k-token segments, keep exactly ONE
    occurrence of each segment that repeats anywhere in the corpus (the
    lexicographically-first (doc, position) — deterministic under
    replay), and reconstruct each document from its surviving segments
    in original order. This is the third point on the exactness ladder:
    exact_dedup (whole doc) < duplicate_segment_removal (fixed spans,
    REWRITES text) < duplicated_spans (rolling windows, MEASURES
    coverage, never rewrites).

    Unlike the reference's per-document index (which only ever asks
    "which docs contain X", store/leveldb.go:147-205), this op mutates
    the corpus — the standard pre-training cleanup between extraction
    and tokenization.

    Topology (the 100 TB shape): in-row segmentation (zero shuffle; the
    token array is bound once per row via inrow.bind — HOF lambda
    bodies re-evaluate outer expressions per element otherwise), one
    posexplode, one partial-aggregating groupBy on the segment key for
    (corpus frequency, first witness), a join back that touches ONLY
    segments with frequency >= 2 (the duplicated dim is sparse on real
    corpora; AQE may broadcast it), and one per-doc reassembly
    aggregate whose state is bounded by document length. Nothing is
    globally sorted; no driver round-trip.

    ``by_hash=True`` shuffles xxhash64(segment) instead of the segment
    text (the production setting at 10^12 rows: fixed 8-byte keys, at
    a ~2^-64 per-pair collision risk); the default keeps the exact
    string so the DuckDB oracle is byte-for-byte reproducible. Both
    paths are pinned equal on the fixture in tests/test_dedup.py.

    Returns (id_col, n_segments, n_segments_kept, text_deduped), one
    row per document that retains at least one segment; documents made
    entirely of duplicated segments (all lost to earlier witnesses)
    drop out, exactly as C4 drops emptied pages.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from flow_indexer_spark.functions.inrow import bind

    segs = bind(
        tokens(text_col),
        # sequence(0, -1) is DESCENDING in Spark, not empty -- guard the
        # zero-token row explicitly
        lambda tok: F.when(
            F.size(tok) > 0,
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size(tok) / k).cast("int") - 1),
                lambda i: F.array_join(F.slice(tok, i * k + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    occ = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.size(segs).alias("_n_segs"),
        F.posexplode(segs).alias("_pos", "_seg"),
    )
    key = F.xxhash64("_seg") if by_hash else F.col("_seg")
    occ = occ.withColumn("_key", key)
    dup_winners = (
        occ.groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("_freq"),
            F.min(F.struct("_id", "_pos")).alias("_w"),
        )
        .filter(F.col("_freq") > 1)
        .select(
            "_key",
            F.col("_w._id").alias("_w_id"),
            F.col("_w._pos").alias("_w_pos"),
        )
    )
    kept = occ.join(dup_winners, "_key", "left").filter(
        F.col("_w_id").isNull()
        | ((F.col("_id") == F.col("_w_id")) & (F.col("_pos") == F.col("_w_pos")))
    )
    return (
        kept.groupBy("_id")
        .agg(
            F.first("_n_segs").alias("n_segments"),
            F.count(F.lit(1)).alias("n_segments_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_seg"))),
                    lambda s: s["_seg"],
                ),
                " ",
            ).alias("text_deduped"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_segments",
            "n_segments_kept",
            "text_deduped",
        )
    )


#: modulus of the universal hash family shared by bbit_minhash_pairs
#: and its DuckDB oracle (both engines compute identical values)
_UH_PRIME = 2147483647


def _uh_constants(n: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) for the universal-hash family: derived
    from md5 of the index so both engines can bake the same literals;
    a_j is odd and < 2^30 (a_j * h < 2^62 for 32-bit base hashes —
    no int64 overflow on either engine)."""
    import hashlib

    out = []
    for j in range(n):
        a = (
            int(hashlib.md5(f"uhA{j}".encode()).hexdigest()[:8], 16)
            & 0x3FFFFFFF
        ) | 1
        b = int(hashlib.md5(f"uhB{j}".encode()).hexdigest()[:8], 16) % _UH_PRIME
        out.append((a, b))
    return out


def containment_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_containment: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment
    C(A in B) = |S(A) & S(B)| / |S(A)| (Broder 1997's second measure).
    Resemblance (Jaccard) misses the quote/subset case — a short doc
    fully embedded in a long one scores low Jaccard but containment
    ~1.0 — which is exactly the "document quotes another" relation a
    training-corpus dedup wants to find before packing both.

    Shape: distinct k-gram shingles per doc (in-row), df-capped
    inverted index (boilerplate shingles dropped BEFORE the self-join,
    the LSH bucket-cap discipline), one join + one groupBy for the
    intersections, sizes joined back (broadcast-able aggregate).
    Output both directions' containments as exact integer sufficient
    stats + one rounded ratio each: (doc_a, doc_b, n_shared, size_a,
    size_b, cont_a_in_b, cont_b_in_a), doc_a < doc_b, filtered to
    max(cont) >= ``min_containment``."""
    from flow_indexer_spark.functions.inrow import bind

    def _grams(tok):
        # tok is BOUND (one split per row): an unbound tokens() here
        # re-runs the whole split per gram index — O(len^2) per row
        # (the genmetrics/inrow.py lesson; measured 10.8 -> ~4 s)
        idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
        return F.when(
            F.size(tok) >= k,
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k))
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(bind(tokens(text_col), _grams)).alias("gram"),
    )
    sizes = sh.groupBy("doc").agg(F.count("*").cast("bigint").alias("size"))
    df_ok = (
        sh.groupBy("gram")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("gram")
    )
    sh = sh.join(df_ok, "gram", "left_semi")
    a = sh.select("gram", F.col("doc").alias("doc_a"))
    b = sh.select("gram", F.col("doc").alias("doc_b"))
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "size": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "size": "size_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "size_a",
            "size_b",
            F.round(F.col("n_shared") / F.col("size_a"), 9).alias("cont_a_in_b"),
            F.round(F.col("n_shared") / F.col("size_b"), 9).alias("cont_b_in_a"),
        )
    )
    return out.filter(
        F.greatest("cont_a_in_b", "cont_b_in_a") >= F.lit(min_containment)
    )


def bbit_minhash_pairs(
    pairs: DataFrame,
    a_col: str = "cand",
    b_col: str = "ref",
    id_col: str = "pair",
    n_hashes: int = 32,
    b_bits: int = 2,
) -> DataFrame:
    """b-bit minwise hashing (Li & Koenig, CACM 2011): store only the
    lowest ``b_bits`` of each of ``n_hashes`` minhashes and estimate
    resemblance from the collision fraction — 1/(32/b)th the sketch
    memory of full minhash, the difference between fitting a 100 TB
    corpus sketch in executor memory or not.

    For each pair this computes, ALL in-row (no shuffle beyond the
    input): ``n_match`` = collision count of the b-bit values (exact
    int), the estimator s_hat = (c - c0)/(1 - c0) with c = n_match/n
    and c0 = 2^-b (the random-collision floor), and the EXACT token-set
    Jaccard (inter/union ints + ratio) as the ground truth column the
    estimator is judged against.

    Hash family (round-5 rework, ~1.6x): ONE md5 per distinct token
    (the 32-bit base hash, bound once per side via functions/inrow
    bind), then each of the ``n_hashes`` signatures is a universal
    hash (a_j * h + b_j) mod 2^31-1 over the base array — pure long
    arithmetic (a_j < 2^30 keeps products inside int64).  The old
    family re-ran md5 per (token, signature): n_hashes x the md5
    cost for identical estimator statistics."""
    if n_hashes < 1 or not 1 <= b_bits <= 16:
        raise ValueError(f"need n_hashes >= 1, 1 <= b_bits <= 16")
    from flow_indexer_spark.functions.inrow import bind

    mod = 1 << b_bits
    consts = _uh_constants(n_hashes)

    def _uh(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_UH_PRIME)

    def minima(hashes: Column) -> Column:
        # n_hashes universal-hash minima over the BASE hash array —
        # pure long arithmetic per element; the md5 ran once per token
        return F.array(
            *[
                F.array_min(F.transform(hashes, _uh(a, b)))
                for a, b in consts
            ]
        )

    def body(ta: Column) -> Column:
        def inner(tb: Column) -> Column:
            def with_ha(ha: Column) -> Column:
                def with_hb(hb: Column) -> Column:
                    n_match = F.aggregate(
                        F.zip_with(
                            minima(ha),
                            minima(hb),
                            lambda x, y: F.when(
                                x % F.lit(mod) == y % F.lit(mod), 1
                            ).otherwise(0),
                        ),
                        F.lit(0),
                        lambda acc, v: acc + v,
                    )
                    return F.struct(
                        n_match.cast("bigint").alias("n_match"),
                        F.size(F.array_intersect(ta, tb))
                        .cast("bigint")
                        .alias("n_inter"),
                        F.size(F.array_union(ta, tb))
                        .cast("bigint")
                        .alias("n_union"),
                    )

                return bind(
                    F.transform(tb, lambda x: md5_int32(x)), with_hb
                )

            return bind(F.transform(ta, lambda x: md5_int32(x)), with_ha)

        return bind(F.array_distinct(tokens(b_col)), inner)

    stats = bind(F.array_distinct(tokens(a_col)), body)
    c0 = 1.0 / mod
    c = F.col("n_match") / F.lit(float(n_hashes))
    return pairs.select(
        F.col(id_col).alias("pair"), stats.alias("_s")
    ).select(
        "pair",
        F.col("_s.n_match").alias("n_match"),
        F.col("_s.n_inter").alias("n_inter"),
        F.col("_s.n_union").alias("n_union"),
    ).select(
        "pair",
        "n_match",
        "n_inter",
        "n_union",
        F.round((c - F.lit(c0)) / F.lit(1.0 - c0), 9).alias("s_bbit"),
        F.round(F.col("n_inter") / F.col("n_union"), 9).alias("jaccard"),
    )


def lsh_tuning_curve(
    pairs: DataFrame,
    a_col: str = "cand",
    b_col: str = "ref",
    n_bands: int = 4,
    rows_per_band: int = 2,
    n_deciles: int = 10,
) -> DataFrame:
    """The banded-LSH S-curve, VALIDATED against the corpus: for
    labeled pairs, the analytic collision probability
    P(collide) = 1 - (1 - s^r)^b at the pair's exact Jaccard s versus
    the OBSERVED band-collision rate under the configured
    (n_bands, rows_per_band) — the tuning report that says whether the
    dedup tier's threshold knob actually sits where the theory says
    before committing a 100 TB pass to it.

    All in-row per pair (token-set Jaccard, the same md5 minhash bands
    the production path uses, the analytic curve as a fixed-order
    polynomial — no pow()); aggregated per Jaccard decile with
    per-pair predictions quantized to the 1e-9 lattice so the mean is
    an order-free exact sum.  Output per decile: (decile, n_pairs,
    mean_jaccard, mean_predicted, observed_rate)."""
    if n_bands < 1 or rows_per_band < 1 or n_deciles < 1:
        raise ValueError("n_bands, rows_per_band, n_deciles must be >= 1")
    ta, tb = tokens(a_col), tokens(b_col)
    sa, sb = F.array_distinct(ta), F.array_distinct(tb)
    inter = F.size(F.array_intersect(sa, sb)).cast("bigint")
    union = F.size(F.array_union(sa, sb)).cast("bigint")
    j = inter / union
    # analytic S-curve with fixed association, no libm pow: u = 1-s^r
    # by repeated multiplication, then 1 - u^b the same way
    sr = j
    for _ in range(rows_per_band - 1):
        sr = sr * j
    u = F.lit(1.0) - sr
    ub = u
    for _ in range(n_bands - 1):
        ub = ub * u
    pred = F.lit(1.0) - ub
    bands_a = minhash_signature(a_col, n_bands, rows_per_band)
    bands_b = minhash_signature(b_col, n_bands, rows_per_band)
    collided = None
    for ba, bb in zip(bands_a, bands_b):
        hit = ba.eqNullSafe(bb)
        collided = hit if collided is None else (collided | hit)
    per_pair = pairs.select(
        F.least(
            F.lit(n_deciles - 1), F.floor(j * n_deciles).cast("int")
        ).alias("decile"),
        F.round(j * 1e9).cast("bigint").alias("j_u"),
        F.round(pred * 1e9).cast("bigint").alias("p_u"),
        F.when(collided, 1).otherwise(0).cast("bigint").alias("hit"),
    ).filter(F.col("j_u").isNotNull())  # empty-token pairs drop out
    return per_pair.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.sum("j_u") / (F.count("*") * F.lit(1e9)), 9).alias(
            "mean_jaccard"
        ),
        F.round(F.sum("p_u") / (F.count("*") * F.lit(1e9)), 9).alias(
            "mean_predicted"
        ),
        F.round(F.sum("hit") / F.count("*"), 9).alias("observed_rate"),
    )
