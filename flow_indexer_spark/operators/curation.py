"""Corpus curation: deterministic splits and per-group quota sampling.

Training-data pipelines need two operations the reference never had
(its corpus is logs, not training corpora) but that sit naturally next
to the dedup suite: assigning every document to a train/val/test split,
and capping how many documents any one group (source/domain/language)
contributes — both MUST be deterministic (re-runs and backfills land
every doc in the same split) and driver-free (no rand(), no collect).

Both use the md5-derived 32-bit hash from operators.dedup so the DuckDB
oracle twins in ``__spark_entry__`` compute bit-identical assignments;
swap xxhash64 in at production scale, topology unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from flow_indexer_spark.operators.dedup import md5_int32

#: hash-space resolution for split fractions (1e-4 granularity)
_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign a deterministic split label per row: bucket =
    hash(salt || id) mod 10000, carved into cumulative weight ranges.

    Pure in-row projection (no shuffle, no rand()): the same id always
    lands in the same split across runs, machines, and engines — the
    property that keeps eval sets untainted across corpus rebuilds.
    Weights are normalized; the last split absorbs rounding remainder.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    # null ids must not null-propagate through concat (a null bucket would
    # silently land every null-id row in the LAST split); coalesce to ''
    # so they hash deterministically like any other value.
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    bucket = md5_int32(F.concat(F.lit(salt), key)) % _BUCKETS
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = bucket < int(round(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def per_group_cap(
    df: DataFrame,
    group_col: str = "source",
    n: int = 100,
    order_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "cap",
    prefilter: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per group — domain/source balancing.

    Selection order is ``order_col`` if given (keep the "best" n by that
    column ascending), else a deterministic hash shuffle (uniform sample
    without rand()); ``id_col`` breaks ties so the kept set is unique.

    The exact path is one row_number window per group — each group sorts
    within one task, fine for bounded groups. ``prefilter=True`` is the
    hot-group scale path: join per-group counts (one partial-agg shuffle)
    and pre-prune to the smallest hash prefix expected to hold ~4n rows
    before the window, so a 10^9-row group sorts only ~4n survivors in
    its window task instead of 10^9. The prefilter keeps every row of
    groups <= 4n and is ordering-consistent with the final window (both
    use the hash), so exact-vs-prefilter results are identical whenever
    >= n rows pass the prefilter — expected 4n pass, so the failure
    probability is Chernoff-small (< e^-n); differential-tested.
    """
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    order = [F.col(order_col), F.col(id_col)] if order_col else [h, F.col(id_col)]
    work = df
    if prefilter and order_col is None:
        counts = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
        # keep hash < threshold scaled so ~4n rows survive per group;
        # h is uniform on [0, 2^32)
        thresh = (
            F.when(F.col("_gn") <= F.lit(4 * n), F.lit(1 << 32))
            .otherwise((F.lit(float(4 * n)) / F.col("_gn")) * F.lit(float(1 << 32)))
            .cast("bigint")
        )
        work = (
            df.join(counts, group_col)
            .filter(h < thresh)
            .drop("_gn")
        )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        work.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "source",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum subsampling — how a training mix applies
    domain weights ("keep 30% of crawl, all of reference"). A row
    survives iff hash(salt || id) mod 10000 < fraction(stratum) * 10000:
    pure in-row projection, no rand(), no shuffle; re-runs/backfills keep
    exactly the same rows, and a row's fate never depends on other rows
    (unlike per_group_cap, which targets a COUNT rather than a rate).
    Strata absent from ``fractions`` keep ``default_fraction``. The same
    id is kept consistently across strata-fraction changes that don't
    cross its bucket — raising a fraction only ADDS rows (monotone), the
    property that makes incremental mix re-weighting cheap.
    """
    fractions = fractions or {}
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    bucket = md5_int32(F.concat(F.lit(salt), key)) % _BUCKETS
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        cut = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    cut_default = F.lit(int(round(default_fraction * _BUCKETS)))
    thresh = cut_default if thresh is None else thresh.otherwise(cut_default)
    return df.filter(bucket < thresh)


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): lay documents end to
    end in a deterministic order and cut the stream every ``budget``
    tokens. Returns every doc with (shard, pack_id, offset, n_tokens):
    pack_id is the training sequence the doc STARTS in and offset its
    token position there; a doc may straddle into the next pack — exactly
    the concat+chunk semantics LLM pretraining loaders use (no bin-packing
    waste, no per-doc padding).

    Scale shape: a single global running sum would serialize into one
    window task, so the stream is sharded by id hash — each shard is an
    independent token stream packed in (hash, id) order, and pack ids are
    namespaced by shard. Shards ≈ executor count keeps every window
    partition a ~1/n_shards slice of the corpus; the order inside a shard
    is deterministic (hash, then id for ties), so re-runs reproduce the
    same packs bit-for-bit.
    """
    from flow_indexer_spark.operators.dedup import tokens

    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else F.size(tokens(text_col))
    ).cast("bigint")
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        h.alias("_h"),
        (h % n_shards).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        id_col,
        "n_tokens",
        "shard",
        F.concat_ws("-", "shard", F.floor(pos / budget)).alias("pack_id"),
        (pos % budget).alias("offset"),
    )


def sliding_window_chunks(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the context-window shaping step
    for long-document training/retrieval (stride < size keeps every token
    covered by at least one window with overlap size-stride). Pure in-row
    generate+explode: start offsets 0, stride, 2*stride … < n_tokens, each
    sliced and hashed in the same projection — no shuffle, no Python; a
    100 TB corpus chunks at scan speed.

    Output per chunk: (id, chunk_idx, start_tok, n_tokens, chunk_hash).
    Tail chunks are short (never empty); empty docs yield no rows.
    """
    from flow_indexer_spark.operators.dedup import tokens

    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    tok = tokens(text_col)
    d = df.select(F.col(id_col), tok.alias("_tok"), F.size(tok).alias("_n"))
    last = (F.floor((F.col("_n") - 1) / stride) * stride).cast("int")
    starts = F.sequence(F.lit(0), last, F.lit(stride))
    chunk = F.slice("_tok", F.col("start_tok") + 1, size)
    return (
        d.filter(F.col("_n") > 0)
        .select(id_col, "_tok", "_n", F.explode(starts).alias("start_tok"))
        .select(
            id_col,
            (F.col("start_tok") / stride).cast("int").alias("chunk_idx"),
            "start_tok",
            F.least(F.lit(size), F.col("_n") - F.col("start_tok"))
            .cast("int")
            .alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    window: int = 8,
    mask_bits: int = 5,
    base: int = 31,
    modulus: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (CDC): cut a document wherever the
    rolling hash of the trailing ``window`` characters lands on a
    ``mask_bits``-zero boundary — so chunk boundaries are a function of
    LOCAL content, and an insertion/deletion only reshuffles the chunks
    it touches (fixed-offset chunking shifts every later boundary; CDC
    is what makes chunk-level dedup robust to edits — the LBFS/rsync
    family of chunkers, Muthitacharoen et al., SOSP 2001).

    Hash: h(p) = sum_{i=0..w-1} codepoint(c[p-i]) * base^i  (mod
    modulus), a cut AFTER position p when h(p) has ``mask_bits`` low
    zero bits. Expected chunk length ~2^mask_bits. The polynomial form
    (not a Rabin LFSR) keeps the hash exactly replayable in plain SQL —
    the oracle twin computes the same integers. No min/max chunk-size
    clamps in this canonical form: clamping is a greedy sequential rule
    (each boundary depends on the previous), kept out so every boundary
    is a pure local function; the pytest covers the clamped variant via
    post-merge of runt chunks if a caller needs it.

    Scale shape: the hash pass is one in-row numpy convolution per doc
    inside an Arrow-batched UDF (O(L*w) C loops, no Python per-char
    work), spans explode in the same projection, and the chunk slice is
    a JVM substring — zero shuffles end to end; a 100 TB corpus chunks
    at scan speed.

    Output per chunk: (id, chunk_idx, start, chunk_len). Empty/null
    docs yield no rows; the final position never cuts (a cut at L-1
    would create an empty tail chunk).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    if window < 2:
        raise ValueError("window must be >= 2")
    if mask_bits <= 0 or (1 << mask_bits) > modulus:
        raise ValueError("mask_bits must be positive and < log2(modulus)")
    weights = [base**i for i in range(window)]  # Python ints: exact
    if 0x110000 * sum(weights) >= 2**63:
        raise ValueError("base**window too large: hash would overflow int64")
    kernel = np.array(weights, dtype=np.int64)
    mask = (1 << mask_bits) - 1

    span_t = ArrayType(
        StructType(
            [StructField("start", IntegerType()), StructField("chunk_len", IntegerType())]
        )
    )

    @pandas_udf(span_t)
    def spans(texts: pd.Series) -> pd.Series:
        def one(s):
            if not s:
                return []
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            L = codes.shape[0]
            if L <= window:
                return [(0, L)]
            # h[p] for p = window-1 .. L-1 via polynomial convolution
            h = np.convolve(codes, kernel)[window - 1 : L] % modulus
            cut_p = np.nonzero((h & mask) == 0)[0] + (window - 1)
            cut_p = cut_p[cut_p < L - 1]  # never cut at the last char
            starts = np.concatenate(([0], cut_p + 1))
            ends = np.concatenate((cut_p + 1, [L]))
            return [(int(a), int(b - a)) for a, b in zip(starts, ends)]

        return texts.map(one)

    d = df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    return (
        d.filter(F.length("_t") > 0)
        .select(id_col, F.posexplode(spans(F.col("_t"))).alias("chunk_idx", "_s"))
        .select(
            id_col,
            F.col("chunk_idx").cast("int"),
            F.col("_s.start").alias("start"),
            F.col("_s.chunk_len").alias("chunk_len"),
        )
    )


def boilerplate_fraction(
    df: DataFrame,
    n: int = 8,
    min_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate score per document: the fraction of its
    distinct token n-grams that occur in more than ``min_df`` documents
    (headers, footers, license blurbs — C4/CCNet-style cleanup evidence).
    Complements operators.textstats.repetition_signals, which is doc-LOCAL.

    Topology: explode distinct grams (in-row), one partial-agg shuffle for
    gram document-frequency, then join docs against only the COMMON grams
    (df > min_df) — a set at most total_grams/min_df big, so it is
    broadcast. The full gram table is never joined against itself.
    """
    from flow_indexer_spark.operators.dedup import fan_out, token_ngram_hashes

    # grams are 64-bit-hashed in the same in-row projection — string-free
    # (dedup.token_ngram_hashes: per-token hash + rotate-xor fold, no
    # per-gram string allocation): the df-count shuffle and the broadcast
    # build move longs, not n-token strings (distinctness is preserved —
    # in-doc 64-bit collisions are ~|G|^2/2^64)
    g = fan_out(df).select(
        F.col(id_col),
        token_ngram_hashes(text_col, n).alias("_grams"),
    ).filter(F.size("_grams") > 0)
    e = g.select(id_col, F.explode("_grams").alias("_g"))
    common = (
        e.groupBy("_g")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > min_df)
        .select("_g", F.lit(1).alias("_c"))
    )
    # one broadcast left-join marks common grams; n_grams and n_common
    # then come from the SAME aggregation — two corpus passes total (df
    # counts + scoring), not three (no separate per-doc size branch)
    return (
        e.join(F.broadcast(common), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_c").alias("n_common"),
        )
        .select(
            id_col,
            "n_grams",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_grams")).alias(
                "boilerplate_ratio"
            ),
        )
    )


def quantile_band_filter(
    df: DataFrame,
    value_col: str = "n_chars",
    lo: float = 0.25,
    hi: float = 0.75,
) -> DataFrame:
    """Keep rows whose ``value_col`` falls inside the corpus's exact
    discrete [lo, hi] quantile band — the outlier trim step quality
    pipelines run on length/score columns (too-short and too-long docs
    dropped by the corpus's OWN distribution, not a magic constant).

    Exact quantiles without a global sort: aggregate to per-VALUE counts
    (one shuffle, domain-sized not corpus-sized), running-sum over the
    sorted distinct values (a window over the value domain — thousands of
    rows, never the corpus), and the thresholds are the smallest values
    whose cumulative count reaches ceil(q*N) (discrete/type-1 quantile —
    the definition the DuckDB oracle twin states literally, so both
    engines agree bit-for-bit where interpolating approximations differ).
    Thresholds are a 1-row broadcast joined back as a filter.
    """
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError("need 0 <= lo <= hi <= 1")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_n"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "_v", F.sum("_n").over(w).alias("_cs"), F.sum("_n").over(
            Window.partitionBy()
        ).alias("_total")
    )
    th = cum.agg(
        F.min(F.when(F.col("_cs") >= F.ceil(lo * F.col("_total")), F.col("_v"))).alias("_lo"),
        F.min(F.when(F.col("_cs") >= F.ceil(hi * F.col("_total")), F.col("_v"))).alias("_hi"),
    )
    return df.join(F.broadcast(th)).filter(
        F.col(value_col).between(F.col("_lo"), F.col("_hi"))
    ).drop("_lo", "_hi")


def cross_split_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    train_split: str = "train",
    eval_splits: tuple[str, ...] = ("val", "test"),
    n: int = 8,
    max_ngram_df: int | None = 1000,
) -> DataFrame:
    """Benchmark decontamination: for every eval-split document, count
    how many of its token n-grams also occur in ANY train document — the
    standard eval-leakage check run before training.

    Topology is the inverted-index cross join (the dedup candidate
    pattern restricted to train x eval, so the join is bipartite — no
    n^2 within either side): explode n-grams per side, join on the gram,
    aggregate per eval doc. ``max_ngram_df`` drops boilerplate grams
    from evidence (a gram in a million train docs indicts nothing and
    would dominate the join output). Returns one row per CONTAMINATED
    eval doc: (id, split, n_shared_grams, n_grams, contamination_ratio,
    example_train_doc) — eval docs with zero shared grams are absent
    (anti-join them for the clean list).
    """
    from flow_indexer_spark.operators.dedup import fan_out, token_ngrams

    grams = fan_out(df).select(
        F.col(id_col),
        F.col(split_col),
        token_ngrams(text_col, n).alias("_grams"),
    )
    melted = grams.select(
        id_col, split_col, F.explode("_grams").alias("_g")
    )
    if max_ngram_df is not None:
        ok = (
            melted.groupBy("_g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_ngram_df)
            .select("_g")
        )
        melted = melted.join(ok, "_g")
    train = melted.filter(F.col(split_col) == train_split).select(
        "_g", F.col(id_col).alias("_train_id")
    )
    evals = melted.filter(F.col(split_col).isin(list(eval_splits)))
    hits = evals.join(train, "_g").groupBy(id_col, split_col).agg(
        F.count_distinct("_g").alias("n_shared_grams"),
        F.min("_train_id").alias("example_train_doc"),
    )
    totals = grams.select(id_col, F.size("_grams").alias("n_grams"))
    return (
        hits.join(totals, id_col)
        .withColumn(
            "contamination_ratio",
            F.col("n_shared_grams").cast("double") / F.greatest("n_grams", F.lit(1)),
        )
        .select(
            id_col, split_col, "n_shared_grams", "n_grams",
            "contamination_ratio", "example_train_doc",
        )
    )


def mix_to_token_budget(
    df: DataFrame,
    budget: int,
    shares: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Sample the corpus down to a total token ``budget`` split across
    sources by target ``shares`` — the mixture-weighting step of a
    pretraining data recipe ("10% code, 60% web, 30% books, 500B tokens
    total"). Where :func:`stratified_sample` APPLIES given per-source
    fractions, this DERIVES them from the data: fraction(source) =
    min(1, share * budget / tokens_in_source), so an over-supplied
    source is downsampled to its token allocation and an under-supplied
    one is kept whole (its deficit is reported, not silently
    redistributed — recipe math belongs to the caller). Shares are
    ABSOLUTE budget fractions, taken as given: they may sum below 1
    (the remainder is deliberately unallocated) but never above —
    silently rescaling {'code': 0.1} to 1.0 would hand one source the
    whole budget, so an over-committed recipe raises instead.

    Row selection reuses the deterministic hash-bucket rule (row kept iff
    hash(salt||id) mod 10000 < floor(fraction*10000)): re-runs keep the
    same rows, raising a share only adds rows, and the DuckDB oracle twin
    reproduces the assignment bit-for-bit.

    Topology: one partial-agg shuffle for per-source token totals (a
    sources-sized table — tens of rows at any corpus size), broadcast
    back as the per-row threshold, filter in-row. The corpus itself is
    never shuffled. Output adds ``mix_fraction`` for audit.
    """
    from flow_indexer_spark.operators.dedup import tokens

    if budget <= 0:
        raise ValueError("budget must be positive")
    total_share = sum(shares.values())
    if total_share <= 0:
        raise ValueError("shares must sum to a positive value")
    if total_share > 1.0 + 1e-9 or any(s < 0 for s in shares.values()):
        raise ValueError(
            "shares are absolute budget fractions: each >= 0, sum <= 1 "
            f"(got sum={total_share})"
        )
    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else F.size(tokens(text_col))
    ).cast("bigint")
    share_expr = None
    for name, s in shares.items():
        cond = F.col(strata_col) == name
        val = F.lit(float(s))
        share_expr = (
            F.when(cond, val) if share_expr is None
            else share_expr.when(cond, val)
        )
    share_expr = share_expr.otherwise(F.lit(0.0))
    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(n_tok).alias("_src_tokens"))
        .withColumn(
            "mix_fraction",
            F.least(
                F.lit(1.0),
                share_expr * F.lit(float(budget))
                / F.col("_src_tokens").cast("double"),
            ),
        )
        .drop("_src_tokens")
    )
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    bucket = md5_int32(F.concat(F.lit(salt), key)) % _BUCKETS
    return (
        df.join(F.broadcast(totals), strata_col)
        .filter(bucket < F.floor(F.col("mix_fraction") * _BUCKETS))
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "order",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global pseudo-random total order — the final
    shuffle before a corpus is written for training (SGD wants an order
    uncorrelated with source/time; reproducibility wants the SAME order
    every run, which ``rand()`` and ``ORDER BY rand()`` do not give).

    Assigns every row ``order_rank`` = its 0-based position in the
    corpus ordered by (hash(salt||id), id). A naive global
    ``row_number()`` serializes the corpus through ONE window task; this
    uses the scalable two-phase rank: the 32-bit hash space is cut into
    ``n_buckets`` contiguous ranges (bucket = h >> k, order-preserving),
    ranks are assigned per-bucket in parallel, and each bucket's offset
    is the running sum of lower buckets' counts — an n_buckets-row
    aggregate, windowed on the driver-free side and broadcast back.
    One corpus shuffle total (the per-bucket window); the rank is
    bit-stable across runs, engines, and re-partitionings PROVIDED ids
    are unique (the doc-corpus invariant everywhere else in this repo):
    rows tying on the full (hash, id) sort key — duplicate ids, or more
    than one null id — still get valid distinct ranks, but which tied
    row gets which rank is engine/partitioning-dependent.

    Writing ``df.repartitionByRange('order_rank').sortWithinPartitions(
    'order_rank')`` then yields globally ordered, evenly sized files.
    """
    if n_buckets <= 0 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a positive power of two")
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    h = md5_int32(F.concat(F.lit(salt), key))
    # md5_int32 is uniform on [0, 2^32); >> keeps bucket order == hash order
    shift = 32 - n_buckets.bit_length() + 1
    d = df.withColumn("_h", h).withColumn(
        "_b", F.shiftright(F.col("_h"), shift).cast("int")
    )
    # tiebreak on the raw id (native type order, matching the oracle's
    # ROW_NUMBER ... ORDER BY h, id), nulls pinned first explicitly —
    # 32-bit hash-prefix collisions between distinct ids DO occur at
    # corpus scale (~n^2/2^33 pairs) and a string-cast tiebreak would
    # rank "10" before "9"
    wb = Window.partitionBy("_b").orderBy(
        "_h", F.col(id_col).asc_nulls_first()
    )
    offsets = (
        d.groupBy("_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    return (
        d.join(F.broadcast(offsets), "_b")
        .withColumn(
            "order_rank",
            (F.row_number().over(wb) - 1 + F.col("_off")).cast("bigint"),
        )
        .drop("_h", "_b", "_off")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: every id labeled
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    different content hash) or ``unchanged`` — the audit step between
    corpus rebuilds ("what did this crawl refresh actually touch"), and
    the input to incremental downstream refresh (re-embed / re-index only
    added+changed).

    One full-outer hash join on the id (both sides reduced to
    (id, content-hash) projections first, so the join moves two hashes
    per row, not documents); counts per kind are a cheap follow-up agg
    the caller runs on this output.
    """
    o = old.select(
        F.col(id_col), F.md5(text_col).alias("_oh")
    )
    n = new.select(
        F.col(id_col), F.md5(text_col).alias("_nh")
    )
    kind = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(id_col, kind.alias("change"))
    )


def temperature_mix(
    df: DataFrame,
    budget: int,
    tau: float = 0.7,
    strata_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based source mixing (the mT5/multilingual recipe):
    target share_i ∝ tokens_i^tau — tau=1 keeps natural proportions,
    tau→0 flattens toward uniform, lifting low-resource sources without
    hand-written share tables. Shares are then applied exactly like
    :func:`mix_to_token_budget`: fraction_i = min(1, share_i * budget /
    tokens_i), deterministic hash-bucket row selection, corpus never
    shuffled. Two sources-sized aggregations (totals + the tau-power
    normalizer) broadcast back; output carries ``mix_fraction``.
    """
    from flow_indexer_spark.operators.dedup import tokens

    if budget <= 0:
        raise ValueError("budget must be positive")
    if tau <= 0:
        raise ValueError("tau must be positive (tau->0 approaches uniform)")
    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else F.size(tokens(text_col))
    ).cast("bigint")
    totals = df.groupBy(strata_col).agg(F.sum(n_tok).alias("_t"))
    z = totals.agg(
        F.sum(F.pow(F.col("_t").cast("double"), F.lit(float(tau)))).alias("_z")
    )
    fr = (
        totals.join(F.broadcast(z))
        .withColumn(
            "mix_fraction",
            F.least(
                F.lit(1.0),
                F.pow(F.col("_t").cast("double"), F.lit(float(tau)))
                / F.col("_z")
                * F.lit(float(budget))
                / F.col("_t").cast("double"),
            ),
        )
        .drop("_t", "_z")
    )
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    bucket = md5_int32(F.concat(F.lit(salt), key)) % _BUCKETS
    return (
        df.join(F.broadcast(fr), strata_col)
        .filter(bucket < F.floor(F.col("mix_fraction") * _BUCKETS))
    )


def _gram_buckets(text_col: str, max_n: int, buckets: int) -> "F.Column":
    """Hashed bag-of-n-grams feature ids for one document, sizes 1..max_n
    combined (the DSIR feature space): every token n-gram — NOT distinct,
    counts matter — hashed to ``buckets`` ids with the portable md5 hash.
    Pure in-row transform; short docs contribute only the sizes they fit."""
    from flow_indexer_spark.functions.inrow import bind
    from flow_indexer_spark.operators.dedup import tokens

    # NB: a two-arg lambda in F.transform is called as (element, INDEX) —
    # a `lambda i, g=g:` default binding would silently receive the array
    # index as g. Bind the gram size via a factory closure instead.
    # The token array itself is bound once (functions/inrow.py): slicing
    # tokens(text) inside the lambda bodies would re-split the text per
    # gram index and size, O(max_n * len^2).
    def _all_grams(tok: "F.Column") -> "F.Column":
        def grams_of(g: int) -> "F.Column":
            idx = F.sequence(F.lit(1), F.size(tok) - (g - 1))
            return F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(tok, i, g))
            )

        parts = []
        for g in range(1, max_n + 1):
            parts.append(
                F.when(F.size(tok) >= g, grams_of(g)).otherwise(
                    F.array().cast("array<string>")
                )
            )
        return F.concat(*parts) if len(parts) > 1 else parts[0]

    allg = bind(tokens(text_col), _all_grams)
    return F.transform(allg, lambda s: md5_int32(s) % buckets)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    max_n: int = 2,
    buckets: int = 512,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., 2023):
    score every raw document by how target-like its hashed n-gram bag is,
    log w(x) = sum over gram features of log p_target(b) / log p_raw(b),
    with add-alpha smoothed bucket distributions estimated from the two
    corpora themselves. High logw = looks like the target domain.

    Topology (the part that must survive 10^12 rows): the two feature
    distributions are ONE groupBy(bucket) count each — at most ``buckets``
    rows out, map-side combined — and the log-ratio table (<= buckets
    rows) is **broadcast** back; the per-doc score is then an
    explode + broadcast-join + per-doc sum, i.e. a single shuffle of
    (doc, partial-sum) pairs. Nothing driver-side, nothing O(vocab).

    Returns (id, n_feats, logw) with logw rounded to 9 dp so the DuckDB
    oracle twin (different summation order) lands on identical values.
    """
    if max_n < 1:
        raise ValueError("max_n must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed ratios divide by zero)")

    def dist(df: DataFrame, name: str) -> DataFrame:
        b = df.select(F.explode(_gram_buckets(text_col, max_n, buckets)).alias("b"))
        return b.groupBy("b").agg(F.count("*").alias(f"c_{name}"))

    r, t = dist(raw, "raw"), dist(target, "tgt")
    joined = r.join(t, "b", "full_outer").select(
        "b",
        F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
    )
    # Scalar totals via an unpartitioned window over the <=buckets-row
    # table: a cross-join against a separate .agg() would make Spark
    # re-execute BOTH corpus-scale gram-explode subtrees a second time
    # (verified via explain: 5 parquet scans -> 3 with this shape).
    w = Window.partitionBy()
    lam = joined.select(
        "b",
        (
            F.log(
                (F.col("c_tgt") + alpha)
                / (F.sum("c_tgt").over(w) + alpha * buckets)
            )
            - F.log(
                (F.col("c_raw") + alpha)
                / (F.sum("c_raw").over(w) + alpha * buckets)
            )
        ).alias("lam"),
    )
    feats = raw.select(
        F.col(id_col),
        F.explode_outer(_gram_buckets(text_col, max_n, buckets)).alias("b"),
    )
    return (
        feats.join(F.broadcast(lam), "b", "left")
        .groupBy(id_col)
        .agg(
            F.count("b").alias("n_feats"),
            F.round(F.coalesce(F.sum("lam"), F.lit(0.0)), 9).alias("logw"),
        )
    )


def dsir_sample(
    weighted: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    salt: str = "dsir",
) -> DataFrame:
    """Importance **resampling** over :func:`dsir_weights` output: draw
    ``n_docs`` docs without replacement with probability proportional to
    softmax(logw), via the Gumbel-top-k trick — key_i = logw_i + g_i,
    take the k largest. The Gumbel noise is hash-seeded
    (u = (md5(salt||id)+0.5)/2^32, g = -ln(-ln u)) so the draw is fully
    deterministic and reproducible across engines/backfills — no rand().

    orderBy(key).limit(k) compiles to TakeOrderedAndProject: each
    partition keeps k rows, no global sort. Returns the sampled rows
    plus their gumbel_key.
    """
    if n_docs <= 0:
        raise ValueError("n_docs must be positive")
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    u = (md5_int32(F.concat(F.lit(salt), key)) + 0.5) / F.lit(float(2**32))
    gumbel = -F.log(-F.log(u))
    return (
        weighted.withColumn(
            "gumbel_key", F.round(F.col(logw_col) + gumbel, 9)
        )
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(n_docs)
    )


def upsample_epochs(
    df: DataFrame,
    factors: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_factor: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """Per-source upsampling WITH replacement — the epoch/repeat knob of a
    data recipe ("repeat books 2.5 epochs, web once"; repeating
    low-resource sources a few epochs is near-free while >4 degrades,
    Muennighoff et al. 2023). :func:`mix_to_token_budget` can only keep a
    fraction <= 1 of a source; this is the other direction.

    factor 2.5 -> every doc appears twice, and the deterministic hash
    rule (hash(salt||id) mod 10000 < floor(0.5 * 10000)) grants half the
    docs a third copy — rerun-stable, engine-portable, no rand().
    factor 0 drops the source. Output repeats input rows with a 0-based
    ``epoch`` copy index, so downstream global shuffling
    (:func:`training_order` keyed on (id, epoch)) spreads the copies
    apart instead of emitting them adjacent.

    Topology: ZERO shuffles — the factor table folds into the projection
    as a CASE expression and the copies come from an in-row
    sequence+explode (guarded: a 0-copy row yields no sequence, never a
    descending one). Composes into any scan at scan speed.
    """
    if any(f < 0 for f in factors.values()) or default_factor < 0:
        raise ValueError("epoch factors must be >= 0")
    fac = None
    for name, f_val in factors.items():
        cond = F.col(strata_col) == name
        val = F.lit(float(f_val))
        fac = F.when(cond, val) if fac is None else fac.when(cond, val)
    fac = (
        fac.otherwise(F.lit(float(default_factor)))
        if fac is not None
        else F.lit(float(default_factor))
    )
    whole = F.floor(fac).cast("int")
    frac = fac - whole
    key = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    extra = (
        md5_int32(F.concat(F.lit(salt), key)) % _BUCKETS
        < F.floor(frac * _BUCKETS)
    ).cast("int")
    n_copies = whole + extra
    return df.withColumn(
        "epoch",
        F.explode(
            F.when(n_copies >= 1, F.sequence(F.lit(0), n_copies - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    score_col: str,
    max_pairs_per_group: int = 3,
    min_margin: float = 0.0,
) -> DataFrame:
    """DPO/RLHF preference-pair construction: within each group (a
    prompt's candidate responses, a source's scored documents), pair the
    r-th best row with the r-th worst, for r = 1..max_pairs_per_group.

    Output: group_cols + (pair_rank, chosen_id, rejected_id,
    chosen_score, rejected_score, margin), keeping only pairs where
    chosen strictly beats rejected by at least ``min_margin``.

    Determinism: both rankings order by (score, id) — the bottom window
    is the EXACT reverse of the top window, so top-rank r and
    bottom-rank r name the same total order from opposite ends; the
    ``2*r <= n`` guard then guarantees a row is never paired with
    itself, ties included. No rand(), so backfills regenerate identical
    pairs.

    Scale: two window sorts over ONE hash exchange on the group key
    (huge groups stay out of executor memory — no collect_list), then an
    equi-join of the two already-filtered rank heads (<= k rows per
    group each). Skewed prompt groups behave: the window is a sort
    within a partition, not a per-key reduction onto one task.
    """
    if max_pairs_per_group < 1:
        raise ValueError("max_pairs_per_group must be >= 1")
    score = F.col(score_col).cast("double")
    w_top = Window.partitionBy(*group_cols).orderBy(
        score.desc(), F.col(id_col).asc()
    )
    w_bot = Window.partitionBy(*group_cols).orderBy(
        score.asc(), F.col(id_col).desc()
    )
    ranked = df.select(
        *group_cols,
        F.col(id_col).alias("_id"),
        score.alias("_score"),
        F.row_number().over(w_top).alias("_rt"),
        F.row_number().over(w_bot).alias("_rb"),
        F.count("*").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    k = F.lit(max_pairs_per_group)
    chosen = ranked.filter(
        (F.col("_rt") <= k) & (2 * F.col("_rt") <= F.col("_n"))
    ).select(
        *group_cols,
        F.col("_rt").alias("pair_rank"),
        F.col("_id").alias("chosen_id"),
        F.col("_score").alias("chosen_score"),
    )
    rejected = ranked.filter(
        (F.col("_rb") <= k) & (2 * F.col("_rb") <= F.col("_n"))
    ).select(
        *group_cols,
        F.col("_rb").alias("pair_rank"),
        F.col("_id").alias("rejected_id"),
        F.col("_score").alias("rejected_score"),
    )
    margin = F.col("chosen_score") - F.col("rejected_score")
    return (
        chosen.join(rejected, [*group_cols, "pair_rank"])
        .withColumn("margin", margin)
        .filter((F.col("margin") > 0) & (F.col("margin") >= float(min_margin)))
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    n_bands: int = 64,
    dp: int = 9,
) -> DataFrame:
    """Map every group's score distribution onto the GLOBAL score
    distribution by rank (quantile normalization, the microarray-
    classic made per-source): a quality model that scores source A
    systematically 0.1 higher than source B stops distorting a global
    threshold once each row's value is replaced by the global value at
    its within-group quantile.

    Per row: q = (rank_in_group - 0.5) / n_group (midpoint
    convention), target = the global order statistic at
    clamp(ceil(q * N), 1, N).  Ranks are exact integers with (value,
    id) tie-breaks, so the mapping is a deterministic SELECTION —
    no interpolation, no float folds.

    Scores are assumed in [0, 1] (the banded global rank uses
    floor(value * n_bands) range buckets — the `_prefix_below` shape:
    band offsets are a tiny broadcast, within-band windows
    partitioned; no corpus-sized single-task sort).  Group ranks are
    windows partitioned by group.  The final lookup is one bigint
    equi-join against the (global_rank -> value) table.

    Returns (group, id, value, norm_value).
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias("value"),
    )
    band = F.least(
        F.lit(n_bands - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") * n_bands)),
    ).cast("int")
    g = d.withColumn("_b", band)
    btot = g.groupBy("_b").agg(F.count("*").cast("bigint").alias("_bn"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "_b", F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_off")
    )
    wi = Window.partitionBy("_b").orderBy("value", "id")
    glob = g.join(F.broadcast(boff), "_b").select(
        F.col("value").alias("_gv"),
        (F.row_number().over(wi) + F.col("_off")).cast("bigint").alias(
            "_grank"
        ),
    )
    n_total = d.agg(F.count("*").cast("bigint").alias("_N"))
    wg = Window.partitionBy("group").orderBy("value", "id")
    ranked = (
        d.withColumn("_r", F.row_number().over(wg).cast("bigint"))
        .withColumn(
            "_ng", F.count("*").over(Window.partitionBy("group"))
        )
        .crossJoin(F.broadcast(n_total))
    )
    target = F.least(
        F.col("_N"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(
                (F.col("_r") - 0.5) / F.col("_ng") * F.col("_N")
            ).cast("bigint"),
        ),
    )
    ranked = ranked.withColumn("_t", target)
    return ranked.join(glob, ranked["_t"] == glob["_grank"]).select(
        "group",
        "id",
        "value",
        F.round(F.col("_gv"), dp).alias("norm_value"),
    )


def priority_sample(
    docs: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "ps0",
) -> DataFrame:
    """Weighted-without-replacement sampling by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): priority q_i = w_i / u_i
    with u_i uniform in (0, 1]; the k highest-priority rows per group
    are an unbiased weighted sample with near-optimal variance.
    Temperature/stratified sampling upstream picks BETWEEN groups;
    this is the principled pick WITHIN a group when rows carry an
    importance weight (quality score, length, dedup multiplicity).

    Determinism/portability: u_i is the md5-derived integer
    h in [0, 2^32) mapped to (h+1)/2^32, so the priority ORDER is the
    order of w_i * 2^32 / (h+1) — computed as an EXACT bigint
    ``(w * 2^32) div (h+1)`` (no float pow/log anywhere, unlike the
    exponential-key A-ES formulation whose u^(1/w) is libm-dependent);
    ties (possible after the floor) break by id.  One window per
    group, rank <= k; no global sort, no shuffle beyond the window.
    Weights must be positive integers (or integer-valued) bounded by
    ~2^20 so w << 32 stays inside int64."""
    if k < 1:
        raise ValueError("k must be >= 1")
    pri = docs.select(
        "*",
        md5_int32(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_h"),
    ).withColumn(
        "priority",
        F.expr(
            f"(CAST({weight_col} AS BIGINT) * 4294967296) div (_h + 1)"
        ),
    )
    win = Window.partitionBy(group_col).orderBy(
        F.desc("priority"), F.col(id_col)
    )
    return (
        pri.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_h", "_rk")
    )


def doremi_weights(
    losses: DataFrame,
    group_col: str,
    proxy_loss_col: str,
    ref_loss_col: str,
    eta: float = 1.0,
    dp: int = 9,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., NeurIPS 2023), the
    one-step exponentiated form: per domain, mean CLIPPED excess loss
    max(0, L_proxy - L_ref) — where the proxy model underperforms the
    reference, the domain is under-served and gets upweighted —
    then weights w_s proportional to exp(eta * excess_s), normalized
    over domains.

    Exactness: per-doc excess quantizes to the 1e-9 lattice (bigint,
    order-free group sums); the softmax runs over the handful of
    domain rows with its denominator folded in sorted domain order
    (the determinism idiom).  Output per domain: (group, n_docs,
    mean_excess, weight); weights sum to 1 up to the rounding grain."""
    exc = F.greatest(
        F.lit(0.0), F.col(proxy_loss_col) - F.col(ref_loss_col)
    )
    per = losses.select(
        F.col(group_col).alias("grp"),
        F.round(exc * 1e9).cast("bigint").alias("e_u"),
    ).groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("e_u").alias("_se"),
    )
    mean_exc = F.col("_se") / (F.col("n_docs") * F.lit(1e9))
    per = per.select(
        "grp", "n_docs", mean_exc.alias("_me"),
        F.exp(F.lit(eta) * mean_exc).alias("_w"),
    )
    denom = per.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "_w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_w"],
        ).alias("_z")
    )
    return (
        per.join(F.broadcast(denom))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.round("_me", dp).alias("mean_excess"),
            F.round(F.col("_w") / F.col("_z"), dp).alias("weight"),
        )
    )
