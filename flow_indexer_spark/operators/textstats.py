"""Text analysis for training-data curation: language ID, quality scores,
token counting, document fingerprinting.

These generalize the reference's per-document metrics (the "Wrote N unique
ips" counter, /root/reference/flowindexer/index.go:46-51) into the
per-document feature columns a corpus pipeline filters on. Everything is
an in-row projection over built-in functions — one scan, no shuffle, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from flow_indexer_spark.operators.dedup import tokens

#: tiny high-frequency English function-word list for the heuristics below
STOPWORDS = ["the", "a", "of", "and", "to"]

#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count(text_col: str | Column = "text") -> Column:
    return F.size(tokens(text_col))


def bpe_token_count(text_col: str | Column = "text") -> Column:
    """Token count under a BPE-style pre-split regex (native
    regexp_extract_all — JVM-side, the S6 grok pattern family)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def stopword_count(text_col: str | Column = "text", stopwords: list[str] | None = None) -> Column:
    stop = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(text_col), lambda x: F.array_contains(stop, x))).cast(
        "bigint"
    )


def quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc quality feature columns: token/char/stopword counts plus the
    derived ratios used for corpus filtering (mean token length, stopword
    ratio). One projection; ``extra_cols`` are carried through unchanged
    (e.g. a label column feeding :func:`fit_logreg`)."""
    n_tok = token_count(text_col)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_tok.alias("n_tokens"),
        F.length(text_col).alias("n_chars_raw"),
        stopword_count(text_col).alias("n_stopwords"),
        (F.length(text_col).cast("double") / F.greatest(n_tok, F.lit(1))).alias(
            "mean_token_len"
        ),
        (
            stopword_count(text_col).cast("double") / F.greatest(n_tok, F.lit(1))
        ).alias("stopword_ratio"),
    )


def lang_id(text_col: str | Column = "text", min_stopwords: int = 2) -> Column:
    """n-gram/function-word language heuristic: >=min_stopwords English
    function words -> 'en_like' else 'other'. (A real model would be a
    pandas-UDF over fasttext; the plumbing — one projection feeding a
    groupBy — is identical.)"""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = F.split(c, " ")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "and", "of"]])
    n = F.size(F.filter(tok, lambda x: F.array_contains(stop, x)))
    return F.when(n >= min_stopwords, "en_like").otherwise("other")


def fingerprint(text_col: str | Column = "text") -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — catches shuffled/duplicated-token copies that exact hash
    misses. (Winnowing/rolling-hash variants slot in the same shape.)"""
    toks = F.array_sort(F.array_distinct(tokens(text_col)))
    return F.md5(F.concat_ws(" ", toks))


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    standard "is this document degenerate boilerplate" curation family:

    * ``dup_line_fraction`` — fraction of non-empty lines that are
      repeats of an earlier line (1 - distinct/total).
    * ``dup_line_char_fraction`` — fraction of line characters belonging
      to repeat occurrences (1 - chars(distinct lines)/chars(all lines)).
    * ``top_ngram_count`` / ``top_ngram`` / ``top_ngram_char_fraction``
      — the most frequent token n-gram (ties -> lexicographically
      smallest), its occurrence count, and count*len(gram)/len(text).
    * ``rep_ngram_char_fraction`` — sum of count*len(gram) over n-grams
      occurring >= 2 times, over len(text). Overlapping occurrences
      count, as in Gopher, so the value may exceed 1 on degenerate text.

    Everything is ONE in-row projection (split / array_sort / a single
    fold over the sorted gram list that tracks run lengths — O(G log G)
    per doc, whole-stage codegen, no shuffle): at 100 TB this is a pure
    scan stage, unlike the groupBy-per-(doc,gram) formulation whose
    shuffle volume is the token count of the corpus.
    """
    lines = F.filter(F.split(text_col, "\n"), lambda x: x != "")
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x)
    )
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))

    from flow_indexer_spark.functions.inrow import bind

    def _grams(tok):
        # token array bound once — slicing tokens(text) directly in the
        # lambda body would re-split the text per gram index, O(len^2)
        idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
        return F.when(
            F.size(tok) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n))),
        ).otherwise(F.array().cast("array<string>"))

    srt = F.array_sort(bind(tokens(text_col), _grams))
    # fold over the sorted grams: current run (prev, run), best run seen
    # (strictly-greater update -> first/lexicographically-smallest max),
    # and chars in grams whose count reaches >= 2 (on the 2nd occurrence
    # credit both, afterwards one each -> run*len per repeated gram)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_run"),
        F.lit("").alias("best_gram"),
        F.lit(0).alias("rep_chars"),
    )

    def step(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(new_run, acc["best_run"]).alias("best_run"),
            F.when(new_run > acc["best_run"], x)
            .otherwise(acc["best_gram"])
            .alias("best_gram"),
            (
                acc["rep_chars"]
                + F.when(new_run == 2, F.length(x) * 2)
                .when(new_run > 2, F.length(x))
                .otherwise(F.lit(0))
            ).alias("rep_chars"),
        )

    st = F.aggregate(srt, zero, step)
    text_len = F.greatest(F.length(text_col), F.lit(1))
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        safe(n_lines - n_distinct_lines, n_lines).alias("dup_line_fraction"),
        safe(line_chars - distinct_line_chars, line_chars).alias(
            "dup_line_char_fraction"
        ),
        st["best_run"].alias("top_ngram_count"),
        st["best_gram"].alias("top_ngram"),
        (st["best_run"] * F.length(st["best_gram"]) / text_len.cast("double")).alias(
            "top_ngram_char_fraction"
        ),
        (st["rep_chars"] / text_len.cast("double")).alias("rep_ngram_char_fraction"),
    )


def top_distinctive_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k most distinctive terms per document by df-normalized term
    frequency (score = tf / document_frequency — TF-IDF's shape with a
    rational score instead of a log, so both engines compute it as one
    IEEE division with no libm variance).

    Topology: one shuffle for per-doc term counts (map-side combine),
    one for global document frequency, a join on term (broadcastable
    when the vocabulary is small; AQE picks it), and a per-doc top-k
    window — per-doc term sets are bounded by document length, so the
    window partition is never hot. Ties break on term text, making the
    kept set deterministic.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(docfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tf", "df", "score", F.col("_rn").alias("rank"))
    )


def quality_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Model-based quality filtering plumbing: a linear classifier over
    the in-row quality features, scored as sigmoid(w·x + b) — the shape
    of the fastText/logistic "looks like reference text" filters
    pretraining pipelines run corpus-wide (the model is trained offline;
    the engine's job is applying it at scan speed). ``weights`` keys name
    :func:`quality_features` columns (missing features weigh 0); the
    weight vector is a tiny constant folded into the projection, so the
    score adds ZERO shuffles or Python — it composes into any scan.

    With ``keep_threshold`` the rows scoring below it are filtered (the
    typical use); without it every row is returned with its score for
    calibration/audit.
    """
    feats = quality_features(df, id_col, text_col)
    allowed = set(feats.columns) - {id_col}
    unknown = set(weights) - allowed
    if unknown:
        raise ValueError(
            f"unknown feature(s) {sorted(unknown)}; available: {sorted(allowed)}"
        )
    z = F.lit(float(bias))
    for name, w in weights.items():
        z = z + F.lit(float(w)) * F.col(name).cast("double")
    scored = feats.withColumn(
        "quality_score", F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )
    if keep_threshold is not None:
        scored = scored.filter(F.col("quality_score") >= float(keep_threshold))
    return scored


def bigram_lm_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    model_path: str | None = None,
) -> DataFrame:
    """N-gram language-model quality scoring (CCNet-style): train an
    add-alpha-smoothed bigram LM on a reference corpus, score every
    candidate doc by mean log-likelihood and perplexity — the "does this
    read like reference text" filter between heuristic ratios and a
    neural classifier, and (unlike both) trained ON the engine itself.

    P(w2|w1) = (C(w1,w2) + alpha) / (C(w1) + alpha*V), V = distinct
    successor vocabulary; unseen contexts degrade to alpha/(alpha*V)
    rather than zero. Returns (id, n_bigrams, avg_logp, ppl) for every
    scored doc with >= 2 tokens; ppl = exp(-avg_logp), lower = more
    reference-like.

    Topology: bigram explode is in-row; the model is two
    map-side-combined count aggs over the TRAIN corpus; scoring joins
    candidate bigrams against the count tables on (w1,w2)/(w1) — hash
    joins on token keys, never a broadcast of a vocab^2 table — then one
    per-doc agg. V travels as a broadcast 1-row cross join, not a
    driver collect.
    """
    from flow_indexer_spark.operators.dedup import tokens

    from flow_indexer_spark.functions.inrow import bind

    def bigrams(df, *keep):
        def _bi(tok):
            # token array bound once — element_at(tokens(text), i) in the
            # lambda body would re-split per position, O(len^2) (measured
            # 7.3 s -> 0.7 s on this builder at sf0.1)
            idx = F.sequence(F.lit(1), F.size(tok) - 1)
            pairs = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(tok, i).alias("w1"),
                    F.element_at(tok, i + 1).alias("w2"),
                ),
            )
            return F.when(F.size(tok) >= 2, pairs)

        d = df.select(*keep, bind(tokens(text_col), _bi).alias("_bi"))
        return d.filter(F.col("_bi").isNotNull()).select(
            *keep, F.explode("_bi").alias("_b")
        ).select(*keep, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))

    tb = bigrams(train_df)
    c2 = tb.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    # The model IS the c2 table: c1 and V derive from it by aggregation
    # (sum over successors / distinct successors), never from the raw
    # corpus. Without materialization Spark re-executes the c2 plan —
    # tokenize + explode of the whole train corpus — once per consumer
    # (measured: no exchange reuse, even under AQE), so at any real
    # scale pass ``model_path``: the counts are written ONCE and the
    # three consumers read the vocab^2-sized table — train-once /
    # score-many, the same persisted-state idiom as dedup_state.
    if model_path is not None:
        c2.write.mode("overwrite").parquet(model_path)
        c2 = train_df.sparkSession.read.parquet(model_path)
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    v = c2.agg(F.count_distinct("w2").alias("_v"))

    sb = bigrams(score_df, F.col(id_col))
    logp = F.log(
        (F.coalesce("_c2", F.lit(0)).cast("double") + F.lit(float(alpha)))
        / (
            F.coalesce("_c1", F.lit(0)).cast("double")
            + F.lit(float(alpha)) * F.col("_v").cast("double")
        )
    )
    return (
        sb.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(v))
        .select(id_col, logp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("_lp").alias("avg_logp"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logp")))
    )


def _logreg_step(
    x: DataFrame,
    w: DataFrame,
    feature_cols: list[str],
    lr: float,
    round_dp: int | None,
) -> DataFrame:
    """One gradient-descent update: p = sigmoid(w·x + b) and the per-dim
    gradient avg((p - y) * x_j) fold into ONE aggregation over the
    feature matrix (partial-agg exchange collapsing to a single
    dims+1-column row); the 1-row weight table enters and leaves by
    broadcast. Plan shape pinned in test_plan_shapes.py."""
    wcols = list(feature_cols) + ["_bias"]
    j = x.crossJoin(F.broadcast(w))
    z = F.col("_w__bias")
    for c in feature_cols:
        z = z + F.col(f"_w_{c}") * F.col(c)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    g = j.agg(
        *[
            F.avg((p - F.col("_y")) * F.col(c)).alias(f"_g_{c}")
            for c in feature_cols
        ],
        F.avg(p - F.col("_y")).alias("_g__bias"),
    )

    def _rnd(col: Column) -> Column:
        return F.round(col, round_dp) if round_dp is not None else col

    return w.crossJoin(F.broadcast(g)).select(
        *[
            _rnd(F.col(f"_w_{c}") - F.lit(float(lr)) * F.col(f"_g_{c}")).alias(
                f"_w_{c}"
            )
            for c in wcols
        ]
    )


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_iter: int = 4,
    lr: float = 0.5,
    standardize: bool = True,
    round_dp: int | None = 8,
) -> DataFrame:
    """TRAIN a logistic-regression quality classifier on the engine itself
    — full-batch gradient descent as pure DataFrame ops. The missing half
    of :func:`quality_score` (which applies a model trained elsewhere):
    together they close the loop the fastText-style corpus filters run —
    label a seed set, fit, score corpus-wide.

    Per iteration: p = sigmoid(w·x + b) and the gradient
    avg((p - y) * x_j) are ONE aggregation over the (cached) feature
    matrix — a partial-agg exchange collapsing to a single dims+1-row —
    and the weights return by broadcast cross join, exactly the
    kmeans_fit topology with k×dims shrunk to dims+1. The corpus TEXT is
    scanned once: the standardized feature matrix is localCheckpoint-ed
    up front, so each iteration reads doubles, not documents. Weights are
    ``localCheckpoint``-ed per round (1 row) to truncate lineage.

    ``standardize`` z-scores each feature (population std, floored at
    1e-9) so one learning rate fits all scales; ``round_dp`` rounds the
    weight vector after EVERY update on the way out of the iteration —
    with the same rounding applied in a reference implementation the
    trajectories stay bit-identical across engines (float-sum order and
    libm exp differences are absorbed at each step instead of
    compounding). Returns long-format rows (feature, weight) with the
    intercept as feature ``_bias``.

    Mirrors the reference's dual-implementation differential discipline
    (/root/reference/backend/nfdump.go vs nfdump_subprocess: same answer,
    two engines): tests pin this against a numpy twin, and the driver
    oracle re-runs the identical trajectory as nested SQL CTEs.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    spark = df.sparkSession
    x = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    )
    if standardize:
        stats = x.agg(
            *[F.avg(c).alias(f"_m_{c}") for c in feature_cols],
            *[
                F.greatest(F.stddev_pop(c), F.lit(1e-9)).alias(f"_s_{c}")
                for c in feature_cols
            ],
        )
        x = x.crossJoin(F.broadcast(stats)).select(
            *[
                ((F.col(c) - F.col(f"_m_{c}")) / F.col(f"_s_{c}")).alias(c)
                for c in feature_cols
            ],
            "_y",
        )
    x = x.localCheckpoint(eager=True)

    wcols = list(feature_cols) + ["_bias"]
    w = spark.range(1).select(*[F.lit(0.0).alias(f"_w_{c}") for c in wcols])

    for _ in range(n_iter):
        w = _logreg_step(x, w, feature_cols, lr, round_dp).localCheckpoint(
            eager=True
        )
    pairs = [
        F.struct(F.lit(c).alias("feature"), F.col(f"_w_{c}").alias("weight"))
        for c in wcols
    ]
    return w.select(F.explode(F.array(*pairs)).alias("_p")).select(
        "_p.feature", "_p.weight"
    )


def tokenizer_fertility(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility/compression report per stratum: BPE-ish tokens
    per whitespace word (fertility — the standard metric for how well a
    tokenizer fits a domain) and chars per token (compression). High
    fertility on one source = the tokenizer fragments that domain; the
    number that drives vocab re-training decisions.

    All counts are in-row projections folded by ONE groupBy(strata) with
    map-side combine — shuffle O(strata), never O(corpus)."""
    words = F.sum(token_count(text_col).cast("bigint")).alias("n_words")
    bpe = F.sum(bpe_token_count(text_col).cast("bigint")).alias("n_bpe_tokens")
    chars = F.sum(F.length(F.col(text_col)).cast("bigint")).alias("n_chars")
    out = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"), words, bpe, chars
    )
    safe = lambda num, den: F.when(  # noqa: E731
        F.col(den) == 0, F.lit(None).cast("double")
    ).otherwise(F.round(F.col(num) / F.col(den), 9))
    return out.select(
        strata_col,
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        safe("n_bpe_tokens", "n_words").alias("fertility"),
        safe("n_chars", "n_bpe_tokens").alias("chars_per_token"),
    )


def corpus_power_laws(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row corpus-law report: Zipf rank-frequency slope and Heaps
    vocabulary-growth exponent.

    - **Zipf** (1949): regress ``ln(freq)`` on ``ln(rank)`` over the
      rank-ordered vocabulary (ties broken lexicographically so the rank
      assignment is deterministic in both engines); slope ≈ -1 on natural
      text.
    - **Heaps** (1978): ``V(N) ~ K·N^β``.  Each document (in ``id_col``
      order) contributes one (cumulative token count, cumulative distinct
      vocabulary) point; β is the log-log regression slope.  The
      cumulative-distinct series needs no stateful scan: a token's first
      occurrence is ``min(doc_id)`` (one hash agg), the per-doc new-vocab
      counts then cumulative-sum under a window — two shuffles total,
      each O(vocab) / O(docs), never O(corpus²).

    Both slopes use the native ``regr_slope`` aggregate (map-side
    partial sums) and are rounded to 9 places — the same cross-engine
    float discipline as the perplexity queries.
    """
    tok = df.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("_w")
    )

    # --- Zipf: deterministic rank over (count desc, word asc) ----------
    freq = tok.groupBy("_w").agg(F.count("*").alias("_n"))
    ranked = freq.select(
        F.col("_n"),
        F.row_number()
        .over(Window.orderBy(F.col("_n").desc(), F.col("_w").asc()))
        .alias("_rank"),
    )
    zipf = ranked.agg(
        F.round(F.regr_slope(F.log("_n"), F.log("_rank")), 9).alias("zipf_slope"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("_n").cast("bigint").alias("n_tokens"),
    )

    # --- Heaps: per-doc (cum tokens, cum vocab) points ------------------
    per_doc = tok.groupBy("_doc").agg(F.count("*").alias("_k"))
    first_seen = (
        tok.groupBy("_w")
        .agg(F.min("_doc").alias("_doc"))
        .groupBy("_doc")
        .agg(F.count("*").alias("_new"))
    )
    w_cum = Window.orderBy("_doc").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_doc.join(first_seen, "_doc", "left")
        .select(
            F.sum("_k").over(w_cum).alias("_cum_n"),
            F.sum(F.coalesce("_new", F.lit(0))).over(w_cum).alias("_cum_v"),
        )
        .filter(F.col("_cum_n") > 0)
    )
    heaps = pts.agg(
        F.round(F.regr_slope(F.log("_cum_v"), F.log("_cum_n")), 9).alias("heaps_beta"),
        F.count("*").cast("bigint").alias("n_points"),
    )
    return zipf.crossJoin(heaps).select(
        "zipf_slope", "vocab_size", "n_tokens", "heaps_beta", "n_points"
    )


def ngram_diversity(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    max_n: int = 3,
    dp: int = 9,
) -> DataFrame:
    """Distinct-n diversity report per group (Li et al. 2016's
    distinct-1/2 metric, the standard mode-collapse smell test for
    SYNTHETIC corpora): for n = 1..max_n, the total and distinct
    whitespace-token n-gram counts within the group and their ratio.
    A generator stuck in a loop shows distinct-2/3 collapsing while
    byte-level dedup still passes.

    Returns (group, n, total_ngrams, distinct_ngrams, distinct_ratio)
    ordered — exact bigints, one division.

    Scale shape: the n-gram explode is in-row (token-array slices, no
    UDF); counting is one map-side-combined shuffle on
    (group, n, gram); a second tiny aggregate collapses to the
    report rows.  Gram strings leave the Exchange as-is — for corpora
    where gram cardinality is the bottleneck, hash them first (the
    curation contamination check's idiom).
    """
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    toks = docs.select(
        F.col(group_col).alias("group"),
        F.split(F.col(text_col), " ").alias("_t"),
    )
    grams = None
    for n in range(1, max_n + 1):
        # guard the sequence behind the length test (CaseWhen is lazy:
        # sequence(0, negative) would throw on short rows otherwise)
        arr = F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - F.lit(n)),
                lambda i: F.concat_ws(" ", F.slice("_t", i + 1, F.lit(n))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = toks.select(
            "group", F.lit(n).alias("n"), F.explode(arr).alias("gram")
        )
        grams = g if grams is None else grams.unionByName(g)
    per = grams.groupBy("group", "n", "gram").agg(
        F.count("*").cast("bigint").alias("_c")
    )
    rep = per.groupBy("group", "n").agg(
        F.sum("_c").cast("bigint").alias("total_ngrams"),
        F.count("*").cast("bigint").alias("distinct_ngrams"),
    )
    return rep.select(
        "group",
        "n",
        "total_ngrams",
        "distinct_ngrams",
        F.round(
            F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"),
            dp,
        ).alias("distinct_ratio"),
    ).orderBy("group", "n")


def readability_report(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    dp: int = 9,
) -> DataFrame:
    """Per-group Flesch reading ease (Flesch 1948) from corpus-level
    exact counts — the classic readability gate beside the ratio
    features in :func:`quality_features`.

    Counting conventions (pinned, both engines identical):
    * words      — whitespace tokens;
    * sentences  — maximal runs ending in [.!?] (count of
      ``[.!?]+`` matches), floored at 1 per document so fragment-only
      docs still score;
    * syllables  — vowel GROUPS per word ([aeiouyAEIOUY]+ runs),
      floored at 1 per word — the standard heuristic (true syllable
      counting needs a dictionary; the vowel-run estimate is the
      documented approximation every fast implementation uses).

    flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    computed on the GROUP AGGREGATE counts (exact bigint sums — the
    corpus-level score, not a float average of per-doc scores), so the
    result is one IEEE expression of exact integers.  Scale: counting
    is in-row (regexp_count + an integer HOF fold per doc, fold order
    irrelevant for integers); one map-side-combined aggregate.

    Returns (group, n_docs, words, sentences, syllables, flesch).
    """
    t = F.col(text_col)
    words_arr = F.split(t, " ")
    n_words = F.size(words_arr)
    n_sent = F.greatest(
        F.lit(1).cast("bigint"), F.regexp_count(t, F.lit(r"[.!?]+"))
    )
    syl = F.aggregate(
        words_arr,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1).cast("bigint"),
            F.regexp_count(w, F.lit(r"[aeiouyAEIOUY]+")),
        ),
    )
    per = docs.select(
        F.col(group_col).alias("group"),
        n_words.cast("bigint").alias("_w"),
        n_sent.alias("_s"),
        syl.alias("_y"),
    ).groupBy("group").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_w").cast("bigint").alias("words"),
        F.sum("_s").cast("bigint").alias("sentences"),
        F.sum("_y").cast("bigint").alias("syllables"),
    )
    w = F.col("words").cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w / F.col("sentences"))
        - F.lit(84.6) * (F.col("syllables") / w)
    )
    return per.select(
        "group",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.round(flesch, dp).alias("flesch"),
    ).orderBy("group")


def unigram_lm_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Add-alpha unigram LM scoring — the weaker sibling of
    :func:`bigram_lm_scores` (same smoothing convention, context-free):
    P(w) = (C(w) + alpha) / (N + alpha*V).  Its role here is the
    REFERENCE model in excess-loss computations (DoReMi-style domain
    reweighting): the unigram/bigram loss gap isolates what context
    modeling buys per domain.  Returns (id, n_tokens, avg_logp, ppl)
    for docs with >= 1 token.  Same topology discipline: two train
    aggs, token-keyed hash join, V and N broadcast as 1-row tables."""
    from flow_indexer_spark.operators.dedup import tokens

    tr = train_df.select(F.explode(tokens(text_col)).alias("w"))
    cw = tr.groupBy("w").agg(F.count("*").cast("bigint").alias("cw"))
    nv = cw.agg(
        F.sum("cw").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("v"),
    )
    sc = score_df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    )
    lp = (
        sc.join(cw, "w", "left")
        .join(F.broadcast(nv))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cw"), F.lit(0)) + F.lit(alpha))
                / (F.col("n") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.avg("lp").alias("avg_logp"),
    ).withColumn("ppl", F.exp(-F.col("avg_logp")))
