"""Corpus tokenization: vocab build, id encoding, and SFT loss-span layout.

The last mile of a training-data pipeline: after curation/dedup the corpus
must become token ids and loss masks. A real subword tokenizer is an
offline artifact (like the quality classifier's weights or the bigram LM
table); the engine's job is the corpus-scale application — vocabulary
census, id lookup, per-turn offset math — all shuffle-budgeted and
deterministic. Word-level ids here (whitespace tokens, the repo-wide
tokenizer stand-in); swapping in BPE pieces changes the token column, not
the topology.

Special ids follow the common convention: PAD=0, UNK=1, BOS=2, EOS=3;
real tokens start at 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PAD_ID, UNK_ID, BOS_ID, EOS_ID = 0, 1, 2, 3
_N_SPECIALS = 4


def build_vocab(
    df: DataFrame,
    max_size: int = 30000,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Frequency vocabulary: the ``max_size`` most frequent tokens with
    count >= ``min_count``, as (token, token_id, n). Ids are dense from
    4 (specials reserved), assigned by (count desc, token asc) — fully
    deterministic, engine-portable ties.

    One map-side-combined count shuffle over the corpus; the ranking
    window runs on the FILTERED vocab (<= max_size after the limit path,
    domain-sized either way) — the corpus is never globally sorted.
    """
    from flow_indexer_spark.operators.dedup import fan_out, tokens

    counts = (
        fan_out(df)
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    top = counts.orderBy(F.desc("n"), "token").limit(max_size)
    w = Window.orderBy(F.desc("n"), "token")
    return top.withColumn(
        "token_id",
        (F.row_number().over(w) - 1 + _N_SPECIALS).cast("int"),
    ).select("token", "token_id", "n")


def encode_corpus(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_special: bool = True,
) -> DataFrame:
    """Text -> token-id arrays using a built vocabulary: out-of-vocab
    tokens map to UNK; ``add_special`` wraps BOS ... EOS. Returns
    (id, input_ids, n_tokens).

    Topology: posexplode (in-row) -> broadcast hash join against the
    vocab (vocab tables are MBs even at 100k entries — never a shuffle
    of the corpus by token) -> one per-doc aggregation re-assembling
    positions in order. Empty docs yield [] (or [BOS, EOS]).
    """
    from flow_indexer_spark.operators.dedup import tokens

    base = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    melted = base.select(
        id_col, F.posexplode_outer("_tok").alias("_pos", "token")
    )
    joined = melted.join(F.broadcast(vocab.select("token", "token_id")),
                         "token", "left")
    tid = F.when(
        F.col("token").isNull(), F.lit(None)  # empty doc's null row
    ).otherwise(F.coalesce(F.col("token_id"), F.lit(UNK_ID)))
    ids = (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tid.isNotNull(),
                            F.struct(F.col("_pos"), tid.cast("int").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ).alias("_ids")
        )
    )
    out = F.col("_ids")
    if add_special:
        out = F.concat(
            F.array(F.lit(BOS_ID).cast("int")),
            out,
            F.array(F.lit(EOS_ID).cast("int")),
        )
    return ids.select(
        id_col,
        out.alias("input_ids"),
        F.size(out).cast("int").alias("n_tokens"),
    )


def sft_turn_spans(
    transcripts: DataFrame,
    loss_roles: tuple[str, ...] = ("assistant",),
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-turn token-offset layout for SFT over concatenated
    conversations: turns laid end to end in ``turn_col`` order give each
    turn (start_tok, end_tok] in its conversation's token stream, plus
    ``is_loss`` (role in ``loss_roles``) — exactly the span table a
    trainer needs to mask non-assistant tokens out of the loss. One
    window over each conversation (bounded by conversation length, the
    same per-key shape as sessionization); token counts are in-row.
    """
    from flow_indexer_spark.operators.dedup import tokens

    n_tok = F.size(tokens(text_col)).cast("bigint")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = transcripts.select(
        conv_col, turn_col, role_col, n_tok.alias("n_tokens")
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        conv_col,
        turn_col,
        "n_tokens",
        start.alias("start_tok"),
        (start + F.col("n_tokens")).alias("end_tok"),
        F.col(role_col).isin(*loss_roles).alias("is_loss"),
    )


def materialize_packs(
    enc: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    ids_col: str = "input_ids",
    salt: str = "pack",
    pad: bool = False,
) -> DataFrame:
    """The loader's last step, actually materialized: lay encoded docs end
    to end in the same deterministic (hash, id) per-shard order as
    :func:`curation.pack_sequences` and emit the fixed-length training
    sequences themselves — (shard, pack_idx, input_ids, n_tokens), each
    ``budget`` tokens except a shard's final tail (padded with PAD_ID
    when ``pad``). Docs straddle pack boundaries by construction
    (concat-and-chunk, no padding waste mid-stream).

    Where pack_sequences only PLANS the layout (doc -> pack/offset, no
    token movement), this pays the token-level shuffle to produce the
    bytes a trainer maps: explode ids with per-shard stream positions
    (window offset + in-doc position, both deterministic), then one
    groupBy (shard, pack) re-assembly. Shuffle volume = corpus token
    count — irreducible for this output; the shard key keeps every
    reducer's slice ~1/n_shards.
    """
    from flow_indexer_spark.operators.dedup import md5_int32

    if budget <= 0:
        raise ValueError("budget must be positive")
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = enc.select(
        F.col(id_col).alias("_id"),
        F.col(ids_col).alias("_ids"),
        F.size(ids_col).cast("bigint").alias("_n"),
        h.alias("_h"),
        (h % n_shards).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("_n").over(w), F.lit(0))
    # the offset window MUST resolve before the explode (a generator and a
    # window in one projection makes Spark run the window over the
    # exploded rows — each token would then see a different cumsum)
    staged = d.select("shard", "_ids", offset.alias("_off"))
    tok = (
        staged.select("shard", "_off",
                      F.posexplode("_ids").alias("_pos", "_tid"))
        .select("shard", (F.col("_off") + F.col("_pos")).alias("_sp"), "_tid")
    )
    packs = (
        tok.groupBy("shard", F.floor(F.col("_sp") / budget).cast("int").alias("pack_idx"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct((F.col("_sp") % budget).alias("p"), F.col("_tid").alias("t"))
                    )
                ),
                lambda s: s["t"],
            ).alias("input_ids")
        )
    )
    ids = F.col("input_ids")
    if pad:
        ids = F.concat(
            ids,
            F.array_repeat(
                F.lit(PAD_ID).cast("int"), F.lit(budget) - F.size(ids)
            ),
        )
    return packs.select(
        "shard",
        "pack_idx",
        ids.alias("input_ids"),
        F.size(ids).cast("int").alias("n_tokens"),
    )


def sft_examples(
    transcripts: DataFrame,
    vocab: DataFrame,
    loss_roles: tuple[str, ...] = ("assistant",),
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-level SFT payloads: per conversation, the turns'
    token ids concatenated in ``turn_col`` order plus a 0/1 ``loss_mask``
    aligned token-for-token (1 where the turn's role is in
    ``loss_roles``) — what :func:`sft_turn_spans` describes as offsets,
    actually materialized next to the ids a trainer consumes.

    Topology: in-row tokenize + posexplode, broadcast vocab join
    (OOV -> UNK), one (conv, turn) re-assembly agg, one per-conv agg
    flattening turns in order — the mask is array_repeat per turn inside
    the same projection, so ids and mask cannot drift out of alignment.
    Returns (conv, input_ids, loss_mask, n_tokens).
    """
    from flow_indexer_spark.operators.dedup import tokens

    is_loss = F.col(role_col).isin(*loss_roles).cast("int")
    melted = transcripts.select(
        conv_col,
        turn_col,
        is_loss.alias("_loss"),
        F.posexplode_outer(tokens(text_col)).alias("_pos", "token"),
    )
    joined = melted.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    )
    tid = F.when(F.col("token").isNull(), F.lit(None)).otherwise(
        F.coalesce(F.col("token_id"), F.lit(UNK_ID))
    )
    per_turn = (
        joined.groupBy(conv_col, turn_col)
        .agg(
            F.first("_loss").alias("_loss"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tid.isNotNull(),
                            F.struct(F.col("_pos"), tid.cast("int").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ).alias("_ids"),
        )
    )
    seq = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col).alias("i"), "_loss", "_ids"))
    )
    per_conv = per_turn.groupBy(conv_col).agg(seq.alias("_seq"))
    ids = F.flatten(F.transform("_seq", lambda s: s["_ids"]))
    mask = F.flatten(
        F.transform(
            "_seq", lambda s: F.array_repeat(s["_loss"], F.size(s["_ids"]))
        )
    )
    return per_conv.select(
        conv_col,
        ids.alias("input_ids"),
        mask.alias("loss_mask"),
        F.size(ids).cast("int").alias("n_tokens"),
    )


def context_length_sweep(
    df: DataFrame,
    lengths: tuple[int, ...] = (32, 64, 128, 256),
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Truncation-loss report for choosing a training context length:
    for each candidate ``max_len``, how many docs would truncate and what
    fraction of corpus tokens is lost. The standard pre-flight before
    fixing the packing budget (:func:`materialize_packs`).

    Per-row token count is in-row; the candidate lengths explode from a
    LITERAL array (|lengths| rows per doc, constant fan-out), and the
    single groupBy produces |lengths| rows — shuffle payload O(lengths),
    map-side combined, regardless of corpus size.
    """
    from flow_indexer_spark.operators.dedup import tokens

    if not lengths or any(l <= 0 for l in lengths):
        raise ValueError("lengths must be non-empty positive ints")
    n = (
        F.col(n_tokens_col) if n_tokens_col else F.size(tokens(text_col))
    ).cast("bigint")
    per = df.select(
        n.alias("_n"),
        F.explode(F.array(*[F.lit(int(l)) for l in lengths])).alias("max_len"),
    )
    lost = F.sum(F.greatest(F.col("_n") - F.col("max_len"), F.lit(0)))
    return (
        per.groupBy("max_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("_n") > F.col("max_len")).cast("bigint")).alias(
                "n_truncated"
            ),
            F.sum(F.least(F.col("_n"), F.col("max_len"))).alias("tokens_kept"),
            lost.alias("tokens_lost"),
            F.round(lost / F.sum("_n"), 9).alias("frac_tokens_lost"),
        )
        .orderBy("max_len")
    )


# --- BPE merge training ------------------------------------------------------


def _merge_fold(syms: "Column", left: "Column", right: "Column") -> "Column":
    """Greedy left-to-right application of ONE merge (left,right)->left||right
    over a symbol array, as a pure in-row fold: the accumulator is the
    space-joined output (leading space = symbol boundary, so a symbol
    that merely ENDS with `left` can never false-match). Returns the
    ltrimmed space-joined result. 'a a a' + (a,a) -> 'aa a', the
    standard non-overlapping BPE semantics."""
    return F.ltrim(
        F.aggregate(
            syms,
            F.lit(""),
            lambda acc, x: F.when(
                acc.endswith(F.concat(F.lit(" "), left)) & (x == right),
                F.concat(
                    F.substr(acc, F.lit(1), F.length(acc) - F.length(left) - 1),
                    F.lit(" "),
                    left,
                    right,
                ),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
    )


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> word-frequency table with each word exploded to its
    space-joined character symbols — the ONE corpus-scale pass of BPE
    training (everything after runs on the vocab-sized table)."""
    from flow_indexer_spark.operators.dedup import tokens

    words = (
        df.select(F.explode(tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_c"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("_w")),
        lambda i: F.substr(F.col("_w"), i, F.lit(1)),
    )
    return words.select(F.concat_ws(" ", chars).alias("_sym"), "_c")


def _accept_merge_batch(top, horizon: int, budget: int):
    """Driver-side batch acceptance for :func:`bpe_train`: from the
    count-desc/text-asc-sorted ``top`` rows, return the longest prefix
    that is guaranteed to equal the next ``len(prefix)`` picks of the
    strictly-sequential BPE loop.

    Why this is bit-identical to one-merge-at-a-time:
    - Merging (a,b)→ab only changes counts of pairs OVERLAPPING {a,b}
      (they can only shrink) and CREATES pairs involving the new symbol
      ab, each bounded by an old overlapping pair's count
      (count(x,ab) <= old count(x,a)).
    - The walk accepts a CONTIGUOUS prefix of mutually-disjoint pairs
      and stops at the first conflict; sorted desc, that first conflict
      has the MAX count among all pairs overlapping any accepted pair,
      so it bounds every changed and created pair.
    - Keeping only accepted pairs with count STRICTLY above that bound
      (``c_stop``) means each is still the unique (count, text)-order
      winner of its round — tie-break never consulted against a bounded
      pair. When the horizon fills without a conflict, the unseen tail
      (counts <= the last fetched) is treated as a potential conflict;
      when the whole pair table fits in the horizon conflict-free, no
      pair shares a symbol, so no merge can change any count: accept all.
    - The round-1 winner is unconditionally correct, so the batch never
      shrinks below one merge (the sequential fallback; horizon=1
      degenerates to exactly the old per-merge loop).
    """
    accepted = []
    used: set[str] = set()
    c_stop = None
    for row in top:
        if row.left_sym in used or row.right_sym in used:
            c_stop = row.pair_count
            break
        accepted.append(row)
        used.add(row.left_sym)
        used.add(row.right_sym)
    else:
        if len(top) == horizon:
            c_stop = top[-1].pair_count
    if c_stop is not None:
        safe = [r for r in accepted if r.pair_count > c_stop]
        accepted = safe if safe else accepted[:1]
    return accepted[:budget]


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    merge_horizon: int = 64,
) -> DataFrame:
    """TRAIN BPE merges on the engine (Sennrich et al. 2016): learn the
    ``n_merges`` highest-count adjacent-symbol merges, ties broken on
    (left, right) text so the rule list is deterministic across engines
    and reruns.

    Scale shape: the corpus is scanned ONCE into a word-frequency table
    (one O(vocab) shuffle with map-side combine) — every round after
    that runs on the vocab-sized table: pair counting is an in-row
    adjacent-zip explode + one O(pairs) agg, the top ``merge_horizon``
    pairs come back as a driver-side k-row collect
    (TakeOrderedAndProject, no global sort), and **every merge in the
    accepted batch applies in ONE job** as an in-row fold of
    :func:`_merge_fold` over the batch's literal rule array. Batch
    acceptance (:func:`_accept_merge_batch`) is provably bit-identical
    to the one-merge-per-job sequential loop — the standard
    non-conflicting-merges trick — so jobs-per-vocab is
    n_merges / avg_batch, not n_merges: at 32k–100k production merges
    the driver round-trip latency no longer dominates. The word table is
    localCheckpoint-ed per round (constant-size lineage), exactly the
    kmeans_fit / fit_logreg iteration discipline. This is why real BPE
    trainers keep word counts, not corpora — here that idiom is the
    difference between n_merges corpus scans and one.

    Returns (merge_rank, left_sym, right_sym, pair_count) ordered rule
    rows; rounds stop early if no adjacent pair remains. The DuckDB
    oracle replays the identical trajectory as generated CTEs, and
    :func:`bpe_segment`'s nested-fold application is differentially
    pinned against this loop's incrementally merged word table;
    ``merge_horizon=1`` degenerates to the sequential loop and a pytest
    pins batched == sequential on the fixture."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if merge_horizon < 1:
        raise ValueError("merge_horizon must be >= 1")
    words = _word_symbols(df, text_col).localCheckpoint(eager=True)
    rules_rows: list[tuple[int, str, str, int]] = []
    while len(rules_rows) < n_merges:
        syms = F.split("_sym", " ")
        pair_arr = F.when(
            F.size(syms) >= 2,
            F.zip_with(
                F.slice(syms, 1, F.size(syms) - 1),
                F.slice(syms, 2, F.size(syms) - 1),
                lambda a, b: F.struct(a.alias("left_sym"), b.alias("right_sym")),
            ),
        ).otherwise(F.array().cast("array<struct<left_sym:string,right_sym:string>>"))
        pc = (
            words.select("_c", F.explode(pair_arr).alias("_p"))
            .groupBy("_p.left_sym", "_p.right_sym")
            .agg(F.sum("_c").alias("pair_count"))
        )
        top = (
            pc.orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(merge_horizon)
            .collect()
        )
        if not top:
            break
        accepted = _accept_merge_batch(
            top, merge_horizon, n_merges - len(rules_rows)
        )
        base_rank = len(rules_rows)
        rules_rows.extend(
            (base_rank + i, r.left_sym, r.right_sym, r.pair_count)
            for i, r in enumerate(accepted)
        )
        batch_rules = F.array(
            *[
                F.struct(
                    F.lit(r.left_sym).alias("l"), F.lit(r.right_sym).alias("r")
                )
                for r in accepted
            ]
        )
        merged = F.aggregate(
            batch_rules,
            F.col("_sym"),
            lambda acc, rule: _merge_fold(F.split(acc, " "), rule["l"], rule["r"]),
        )
        words = words.select(merged.alias("_sym"), "_c").localCheckpoint(eager=True)
    if not rules_rows:
        raise ValueError("corpus has no adjacent symbol pairs to merge")
    # pandas/Arrow LocalRelation, not a pickled-list RDD: the rule table
    # is re-evaluated by every downstream action (segment's broadcast,
    # the oracle replay) and the Python-RDD path costs a Python-worker
    # launch each time (see sources/manifest._local_manifest_df)
    import pandas as pd

    return df.sparkSession.createDataFrame(
        pd.DataFrame(
            rules_rows,
            columns=["merge_rank", "left_sym", "right_sym", "pair_count"],
        ),
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_segment(
    df: DataFrame,
    rules: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply trained BPE merges to the corpus vocabulary: every distinct
    word -> its subword pieces, by folding the rank-ordered rule list
    over the word's character symbols (a NESTED in-row fold: outer over
    rules, inner the per-rule :func:`_merge_fold`). The rule table packs
    to ONE broadcast row, so segmentation is a scan-speed projection —
    the tokenizer-apply analogue of pq_encode's broadcast-codebook
    argmin. Output (word, pieces array<string>, n_pieces)."""
    from flow_indexer_spark.operators.dedup import tokens

    packed = rules.groupBy().agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("merge_rank", "left_sym", "right_sym"))
            ),
            lambda s: F.struct(
                s["left_sym"].alias("l"), s["right_sym"].alias("r")
            ),
        ).alias("_rules")
    )
    words = df.select(F.explode(tokens(text_col)).alias("word")).distinct()
    chars = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substr(F.col("word"), i, F.lit(1)),
        ),
    )
    seg = F.aggregate(
        F.col("_rules"),
        chars,
        lambda acc, rule: _merge_fold(F.split(acc, " "), rule["l"], rule["r"]),
    )
    return (
        words.crossJoin(F.broadcast(packed))
        .select("word", F.split(seg, " ").alias("pieces"))
        .withColumn("n_pieces", F.size("pieces"))
    )


def vocab_coverage_curve(
    docs: DataFrame,
    text_col: str,
    ranks: list[int],
    dp: int = 9,
) -> DataFrame:
    """Vocabulary coverage at candidate vocab sizes — the sizing curve
    for a tokenizer budget: for each requested rank R, what fraction
    of all token OCCURRENCES is covered by the R most frequent types?
    (The Zipf-shaped knee of this curve is where `vocab_census` /
    BPE/unigram training budgets come from.)

    Returns (rank, token, count, cum_count, coverage) for each
    requested rank present in the vocabulary (ranks beyond |V| are
    absent — no row is invented), where `token` is the type AT that
    rank (frequency desc, token asc ties) and coverage =
    cum_count / total — exact bigints, one division.

    Scale: one (token) count shuffle, then the banded two-level rank
    on the VOCAB table — bands are floor(log2(count)) buckets
    (descending count order == descending band order), band offsets
    are a <=64-row broadcast, the within-band window is partitioned —
    so no vocab-sized single-task sort; the cumulative count rides
    the same window pass plus the band prefix.
    """
    from pyspark.sql import Window

    if not ranks or any(r < 1 for r in ranks):
        raise ValueError(f"ranks must be >= 1, got {ranks}")
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    vocab = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("count")
    )
    total = vocab.agg(F.sum("count").cast("bigint").alias("_T"))
    # descending band: higher counts -> higher log2 bucket -> rank first
    band = F.floor(F.log2(F.col("count"))).cast("int")
    v = vocab.withColumn("_b", band)
    btot = v.groupBy("_b").agg(
        F.count("*").cast("bigint").alias("_bn"),
        F.sum("count").cast("bigint").alias("_bc"),
    )
    wb = Window.orderBy(F.desc("_b")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = btot.select(
        "_b",
        F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_roff"),
        F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_coff"),
    )
    wi = Window.partitionBy("_b").orderBy(F.desc("count"), F.asc("token"))
    ranked = v.join(F.broadcast(boff), "_b").select(
        "token",
        "count",
        (F.row_number().over(wi) + F.col("_roff")).cast("bigint").alias(
            "rank"
        ),
        (
            F.sum("count").over(
                wi.rowsBetween(Window.unboundedPreceding, 0)
            )
            + F.col("_coff")
        )
        .cast("bigint")
        .alias("cum_count"),
    )
    wanted = F.array(*[F.lit(r) for r in sorted(set(ranks))])
    return (
        ranked.filter(F.array_contains(wanted, F.col("rank").cast("int")))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "count",
            "cum_count",
            F.round(
                F.col("cum_count") / F.col("_T").cast("double"), dp
            ).alias("coverage"),
        )
        .orderBy("rank")
    )
