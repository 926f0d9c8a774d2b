"""Transcript-level analytics: conversation rollups, response latency,
entity co-occurrence.

The reference's unit of analysis is the file/document; a transcript
engine also needs conversation-level views (the "document" rolled up
from its turns) and turn-adjacency semantics (what answered what). All
pure DataFrame: one hash aggregate for rollups, one window pass for
adjacency, one capped inverted-index self-join for co-occurrence — the
same topologies as the index build (SURVEY §2 A2) applied to new
questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_rollup(
    transcripts: DataFrame,
    roles: tuple[str, ...] = ("user", "assistant"),
) -> DataFrame:
    """Per-conversation summary: turn counts (total / per listed role),
    time span, distinct tools used. One map-side-combined groupBy — the
    A5 hits/first/last stats (reference
    /root/reference/flowindexer/flowindexer.go:352-366) generalized from
    a query's hit list to every conversation."""
    tool = F.when(F.col("tool").isNotNull() & (F.col("tool") != ""), F.col("tool"))
    role_counts = [
        F.sum((F.col("role") == r).cast("long")).alias(f"n_{r}_turns") for r in roles
    ]
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        *role_counts,
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count_distinct(tool).alias("n_distinct_tools"),
    )


def response_latency(
    transcripts: DataFrame,
    from_role: str = "user",
    to_role: str = "assistant",
) -> DataFrame:
    """Pair each ``from_role`` turn with the IMMEDIATELY NEXT turn in the
    conversation when that turn is ``to_role``, and compute the reply
    delay in seconds. Adjacency via lead() over (conv_id, turn_idx) —
    one shuffle on conv_id, both lead()s in one in-partition sort; a
    per-conversation history fits one task by construction (conversations
    are bounded, unlike users in sessionize)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt_role = F.lead("role").over(w)
    nxt_ts = F.lead("ts").over(w)
    nxt_idx = F.lead("turn_idx").over(w)
    lat_us = F.unix_micros(nxt_ts.cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "ts",
            "role",
            nxt_role.alias("next_role"),
            nxt_idx.alias("next_turn_idx"),
            (lat_us / 1_000_000.0).alias("latency_s"),
        )
        .filter((F.col("role") == from_role) & (F.col("next_role") == to_role))
        .drop("role", "next_role")
    )


def capped_entities(
    entity_rows: DataFrame,
    max_entity_df: int | None = 1000,
) -> DataFrame:
    """Distinct per-turn entity occurrences with the document-frequency
    skew cap applied: entities present in more than ``max_entity_df``
    turns are dropped entirely. Shared by :func:`entity_cooccurrence`
    and the graph analytics built on it (operators/graph.py) so both
    see the identical node universe."""
    e = entity_rows.select(
        "entity_class", "entity_key", "conv_id", "turn_idx"
    ).dropDuplicates()
    if max_entity_df is not None:
        ok = (
            e.groupBy("entity_class", "entity_key")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_entity_df)
            .select("entity_class", "entity_key")
        )
        e = e.join(ok, ["entity_class", "entity_key"])
    return e


def entity_cooccurrence(
    entity_rows: DataFrame,
    max_entity_df: int | None = 1000,
) -> DataFrame:
    """Entity co-occurrence graph: for every pair of entities appearing
    in the SAME turn, count the co-occurring turns. The candidate
    topology is the inverted-index self-join (A2/J3 applied to itself)
    with the same document-frequency skew cap as the dedup paths: an
    entity present in every turn (the hot-key case the salt-chunk
    postings exist for) would pair with everything — entities above
    ``max_entity_df`` turns are excluded from the graph (and at 100 TB
    that exclusion is what bounds the join output).

    Input: long-format rows (entity_class, entity_key, conv_id,
    turn_idx) — extraction output or the routed table. Output:
    (class_a, key_a, class_b, key_b, n_turns), pairs ordered a < b.
    """
    e = capped_entities(entity_rows, max_entity_df)
    a = e.select(
        F.col("entity_class").alias("class_a"),
        F.col("entity_key").alias("key_a"),
        "conv_id",
        "turn_idx",
    )
    b = e.select(
        F.col("entity_class").alias("class_b"),
        F.col("entity_key").alias("key_b"),
        "conv_id",
        "turn_idx",
    )
    return (
        a.join(b, ["conv_id", "turn_idx"])
        .filter(
            (F.col("class_a") < F.col("class_b"))
            | ((F.col("class_a") == F.col("class_b")) & (F.col("key_a") < F.col("key_b")))
        )
        .groupBy("class_a", "key_a", "class_b", "key_b")
        .agg(F.count("*").alias("n_turns"))
    )


def tool_call_validation(
    df: DataFrame,
    registry: list[dict],
    call_col: str = "tool_call",
) -> DataFrame:
    """Per-turn tool-call schema validation against a tool registry —
    the agent-transcript analogue of the reference's per-line parse
    classification (parse ok / parse error counters,
    /root/reference/flowindexer/flowindexer.go indexer stats): every
    tool invocation is checked against its declared argument schema and
    classified ``ok`` / ``missing_arg`` / ``bad_type`` /
    ``unknown_tool`` / ``malformed``.

    ``registry`` is a driver-side dim (the tool registry is the same
    small lookup the enrich stage broadcasts): a list of
    ``{"name": ..., "required": [...], "int_args": [...]}`` specs. The
    specs COMPILE INTO the projection as literal JSON paths — one
    in-row CASE chain, JVM codegen, zero joins, zero Python — because
    ``get_json_object`` paths must be foldable. At 100 TB this is a
    pure map stage over the scan.

    Classification order (first hit wins): malformed JSON (no name) ->
    unknown tool -> missing required arg -> wrongly-typed int arg -> ok.
    """
    c = F.col(call_col)
    name = F.get_json_object(c, "$.name")
    keys = F.json_object_keys(F.get_json_object(c, "$.args"))
    status = None
    for spec in registry:
        missing = F.lit(False)
        for a in spec.get("required", []):
            missing = missing | F.get_json_object(c, f"$.args.{a}").isNull()
        badtype = F.lit(False)
        for a in spec.get("int_args", []):
            v = F.get_json_object(c, f"$.args.{a}")
            badtype = badtype | (v.isNotNull() & ~v.rlike("^-?[0-9]+$"))
        this = (
            F.when(missing, "missing_arg")
            .when(badtype, "bad_type")
            .otherwise("ok")
        )
        cond = name == spec["name"]
        status = F.when(cond, this) if status is None else status.when(cond, this)
    status = (
        F.when(name.isNull(), "malformed")
        .otherwise(status.otherwise("unknown_tool"))
        if status is not None
        else F.when(name.isNull(), "malformed").otherwise("unknown_tool")
    )
    return df.withColumn("tool_name", F.coalesce(name, F.lit(""))).withColumn(
        "status", status
    ).withColumn(
        "n_args", F.coalesce(F.size(keys), F.lit(0)).cast("bigint")
    )


def tool_call_audit(
    df: DataFrame, registry: list[dict], call_col: str = "tool_call"
) -> DataFrame:
    """Corpus-level audit rollup of :func:`tool_call_validation`: counts
    per (tool_name, status). One map-side-combined agg over the
    validated scan."""
    v = tool_call_validation(df, registry, call_col)
    return v.groupBy("tool_name", "status").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum("n_args").alias("n_args_total"),
    )


def context_window_pairs(
    transcripts: DataFrame,
    response_role: str = "assistant",
    budget_tokens: int = 64,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(context, response) SFT training pairs with a token budget: for
    every turn of ``response_role``, the context is the MAXIMAL
    CONTIGUOUS SUFFIX of preceding turns whose total whitespace-token
    count fits ``budget_tokens`` — the rolling-context truncation every
    chat-SFT pipeline applies before packing. Turns render as
    ``role: text`` joined by newlines, chronological order.

    Shape: ONE window pass per conversation (collect preceding
    (role, text, n_tok) structs — conversations are bounded-length by
    the same contract sessions.py relies on), then a pure in-row fold
    picks the suffix (greedy from the most recent turn backwards, which
    IS the maximal fitting suffix since token counts are nonnegative).
    No self-join, no per-row Python.
    """
    ntok = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = F.collect_list(
        F.struct(
            F.col(role_col).alias("r"),
            F.col(text_col).alias("t"),
            ntok.alias("k"),
        )
    ).over(w)
    base = transcripts.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col),
        F.col(text_col),
        hist.alias("hist"),
    ).filter(F.col(role_col) == response_role)
    # greedy fold over reversed history: acc = (remaining budget, parts);
    # remaining drops below zero permanently once a turn doesn't fit, so
    # the kept set stays contiguous.
    fold = F.aggregate(
        F.reverse("hist"),
        F.struct(
            F.lit(budget_tokens).cast("int").alias("rem"),
            F.array().cast("array<string>").alias("parts"),
        ),
        lambda acc, x: F.struct(
            F.when(x["k"] <= acc["rem"], acc["rem"] - x["k"])
            .otherwise(F.lit(-1))
            .alias("rem"),
            F.when(
                x["k"] <= acc["rem"],
                F.array_append(acc["parts"], F.concat(x["r"], F.lit(": "), x["t"])),
            )
            .otherwise(acc["parts"])
            .alias("parts"),
        ),
    )
    return base.select(
        F.col(conv_col),
        F.col(idx_col),
        F.array_join(F.reverse(fold["parts"]), "\n").alias("context"),
        F.col(text_col).alias("response"),
        F.size(fold["parts"]).cast("bigint").alias("n_context_turns"),
    )


def turn_taking_stats(
    t: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    dp: int = 9,
) -> DataFrame:
    """Per-conversation turn-taking structure: how dialogue-like is
    the transcript?  A healthy agent loop alternates roles; a stuck
    one monologues.

    Returns (conv_id, n_turns, n_switches, alternation, longest_run):
    * n_switches  — adjacent turn pairs with different roles (exact);
    * alternation — n_switches / (n_turns - 1), NULL for 1-turn
      conversations (no pair exists);
    * longest_run — the longest same-role run, via the runs trick:
      run id = running count of switch flags (the sessionize cumsum
      idiom), then max run size.

    Two window passes partitioned by conversation + two exact-integer
    aggregates; no self-join.
    """
    w = Window.partitionBy("_c").orderBy("_o")
    d = t.select(
        F.col(conv_col).alias("_c"),
        F.col(order_col).alias("_o"),
        F.col(role_col).alias("_r"),
    )
    d = d.withColumn(
        "_sw",
        F.when(
            F.lag("_r").over(w).isNull()
            | (F.lag("_r").over(w) == F.col("_r")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn(
        "_run",
        F.sum("_sw").over(
            Window.partitionBy("_c")
            .orderBy("_o")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = d.groupBy("_c", "_run").agg(
        F.count("*").cast("bigint").alias("_rl")
    )
    per_run = runs.groupBy("_c").agg(
        F.max("_rl").cast("bigint").alias("longest_run")
    )
    per = d.groupBy("_c").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("_sw").cast("bigint").alias("n_switches"),
    )
    return (
        per.join(per_run, "_c")
        .select(
            F.col("_c").alias("conv_id"),
            "n_turns",
            "n_switches",
            F.when(
                F.col("n_turns") > 1,
                F.round(
                    F.col("n_switches")
                    / (F.col("n_turns") - 1).cast("double"),
                    dp,
                ),
            ).alias("alternation"),
            "longest_run",
        )
    )


def tool_retry_chains(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    ok_col: str = "ok",
) -> DataFrame:
    """Retry-chain mining over agent tool invocations: a RUN is a
    maximal stretch of consecutive turns in one conversation invoking
    the same tool; a RETRY CHAIN is a run where some non-final attempt
    failed (the agent re-invoked after an error).  The per-tool report
    is the 'is this tool flaky, and does retrying it help' gate an
    agent-ops pipeline runs before trusting tool success rates:

    - ``n_runs`` / ``n_retry_chains``
    - ``n_recovered`` (chain whose final attempt succeeded) vs
      ``n_exhausted`` (gave up failing)
    - ``max_chain_len``, ``wasted_attempts`` (sum of len-1 over chains
      — the retry-traffic cost)

    Shape: run ids via the runs trick (row_number difference inside
    one conversation-partitioned window — turn index minus the
    per-(conv, tool) rank is constant exactly on a run), then two
    map-combined groupBys.  Nothing is ever corpus-sorted; the window
    partitions by conversation."""
    w_conv = Window.partitionBy("conv").orderBy("idx")
    w_tool = Window.partitionBy("conv", "tool").orderBy("idx")
    runs = df.select(
        F.col(conv_col).alias("conv"),
        F.col(tool_col).alias("tool"),
        F.col(idx_col).alias("idx"),
        # null status = the attempt never reported success: a FAILURE,
        # not a droppable row — without the coalesce a null propagates
        # through the cast and silently vanishes from n_failures and
        # from final_ok's max_by, diverging from the oracle's
        # CASE-maps-null-to-0 semantics on dirty input.
        F.coalesce(F.col(ok_col).cast("int"), F.lit(0)).alias("ok"),
    ).withColumn(
        "run_id",
        F.row_number().over(w_conv) - F.row_number().over(w_tool),
    )
    per_run = runs.groupBy("conv", "tool", "run_id").agg(
        F.count("*").cast("bigint").alias("n_attempts"),
        F.sum(1 - F.col("ok")).cast("bigint").alias("n_failures"),
        F.max_by("ok", "idx").alias("final_ok"),
    )
    is_chain = (
        F.col("n_failures") - (1 - F.col("final_ok")) > 0
    )  # some NON-final attempt failed
    return (
        per_run.groupBy("tool")
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.sum(F.when(is_chain, 1).otherwise(0))
            .cast("bigint")
            .alias("n_retry_chains"),
            F.sum(F.when(is_chain & (F.col("final_ok") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("n_recovered"),
            F.sum(F.when(is_chain & (F.col("final_ok") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exhausted"),
            F.coalesce(F.max(F.when(is_chain, F.col("n_attempts"))), F.lit(0))
            .cast("bigint")
            .alias("max_chain_len"),
            F.sum(F.when(is_chain, F.col("n_attempts") - 1).otherwise(0))
            .cast("bigint")
            .alias("wasted_attempts"),
        )
    )


def topic_segments(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    min_overlap: float = 0.2,
    dp: int = 9,
) -> DataFrame:
    """Lexical topic segmentation of conversations (the TextTiling idea
    — Hearst, CL 1997 — reduced to its scale-friendly core): a segment
    boundary falls between adjacent turns whose token-set Jaccard
    drops below ``min_overlap`` (or where either side has no tokens —
    a topic reset by construction).  'How many topics does a
    conversation span' is a context-packing and retrieval-chunking
    signal over agent transcripts.

    Per conversation: ``n_turns``, ``n_segments`` (1 + boundary
    count), ``mean_segment_len`` (one rounded division of exact
    integers), ``min_jaccard`` over adjacent pairs (rounded; null for
    single-turn conversations).  One conversation-partitioned window
    (the lag of the token set) + one groupBy — nothing corpus-global."""
    from pyspark.sql import Window

    from flow_indexer_spark.operators.dedup import tokens

    w = Window.partitionBy("c").orderBy("i")
    t = df.select(
        F.col(conv_col).alias("c"),
        F.col(idx_col).alias("i"),
        F.array_distinct(tokens(text_col)).alias("s"),
    ).withColumn("p", F.lag("s").over(w))
    inter = F.size(F.array_intersect("p", "s")).cast("bigint")
    union = F.size(F.array_union("p", "s")).cast("bigint")
    j = F.when(union > 0, inter / union)
    boundary = F.when(
        F.col("p").isNull(), F.lit(0)  # first turn opens, not a boundary
    ).otherwise(
        F.when(j.isNull() | (j < F.lit(min_overlap)), 1).otherwise(0)
    )
    per = t.select("c", boundary.alias("b"), j.alias("j")).groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        (F.sum("b") + 1).cast("bigint").alias("n_segments"),
        F.round(F.min("j"), dp).alias("min_jaccard"),
    )
    return per.select(
        F.col("c").alias(conv_col),
        "n_turns",
        "n_segments",
        F.round(F.col("n_turns") / F.col("n_segments"), dp).alias(
            "mean_segment_len"
        ),
        "min_jaccard",
    )


def context_eviction_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    budget: int = 256,
    dp: int = 9,
) -> DataFrame:
    """Context-window eviction policy comparison: given a token budget
    per conversation, how much does each standard assembly policy
    retain?  The serving-side question behind every 'truncate the
    history' heuristic, answered exactly from the corpus before
    anyone ships the heuristic:

    - ``recency``: keep the longest SUFFIX of turns fitting the budget
      (the sliding-window default);
    - ``longest_first``: the standard skip-greedy knapsack heuristic —
      walk turns by descending token count, keep each one that still
      fits the remaining budget (an oversized turn is SKIPPED, not a
      stopper).

    Per conversation: ``n_turns``, ``total_tokens``, per policy the
    kept-turn count and retained token fraction (one rounded division
    of exact integers).  One conversation-partitioned window (the
    recency suffix) + one groupBy; the skip-greedy runs IN-ROW as a
    fold over the size-sorted array with a single encoded accumulator
    ``tok * 4096 + kept`` — identical on both engines because the
    first folded element equals step(0, e) (conversations are bounded
    well under 4096 turns by construction)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    from pyspark.sql import Window

    from flow_indexer_spark.operators.dedup import tokens

    t = df.select(
        F.col(conv_col).alias("c"),
        F.col(idx_col).alias("i"),
        F.size(tokens(text_col)).cast("bigint").alias("n"),
    )
    w_suf = (
        Window.partitionBy("c")
        .orderBy(F.desc("i"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("suf", F.sum("n").over(w_suf))
    keep_rec = F.when(F.col("suf") <= budget, 1).otherwise(0)
    enc = lambda x: F.when(  # noqa: E731
        x <= budget, x * 4096 + 1
    ).otherwise(F.lit(0).cast("bigint"))
    # tok(acc) = floor(acc / 4096): division by a power of two is
    # IEEE-exact, so the floor is the true integer quotient
    step = lambda acc, e: F.when(  # noqa: E731
        F.floor(acc / 4096) + F.floor(e / 4096) <= budget, acc + e
    ).otherwise(acc)
    per = t.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(keep_rec).cast("bigint").alias("kept_recency"),
        F.sum(F.when(F.col("suf") <= budget, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("tok_recency"),
        F.aggregate(
            F.transform(
                F.reverse(F.array_sort(F.collect_list("n"))),
                lambda x: enc(x),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, e: step(acc, e),
        ).alias("_acc"),
    )
    per = per.withColumn(
        "kept_longest", (F.col("_acc") % 4096).cast("bigint")
    ).withColumn(
        "tok_longest", F.expr("_acc div 4096").cast("bigint")
    )
    frac = lambda c: F.when(  # noqa: E731
        F.col("total_tokens") > 0,
        F.round(F.col(c) / F.col("total_tokens"), dp),
    ).otherwise(F.lit(None))
    return per.select(
        F.col("c").alias(conv_col),
        "n_turns",
        "total_tokens",
        "kept_recency",
        frac("tok_recency").alias("retained_recency"),
        "kept_longest",
        frac("tok_longest").alias("retained_longest"),
    )


def tool_loop_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    max_period: int = 4,
) -> DataFrame:
    """Agent LOOP detection: per conversation, the longest run of
    period-``p`` repetition in the ordered tool-call sequence for each
    p in 1..``max_period`` — 'the agent is calling the same tool (or
    the same short cycle of tools) over and over', the stuck-loop
    health gate agent-ops wants BEFORE retry budgets burn.  A turn
    position matches period p when its tool equals the tool p
    tool-turns earlier; a maximal run of r consecutive matches spans
    r + p positions = (r + p) / p cycle repetitions.

    Output per conversation: ``n_tool_turns``, ``cyc<p>`` (max cycle
    count at period p, >= 1), ``max_cycles``, ``loop_period`` (the
    SMALLEST period achieving max_cycles — deterministic), and
    ``is_looping`` (max_cycles >= 3: the cycle repeated at least
    thrice).

    Shape: one conversation-window pass computing all ``max_period``
    lags, an in-row melt to (conv, period, match) long form, ONE
    (conv, period)-partitioned window for the run-break counter, and
    two map-side-combined groupBys — nothing corpus-global, rows
    bounded by max_period x tool turns.  All-integer output:
    hash-exact on both engines."""
    w = Window.partitionBy("c").orderBy("i")
    t = (
        df.filter(
            F.col(tool_col).isNotNull() & (F.col(tool_col) != F.lit(""))
        )
        .select(
            F.col(conv_col).alias("c"),
            F.col(idx_col).alias("i"),
            F.col(tool_col).alias("tl"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    lags = t.select(
        "c",
        "rn",
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("p"),
                    F.coalesce(
                        (F.lag("tl", p).over(w) == F.col("tl")).cast("int"),
                        F.lit(0),
                    ).alias("m"),
                )
                for p in range(1, max_period + 1)
            ]
        ).alias("_ms"),
    )
    long = lags.select(
        "c", "rn", F.explode("_ms").alias("pm")
    ).select("c", "rn", F.col("pm.p").alias("p"), F.col("pm.m").alias("m"))
    wpp = (
        Window.partitionBy("c", "p")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = long.withColumn("brk", F.sum(1 - F.col("m")).over(wpp))
    per_run = runs.groupBy("c", "p", "brk").agg(
        F.sum("m").cast("bigint").alias("r")
    )
    per_p = per_run.groupBy("c", "p").agg(F.max("r").alias("rmax"))
    cyc = per_p.select(
        "c",
        "p",
        F.expr("(rmax + p) div p").cast("bigint").alias("cyc"),
    )
    wide = cyc.groupBy("c").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("p") == p, F.col("cyc"))), F.lit(1)
            )
            .cast("bigint")
            .alias(f"cyc{p}")
            for p in range(1, max_period + 1)
        ]
    )
    n_turns = t.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_tool_turns")
    )
    mx = F.greatest(*[F.col(f"cyc{p}") for p in range(1, max_period + 1)])
    out = wide.join(n_turns, "c").withColumn("max_cycles", mx)
    period_pick = F.lit(None).cast("bigint")
    for p in range(max_period, 0, -1):  # smallest period wins
        period_pick = F.when(
            F.col(f"cyc{p}") == F.col("max_cycles"), F.lit(p).cast("bigint")
        ).otherwise(period_pick)
    return out.select(
        F.col("c").alias(conv_col),
        "n_tool_turns",
        *[f"cyc{p}" for p in range(1, max_period + 1)],
        "max_cycles",
        period_pick.alias("loop_period"),
        (F.col("max_cycles") >= 3).alias("is_looping"),
    )
