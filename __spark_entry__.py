"""Driver contract for the spark-graft builder (PySpark target).

Maps the operator inventory of SURVEY.md §2 onto the driver's parquet
testdata tables. Each ``queries()`` entry has a matching ``oracle_sql()``
ANSI-SQL string for DuckDB; column names and value representations are
aligned on both sides (floats produced from exact decimal sums / explicit
casts, timestamps stringified) so the order-insensitive value-hash matches.

The transcript pipeline itself (the north_star) is exercised two ways:
- ``entry()`` runs the real extract→index engine over transcripts
  synthesized deterministically from sf0.001 ``events``;
- ``pipeline_postings_exploded`` / ``pipeline_routed_counts`` run it at the
  target sf with a full DuckDB oracle re-deriving the same posting rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Transcript synthesis (deterministic, SQL-expressible on both engines):
# events -> (conv_id, turn_idx, role, text, tool, ts) with one embedded
# IPv4 per turn derived from (user_id, event_id).
# ---------------------------------------------------------------------------

def synth_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.concat(
            F.lit("evt "),
            F.col("props"),
            F.lit(" from 10."),
            (F.col("user_id") % 200).cast("string"),
            F.lit("."),
            (F.col("event_id") % 200).cast("string"),
            F.lit(".7"),
        ).alias("text"),
        F.lit("").alias("tool"),
        F.col("ts"),
    )


_SYNTH_SQL = """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id AS INTEGER) AS turn_idx,
           event_type AS role,
           'evt ' || props || ' from 10.' || CAST(user_id % 200 AS VARCHAR)
                  || '.' || CAST(event_id % 200 AS VARCHAR) || '.7' AS text,
           ts
    FROM events
"""

# key derived from the synthesized columns (conv_id==user_id, turn_idx==event_id)
_SYNTH_IP_KEY_SQL = (
    "printf('0a%02x%02x07', CAST(CAST(conv_id AS BIGINT) % 200 AS INTEGER),"
    " CAST(turn_idx % 200 AS INTEGER))"
)


def _q_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full engine run — extract entities from synthesized
    transcripts, build the salted inverted index, return it exploded."""
    from flow_indexer_spark.functions.extractors import extract_entities
    from flow_indexer_spark.operators.postings import build_postings

    t = synth_transcripts(spark, sf_dir)
    postings = build_postings(extract_entities(t), n_salt=8)
    return (
        postings.select(
            "entity_class", "entity_key", F.explode("postings").alias("p")
        )
        .select("entity_class", "entity_key", "p.conv_id", "p.turn_idx")
        .orderBy("entity_class", "entity_key", "conv_id", "turn_idx")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_entry(spark, SF_DEFAULT)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# --- the pipeline itself, oracle-checked (A2 + J4 + K2) --------------------

@_register(
    "pipeline_postings_exploded",
    f"""
    WITH t AS ({_SYNTH_SQL}),
    ip AS (
      SELECT 'ip' AS entity_class, {_SYNTH_IP_KEY_SQL} AS entity_key,
             conv_id, turn_idx
      FROM t
    ),
    role AS (
      SELECT 'role' AS entity_class, role AS entity_key, conv_id, turn_idx
      FROM t WHERE role IS NOT NULL AND role <> ''
    )
    SELECT DISTINCT * FROM (SELECT * FROM ip UNION ALL SELECT * FROM role)
    ORDER BY entity_class, entity_key, conv_id, turn_idx
    """,
)
def _q_pipeline_postings(spark, sf_dir):
    return _q_entry(spark, sf_dir)


@_register(
    "pipeline_routed_counts",
    f"""
    WITH t AS ({_SYNTH_SQL}),
    ip AS (
      SELECT 'ip' AS entity_class, {_SYNTH_IP_KEY_SQL} AS entity_key,
             conv_id, turn_idx FROM t
    ),
    role AS (
      SELECT 'role' AS entity_class, role AS entity_key, conv_id, turn_idx
      FROM t WHERE role IS NOT NULL AND role <> ''
    ),
    all_e AS (
      SELECT DISTINCT * FROM (SELECT * FROM ip UNION ALL SELECT * FROM role)
    )
    SELECT entity_class, COUNT(*) AS n_rows,
           COUNT(DISTINCT entity_key) AS n_entities
    FROM all_e GROUP BY entity_class ORDER BY entity_class
    """,
)
def _q_pipeline_routed_counts(spark, sf_dir):
    """Per-sink aggregate counts — the north_rule correctness metric."""
    from flow_indexer_spark.functions.extractors import extract_entities

    t = synth_transcripts(spark, sf_dir)
    e = extract_entities(t)
    return (
        e.groupBy("entity_class")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("entity_key").alias("n_entities"),
        )
        .orderBy("entity_class")
    )


# --- inverted index over documents (A1/A2/A8/J3/P6/O2) ---------------------

@_register(
    "token_postings",
    """
    SELECT token, COUNT(DISTINCT doc_id) AS ndocs, COUNT(*) AS nhits
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token ORDER BY token
    """,
)
def _q_token_postings(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        tok.groupBy("token")
        .agg(F.count_distinct("doc_id").alias("ndocs"), F.count("*").alias("nhits"))
        .orderBy("token")
    )


@_register(
    "token_search",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
    ORDER BY doc_id
    """,
)
def _q_token_search(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.array_contains(F.split("text", " "), "spark"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@_register(
    "token_expand_range",
    """
    SELECT DISTINCT token FROM
      (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token >= 'm' AND token < 'q'
    ORDER BY token
    """,
)
def _q_token_expand(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter((F.col("token") >= "m") & (F.col("token") < "q"))
        .distinct()
        .orderBy("token")
    )


@_register(
    "per_doc_distinct_tokens",
    """
    SELECT doc_id, COUNT(DISTINCT token) AS n_distinct
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def _q_per_doc_distinct(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        tok.groupBy("doc_id")
        .agg(F.count_distinct("token").alias("n_distinct"))
        .orderBy("doc_id")
    )


@_register(
    "doc_resolve_join",
    """
    SELECT d.doc_id, d.n_chars, d.lang FROM documents d
    WHERE list_contains(string_split(d.text, ' '), 'vector')
    ORDER BY d.doc_id
    """,
)
def _q_doc_resolve(spark, sf_dir):
    """J1/J3: posting hits resolved back to doc rows via semi-join."""
    d = _t(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") == "vector")
        .select("doc_id")
        .distinct()
    )
    return (
        d.join(hits, "doc_id", "left_semi")
        .select("doc_id", "n_chars", "lang")
        .orderBy("doc_id")
    )


@_register(
    "family_length_filter",
    """
    SELECT length(token) AS key_len, COUNT(DISTINCT token) AS n_keys
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY length(token) ORDER BY key_len
    """,
)
def _q_family_filter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(F.length("token").alias("key_len"))
        .agg(F.count_distinct("token").alias("n_keys"))
        .orderBy("key_len")
    )


# --- grok/regex parse over events (S5/S6/F9) --------------------------------

@_register(
    "props_regex_extract",
    """
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY k_mod ORDER BY k_mod
    """,
)
def _q_props_regex(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("k_mod")
    )


@_register(
    "props_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events GROUP BY k ORDER BY k
    """,
)
def _q_props_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("k")
    )


# --- time-bucket stats (A5/A6/F7) -------------------------------------------

@_register(
    "stats_two_level_buckets",
    """
    SELECT strftime(date_trunc('month', ts), '%Y-%m') AS bucket,
           COUNT(DISTINCT date_trunc('day', ts)) AS hits,
           COUNT(*) AS total
    FROM events GROUP BY bucket ORDER BY bucket
    """,
)
def _q_stats_buckets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("bucket"))
        .agg(
            F.count_distinct(F.date_trunc("day", "ts")).alias("hits"),
            F.count("*").alias("total"),
        )
        .orderBy("bucket")
    )


@_register(
    "stats_minmax",
    """
    SELECT event_type, COUNT(*) AS hits,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def _q_stats_minmax(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("hits"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last"),
        )
        .orderBy("event_type")
    )


# --- joins (J1/J2/J4) --------------------------------------------------------

@_register(
    "enrich_broadcast_dims",
    """
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY region_name
    """,
)
def _q_enrich(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("region_name")
    )


@_register(
    "manifest_anti_join",
    """
    SELECT n.n_name AS nation_name, COUNT(*) AS n_idle
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name ORDER BY nation_name
    """,
)
def _q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_idle"))
        .orderBy("nation_name")
    )


# --- generic relational parity (classic agg + top-k join) -------------------

@_register(
    "tpch_q1_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "topk_revenue_orders",
    """
    SELECT o.o_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def _q_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


# --- training-data ops: dedup / fingerprint / quality / lang-id -------------

@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY text_hash
    """,
)
def _q_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .orderBy("text_hash")
    )


@_register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def _q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.array_sort(
        F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    )
    return d.select(
        "doc_id", F.md5(F.concat_ws(" ", toks)).alias("fp")
    ).orderBy("doc_id")


@_register(
    "minhash_lsh_buckets",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tok
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
             list_aggregate(list_transform(tok, x -> md5('b0' || x)), 'min') AS band0,
             list_aggregate(list_transform(tok, x -> md5('b1' || x)), 'min') AS band1
      FROM toks
    )
    SELECT band0 AS bucket, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM sigs GROUP BY band0 HAVING COUNT(*) > 1 ORDER BY bucket
    """,
)
def _q_minhash(spark, sf_dir):
    """MinHash band signature -> LSH buckets with >1 member (near-dup
    candidates). md5-based hash family so both engines agree exactly."""
    d = _t(spark, sf_dir, "documents")
    tok = F.filter(F.split("text", " "), lambda x: x != "")
    band0 = F.array_min(F.transform(tok, lambda x: F.md5(F.concat(F.lit("b0"), x))))
    sigs = d.select("doc_id", band0.alias("band0"))
    return (
        sigs.groupBy(F.col("band0").alias("bucket"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
        .orderBy("bucket")
    )


@_register(
    "text_quality",
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           length(text) AS n_chars_raw,
           CAST(len(list_filter(string_split(text, ' '),
                x -> list_contains(['the','a','of','and','to'], x))) AS BIGINT) AS n_stopwords
    FROM documents ORDER BY doc_id
    """,
)
def _q_text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to"]])
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_raw"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast("bigint").alias(
            "n_stopwords"
        ),
    ).orderBy("doc_id")


@_register(
    "token_count_bpe",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def _q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))
        ).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@_register(
    "lang_id_heuristic",
    """
    SELECT CASE WHEN len(list_filter(string_split(text, ' '),
                     x -> list_contains(['the','a','and','of'], x))) >= 2
                THEN 'en_like' ELSE 'other' END AS pred_lang,
           COUNT(*) AS n_docs
    FROM documents GROUP BY pred_lang ORDER BY pred_lang
    """,
)
def _q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "and", "of"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    return (
        d.select(
            F.when(n_stop >= 2, "en_like").otherwise("other").alias("pred_lang")
        )
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("pred_lang")
    )


# --- embeddings: similarity search -------------------------------------------

@_register(
    "ann_topk_cosine",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_inner_product(
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(q.qv, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_inner_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                        list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                * sqrt(list_inner_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),
                                          list_transform(q.qv, x -> CAST(x AS DOUBLE)))))
             DESC, e.vec_id
    LIMIT 20
    """,
)
def _q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exact baseline; LSH-bucketed variant is
    the scale path). Returns ids only — float sims are engine-rounding bait."""
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "emb", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qv"))
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "sim", dot(F.col("emb"), F.col("qv")) / (F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qv"), F.col("qv"))))
        )
    )
    return scored.orderBy(F.desc("sim"), "vec_id").select("vec_id", "label").limit(20)


@_register(
    "embedding_label_norms",
    """
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(CAST(list_inner_product(
                list_transform(embedding, x -> CAST(x AS DOUBLE)),
                list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DECIMAL(28,10))) AS DOUBLE)
             AS sum_sq_norm
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def _q_embedding_norms(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "emb", F.col("embedding").cast("array<double>")
    )
    dot = F.aggregate(
        F.zip_with("emb", "emb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(dot.cast("decimal(28,10)")).cast("double").alias("sum_sq_norm"),
        )
        .orderBy("label")
    )


# --- set ops (U1) ------------------------------------------------------------

@_register(
    "union_entity_classes",
    """
    SELECT entity_class, entity_key, n FROM (
      SELECT 'token' AS entity_class, token AS entity_key, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token
      UNION ALL
      SELECT 'event_type' AS entity_class, event_type AS entity_key, COUNT(*) AS n
      FROM events GROUP BY event_type
    ) ORDER BY entity_class, entity_key
    """,
)
def _q_union_classes(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    tok = (
        d.select(F.explode(F.split("text", " ")).alias("entity_key"))
        .filter(F.col("entity_key") != "")
        .groupBy("entity_key")
        .agg(F.count("*").alias("n"))
        .select(F.lit("token").alias("entity_class"), "entity_key", "n")
    )
    et = (
        ev.groupBy(F.col("event_type").alias("entity_key"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("event_type").alias("entity_class"), "entity_key", "n")
    )
    return tok.unionByName(et).orderBy("entity_class", "entity_key")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query."""
    return dict(_ORACLES)
