"""Longest-prefix-match CIDR block enrichment.

The reference answers "which documents contain an IP in this CIDR"
(range scan over sorted keys, store/leveldb.go:147-205). The inverse
enrichment — classify every extracted IP into its containing network
block from a block dimension (netblock registry, RFC1918 classes,
geo/ASN feeds) — is a routing-table LONGEST-prefix match: overlapping
blocks are resolved to the most specific one.

Scale shape: a naive formulation is a non-equi theta join
(``substr(key, 1, b.nibbles) = b.prefix`` references both sides), which
Spark can only execute as BroadcastNestedLoopJoin — O(|fact| x |dim|)
comparisons. The standard fix (as used in IP-geolocation joins at
scale) is prefix-length bucketing: the dim is tiny and driver-visible,
so group its blocks by prefix length, and for each of the (few)
distinct lengths emit ONE broadcast hash equi-join on the
length-truncated key. The fact table is scanned once per distinct
prefix length with zero shuffles (broadcast joins only); the union
resolves to the longest match with one ``max_by`` aggregation on the
row key. Nibble-aligned prefixes (multiples of 4 bits) truncate via
``substring`` on the hex key — non-aligned lengths would need a
masked-nibble compare and are rejected explicitly rather than
silently mis-matched.

Keys are the engine's canonical fixed-width hex entity keys
(functions/keys.py: 8 hex chars v4, 32 v6 — byte order = numeric
order, ipset/ipset.go:23-37), so prefix truncation IS network
truncation and the v4/v6 family guard is a key-length equality.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.functions.keys import V4_KEY_LEN, V6_KEY_LEN


def block_table(blocks: list[tuple[str, str]]) -> list[dict]:
    """(name, cidr) pairs -> validated block rows
    [{name, prefix, nibbles, prefix_len, key_len}]. Raises ValueError on
    bad CIDRs, non-nibble-aligned prefix lengths, or duplicate names."""
    rows = []
    seen = set()
    for name, cidr in blocks:
        if name in seen:
            raise ValueError(f"duplicate block name: {name!r}")
        seen.add(name)
        net = ipaddress.ip_network(cidr, strict=True)
        plen = net.prefixlen
        if plen % 4 != 0:
            raise ValueError(
                f"block {name!r}: prefix /{plen} is not nibble-aligned "
                "(hex-substring LPM supports multiples of 4 bits)"
            )
        key_len = V4_KEY_LEN if net.version == 4 else V6_KEY_LEN
        rows.append(
            {
                "name": name,
                "prefix": net.network_address.packed.hex()[: plen // 4],
                "nibbles": plen // 4,
                "prefix_len": plen,
                "key_len": key_len,
            }
        )
    return rows


def lpm_enrich(
    df: DataFrame,
    blocks: list[tuple[str, str]],
    key_col: str = "entity_key",
    id_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Annotate each row with the LONGEST matching block:
    input columns + (block_name, prefix_len), nulls where no block
    contains the key. ``id_cols`` must uniquely identify input rows
    (default: ``key_col`` alone — correct when enriching a distinct
    entity table); an explicit unique key keeps the operator
    deterministic instead of leaning on a generated row id.
    """
    ids = list(id_cols) if id_cols is not None else [key_col]
    table = block_table(blocks)
    spark = df.sparkSession

    by_len: dict[tuple[int, int], list[dict]] = {}
    for row in table:
        by_len.setdefault((row["nibbles"], row["key_len"]), []).append(row)

    matches = None
    for (nib, key_len), rows in sorted(by_len.items()):
        import pandas as pd

        # pandas/Arrow LocalRelation, not a pickled-list RDD (see
        # sources/manifest._local_manifest_df for the measured cost)
        dim = spark.createDataFrame(
            pd.DataFrame(
                [(r["prefix"], r["name"], r["prefix_len"]) for r in rows],
                columns=["prefix", "block_name", "prefix_len"],
            ),
            "prefix string, block_name string, prefix_len int",
        )
        m = (
            df.filter(F.length(key_col) == key_len)
            .withColumn("_pfx", F.substring(key_col, 1, nib))
            .join(F.broadcast(dim), F.col("_pfx") == dim["prefix"])
            .select(*ids, "block_name", "prefix_len")
        )
        matches = m if matches is None else matches.unionByName(m)
    if matches is None:
        return df.withColumn("block_name", F.lit(None).cast("string")).withColumn(
            "prefix_len", F.lit(None).cast("int")
        )
    winners = matches.groupBy(*ids).agg(
        F.max_by(
            F.struct("block_name", "prefix_len"),
            # longest prefix wins; name as the deterministic tiebreak for
            # equal-length duplicate blocks
            F.struct("prefix_len", "block_name"),
        ).alias("_w")
    ).select(*ids, F.col("_w.block_name"), F.col("_w.prefix_len"))
    return df.join(winners, ids, "left")


def lpm_enrich_inrow(
    df: DataFrame,
    blocks: list[tuple[str, str]],
    key_col: str = "entity_key",
) -> DataFrame:
    """Join-free LPM: the block table compiled into literal in-row MAP
    lookups — input columns + (block_name, prefix_len), row count
    unchanged, no unique-id requirement.

    For a driver-visible dim (a handful to a few thousand blocks) even
    the broadcast join is overhead: each distinct (prefix_len, family)
    becomes one ``map<prefix, struct>`` literal probed with the
    length-truncated key, and ``coalesce`` over the probes in
    descending prefix-length order IS the longest-match rule. The whole
    operator is a single projection inside the scan's WholeStageCodegen
    span — zero joins, zero shuffles, zero extra scans of ``df``
    (the join formulation re-executes the input subtree once per
    distinct prefix length: measured 4.2 s -> 1.5 s enriching the
    extracted-entity table at sf0.1, where three scans of the
    regex-extract upstream dominated). Use :func:`lpm_enrich` when the
    block table is itself a big dataset (full routing/ASN feeds).

    Differential twin contract: identical output to ``lpm_enrich`` on
    any input (equal-length duplicate prefixes resolve to the greater
    name, matching max_by's tiebreak) — pinned by the tests.
    """
    table = block_table(blocks)
    by_len: dict[tuple[int, int], dict[str, tuple[str, int]]] = {}
    for row in sorted(table, key=lambda r: r["name"]):
        grp = by_len.setdefault((row["nibbles"], row["key_len"]), {})
        # later (greater) name wins an exact duplicate prefix, matching
        # the join path's max_by(struct(prefix_len, block_name))
        grp[row["prefix"]] = (row["name"], row["prefix_len"])

    probes = []
    for (nib, key_len), entries in sorted(by_len.items(), reverse=True):
        pairs = []
        for pfx, (name, plen) in entries.items():
            pairs += [
                F.lit(pfx),
                F.struct(
                    F.lit(name).alias("block_name"),
                    F.lit(plen).alias("prefix_len"),
                ),
            ]
        probe = F.when(
            F.length(key_col) == key_len,
            F.create_map(*pairs)[F.substring(key_col, 1, nib)],
        )
        probes.append(probe)
    if not probes:
        return df.withColumn("block_name", F.lit(None).cast("string")).withColumn(
            "prefix_len", F.lit(None).cast("int")
        )
    # v4 and v6 groups are disjoint on the length guard, so sorting the
    # probe list by descending (nibbles, key_len) yields longest-first
    # within each family and coalesce returns the longest match
    hit = F.coalesce(*probes)
    return df.withColumn("block_name", hit["block_name"]).withColumn(
        "prefix_len", hit["prefix_len"]
    )
