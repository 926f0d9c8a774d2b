"""Open-representation membership/frequency sketches: Bloom filter and
Count-Min, built and queried as plain DataFrames.

:mod:`sketches` wraps the DataSketches binary aggregates (HLL/Theta/
KLL); these two are the other classic pair, implemented OPEN — the
sketch is an ordinary table of integers — because that is what makes
them useful inside a pipeline at 100 TB:

- **Bloom filter** (Bloom 1970): a sparse (lane, mask) bit table. The
  scale use is *join pruning*: build a filter over the small-but-not-
  broadcastable side's keys, semi-filter the 100 TB side BEFORE the
  shuffle — rows that fail the filter can't join (no false negatives),
  and the false-positive rate only costs shuffled bytes, never
  correctness. This is exactly the LevelDB bloom filter the reference
  leans on for point lookups (/root/reference/store/leveldb.go:35
  ``leveldb.NewBloomFilter(10)``), lifted to a relational object.
- **Count-Min** (Cormode & Muthukrishnan 2005): a depth x width counter
  grid; point frequency = min over rows. Mergeable by cell-wise SUM
  (linear sketch), biased >= truth, never under. The streaming
  heavy-hitter companion to heavyhitters.py's exact Misra-Gries pass.

Both are DETERMINISTIC given (seed, geometry): positions come from
md5 of a salted key — portable bit-for-bit to the DuckDB oracle, like
functions/extractors' md5_int32. Bits pack into 32-bit lanes of a
BIGINT so neither engine touches the sign bit.

Scale shape: build = one in-row position explode + one map-side-
combined bit_or/sum agg (output is lanes/cells-sized, constant);
merge of incremental builds = the same agg over unioned sketch tables;
probe = a lanes-keyed hash join (the sketch is small enough to
broadcast, and Spark does, but correctness never depends on it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(key: Column, salt: str, i: int, modulus: int) -> Column:
    """Deterministic position i for ``key``: first 8 md5 hex digits of
    the salted key as an int, mod ``modulus`` (md5_int32 discipline —
    < 2^32, so always positive in a BIGINT)."""
    h = F.md5(F.concat(F.lit(f"{salt}{i}|"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
        % F.lit(modulus)
    ).cast("int")


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over the column's values -> sparse
    (lane, mask) table: lane = bit_position / 32, mask = OR of
    (1 << bit_position % 32). Lanes no key touches are absent (sparse).
    Merge incremental builds by re-aggregating bit_or over their union.
    """
    if m_bits < 32 or m_bits % 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.col(key_col)
    pos = F.array(*[_pos(key, "bf", i, m_bits) for i in range(k)])
    return (
        df.select(F.explode(pos).alias("_p"))
        .select(
            (F.col("_p") / 32).cast("int").alias("lane"),
            # F.shiftleft only takes a literal shift; the per-row shift
            # goes through expr()
            F.expr("shiftleft(CAST(1 AS BIGINT), _p % 32)").alias("_m"),
        )
        .groupBy("lane")
        .agg(F.bit_or("_m").alias("mask"))
    )


def bloom_probe(
    bloom_df: DataFrame,
    probe_df: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe: adds ``in_bloom`` (true iff every one of the key's k bits
    is set — may be a false positive, never a false negative). Geometry
    (m_bits, k) must match the build. ``probe_df`` rows must be
    distinct (the k exploded positions regroup on all probe columns)."""
    key = F.col(key_col)
    pos = F.array(*[_pos(key, "bf", i, m_bits) for i in range(k)])
    probed = probe_df.select(
        "*", F.explode(pos).alias("_p")
    ).select(
        "*",
        (F.col("_p") / 32).cast("int").alias("lane"),
        (F.col("_p") % 32).alias("_bit"),
    )
    hit = (
        F.coalesce(F.col("mask"), F.lit(0).cast("bigint")).bitwiseAND(
            F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")
        )
        != 0
    )
    return (
        probed.join(bloom_df, ["lane"], "left")
        .select(*probe_df.columns, hit.alias("_hit"))
        .groupBy(*probe_df.columns)
        .agg(F.bool_and("_hit").alias("in_bloom"))
    )


def countmin_build(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 3,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch -> (row, col, cnt) cell table (zero
    cells absent). Merge incremental builds by summing cells; the
    estimate is biased >= truth by construction."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    key = F.col(key_col)
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _pos(key, "cm", r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("_c"), w.alias("_w"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_estimate(
    cm_df: DataFrame,
    probe_df: DataFrame,
    key_col: str = "key",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: adds ``est`` = min over the key's
    depth cells (an absent cell reads 0 — the key was never counted).
    Geometry must match the build; ``probe_df`` rows must be distinct
    (the depth exploded cells regroup on all probe columns)."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _pos(key, "cm", r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        probe_df.select("*", F.explode(cells).alias("_c"))
        .select("*", F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .join(cm_df, ["row", "col"], "left")
        .select(
            *probe_df.columns,
            F.coalesce("cnt", F.lit(0).cast("bigint")).alias("_cell"),
        )
        .groupBy(*probe_df.columns)
        .agg(F.min("_cell").alias("est"))
    )


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """The scale idiom the Bloom filter exists for: pre-filter ``big``
    by a filter built over ``small``'s join keys, then inner-join. The
    result is EXACTLY big JOIN small (false positives are removed by
    the real join; false negatives don't exist) — but the shuffle only
    carries big-side rows that can possibly match. With the sparse
    (lane, mask) table the filter side is tiny and broadcasts."""
    bl = bloom_build(small.select(key_col), key_col, m_bits, k)
    pruned = bloom_probe(bl, big, key_col, m_bits, k).filter(
        "in_bloom"
    ).drop("in_bloom")
    return pruned.join(small, [key_col], "inner")


def hll_build(
    df: DataFrame,
    key_col: str = "key",
    p: int = 10,
) -> DataFrame:
    """Open-representation HyperLogLog (Flajolet et al. 2007) register
    table over the column's values — the third classic sketch beside
    Bloom and Count-Min, OPEN like them: the sketch is an ordinary
    (j, r) DataFrame, so it shuffles, merges (cell-wise MAX over a
    union), persists, and oracle-checks like any table, where the
    DataSketches binary HLL (operators/sketches.py) is an opaque blob.

    Hash discipline: 60 bits from the first 15 md5 hex digits of the
    key (md5_int32 family — portable bit-for-bit to the DuckDB
    oracle, never touches the BIGINT sign).  j = low ``p`` bits
    (register index), w = high 60-p bits, r = rho(w) = leading-zero
    count + 1 in the (60-p)-bit window (w == 0 -> 61-p).  Registers no
    key touches are ABSENT (sparse, value 0).

    Scale shape: one in-row projection + one map-side-combined MAX agg;
    output is at most 2^p rows regardless of input size.  Distributed
    build = this agg per partition-group, merged by the same MAX."""
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    key = F.col(key_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    m = 1 << p
    wbits = 60 - p
    j = (h % F.lit(m)).cast("int")
    w = F.shiftright(h, p)  # exact bit shift — `/` would round via double
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(j.alias("j"), rho.cast("int").alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """Register table -> one row (m_registers, n_zero_registers, rmax,
    hll_estimate): the raw harmonic-mean estimate alpha_m * m^2 / Z.

    Cross-engine float pinning: Z = sum_j 2^-M_j is computed EXACTLY —
    Z = S / 2^Rmax with S = sum_j 2^(Rmax - M_j), each term a bigint
    shiftleft (Rmax <= 61 - p + p = 61), summed in DECIMAL(38,0)
    (S <= 2^p * 2^61 < 10^38); the estimate is then one deterministic
    IEEE double expression alpha * m * m * 2^Rmax / S — multiplication
    and division are correctly rounded, identical on Spark and DuckDB.
    alpha_m = 0.7213 / (1 + 1.079/m) (the m >= 128 constant; p >= 7
    enforced so the small-m constants never apply).  No bias/linear-
    counting correction: this reports the RAW estimator, and the
    companion query carries the exact distinct count beside it."""
    if not 7 <= p <= 14:
        raise ValueError("p must be in [7, 14] (alpha formula regime)")
    m = 1 << p
    agg = registers.agg(
        F.count("*").cast("bigint").alias("_nset"),
        F.coalesce(F.max("r"), F.lit(0)).cast("int").alias("rmax"),
    )
    reg_sum = registers.crossJoin(F.broadcast(agg)).select(
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), rmax - r) AS decimal(38,0))")
        .alias("_t")
    ).agg(F.coalesce(F.sum("_t"), F.lit(0).cast("decimal(38,0)")).alias("_ssum"))
    out = agg.crossJoin(F.broadcast(reg_sum)).select(
        F.lit(m).cast("bigint").alias("m_registers"),
        (F.lit(m) - F.col("_nset")).cast("bigint").alias("n_zero_registers"),
        "rmax",
        (
            F.col("_ssum")
            + (F.lit(m) - F.col("_nset")).cast("decimal(38,0)")
            * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), rmax) AS decimal(38,0))")
        ).alias("_S"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return out.select(
        "m_registers",
        "n_zero_registers",
        "rmax",
        (
            F.lit(alpha * m * m)
            * F.pow(F.lit(2.0), F.col("rmax").cast("double"))
            / F.col("_S").cast("double")
        ).alias("hll_estimate"),
    )
