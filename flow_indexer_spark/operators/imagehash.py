"""Perceptual image hashing (pHash) + banded Hamming near-dup join.

Near-duplicate IMAGE detection is the multimodal twin of the text
dedup suite: a training corpus at 100 TB carries the same screenshot /
logo / meme re-encoded thousands of times, and byte-level exact dedup
misses every re-encode. pHash makes the signature content-level: decode
pixels (operators/codecs.py — real PPM/PNG parsers), downsample luma to
32x32, 2-D DCT-II, threshold the top-left 8x8 coefficient block (minus
DC) at its median -> 63 stable bits. Small pixel noise, recompression,
and brightness shifts (DC-only) leave the hash within a few bits;
different images land ~32 bits apart (measured on the fixture family:
near <= 2, far >= 20).

Scale topology is IDENTICAL to simhash_near_pairs
(operators/dedup.py): split the 64-bit hash into 4 x 16-bit bands, an
r-bit-different pair must agree on >= 1 whole band (pigeonhole: 4 bands
can absorb at most 3 flipped-band boundaries at Hamming distance <= 3
per band), so candidates come from equi-joins on (band_idx, band_val)
buckets — never an all-pairs product — with the same degenerate-bucket
cap, then exact `bit_count(a ^ b)` verifies inside the candidate set.

Python appears only in the Arrow-batched decode+hash stage (numpy DCT
per image, same mapInPandas seam as the codec featurizers); banding,
the join, and Hamming verification are all JVM-side expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flow_indexer_spark.operators.codecs import decode_pixels, encode_png

_N = 32  # downsample side
_DCT = np.cos(
    np.pi
    * (2 * np.arange(_N)[None, :] + 1)
    * np.arange(_N)[:, None]
    / (2 * _N)
)


def phash64_pixels(px: np.ndarray) -> int:
    """63-bit perceptual hash of an (h, w, 3) uint8 pixel array (top
    bit always 0, so the value is a valid non-negative int64)."""
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    h, w = luma.shape
    ri = np.round(np.linspace(0, h - 1, _N)).astype(int)
    ci = np.round(np.linspace(0, w - 1, _N)).astype(int)
    small = luma[np.ix_(ri, ci)].astype(np.float64)
    d = _DCT @ small @ _DCT.T
    block = d[:8, :8].flatten()[1:]  # drop DC: brightness-invariant
    med = np.median(block)
    v = 0
    for b in block > med:
        v = (v << 1) | int(b)
    return v


# --- deterministic fixture family: smooth random images + noisy twins ------


def smooth_image(base: int, w: int = 64, h: int = 48) -> np.ndarray:
    """Bilinear upsample of a seeded random 8x8 grid: every DCT
    coefficient in the hashed block is structurally meaningful, so the
    63 hash bits are all signal (a pure sinusoid would leave most
    coefficients as numerical dust and the median threshold unstable)."""
    rng = np.random.default_rng(1000 + base)
    grid = rng.integers(30, 226, (8, 8)).astype(np.float64)
    yi = np.linspace(0, 7, h)
    xi = np.linspace(0, 7, w)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, 7)
    x1 = np.minimum(x0 + 1, 7)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    v = (
        grid[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + grid[np.ix_(y1, x0)] * fy * (1 - fx)
        + grid[np.ix_(y0, x1)] * (1 - fy) * fx
        + grid[np.ix_(y1, x1)] * fy * fx
    )
    v8 = np.clip(np.round(v), 0, 255).astype(np.uint8)
    return np.repeat(v8[:, :, None], 3, axis=2)


def noisy_twin(px: np.ndarray, base: int) -> np.ndarray:
    """Dense low-amplitude seeded noise — the 're-encoded copy' stand-in
    (high-frequency damage the hashed low-frequency block shrugs off)."""
    rng = np.random.default_rng(5000 + base)
    noise = rng.integers(-6, 7, px.shape[:2])
    return np.clip(px.astype(np.int16) + noise[:, :, None], 0, 255).astype(
        np.uint8
    )


def make_phash_media(spark, n_pairs: int = 24) -> DataFrame:
    """2*n_pairs PNG payloads synthesized on executors: media 2k is a
    smooth random image, 2k+1 its noisy twin — ground truth for the
    near-dup join is exactly the (2k, 2k+1) pair list."""
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            payloads = []
            for i in ids:
                base = smooth_image(i // 2)
                img = base if i % 2 == 0 else noisy_twin(base, i // 2)
                payloads.append(encode_png(img))
            yield pd.DataFrame(
                {
                    "media_id": [f"m{i:05d}" for i in ids],
                    "payload": payloads,
                }
            )

    return spark.range(2 * n_pairs).repartition(
        max(2, spark.sparkContext.defaultParallelism // 4)
    ).mapInPandas(_gen, schema)


# --- the Spark stages -------------------------------------------------------

_HASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)


def image_phash(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, phash): Arrow-batched decode
    (any codec decode_pixels understands) + DCT hash per image."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        phash64_pixels(decode_pixels(bytes(p)))
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(_hash, _HASH_SCHEMA)


def phash_near_pairs(
    hashes: DataFrame,
    max_dist: int = 8,
    n_bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_bucket_df: int | None = 10_000,
) -> DataFrame:
    """Banded-LSH candidate join + exact Hamming verify. Output:
    (id_a, id_b, dist) with id_a < id_b, each qualifying pair once.

    A pair within ``max_dist`` flipped bits agrees on a whole band
    whenever its flips miss one of the ``n_bands`` 16-bit bands —
    guaranteed when max_dist < n_bands, overwhelmingly likely for the
    re-encode distances this targets (the fixture family measures <= 2).
    Buckets larger than ``max_bucket_df`` (boilerplate images: solid
    fills, empty frames) are dropped before the join, same guard as
    every text-LSH path (operators/dedup.py max_ngram_df)."""
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(s).alias("band_idx"),
                (
                    F.shiftrightunsigned(F.col(hash_col), s * width)
                    .bitwiseAND(F.lit(mask))
                ).alias("band_val"),
            )
            for s in range(n_bands)
        ]
    )
    b = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(bands).alias("band"),
    ).select("_id", "_h", "band.band_idx", "band.band_val")
    if max_bucket_df is not None:
        # Plain shuffle join, NOT broadcast: the surviving-bucket set is
        # O(distinct hashes x n_bands) — corpus-proportional, so a
        # broadcast would blow the driver at scale. Same guard shape as
        # dedup._banded_candidate_pairs.
        sizes = b.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("_df")
        )
        b = b.join(
            sizes.filter(F.col("_df") <= max_bucket_df),
            ["band_idx", "band_val"],
        ).drop("_df")
    left = b.select(
        "band_idx",
        "band_val",
        F.col("_id").alias("id_a"),
        F.col("_h").alias("_ha"),
    )
    right = b.select(
        "band_idx",
        "band_val",
        F.col("_id").alias("id_b"),
        F.col("_h").alias("_hb"),
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
    )
    dist = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
