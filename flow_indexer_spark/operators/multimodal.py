"""Multimodal (image/audio/video) column plumbing.

Reference analogue: the pcap backend — binary payload decode to typed
records (/root/reference/backend/pcap.go:17-54) and the subprocess
backends that stream bytes through an external tool
(/root/reference/backend/nfdump.go:16-51). A training-data pipeline holds
media as opaque ``binary`` columns with typed metadata and runs decode /
feature-extract / resize / frame-sample as Arrow-batched ``mapInPandas``
stages.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
environment, so the decode kernel is pluggable: ``real_decoder`` raises
``NotImplementedError`` (clearly-marked stub), and
``deterministic_fake_decoder`` derives stable pseudo-features from the
payload bytes so the Spark-side plumbing — schema, batch shape,
partitioning, UDF signature — is real and fully tested.

Scale notes baked in:
- media rows are wildly size-skewed (a 4 KB icon vs a 2 GB video);
  :func:`repartition_by_payload_size` splits on cumulative byte budget so
  one task never holds many giant blobs.
- ``mapInPandas`` streams an *iterator* of Arrow batches — constant memory
  per task regardless of partition row count; never collect the iterator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_md5", StringType(), False),
        StructField("mean_byte", DoubleType(), True),
        StructField("feat_dim0", DoubleType(), True),
        StructField("feat_dim1", DoubleType(), True),
    ]
)


def real_decoder(payload: bytes, kind: str) -> dict:
    """STUB — the genuine COMPRESSED codec path. Needs PIL / ffmpeg /
    librosa, which are not installed in this container. The signature and
    the schema it must fill are fixed by FEATURE_SCHEMA. For the
    uncompressed formats this environment CAN decode (RIFF/WAV PCM,
    binary PPM), the real path exists: operators/codecs.py
    ``media_decoder`` + ``decode_real_media``."""
    raise NotImplementedError(
        "compressed media codecs (PIL/ffmpeg/librosa) unavailable in this "
        "environment; operators/codecs.py decodes WAV/PPM for real, and "
        "deterministic_fake_decoder covers plumbing tests"
    )


def deterministic_fake_decoder(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in: features derived purely from payload bytes
    (stable across runs/machines), same output shape as real_decoder."""
    import hashlib

    md5 = hashlib.md5(payload).hexdigest()
    mean = sum(payload) / len(payload) if payload else 0.0
    return {
        "mean_byte": mean,
        "feat_dim0": int(md5[:8], 16) / 0xFFFFFFFF,
        "feat_dim1": int(md5[8:16], 16) / 0xFFFFFFFF,
    }


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] = deterministic_fake_decoder,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table.

    ``mapInPandas`` (not a scalar UDF) because decode is one-row-to-one-row
    but needs whole-row access and per-batch amortized setup; the iterator
    signature keeps memory at one Arrow batch per task.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(p) if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_md5": [
                        __import__("hashlib").md5(
                            bytes(p) if p is not None else b""
                        ).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )
            for c in ("mean_byte", "feat_dim0", "feat_dim1"):
                out[c] = [f[c] for f in feats]
            yield out

    return df.mapInPandas(_decode, FEATURE_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_byte", DoubleType(), True),
        StructField("head_hex", StringType(), True),
        StructField("weighted_sum", LongType(), True),
    ]
)


def make_oracle_media(spark, n: int = 64) -> DataFrame:
    """Distributed synthetic media table whose ``binary`` payloads are an
    md5 chain of the media id — deterministic AND re-derivable in plain SQL
    (DuckDB oracle twin), unlike the seeded-RNG :func:`make_fake_media`.
    payload(i) = unhex(concat_j md5(media_id || ':' || j)), j < 4 + i%13."""
    return spark.range(n).select(
        F.format_string("m%05d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("kind"),
        F.unhex(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), (4 + F.col("id") % 13).cast("int") - 1),
                    lambda j: F.md5(
                        F.concat(
                            F.format_string("m%05d", F.col("id")),
                            F.lit(":"),
                            j.cast("string"),
                        )
                    ),
                ),
                "",
            )
        ).alias("payload"),
    )


def media_probe_features(df: DataFrame) -> DataFrame:
    """Arrow-batched byte-level probe over a (media_id, kind, payload)
    table: length, mean byte, head bytes, position-weighted checksum —
    features chosen to be recomputable by a SQL oracle from the payload
    hex, so the binary-column mapInPandas plumbing itself (Arrow transfer
    of bytes, batch iteration, schema) is value-checked end to end."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "mean_byte": [
                        (sum(p) / len(p)) if p else None for p in payloads
                    ],
                    "head_hex": [p[:8].hex() if p else None for p in payloads],
                    "weighted_sum": [
                        sum(b * (k + 1) for k, b in enumerate(p)) if p else None
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(_probe, PROBE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode (media_id, frame_idx, frame_ms)
    rows from metadata only — pure column math, no decode, no Python. The
    actual frame grab would join this plan back to payloads inside a
    mapInPandas decode stage."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    # Guard the sequence: Spark defaults step to -1 when start > stop, so a
    # short/null-duration video (n_frames == 0) would emit bogus frames
    # [0, -1]. when() yields NULL for those and explode drops them.
    frames = F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .withColumn("frame_ms", F.col("frame_idx") * every_ms)
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize *plan* for images: target dims preserving aspect ratio —
    metadata-only column math; the pixel work is decoder territory."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def repartition_by_payload_size(
    df: DataFrame, target_bytes_per_partition: int = 128 * 1024 * 1024
) -> DataFrame:
    """Byte-budget repartitioning for size-skewed binary rows: total payload
    bytes / budget -> partition count, then a round-robin repartition so
    giant blobs spread instead of hashing into the same partition. (At
    Iceberg scale the equivalent is write.target-file-size + a sort on
    n_bytes descending for first-fit packing.)"""
    total = df.select(F.sum(F.length("payload")).alias("b")).head()["b"] or 0
    n = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload bytes from a seeded
    generator) — the loggen analogue for the binary domain."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = rng.randint(64, 4096)
        payload = bytes(rng.getrandbits(8) for _ in range(size))
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "payload": payload,
                "width": rng.choice([640, 1024, 1920]) if kind == "image" else None,
                "height": rng.choice([480, 768, 1080]) if kind == "image" else None,
                "sample_rate": 16000 if kind == "audio" else None,
                "duration_ms": rng.randint(1000, 20000) if kind != "image" else None,
                "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
