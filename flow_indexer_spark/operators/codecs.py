"""REAL media codecs for the uncompressed formats: RIFF/WAV PCM audio
and binary PPM (P6) images — pure stdlib ``struct`` + numpy, no external
codec libraries.

This fills the ``real_decoder`` seam of :mod:`operators.multimodal` for
the formats this environment CAN decode: the plumbing module ships the
Arrow-batched mapInPandas stage and byte-budget partitioning; this
module supplies genuine byte-format parsing (header field extraction,
PCM sample decode, pixel-plane decode) and signal-level features (RMS /
peak / zero-crossing rate / dominant FFT frequency for audio; per-plane
means / luma deviation / gradient edge energy for images). Compressed
codecs (JPEG/PNG/MP4) remain the environment-blocked
``NotImplementedError`` path — reference analogue: the pcap backend
decodes the packet framing it understands and rejects the rest
(/root/reference/backend/pcap.go:17-54).

The synthesizer writes byte-real WAV/PPM files with closed-form physics
(whole-cycle sine tones, axis-gradient color planes), so the decoder's
output is checkable three ways: exact header-field equality (parse
fidelity), measured-vs-theory feature gates (signal fidelity), and the
DuckDB oracle twin re-deriving both from id arithmetic alone.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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

# --- byte-real synthesis (deterministic, id-arithmetic parameters) ---------

AUDIO_SR = 8000
AUDIO_AMP = 0.5


def audio_params(i: int) -> tuple[int, int]:
    """(n_samples, freq_hz) for media index i — chosen so every tone has
    a whole number of cycles (exact RMS/peak theory) and the frequency
    lands on an FFT bin (exact dominant-frequency recovery)."""
    return 4000 + (i % 4) * 2000, 200 * (1 + i % 8)


def image_params(i: int) -> tuple[int, int, int]:
    """(width, height, red) for media index i. The pixel planes are
    R=const, G=x, B=y — gradients with closed-form means."""
    return 16 + (i % 5) * 8, 12 + (i % 3) * 8, (7 * i) % 256


def make_wav_bytes(i: int) -> bytes:
    """A real RIFF/WAVE file: 44-byte canonical PCM header + 16-bit LE
    mono samples of a whole-cycle sine tone."""
    n, freq = audio_params(i)
    t = np.arange(n, dtype=np.float64)
    samples = np.round(
        AUDIO_AMP * 32767.0 * np.sin(2.0 * np.pi * freq * t / AUDIO_SR)
    ).astype("<i2")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16,
        1,                      # PCM
        1,                      # mono
        AUDIO_SR,
        AUDIO_SR * 2,           # byte rate
        2,                      # block align
        16,                     # bits per sample
        b"data", len(data),
    )
    return hdr + data


def make_ppm_bytes(i: int) -> bytes:
    """A real binary PPM (P6): ASCII header + raw interleaved RGB rows
    with R=const, G=column index, B=row index (w, h < 256)."""
    w, h, red = image_params(i)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = red
    px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


# --- real decoders ----------------------------------------------------------

def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload and measure signal features. Walks
    the chunk list (not fixed offsets), so files with extra chunks still
    decode; only 16-bit mono PCM is supported here."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sr, _br, _ba, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise NotImplementedError("only 16-bit mono PCM supported")
    s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    n = s.size
    spec = np.abs(np.fft.rfft(s))
    spec[0] = 0.0  # DC is not a tone
    sign = np.signbit(s)
    return {
        "sample_rate": sr,
        "n_samples": n,
        "duration_ms": n * 1000 // sr,
        "rms": float(np.sqrt(np.mean(s * s))),
        "peak": float(np.max(np.abs(s))),
        "zcr": float(np.mean(sign[1:] != sign[:-1])),
        "dom_freq_hz": float(np.argmax(spec) * sr / n),
    }


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) payload and measure pixel features."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace-separated width height maxval, 1 ws byte
    fields, pos = [], 2
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .astype(np.float64)
    )
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    gx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
    return {
        "width": w,
        "height": h,
        "mean_r": float(px[:, :, 0].mean()),
        "mean_g": float(px[:, :, 1].mean()),
        "mean_b": float(px[:, :, 2].mean()),
        "luma_std": float(luma.std()),
        "edge_energy": float(gx + gy),
    }


def uncompressed_decoder(payload: bytes, kind: str) -> dict:
    """The real_decoder seam, filled for the formats this environment can
    genuinely decode: sniffs the container magic and dispatches. Anything
    compressed stays the clearly-marked blocked path."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "compressed codecs (JPEG/PNG/MP4) unavailable in this environment"
    )


# --- the Spark stage --------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zcr", DoubleType(), True),
        StructField("dom_freq_hz", DoubleType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("luma_std", DoubleType(), True),
        StructField("edge_energy", DoubleType(), True),
    ]
)

_COLS = [f.name for f in DECODED_SCHEMA.fields[3:]]


def make_real_media(spark, n: int = 48) -> DataFrame:
    """Distributed synthesis of byte-real media: even ids are WAV tones,
    odd ids are PPM images. Built inside mapInPandas so payload bytes are
    produced on executors (never driver-collected) — the generator IS the
    write path a real pipeline's media ingest would use."""
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": [f"m{i:05d}" for i in ids],
                    "kind": ["audio" if i % 2 == 0 else "image" for i in ids],
                    "payload": [
                        make_wav_bytes(i) if i % 2 == 0 else make_ppm_bytes(i)
                        for i in ids
                    ],
                }
            )

    return spark.range(n).repartition(
        max(2, spark.sparkContext.defaultParallelism // 4)
    ).mapInPandas(_gen, schema)


def decode_real_media(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over (media_id, kind, payload): same
    iterator-of-batches topology as multimodal.extract_media_features
    (constant memory per task), but the kernel is the genuine byte-format
    parser, not the deterministic fake."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(p) if p is not None else b""
                feats = uncompressed_decoder(payload, kind)
                row = {"media_id": mid, "kind": kind, "n_bytes": len(payload)}
                row.update({c: feats.get(c) for c in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, DECODED_SCHEMA)
