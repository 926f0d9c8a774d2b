"""REAL media codecs — pure stdlib ``struct``/``zlib`` + numpy, no
external codec libraries: RIFF/WAV PCM audio, binary PPM (P6) images,
and DEFLATE-compressed PNG (CRC-verified chunk walk, all five scanline
filters).

This fills the ``real_decoder`` seam of :mod:`operators.multimodal` for
the formats this environment CAN decode: the plumbing module ships the
Arrow-batched mapInPandas stage and byte-budget partitioning; this
module supplies genuine byte-format parsing (header field extraction,
PCM sample decode, pixel-plane decode/unfilter/inflate) and
signal-level features (RMS / peak / zero-crossing rate / dominant FFT
frequency for audio; per-plane means / luma deviation / gradient edge
energy for images). Baseline JPEG decodes too — :mod:`jpegcodec`
implements the DCT + canonical-Huffman pipeline on numpy. Only
MP4/H.264 (a full motion-compensation video stack) remains the
environment-blocked ``NotImplementedError`` path — reference analogue:
the pcap backend decodes the packet framing it understands and rejects
the rest (/root/reference/backend/pcap.go:17-54).

The synthesizer writes byte-real WAV/PPM files with closed-form physics
(whole-cycle sine tones, axis-gradient color planes), so the decoder's
output is checkable three ways: exact header-field equality (parse
fidelity), measured-vs-theory feature gates (signal fidelity), and the
DuckDB oracle twin re-deriving both from id arithmetic alone.
"""

from __future__ import annotations

import struct
import zlib
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


def encode_wav(samples: np.ndarray, sr: int = AUDIO_SR) -> bytes:
    """Encode int16 mono samples as a real RIFF/WAVE file: 44-byte
    canonical PCM header + 16-bit LE data chunk."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16,
        1,                      # PCM
        1,                      # mono
        sr,
        sr * 2,                 # byte rate
        2,                      # block align
        16,                     # bits per sample
        b"data", len(data),
    )
    return hdr + data


def make_wav_bytes(i: int) -> bytes:
    """A real RIFF/WAVE file of a whole-cycle sine tone for media
    index i."""
    n, freq = audio_params(i)
    t = np.arange(n, dtype=np.float64)
    samples = np.round(
        AUDIO_AMP * 32767.0 * np.sin(2.0 * np.pi * freq * t / AUDIO_SR)
    ).astype("<i2")
    return encode_wav(samples)


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

def decode_wav_samples(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM payload to (sample_rate, int16 samples).
    Walks the chunk list (not fixed offsets), so files with extra
    chunks still decode; only 16-bit mono PCM is supported here."""
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
    return sr, np.frombuffer(data, dtype="<i2")


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload and measure signal features."""
    sr, raw = decode_wav_samples(payload)
    s = raw.astype(np.float64) / 32768.0
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


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) payload to its (h, w, 3) uint8 pixels."""
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
    return np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) payload and measure pixel features."""
    return _image_features(_ppm_pixels(payload).astype(np.float64))


def decode_pixels(payload: bytes) -> np.ndarray:
    """Decode an image payload (PPM, PNG, or baseline JPEG) to its raw
    (h, w, 3) uint8 pixel array — the seam perceptual hashing and any
    future vision featurizer read from, so they stay codec-agnostic."""
    if payload[:2] == b"P6":
        return _ppm_pixels(payload)
    if payload[:8] == PNG_SIG:
        return _png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        from flow_indexer_spark.operators.jpegcodec import _jpeg_pixels

        return _jpeg_pixels(payload)
    raise ValueError("not a decodable image payload")


def _image_features(px: np.ndarray) -> dict:
    """Pixel-plane measurements shared by every image codec (PPM, PNG):
    per-plane means, luma deviation, gradient edge energy."""
    h, w = px.shape[:2]
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


# --- PNG: a genuinely COMPRESSED codec on stdlib zlib ----------------------
#
# DEFLATE (the only compression PNG uses) ships in the standard library,
# so like baseline JPEG (jpegcodec.py) and unlike MP4 this "compressed
# format" is fully decodable here:
# CRC-verified chunk walk -> zlib inflate -> scanline unfiltering (all
# five filter types, including the sequential Paeth predictor). The
# encoder cycles through every filter type so the decoder's unfilter
# paths are all exercised by the round trip.

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit RGB


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _filter_row(ft: int, row: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Apply PNG filter `ft` to one scanline (encode direction). All five
    filters vectorize on encode because predictors read ORIGINAL bytes."""
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    zero = np.zeros(_BPP, np.int32)
    left = np.concatenate([zero, r[:-_BPP]])
    ul = np.concatenate([zero, p[:-_BPP]])
    if ft == 0:
        out = r
    elif ft == 1:  # Sub
        out = r - left
    elif ft == 2:  # Up
        out = r - p
    elif ft == 3:  # Average
        out = r - ((left + p) >> 1)
    elif ft == 4:  # Paeth
        pa = np.abs(p - ul)
        pb = np.abs(left - ul)
        pc = np.abs(left + p - 2 * ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul)
        )
        out = r - pred
    else:
        raise ValueError(f"bad PNG filter type {ft}")
    return (out & 255).astype(np.uint8)


def _unfilter_row(ft: int, line: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Reverse one scanline filter (decode direction). Sub reduces to a
    per-channel cumulative sum (mod distributes over addition); Up is a
    plain vector add; Average/Paeth are inherently sequential in x
    because the predictor reads RECONSTRUCTED left neighbors."""
    if ft == 0:
        return line.copy()
    if ft == 2:  # Up — uint8 wraparound is the mod-256 we want
        return line + prev
    if ft == 1:  # Sub — cumsum per channel, mod at the end
        ch = line.reshape(-1, _BPP).astype(np.uint32)
        return (np.cumsum(ch, axis=0) % 256).astype(np.uint8).reshape(-1)
    l32 = line.reshape(-1, _BPP).astype(np.int32)
    p32 = prev.reshape(-1, _BPP).astype(np.int32)
    out = np.empty_like(l32)
    left = np.zeros(_BPP, np.int32)
    ul = np.zeros(_BPP, np.int32)
    if ft == 3:  # Average
        for x in range(l32.shape[0]):
            out[x] = (l32[x] + ((left + p32[x]) >> 1)) & 255
            left = out[x]
    elif ft == 4:  # Paeth
        for x in range(l32.shape[0]):
            pa = np.abs(p32[x] - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + p32[x] - 2 * ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p32[x], ul)
            )
            out[x] = (l32[x] + pred) & 255
            left = out[x]
            ul = p32[x]
    else:
        raise ValueError(f"bad PNG filter type {ft}")
    return out.astype(np.uint8).reshape(-1)


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 pixel array as a real PNG file:
    signature, IHDR (8-bit RGB, non-interlaced), one zlib-DEFLATE IDAT,
    IEND. Scanline filters cycle 0..4 by row to exercise every
    unfilter path on decode."""
    h, w = px.shape[:2]
    rows = np.ascontiguousarray(px, dtype=np.uint8).reshape(h, w * _BPP)
    raw = bytearray()
    prev = np.zeros(w * _BPP, np.uint8)
    for y in range(h):
        ft = y % 5
        raw.append(ft)
        raw += _filter_row(ft, rows[y], prev).tobytes()
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def make_png_bytes(i: int) -> bytes:
    """A real PNG file for media index i — same gradient pixel planes
    as :func:`make_ppm_bytes`, so PNG-vs-PPM decode is an exact
    differential test."""
    w, h, red = image_params(i)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = red
    px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
    return encode_png(px)


def decode_png(payload: bytes) -> dict:
    """Parse a PNG payload and measure pixel features."""
    return _image_features(_png_pixels(payload).astype(np.float64))


def _png_pixels(payload: bytes) -> np.ndarray:
    """Parse a PNG payload to its (h, w, 3) uint8 pixels: CRC-verified
    chunk walk, IDAT inflate, scanline unfilter. Only the 8-bit RGB
    non-interlaced profile is supported (palette/alpha/Adam7 raise
    NotImplementedError, like the WAV codec's PCM-only stance)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in PNG chunk {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise NotImplementedError("only 8-bit RGB non-interlaced PNG")
    raw = zlib.decompress(bytes(idat))
    stride = w * _BPP
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT scanline length mismatch")
    px = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        line = np.frombuffer(raw, np.uint8, stride, off + 1)
        prev = _unfilter_row(raw[off], line, prev)
        px[y] = prev
    return px.reshape(h, w, 3)


def media_decoder(payload: bytes, kind: str) -> dict:
    """The real_decoder seam: sniffs the container magic and dispatches
    to a genuine parser — RIFF/WAV, PPM, (DEFLATE-compressed) PNG,
    baseline JPEG (:mod:`operators.jpegcodec`, pure numpy DCT +
    canonical Huffman), and ISO BMFF/MP4 (:mod:`operators.mp4codec`:
    real box walk + sample tables; MJPEG tracks decode — the summary
    row carries duration plus first-frame image features). Only
    inter-coded video bitstreams (H.264 et al., a full motion-
    compensation stack) remain the clearly-marked environment-blocked
    path, raised from inside the MP4 frame decode."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from flow_indexer_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if payload[4:8] == b"ftyp":
        from flow_indexer_spark.operators.mp4codec import mp4_frames, parse_mp4

        info = parse_mp4(payload)
        _, _, first = next(mp4_frames(payload, every_n=max(1, info["n_frames"])))
        return {
            "kind": "video",
            "n_bytes": len(payload),
            "duration_ms": info["duration_ms"],
            "n_samples": info["n_frames"],
            **_image_features(first),
        }
    raise NotImplementedError("unrecognized media container")


#: pre-PNG name, kept for callers that imported the seam before the
#: compressed path existed
uncompressed_decoder = media_decoder


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


def make_png_media(spark, n: int = 48) -> DataFrame:
    """Distributed synthesis of real DEFLATE-compressed PNG payloads —
    one per id, same executor-side mapInPandas topology as
    :func:`make_real_media`. Pixel content matches make_ppm_bytes(i)
    exactly, so PNG decode is differential-checkable against the
    uncompressed PPM path."""
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
                    "kind": ["image"] * len(ids),
                    "payload": [make_png_bytes(i) for i in ids],
                }
            )

    return spark.range(n).repartition(
        max(2, spark.sparkContext.defaultParallelism // 4)
    ).mapInPandas(_gen, schema)


def make_jpeg_bytes(i: int, quality: int = 90) -> bytes:
    """A real baseline-JFIF file for media index i — same gradient pixel
    planes as :func:`make_ppm_bytes`, so JPEG decode is checkable
    against the same closed-form means (within lossy-codec tolerance,
    unlike PNG's bit-exact round trip)."""
    from flow_indexer_spark.operators.jpegcodec import encode_jpeg

    w, h, red = image_params(i)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = red
    px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
    return encode_jpeg(px, quality)


def make_jpeg_media(spark, n: int = 48) -> DataFrame:
    """Distributed synthesis of real baseline-JPEG payloads — same
    executor-side mapInPandas topology as :func:`make_real_media`."""
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
                    "kind": ["image"] * len(ids),
                    "payload": [make_jpeg_bytes(i) for i in ids],
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
                feats = media_decoder(payload, kind)
                row = {"media_id": mid, "kind": kind, "n_bytes": len(payload)}
                row.update({c: feats.get(c) for c in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, DECODED_SCHEMA)
