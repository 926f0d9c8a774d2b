"""Real codec path: byte-exact WAV/PPM write-parse round trips, header
robustness (extra RIFF chunks, PPM comments), signal physics, and the
distributed decode stage."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.codecs import (
    AUDIO_SR,
    _filter_row,
    _unfilter_row,
    audio_params,
    decode_png,
    decode_ppm,
    decode_real_media,
    decode_wav,
    image_params,
    make_png_bytes,
    make_png_media,
    make_ppm_bytes,
    make_real_media,
    make_wav_bytes,
    uncompressed_decoder,
)


def test_wav_roundtrip_physics():
    for i in (0, 2, 4, 6, 14):
        n, f = audio_params(i)
        d = decode_wav(make_wav_bytes(i))
        assert d["sample_rate"] == AUDIO_SR
        assert d["n_samples"] == n
        assert d["duration_ms"] == n * 1000 // AUDIO_SR
        assert abs(d["rms"] - 0.5 / math.sqrt(2)) < 0.005
        assert abs(d["peak"] - 0.5) < 0.005
        assert d["dom_freq_hz"] == pytest.approx(f, abs=0.5)
        assert abs(d["zcr"] - 2 * f / AUDIO_SR) < 0.01


def test_wav_parser_walks_chunks_not_offsets():
    """A LIST chunk between fmt and data (common in real encoders) must
    not break the parse — the walker reads the chunk list, and odd-sized
    chunks are padded per RIFF."""
    raw = make_wav_bytes(0)
    fmt_chunk = raw[12:36]
    data_chunk = raw[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = fmt_chunk + extra + data_chunk
    doctored = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(doctored) == decode_wav(raw)


def test_wav_rejects_unsupported_encodings():
    raw = bytearray(make_wav_bytes(0))
    raw[22] = 2  # channels = 2
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK" + b"\x00" * 40)


def test_ppm_roundtrip_and_comment_header():
    for i in (1, 3, 5, 7):
        w, h, r = image_params(i)
        d = decode_ppm(make_ppm_bytes(i))
        assert (d["width"], d["height"]) == (w, h)
        assert d["mean_r"] == float(r)
        assert d["mean_g"] == (w - 1) / 2
        assert d["mean_b"] == (h - 1) / 2
        assert d["edge_energy"] > 0  # gradients are real
    raw = make_ppm_bytes(1)
    w, h, _ = image_params(1)
    commented = f"P6\n# synthetic\n{w} {h}\n# maxval next\n255\n".encode() + raw[
        len(f"P6\n{w} {h}\n255\n") :
    ]
    assert decode_ppm(commented) == decode_ppm(raw)


def test_mp4_container_parses_bitstream_stays_blocked_jpeg_decodes():
    """Round 3 moved the video seam inward twice: JPEG left the blocked
    list (operators/jpegcodec.py), then the MP4 CONTAINER did too
    (operators/mp4codec.py — media_decoder sniffs ftyp and parses the
    box tree; only non-MJPEG track decode raises NotImplementedError,
    covered in test_mp4). Garbage after any recognized magic is now a
    parse error (ValueError), not a capability gap."""
    with pytest.raises(ValueError):
        uncompressed_decoder(b"\x00\x00\x00\x18ftypmp42", "video")
    from flow_indexer_spark.operators.mp4codec import make_mp4_bytes

    d = uncompressed_decoder(make_mp4_bytes(0), "video")
    assert d["kind"] == "video" and d["n_samples"] == 6
    with pytest.raises(ValueError):
        uncompressed_decoder(b"\xff\xd8\xff\xe0jpeg", "image")
    from flow_indexer_spark.operators.codecs import make_jpeg_bytes

    feats = uncompressed_decoder(make_jpeg_bytes(5), "image")
    w, h, _red = image_params(5)
    assert (feats["width"], feats["height"]) == (w, h)


def test_png_roundtrip_matches_ppm_exactly():
    """The PNG path is a REAL compressed codec: encode (filters 0-4
    cycling by row, zlib DEFLATE) then decode must reproduce the exact
    features of the uncompressed PPM twin, and the file must actually
    be smaller than the raw pixels."""
    for i in range(10):
        png = make_png_bytes(i)
        assert decode_png(png) == decode_ppm(make_ppm_bytes(i))
        w, h, _ = image_params(i)
        assert len(png) < 3 * w * h
    assert uncompressed_decoder(make_png_bytes(3), "image") == decode_png(
        make_png_bytes(3)
    )


def test_png_unfilter_inverts_every_filter_type():
    """Filter/unfilter are exact inverses per type, including the
    sequential Average and Paeth predictors, on adversarial byte rows
    (wraparound values, non-gradient noise)."""
    rng = np.random.default_rng(7)
    prev = rng.integers(0, 256, 30, dtype=np.uint8)
    row = rng.integers(0, 256, 30, dtype=np.uint8)
    for ft in range(5):
        enc = _filter_row(ft, row, prev)
        assert np.array_equal(_unfilter_row(ft, enc, prev), row), ft


def test_png_rejects_corruption_and_unsupported():
    raw = bytearray(make_png_bytes(1))
    raw[40] ^= 0xFF  # flip a byte inside a chunk -> CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(raw))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # 16-bit depth is out of profile -> NotImplementedError, like WAV
    deep = bytearray(make_png_bytes(1))
    ihdr_off = 8 + 8  # sig + len/type of IHDR
    body = bytearray(deep[ihdr_off : ihdr_off + 13])
    body[8] = 16
    deep[ihdr_off : ihdr_off + 13] = body
    deep[ihdr_off + 13 : ihdr_off + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png(bytes(deep))


def test_png_media_distributed(spark):
    out = decode_real_media(make_png_media(spark, 10)).collect()
    assert len(out) == 10
    for r in out:
        i = int(r.media_id[1:])
        w, h, red = image_params(i)
        assert (r.kind, r.width, r.height) == ("image", w, h)
        assert r.mean_r == float(red)
        assert r.n_bytes < 3 * w * h


def test_decode_real_media_distributed(spark):
    out = decode_real_media(make_real_media(spark, 12)).collect()
    assert len(out) == 12
    by_id = {r.media_id: r for r in out}
    for i in range(12):
        r = by_id[f"m{i:05d}"]
        if i % 2 == 0:
            n, f = audio_params(i)
            assert (r.kind, r.sample_rate, r.n_samples) == ("audio", AUDIO_SR, n)
            assert r.width is None
            assert r.dom_freq_hz == pytest.approx(f, abs=0.5)
        else:
            w, h, red = image_params(i)
            assert (r.kind, r.width, r.height) == ("image", w, h)
            assert r.sample_rate is None
            assert r.mean_r == float(red)
