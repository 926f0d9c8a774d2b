"""Baseline JPEG codec: lossy round-trip bounds, header exactness,
profile rejection, and the Spark decode stage over executor-synthesized
JFIF payloads. Unlike PNG (bit-exact), JPEG correctness is bounded
error vs ground truth plus exact header fields."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flow_indexer_spark.operators.codecs import (
    _ppm_pixels,
    image_params,
    make_jpeg_bytes,
    make_ppm_bytes,
    media_decoder,
)
from flow_indexer_spark.operators.jpegcodec import (
    JPEG_SIG,
    _jpeg_pixels,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w, h, red):
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = red
    px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
    return px


def test_gradient_roundtrip_bounded():
    px = _gradient(40, 28, 77)
    out = _jpeg_pixels(encode_jpeg(px, 90))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_constant_image_is_exact():
    """DC-only blocks survive quantization exactly at any quality."""
    for q in (50, 90):
        c = np.full((24, 16, 3), 128, dtype=np.uint8)
        assert np.array_equal(_jpeg_pixels(encode_jpeg(c, q)), c)


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (8, 8), (17, 3), (9, 25)])
def test_non_multiple_of_8_shapes_crop_back(shape):
    h, w = shape
    px = np.full((h, w, 3), 200, dtype=np.uint8)
    out = _jpeg_pixels(encode_jpeg(px, 90))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - 200).max() == 0


def test_fixture_sweep_matches_ppm_truth():
    """All 48 fixture ids: exact dimensions, pixels within lossy bound
    of the PPM (uncompressed truth) twin, closed-form means within the
    driver query's tolerance."""
    for i in range(48):
        w, h, red = image_params(i)
        truth = _ppm_pixels(make_ppm_bytes(i))
        got = _jpeg_pixels(make_jpeg_bytes(i))
        assert got.shape == (h, w, 3)
        assert np.abs(got.astype(int) - truth.astype(int)).max() <= 3
        feats = media_decoder(make_jpeg_bytes(i), "image")
        assert (feats["width"], feats["height"]) == (w, h)
        assert abs(feats["mean_r"] - red) < 0.75
        assert abs(feats["mean_g"] - (w - 1) / 2) < 0.75
        assert abs(feats["mean_b"] - (h - 1) / 2) < 0.75


def test_noise_exercises_entropy_paths():
    """Random pixels hit high AC categories, ZRL runs, and EOB-less
    blocks; the stream must still parse to the right shape and a second
    generation must decode to the same shape (format stability)."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(33, 41, 3)).astype(np.uint8)
    d1 = _jpeg_pixels(encode_jpeg(px, 30))
    assert d1.shape == px.shape
    d2 = _jpeg_pixels(encode_jpeg(d1, 30))
    assert d2.shape == px.shape


def test_decode_jpeg_features_contract():
    feats = decode_jpeg(make_jpeg_bytes(3))
    w, h, _ = image_params(3)
    assert feats["width"] == w and feats["height"] == h
    assert set(feats) == {
        "width", "height", "mean_r", "mean_g", "mean_b",
        "luma_std", "edge_energy",
    }


def test_out_of_profile_rejected():
    data = bytearray(make_jpeg_bytes(1))
    # progressive: rewrite the SOF0 marker to SOF2
    sof = data.find(b"\xff\xc0")
    prog = bytes(data[:sof]) + b"\xff\xc2" + bytes(data[sof + 2 :])
    with pytest.raises(NotImplementedError, match="baseline"):
        _jpeg_pixels(prog)
    # subsampled chroma: set Y sampling factors to 2x2
    hv = sof + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc+cid
    sub = bytearray(data)
    sub[hv] = 0x22
    with pytest.raises(NotImplementedError, match="4:4:4"):
        _jpeg_pixels(bytes(sub))
    # restart interval: inject a DRI segment before SOS
    sos = data.find(b"\xff\xda")
    dri = bytes(data[:sos]) + b"\xff\xdd\x00\x04\x00\x08" + bytes(data[sos:])
    with pytest.raises(NotImplementedError, match="restart"):
        _jpeg_pixels(dri)
    with pytest.raises(ValueError):
        _jpeg_pixels(b"not a jpeg")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8), 90)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), np.uint8), 0)


def test_grayscale_single_component_scan():
    """The decoder's 1-component path, fed by a minimal hand-built
    grayscale baseline stream using the module's own primitives."""
    from flow_indexer_spark.operators.jpegcodec import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        QUANT_LUMA,
        ZIGZAG,
        _BitWriter,
        _canonical_codes,
        _magnitude,
        quality_scaled,
    )

    qt = quality_scaled(QUANT_LUMA, 90)
    # one flat 8x8 block, luma 100 -> level-shifted DC = (100-128)*8
    dc_val = int(round((100 - 128) * 8.0 / qt[0]))
    bw = _BitWriter()
    dct = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    act = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    size, raw = _magnitude(dc_val)
    code, length = dct[size]
    bw.write(code, length)
    if size:
        bw.write(raw, size)
    code, length = act[0x00]  # EOB
    bw.write(code, length)
    bw.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    data = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qt[ZIGZAG]))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )
    out = _jpeg_pixels(data)
    assert out.shape == (8, 8, 3)
    # flat gray within DC quantization error of the target
    assert np.all(out == out[0, 0, 0])
    assert abs(int(out[0, 0, 0]) - 100) <= 2


def test_spark_decode_stage(spark):
    from flow_indexer_spark.operators.codecs import (
        decode_real_media,
        make_jpeg_media,
    )

    rows = decode_real_media(make_jpeg_media(spark, 12)).collect()
    assert len(rows) == 12
    for r in rows:
        w, h, red = image_params(int(r["media_id"][1:]))
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_r"] - red) < 0.75


def test_magic_is_jpeg():
    assert make_jpeg_bytes(0)[:2] == JPEG_SIG
