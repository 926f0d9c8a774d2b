"""H.264 Intra_4x4 spatial prediction (operators/h264intra.py): the
per-4x4-block half of the intra toolbox — spec 8.3.1 prediction modes,
8.3.1.1 most-probable-mode signalling, Table 9-4 intra CBP mapping,
and per-block DC LumaLevel4x4 residuals. No SparkSession needed.

The bit layer is pinned EXACTLY (decoder reproduces the encoder's
closed-loop recon byte-for-byte); frame-level tests gate means within
the measured quantizer envelope and pin the family's discriminating
property: I_4x4 preserves strictly more gradient than the I_16x16
twin on identical source pixels."""

from __future__ import annotations

import random

import numpy as np
import pytest

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264intra as I
from flow_indexer_spark.operators.mp4codec import (
    make_h264_i4_bytes,
    make_h264_intra_bytes,
    mp4_frames,
    parse_mp4,
    video_params,
)


def _content(mbw: int, mbh: int, seed: int = 59):
    """Luma/chroma planes mixing flats, ramps, and noise so the mode
    search exercises the full 9-mode alphabet."""
    rng = np.random.default_rng(seed)
    y = np.empty((mbh * 16, mbw * 16), dtype=np.uint8)
    y[:, :] = np.arange(mbw * 16, dtype=np.uint8)[None, :]
    y[16:32] = 200
    y[32:48] = np.arange(mbh * 16, dtype=np.uint8)[32:48, None]
    y[48:] = rng.integers(0, 256, (mbh * 16 - 48, mbw * 16), dtype=np.uint8)
    cb = np.add.outer(np.arange(mbh * 8) * 2, np.arange(mbw * 8) * 3).astype(
        np.uint8
    )
    cr = rng.integers(0, 256, (mbh * 8, mbw * 8), dtype=np.uint8)
    return y, cb, cr


def test_decoder_is_bit_faithful_to_encoder_recon():
    """Arbitrary content, full mode alphabet: decode must reproduce
    the encoder's closed-loop recon EXACTLY (same integer prediction +
    CAVLC + dequant chain on both sides)."""
    y, cb, cr = _content(5, 4)
    for qp in (36, 44, 51):
        nal, (ry, rcb, rcr) = I.encode_idr_i4(y, cb, cr, qp=qp, return_recon=True)
        sps = H.parse_sps(H.make_sps(80, 64))
        dy, dcb, dcr = I.decode_idr_any(nal, sps)
        assert np.array_equal(dy, ry), qp
        assert np.array_equal(dcb, rcb), qp
        assert np.array_equal(dcr, rcr), qp


def test_encoder_exercises_many_modes_and_mpm_flags():
    """On mixed content the mode search should pick a diverse mode set
    (at least 6 of the 9) and both branches of the
    prev_intra4x4_pred_mode_flag signalling should appear."""
    y, cb, cr = _content(5, 4)
    nal, _ = I.encode_idr_i4(y, cb, cr, qp=36, return_recon=True)
    # re-derive the mode plane by decoding with an instrumented plane
    sps = H.parse_sps(H.make_sps(80, 64))
    # decode_idr_any fills the plane internally; re-run decode level
    # manually to capture it
    from flow_indexer_spark.operators.h264codec import (
        _BitReader,
        nal_to_rbsp,
    )

    _, rbsp = nal_to_rbsp(nal)
    r = _BitReader(rbsp)
    r.ue("first_mb_in_slice")
    r.ue("slice_type")
    r.ue("pps_id")
    r.u(4, "frame_num")
    r.ue("idr_pic_id")
    r.u(1, "no_output")
    r.u(1, "long_term")
    qp = (26 + r.se("slice_qp_delta")) % 52
    yd = np.zeros((64, 80), np.uint8)
    cbd = np.zeros((32, 40), np.uint8)
    crd = np.zeros_like(cbd)
    modes = np.full((16, 20), -1, dtype=np.int8)
    for my in range(4):
        for mx in range(5):
            mb_type = r.ue("mb_type")
            assert mb_type == 0
            qp = I.decode_i_mb(r, mb_type, qp, yd, cbd, crd, mx, my, modes)
    used = set(int(m) for m in modes.ravel())
    assert -1 not in used
    assert len(used) >= 6, sorted(used)


def test_best_level_luma4_tracks_the_true_quant_slope():
    """Regression pin for the slope bug: the level search must land
    within half a quant step of ANY target in the coder's range (the
    old recon(1)-recon(0) slope estimate floored to 1 and
    under-corrected a -123 residual by ~46 at qp 36)."""
    for qp in (36, 40, 44, 48, 51):
        ls = 16 * I._NORM_ADJUST[qp % 6][0]  # LevelScale = 16 * normAdjust
        step = ls * (1 << (qp // 6 - 4)) / 64.0
        for t in range(-255, 256, 7):
            lvl = I._best_level_luma4(t, qp)
            got = int(I.luma4_residual([lvl] + [0] * 15, qp)[0, 0])
            assert abs(got - t) <= step / 2 + 1, (qp, t, lvl, got)


def test_avail4_z_order_top_right_rules():
    """Top-right availability must follow decode order: block (1,1)
    decodes after (2,0), so its top-right is available; (3,1)'s
    top-right block (4,0) is outside the MB and in a LATER MB -> only
    available via the next MB's column when my>0."""
    # MB (0,0), by==0: top-right samples sit in the (absent) MB row
    # above the picture -> never available when my==0
    assert I._avail4(0, 0, 0, 0, mb_w=4) == (False, False, False, False)
    assert I._avail4(0, 0, 1, 0, mb_w=4)[2] is False
    # interior: (0,1)'s TR block (1,0) decodes earlier (Z 1 < 2) -> True;
    # (1,1)'s TR block (2,0) decodes LATER (Z 4 > 3) -> False — the
    # classic spec case where blocks 3/7/11/13/15 lack a top-right
    assert I._avail4(0, 0, 0, 1, mb_w=4)[2] is True
    assert I._avail4(0, 0, 1, 1, mb_w=4)[2] is False
    assert I._avail4(0, 0, 2, 1, mb_w=4)[2] is True
    # (3,1)'s TR is the NEXT macroblock's column: decodes later -> False
    assert I._avail4(0, 0, 3, 1, mb_w=4)[2] is False
    # with an MB row above, by==0 blocks read the upper MB's bottom row
    assert I._avail4(0, 1, 3, 0, mb_w=4)[2] is True
    assert I._avail4(2, 1, 3, 0, mb_w=4)[2] is True
    # but bx==3, by==0 of the LAST MB column has no top-right MB
    assert I._avail4(3, 1, 3, 0, mb_w=4)[2] is False


def test_i4_beats_i16_on_gradients():
    """The reason I_4x4 exists: on smoothly varying content the
    per-4x4 adaptive prediction reconstructs with strictly less error
    than per-16x16 flattening."""
    y = np.add.outer(
        np.arange(48, dtype=np.int32), np.arange(48, dtype=np.int32) * 2
    ).astype(np.uint8)
    cb = np.full((24, 24), 90, np.uint8)
    cr = np.full((24, 24), 160, np.uint8)
    _, (r4, _, _) = I.encode_idr_i4(y, cb, cr, qp=36, return_recon=True)
    _, (r16, _, _) = I.encode_idr_i16(y, cb, cr, qp=36, return_recon=True)
    e4 = np.abs(r4.astype(int) - y.astype(int)).mean()
    e16 = np.abs(r16.astype(int) - y.astype(int)).mean()
    assert e4 < e16 * 0.6, (e4, e16)


def test_i4_mp4_container_and_sampled_decode():
    """The deterministic fixture family decodes through the container
    path within the measured lossy envelope (r<=0.85, g<=0.60,
    b<=2.60) and stays sharper than the I_16x16 twin per frame."""
    for i in (0, 7, 14):
        payload = make_h264_i4_bytes(i)
        info = parse_mp4(payload)
        n, w, h = video_params(i)
        assert info["codec"] == "avc1" and info["avcc"] is not None
        assert (info["n_frames"], info["width"], info["height"]) == (n, w, h)
        i16 = {
            k: px for k, _, px in mp4_frames(make_h264_intra_bytes(i), every_n=2)
        }
        seen = []
        for k, t_ms, px in mp4_frames(payload, every_n=2):
            seen.append(k)
            want_r = (7 * i + 11 * k) % 256
            assert abs(px[:, :, 0].astype(float).mean() - want_r) < 1.2
            assert abs(px[:, :, 1].astype(float).mean() - (w - 1) / 2) < 1.0
            assert abs(px[:, :, 2].astype(float).mean() - (h - 1) / 2) < 3.0
            e4 = np.abs(np.diff(px[:, :, 1].astype(float), axis=1)).mean()
            e16 = np.abs(np.diff(i16[k][:, :, 1].astype(float), axis=1)).mean()
            assert e4 > e16 + 0.05, (i, k, e4, e16)
        assert seen == list(range(0, n, 2))


def test_fuzz_i4_corruption_is_always_classifiable():
    """Random byte mutations of a valid I_4x4 sample must classify as
    ValueError/NotImplementedError — never misdecode into a crash or
    a numpy error (the module contract)."""
    rng = random.Random(443)
    px = np.empty((12, 16, 3), dtype=np.uint8)
    px[:, :, 0] = 55
    px[:, :, 1] = np.arange(16, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(12, dtype=np.uint8)[:, None]
    avcc = H.make_avcc(H.make_sps(16, 12), H.make_pps())
    sample = I.encode_frame_sample_i4(px)
    for _ in range(500):
        b = bytearray(sample)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            I.decode_frame_sample_any(bytes(b), avcc)
        except (ValueError, NotImplementedError):
            pass


def test_i4_requires_picture_context():
    """decode_i_mb(mb_type=0) without the picture-wide mode plane must
    refuse rather than misdecode (predIntra4x4PredMode needs every
    earlier block's mode)."""
    r = H._BitReader(b"\x00" * 8)
    y = np.zeros((16, 16), np.uint8)
    c = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="mode plane"):
        I.decode_i_mb(r, 0, 36, y, c, c, 0, 0, None)
