"""H.264 B slices: bi-prediction between two reference pictures plus
the container reorder layer (ctts) that B frames force on MP4 tracks
(operators/h264inter.py + mp4codec.py). No SparkSession — plain numpy.

The slice layer gates byte-exactness against the encoder's own
reconstruction (prediction + the shared inter residual path is
deterministic integer math); mode selection is gated on constructed
content where each of B_L0 / B_L1 / B_Bi is the unique zero-error
choice; the container layer gates presentation-order frame means on
the fixture family whose R channel steps 11 grey levels per DISPLAY
frame — a decode-order-confused reader is >= 11 levels off while the
real decode stays within quantization error."""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264inter as P
from flow_indexer_spark.operators.mp4codec import (
    encode_mp4_h264_bgop,
    make_h264_b_bytes,
    mp4_frames,
    parse_mp4,
    video_params,
)

POC = (2, 6)  # pic_order_cnt_lsb value/width used throughout


def _sps(w: int, h: int) -> dict:
    return H.parse_sps(
        H.make_sps(w, h, ref_frames=2, poc_type=0, log2_max_poc_lsb=6)
    )


def _rand_planes(rng, w=48, h=32):
    return (
        rng.integers(0, 256, (h, w), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


def _first_b_mb_type(nal: bytes, sps: dict) -> int:
    """Parse up to the first macroblock's mb_type in a B slice."""
    _, rbsp = H.nal_to_rbsp(nal)
    r = P._BitReader(rbsp)
    r.ue("first_mb_in_slice")
    assert r.ue("slice_type") % 5 == 1
    r.ue("pps")
    r.u(sps["log2_max_frame_num"], "frame_num")
    r.u(sps["log2_max_poc_lsb"], "poc_lsb")
    r.u(1, "direct_spatial")
    r.u(3, "flags")  # override + two list-modification flags
    r.se("slice_qp_delta")
    assert r.ue("mb_skip_run") == 0
    return r.ue("mb_type")


# --- slice roundtrips ---------------------------------------------------------


@pytest.mark.parametrize("code_residual", [False, True])
def test_b_slice_decode_equals_encoder_recon_byte_exact(code_residual):
    rng = np.random.default_rng(31)
    sps = _sps(48, 32)
    ref0 = _rand_planes(rng)
    ref1 = _rand_planes(rng)
    cur = tuple(
        ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1).astype(np.uint8)
        for a, b in zip(ref0, ref1)
    )
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
        code_residual=code_residual, intra_mbs=frozenset({(0, 1)}),
    )
    dec = P.decode_b_slice(nal, sps, ref0, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()


def test_mode_selection_l0_l1_bi_each_uniquely_optimal():
    """cur == ref1 -> every MB is B_L1 (mb_type 2) and the roundtrip
    is lossless; cur == ref0 -> B_L0 (1); cur == the rounded average
    -> B_Bi (3), also lossless. The refs share one strong texture and
    differ by a +20 DC step, so (0, 0) is the strict SAD minimum for
    both lists (independent noise would let quarter-pel refinement
    legally land sub-pel MVs) and the bi average is uniquely exact."""
    rng = np.random.default_rng(32)
    sps = _sps(32, 32)
    base = _rand_planes(rng, 32, 32)
    ref0 = tuple((p % 225).astype(np.uint8) for p in base)
    ref1 = tuple((p + 20).astype(np.uint8) for p in ref0)
    avg = tuple((p + 10).astype(np.uint8) for p in ref0)
    for cur, want in ((ref0, 1), (ref1, 2), (avg, 3)):
        nal = P.encode_b_slice(*cur, ref0, ref1, frame_num=2, poc=POC)
        assert _first_b_mb_type(nal, sps) == want
        dec = P.decode_b_slice(nal, sps, ref0, ref1)
        for a, b in zip(cur, dec):
            assert (a == b).all(), want


def test_b_residual_tracks_a_luminance_step_neither_ref_has():
    """Luma midway between the two refs PLUS a +40 DC step: prediction
    alone is 40 levels off, the coded residual brings recon within the
    qp-10 quantizer step."""
    rng = np.random.default_rng(33)
    sps = _sps(48, 32)
    base = _rand_planes(rng)
    ref0 = tuple((p % 150).astype(np.uint8) for p in base)  # headroom
    ref1 = tuple((p + 10).astype(np.uint8) for p in ref0)
    cur = tuple((p + 45).astype(np.uint8) for p in ref0)  # avg + 40
    bare = P.decode_b_slice(
        P.encode_b_slice(*cur, ref0, ref1, frame_num=2, poc=POC),
        sps, ref0, ref1,
    )
    coded = P.decode_b_slice(
        P.encode_b_slice(
            *cur, ref0, ref1, frame_num=2, poc=POC, qp=10,
            code_residual=True,
        ),
        sps, ref0, ref1,
    )
    err_bare = abs(bare[0].astype(float).mean() - cur[0].astype(float).mean())
    err_coded = abs(
        coded[0].astype(float).mean() - cur[0].astype(float).mean()
    )
    assert err_bare > 30
    assert err_coded < 2.0


def test_decoder_routing_is_mutual():
    rng = np.random.default_rng(34)
    sps = _sps(32, 32)
    ref = _rand_planes(rng, 32, 32)
    b_nal = P.encode_b_slice(*ref, ref, ref, frame_num=2, poc=POC)
    with pytest.raises(ValueError, match="B slice handed"):
        P.decode_p_slice(b_nal, sps, ref)
    p_nal = P.encode_p_slice(*ref, ref, frame_num=1, poc=POC)
    with pytest.raises(ValueError, match="handed to the B decoder"):
        P.decode_b_slice(p_nal, sps, ref, ref)


def test_unimplemented_b_tools_classify_from_syntax():
    sps = _sps(32, 32)
    rng = np.random.default_rng(35)
    ref = _rand_planes(rng, 32, 32)

    def _b_header(w):
        w.ue(0)  # first_mb_in_slice
        w.ue(6)  # slice_type B
        w.ue(0)  # pps id
        w.u(2, 4)  # frame_num
        w.u(POC[0], POC[1])  # pic_order_cnt_lsb
        w.u(1, 1)  # direct_spatial_mv_pred_flag
        w.u(0, 1)  # num_ref_idx_active_override_flag
        w.u(0, 1)  # list0 modification
        w.u(0, 1)  # list1 modification
        w.se(0)  # slice_qp_delta

    # skip run overrunning the picture (B_Skip itself decodes now)
    w = H._BitWriter()
    _b_header(w)
    w.ue(5)  # only 4 MBs in 32x32
    with pytest.raises(ValueError, match="overruns"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)

    # B_Direct_16x16 whose residual layer is truncated
    w = H._BitWriter()
    _b_header(w)
    w.ue(0)
    w.ue(0)  # mb_type 0 (direct: no MVDs, straight to cbp)
    w.ue(2)  # cbp codeNum 2 -> luma 8x8 #0 coded, then nothing
    with pytest.raises(ValueError, match="truncated"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)

    # bi-directional partitions (mb_type 4..22)
    w = H._BitWriter()
    _b_header(w)
    w.ue(0)
    w.ue(4)  # B_L0_L0_16x8
    with pytest.raises(NotImplementedError, match="partition"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)

    # invalid mb_type
    w = H._BitWriter()
    _b_header(w)
    w.ue(0)
    w.ue(49)
    with pytest.raises(ValueError, match="invalid B-slice mb_type"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)


# --- spatial direct mode (8.4.1.2.2): B_Skip + B_Direct_16x16 ----------------


def test_stationary_content_collapses_to_one_b_skip_run():
    """cur == ref0 == ref1: with no predicted neighbours anywhere the
    direct derivation bi-predicts with zero MVs (the
    directZeroPredictionFlag branch), the prediction is exact, and the
    whole picture folds into a single mb_skip_run — the NAL is header
    + one ue(v) — while the decode stays byte-exact."""
    rng = np.random.default_rng(36)
    sps = _sps(48, 32)
    ref = _rand_planes(rng)
    plain = P.encode_b_slice(*ref, ref, ref, frame_num=2, poc=POC)
    skipped = P.encode_b_slice(
        *ref, ref, ref, frame_num=2, poc=POC, direct=True,
    )
    assert len(skipped) <= 6 < len(plain)
    dec = P.decode_b_slice(skipped, sps, ref, ref)
    for a, b in zip(ref, dec):
        assert (a == b).all()


def test_direct_with_residual_codes_b_direct_16x16():
    """Stationary refs + a +30 DC step: direct prediction ties every
    explicit mode's SAD and wins (zero motion bits), the step survives
    quantization, so MB (0,0) codes as B_Direct_16x16 (mb_type 0) and
    the decode is byte-exact against the encoder recon."""
    rng = np.random.default_rng(37)
    sps = _sps(48, 32)
    base = _rand_planes(rng)
    ref = tuple((p % 200).astype(np.uint8) for p in base)
    cur = tuple((p + 30).astype(np.uint8) for p in ref)
    nal, recon = P.encode_b_slice(
        *cur, ref, ref, frame_num=2, poc=POC, qp=10,
        code_residual=True, direct=True, return_recon=True,
    )
    assert _first_b_mb_type(nal, sps) == 0
    dec = P.decode_b_slice(nal, sps, ref, ref)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    # and the residual actually landed: recon within the quantizer step
    assert abs(dec[0].astype(float).mean() - cur[0].astype(float).mean()) < 2


def test_direct_quantized_away_residual_joins_skip_run():
    """With code_residual=True a direct macroblock whose residual
    quantizes to nothing joins the skip run: cur == refs exactly, so
    every MB skips even though the residual layer is enabled."""
    rng = np.random.default_rng(38)
    sps = _sps(32, 32)
    ref = _rand_planes(rng, 32, 32)
    nal = P.encode_b_slice(
        *ref, ref, ref, frame_num=2, poc=POC,
        code_residual=True, direct=True,
    )
    assert len(nal) <= 6
    dec = P.decode_b_slice(nal, sps, ref, ref)
    for a, b in zip(ref, dec):
        assert (a == b).all()


def test_spatial_direct_derivation_cases():
    """The 8.4.1.2.2 table on constructed neighbour grids: no
    predicted neighbour anywhere -> zero-MV bi; an L0 neighbour with
    motion -> L0-only with the 8.4.1.3 median, zeroed exactly when the
    co-located macroblock is inter and |mv| <= 1 per component."""
    mb_w, mb_h = 3, 2

    def grids():
        return {
            lx: (
                [[(0, 0)] * mb_w for _ in range(mb_h)],
                [[False] * mb_w for _ in range(mb_h)],
            )
            for lx in (0, 1)
        }

    g = grids()
    assert P.spatial_direct(g, 0, 0, mb_w, None) == (
        {0: (0, 0), 1: (0, 0)}, {0: True, 1: True},
    )
    g = grids()
    g[0][0][0][0] = (8, 4)
    g[0][1][0][0] = True
    col_inter = [[True] * mb_w for _ in range(mb_h)]
    still = ([[(1, -1)] * mb_w for _ in range(mb_h)], col_inter)
    moving = ([[(2, 0)] * mb_w for _ in range(mb_h)], col_inter)
    intra_col = ([[(0, 0)] * mb_w for _ in range(mb_h)],
                 [[False] * mb_w for _ in range(mb_h)])
    for col, want_mv in ((None, (8, 4)), (intra_col, (8, 4)),
                         (moving, (8, 4)), (still, (0, 0))):
        mvs, pred = P.spatial_direct(g, 1, 0, mb_w, col)
        assert pred == {0: True, 1: False}
        assert mvs[0] == want_mv


def test_b_skip_decode_uses_neighbour_motion_not_just_zero():
    """A B slice whose first MB codes explicit L0 motion and whose
    SECOND falls in a skip run must reconstruct the second from the
    direct-derived (neighbour-median) MV — a decoder that treats
    B_Skip as zero-MV copy gets different bytes. Encoder recon is the
    gate, so this pins encoder and decoder to the SAME derivation."""
    rng = np.random.default_rng(39)
    sps = _sps(64, 16)
    ref = _rand_planes(rng, 64, 16)
    # shift the whole picture 4 integer pixels right -> uniform MV (16,0)
    cur_y = np.roll(ref[0], 4, axis=1)
    cur_cb = np.roll(ref[1], 2, axis=1)
    cur_cr = np.roll(ref[2], 2, axis=1)
    # ref1 is a decoy far from cur so every MB picks L0 explicit motion
    ref1 = tuple(255 - p for p in ref)
    nal, recon = P.encode_b_slice(
        cur_y, cur_cb, cur_cr, ref, ref1, frame_num=2, poc=POC,
        direct=True, return_recon=True,
    )
    dec = P.decode_b_slice(nal, sps, ref, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()


# --- container integration ----------------------------------------------------


def test_bgop_ctts_layout_and_presentation_mapping():
    """gop=6 / b_frames=2 decode order is [I0 P3 B1 B2 P5 B4]: ctts
    offsets (1, 3, 0, 0, 2, 0), presentation [0 2 3 1 5 4], stss = the
    IDRs, and the SPS round-trips poc_type 0."""
    n, w, h = video_params(1)  # 9 frames -> GOPs of 6 + 3
    info = parse_mp4(make_h264_b_bytes(1))
    assert info["codec"] == "avc1"
    assert info["n_frames"] == n == 9
    assert info["sync"] == [0, 6]
    assert info["ct_offsets"] == [1, 3, 0, 0, 2, 0, 1, 2, 0]
    assert info["presentation"] == [0, 2, 3, 1, 5, 4, 6, 8, 7]
    sps = H.parse_sps(H.parse_avcc(info["avcc"])[0])
    assert sps["poc_type"] == 0 and sps["log2_max_poc_lsb"] == 6
    assert (sps["width"], sps["height"]) == (w, h)


def test_bgop_sampled_decode_matches_display_order_theory():
    """Frame j in PRESENTATION order must carry display frame j's
    R = (7i + 11j) mod 256 within quantization error — decode-order
    output would be >= 11 grey levels off at the B/P positions."""
    for i in (0, 7, 14):
        n, w, h = video_params(i)
        payload = make_h264_b_bytes(i)
        seen = []
        for j, t_ms, px in mp4_frames(payload, every_n=2):
            seen.append(j)
            assert t_ms == j * 100
            dt = j % 6
            assert abs(
                px[:, :, 0].astype(float).mean() - (7 * i + 11 * j) % 256
            ) < 2.0, (i, j)
            assert abs(
                px[:, :, 1].astype(float).mean() - ((w - 1) / 2 + dt)
            ) < 1.5, (i, j)
            assert abs(
                px[:, :, 2].astype(float).mean() - ((h - 1) / 2 + dt)
            ) < 1.5, (i, j)
        assert seen == list(range(0, n, 2))


def test_bgop_sampling_is_consistent_across_strides():
    payload = make_h264_b_bytes(4)
    full = {j: px for j, _, px in mp4_frames(payload, every_n=1)}
    for stride in (2, 3, 4):
        for j, _, px in mp4_frames(payload, every_n=stride):
            assert (px == full[j]).all(), (stride, j)


def test_nontarget_b_samples_are_skipped_not_decoded():
    """Corrupting a B sample that no target needs must not disturb
    sampling — proof the skip avoids entropy-decoding it at all.
    (Display targets at every_n=3 are {0, 3, ...}; display 1 = decode
    sample 2 is a non-reference B nothing depends on.)"""
    payload = bytearray(make_h264_b_bytes(0))  # 6 frames, one GOP
    info = parse_mp4(bytes(payload))
    k = info["presentation"][1]  # decode index of display frame 1
    assert k == 2
    off, size = info["offsets"][k], info["sizes"][k]
    for p in range(off + 5, off + size):  # keep length prefix + NAL hdr
        payload[p] ^= 0xA5
    got = [j for j, _, _ in mp4_frames(bytes(payload), every_n=3)]
    assert got == [0, 3]
    # ... while a stride that DOES display frame 1 sees the corruption
    with pytest.raises((ValueError, NotImplementedError)):
        for _ in mp4_frames(bytes(payload), every_n=1):
            pass


def test_bgop_requires_reordering_poc_type():
    frames = [
        np.full((16, 16, 3), 40 * t, dtype=np.uint8) for t in range(4)
    ]
    payload = encode_mp4_h264_bgop(frames, gop=4, b_frames=2)
    info = parse_mp4(payload)
    # decode order I0 P3 B1 B2
    assert info["presentation"] == [0, 2, 3, 1]
    with pytest.raises(ValueError, match="gop must be"):
        encode_mp4_h264_bgop(frames, gop=33)
    with pytest.raises(ValueError, match="b_frames"):
        encode_mp4_h264_bgop(frames, b_frames=0)


def test_ctts_version1_and_overrun_classify():
    payload = bytearray(make_h264_b_bytes(2))
    pos = bytes(payload).find(b"ctts")
    assert pos > 0
    v1 = bytearray(payload)
    v1[pos + 4] = 1  # version byte
    with pytest.raises(NotImplementedError, match="ctts version 1"):
        parse_mp4(bytes(v1))
    huge = bytearray(payload)
    huge[pos + 8 : pos + 12] = (1 << 24).to_bytes(4, "big")  # entry_count
    with pytest.raises(ValueError, match="ctts"):
        parse_mp4(bytes(huge))


def test_fuzz_corrupted_b_samples_always_classify():
    """Mutations of a valid B-GOP payload decode or classify
    (ValueError / NotImplementedError), never a raw numpy error — the
    same contract every other codec fuzzer here pins."""
    import random

    rng = random.Random(29)
    payload = make_h264_b_bytes(5)
    for _ in range(300):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            for _ in mp4_frames(bytes(b)):
                pass
        except (ValueError, NotImplementedError):
            pass
