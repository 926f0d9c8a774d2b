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

    # two-partition types decode since round 5; a TRUNCATED one is a
    # ValueError (mvd parse), not a classification
    w = H._BitWriter()
    _b_header(w)
    w.ue(0)
    w.ue(4)  # B_L0_L0_16x8: two L0 mvd pairs expected, none coded
    with pytest.raises(ValueError, match="truncated"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)

    # B_8x8 sub-macroblock partitions still classify
    w = H._BitWriter()
    _b_header(w)
    w.ue(0)
    w.ue(22)  # B_8x8
    with pytest.raises(NotImplementedError, match="sub-macroblock"):
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


# --- temporal direct (8.4.1.2.3) ---------------------------------------------


def test_temporal_direct_scaling_known_values():
    """Hand-checked POC scaling: cur midway between refs halves the
    co-located motion (tb=2, td=4 -> DistScaleFactor 128)."""
    col = ([[(8, -6)]], [[True]])
    mvs, pred = P.temporal_direct(col, 0, 0, 2, 0, 4)
    assert mvs[0] == (4, -3) and mvs[1] == (-4, 3)
    assert pred == {0: True, 1: True}
    # intra co-located MB -> mvCol (0,0) -> both lists zero
    mvs, _ = P.temporal_direct(([[(8, -6)]], [[False]]), 0, 0, 2, 0, 4)
    assert mvs[0] == (0, 0) and mvs[1] == (0, 0)
    # td == 0 degrades to mvL0 = mvCol, mvL1 = 0 (spec long-term shape)
    mvs, _ = P.temporal_direct(col, 0, 0, 2, 4, 4)
    assert mvs[0] == (8, -6) and mvs[1] == (0, 0)
    # asymmetric distances: tb=1, td=4 -> quarter scaling
    mvs, _ = P.temporal_direct(col, 0, 0, 1, 0, 4)
    assert mvs[0] == (2, -1) and mvs[1] == (2 - 8, -1 + 6)


def test_temporal_direct_b_slice_roundtrip_and_classification():
    """A stream coded with direct_spatial_mv_pred_flag == 0: every MB's
    content IS the temporal-direct bi prediction from a nonzero
    co-located motion field, so the encoder emits B_Skip/B_Direct
    everywhere, the decoder must reproduce the recon byte-exactly —
    and WITHOUT POC context it must CLASSIFY (NotImplementedError),
    never silently decode against spatial motion."""
    rng = np.random.default_rng(77)
    sps = _sps(48, 32)
    ref0 = _rand_planes(rng)
    ref1 = _rand_planes(rng)
    mb_w, mb_h = 3, 2
    col_motion = (
        [[(8, -6)] * mb_w for _ in range(mb_h)],
        [[True] * mb_w for _ in range(mb_h)],
    )
    refs = (ref0, ref1)
    # build cur = the exact temporal-direct prediction per MB
    cur_y = np.zeros_like(ref0[0])
    cur_cb = np.zeros_like(ref0[1])
    cur_cr = np.zeros_like(ref0[2])
    for my in range(mb_h):
        for mx in range(mb_w):
            mvs, _ = P.temporal_direct(col_motion, mx, my, 2, 0, 4)
            py, pcb, pcr = P._predict_b_mb(refs, mx, my, 3, mvs[0], mvs[1])
            cur_y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = py
            cur_cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcb
            cur_cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcr
    nal, recon = P.encode_b_slice(
        cur_y, cur_cb, cur_cr, ref0, ref1, frame_num=2, poc=POC,
        return_recon=True, direct=True, col_motion=col_motion,
        direct_temporal=True, ref_pocs=(0, 4),
    )
    # the flag is genuinely 0 on the wire
    _, rbsp = H.nal_to_rbsp(nal)
    r = P._BitReader(rbsp)
    r.ue("first_mb"); r.ue("slice_type"); r.ue("pps")
    r.u(sps["log2_max_frame_num"], "frame_num")
    r.u(sps["log2_max_poc_lsb"], "poc_lsb")
    assert r.u(1, "direct_spatial_mv_pred_flag") == 0
    # decode with POC context: byte-exact
    dec = P.decode_b_slice(
        nal, sps, ref0, ref1, col_motion=col_motion, pocs=(2, 0, 4)
    )
    for a, b in zip(recon, dec):
        assert (a == b).all()
    assert (dec[0] == cur_y).all()  # direct prediction was exact
    # without POC context: classify, never guess
    with pytest.raises(NotImplementedError, match="temporal direct"):
        P.decode_b_slice(nal, sps, ref0, ref1, col_motion=col_motion)
    # encoder guard: temporal direct without ref POCs is a caller error
    with pytest.raises(ValueError, match="ref_pocs"):
        P.encode_b_slice(
            cur_y, cur_cb, cur_cr, ref0, ref1, frame_num=2, poc=POC,
            direct=True, direct_temporal=True,
        )


# --- two-partition B macroblocks (Table 7-14 types 4..21) --------------------


def _parts_planes(refs, mb_w, mb_h, parts_of):
    """Build (y, cb, cr) whose every MB is exactly the partitioned
    prediction given by parts_of(mx, my) — through the decoder's own
    MC, so the match is exact including edge clamping."""
    y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    for my in range(mb_h):
        for mx in range(mb_w):
            py, pcb, pcr = P._predict_b_parts(refs, mx, my, parts_of(mx, my))
            y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = py
            cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcb
            cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcr
    return y, cb, cr


def _wire_mb_types(nal: bytes, sps: dict) -> list[int]:
    """All mb_types of a B slice in decode order (skip runs -> -1)."""
    _, rbsp = H.nal_to_rbsp(nal)
    r = P._BitReader(rbsp)
    r.ue("first_mb")
    assert r.ue("slice_type") % 5 == 1
    r.ue("pps")
    r.u(sps["log2_max_frame_num"], "fn")
    r.u(sps["log2_max_poc_lsb"], "poc")
    r.u(4, "flags")
    r.se("qp_delta")
    out = []
    n_mbs = sps["mb_width"] * sps["mb_height"]
    while len(out) < n_mbs and r.more_data():
        out.extend([-1] * r.ue("skip_run"))
        if len(out) >= n_mbs or not r.more_data():
            break
        mb_type = r.ue("mb_type")
        out.append(mb_type)
        if not 0 <= mb_type <= 3:
            break  # partitioned/intra: stop at the first (mvds follow)
    return out


@pytest.mark.parametrize(
    "parts,want_mb_type,exact",
    [
        # (L0, L1) 16x8 -> pair idx 2, mb_type 8
        (
            (
                (0, 0, 16, 8, 1, {0: (8, 0)}),
                (0, 8, 16, 8, 2, {1: (0, 8)}),
            ),
            8,
            True,
        ),
        # (L0, L0) 8x16 with different MVs -> pair idx 0, mb_type 5
        (
            (
                (0, 0, 8, 16, 1, {0: (8, 0)}),
                (8, 0, 8, 16, 1, {0: (-8, 4)}),
            ),
            5,
            True,
        ),
        # (Bi, L1) 16x8 -> pair idx 7 (Table 7-14 B_Bi_L1_16x8),
        # mb_type 18.  The bi content is an average the single-list
        # searches cannot invert exactly, so only recon==decode is
        # guaranteed — the residual layer carries the remainder.
        (
            (
                (0, 0, 16, 8, 3, {0: (4, 0), 1: (-4, 0)}),
                (0, 8, 16, 8, 2, {1: (0, 4)}),
            ),
            18,
            False,
        ),
    ],
)
def test_b_partition_roundtrip_byte_exact(parts, want_mb_type, exact):
    """Content whose halves genuinely move differently (built through
    the decoder's own partitioned MC): the encoder must pick the
    two-partition type ON THE WIRE, and decode must equal the encoder
    recon byte-exactly — and the source too when the generating MVs
    are single-list recoverable (SAD-0 search)."""
    rng = np.random.default_rng(57)
    sps = _sps(48, 32)
    ref0 = _rand_planes(rng)
    ref1 = _rand_planes(rng)
    refs = (ref0, ref1)
    cur = _parts_planes(refs, 3, 2, lambda mx, my: list(parts))
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
        code_residual=True, partitions=True,
    )
    types = _wire_mb_types(nal, sps)
    assert types[0] == want_mb_type
    dec = P.decode_b_slice(nal, sps, ref0, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    if exact:
        for a, b in zip(cur, dec):
            assert (a == b).all()  # prediction exact -> lossless


def test_b_partition_mv_prediction_crosses_partitions():
    """Partition 1's MV predictor must read partition 0's freshly
    decoded cells (8.4.1.3 via the 4x4 grid): same content, but the
    roundtrip only stays byte-exact if encoder and decoder agree on
    the within-MB fill order — exercised by per-MB VARYING motion so
    neighbour MBs contribute genuinely different predictors."""
    rng = np.random.default_rng(58)
    sps = _sps(64, 48)
    ref0 = _rand_planes(rng, 64, 48)
    ref1 = _rand_planes(rng, 64, 48)
    refs = (ref0, ref1)

    def parts_of(mx, my):
        d = 4 * ((mx + my) % 3)
        return [
            (0, 0, 16, 8, 1, {0: (d, 0)}),
            (0, 8, 16, 8, 1, {0: (0, -d)}),
        ]

    cur = _parts_planes(refs, 4, 3, parts_of)
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
        code_residual=True, partitions=True,
    )
    dec = P.decode_b_slice(nal, sps, ref0, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()


def test_b_16x16_content_never_fragments():
    """Identical motion across a whole MB must still code as 16x16
    (the split carries a strict-inequality penalty): the existing
    uniquely-optimal-mode fixtures stay 16x16 on the wire."""
    rng = np.random.default_rng(59)
    sps = _sps(32, 32)
    ref0 = _rand_planes(rng, 32, 32)
    ref1 = tuple((p + 20).astype(np.uint8) for p in ref0)
    nal, _ = P.encode_b_slice(
        *ref1, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
    )
    types = _wire_mb_types(nal, sps)
    assert all(t in (-1, 0, 1, 2, 3) for t in types)


def test_bparts_fixture_asserts_emission():
    """make_h264_bparts_bytes fails LOUD when the scene cannot force a
    partitioned B macroblock — the min_part_mbs discipline; and the
    real scene genuinely emits them (builder does not raise)."""
    from flow_indexer_spark.operators.mp4codec import (
        encode_mp4_h264_bgop,
        make_h264_bparts_bytes,
    )

    assert len(make_h264_bparts_bytes(1)) > 0  # emits, or would raise
    still = [np.zeros((16, 16, 3), dtype=np.uint8) for _ in range(4)]
    with pytest.raises(ValueError, match="partitioned B macroblocks"):
        encode_mp4_h264_bgop(
            still, gop=4, b_frames=2, min_part_mbs=1, partitions=True
        )


# --- B_8x8 sub-macroblock partitions (Table 7-18) ----------------------------


def test_b8x8_roundtrip_byte_exact_and_wire():
    """Per-quadrant motion (each 8x8 quadrant of every MB moves
    differently, alternating L0/L1) forces B_8x8 on the wire with the
    expected Table 7-18 sub_mb_types; decode equals recon equals the
    source byte-exactly."""
    rng = np.random.default_rng(61)
    sps = _sps(48, 32)
    ref0 = _rand_planes(rng)
    ref1 = _rand_planes(rng)
    refs = (ref0, ref1)
    qmv = {  # (quadrant) -> (pmode, mv)
        (0, 0): (1, (8, 0)),
        (8, 0): (2, (0, 8)),
        (0, 8): (1, (-8, 4)),
        (8, 8): (2, (4, -8)),
    }

    def parts_of(mx, my):
        return [
            (qx, qy, 8, 8, pm, {0: mv} if pm == 1 else {1: mv})
            for (qx, qy), (pm, mv) in qmv.items()
        ]

    cur = _parts_planes(refs, 3, 2, parts_of)
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
        code_residual=True, partitions=True,
    )
    # wire: first MB is B_8x8 with (L0,L1,L0,L1) 8x8 sub types (1/2)
    _, rbsp = H.nal_to_rbsp(nal)
    r = P._BitReader(rbsp)
    r.ue("first_mb")
    assert r.ue("slice_type") % 5 == 1
    r.ue("pps")
    r.u(sps["log2_max_frame_num"], "fn")
    r.u(sps["log2_max_poc_lsb"], "poc")
    r.u(4, "flags")
    r.se("qp_delta")
    assert r.ue("skip_run") == 0
    assert r.ue("mb_type") == 22
    assert [r.ue("sub") for _ in range(4)] == [1, 2, 1, 2]
    dec = P.decode_b_slice(nal, sps, ref0, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()


def test_b8x8_4x4_subparts_roundtrip():
    """4x4 sub-partitions: quadrant content moves per 4x4 cell; the
    encoder lands sub_mb_type 10/11 (L0_4x4/L1_4x4) and the roundtrip
    is byte-exact (prediction chain crosses sub-part fills)."""
    rng = np.random.default_rng(62)
    sps = _sps(32, 32)
    ref0 = _rand_planes(rng, 32, 32)
    ref1 = _rand_planes(rng, 32, 32)
    refs = (ref0, ref1)

    def parts_of(mx, my):
        out = []
        for qx, qy in ((0, 0), (8, 0), (0, 8), (8, 8)):
            pm = 1 if (qx + qy) % 16 == 0 else 2
            for i, (sx, sy) in enumerate(((0, 0), (4, 0), (0, 4), (4, 4))):
                mv = (4 * (i + 1) * (1 if pm == 1 else -1), 4 * i)
                out.append(
                    (qx + sx, qy + sy, 4, 4, pm, {0: mv} if pm == 1 else {1: mv})
                )
        return out

    cur = _parts_planes(refs, 2, 2, parts_of)
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=POC, return_recon=True,
        code_residual=True, partitions=True,
    )
    dec = P.decode_b_slice(nal, sps, ref0, ref1)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()


def test_b8x8_classification_boundaries():
    sps = _sps(32, 32)
    rng = np.random.default_rng(63)
    ref = _rand_planes(rng, 32, 32)

    def _hdr(w):
        w.ue(0)
        w.ue(6)
        w.ue(0)
        w.u(2, 4)
        w.u(POC[0], POC[1])
        w.u(1, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)

    # B_Direct_8x8 (sub type 0) classifies
    w = H._BitWriter()
    _hdr(w)
    w.ue(0)
    w.ue(22)
    w.ue(0)  # sub_mb_type 0 in quadrant 0
    with pytest.raises(NotImplementedError, match="B_Direct_8x8"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)
    # sub type > 12 is corrupt
    w = H._BitWriter()
    _hdr(w)
    w.ue(0)
    w.ue(22)
    w.ue(13)
    with pytest.raises(ValueError, match="> 12"):
        P.decode_b_slice(H.rbsp_to_nal(0x01, w.rbsp_trailing()), sps, ref, ref)
