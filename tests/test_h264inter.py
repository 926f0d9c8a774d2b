"""H.264 P-slice motion compensation (operators/h264inter.py). No
SparkSession needed — plain numpy.

Because the implemented P subset codes ZERO residual, the decoder's
reconstruction must equal the encoder's motion-compensated prediction
byte-exactly — so unlike the lossy intra tests, everything here gates
exact equality: the interpolation kernels against a scalar spec
transcription, the MV prediction rules against hand cases, and the
full slice roundtrip against the encoder's recon."""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264inter as P
from flow_indexer_spark.operators.mp4codec import (
    make_h264_gop_bytes,
    mp4_frames,
    parse_mp4,
    video_params,
)


def _sps(w: int, h: int) -> dict:
    return H.parse_sps(H.make_sps(w, h, ref_frames=1))


def _rand_planes(rng, w=48, h=32):
    return (
        rng.integers(0, 256, (h, w), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


# --- interpolation vs a scalar spec transcription (8.4.2.2.1/2) ---------------


def _naive_luma(ref, x_q, y_q, h, w):
    """Per-pixel transcription of Figure 8-4 / Table 8-12 with
    edge-clipped integer sample fetches."""
    H_, W_ = ref.shape

    def px(x, y):
        return int(ref[min(max(y, 0), H_ - 1), min(max(x, 0), W_ - 1)])

    def bh(x, y):  # unrounded horizontal half at (x + 1/2, y)
        return (
            px(x - 2, y) - 5 * px(x - 1, y) + 20 * px(x, y)
            + 20 * px(x + 1, y) - 5 * px(x + 2, y) + px(x + 3, y)
        )

    def bv(x, y):  # unrounded vertical half at (x, y + 1/2)
        return (
            px(x, y - 2) - 5 * px(x, y - 1) + 20 * px(x, y)
            + 20 * px(x, y + 1) - 5 * px(x, y + 2) + px(x, y + 3)
        )

    def clip(v):
        return min(max(v, 0), 255)

    xi, fx = x_q >> 2, x_q & 3
    yi, fy = y_q >> 2, y_q & 3
    out = np.zeros((h, w), np.uint8)
    for r in range(h):
        for c in range(w):
            x, y = xi + c, yi + r
            G = px(x, y)
            b = clip((bh(x, y) + 16) >> 5)
            hh = clip((bv(x, y) + 16) >> 5)
            ju = (
                bh(x, y - 2) - 5 * bh(x, y - 1) + 20 * bh(x, y)
                + 20 * bh(x, y + 1) - 5 * bh(x, y + 2) + bh(x, y + 3)
            )
            j = clip((ju + 512) >> 10)
            s = clip((bh(x, y + 1) + 16) >> 5)
            m = clip((bv(x + 1, y) + 16) >> 5)
            tab = {
                (0, 0): G, (2, 0): b, (0, 2): hh, (2, 2): j,
                (1, 0): (G + b + 1) >> 1,
                (3, 0): (b + px(x + 1, y) + 1) >> 1,
                (0, 1): (G + hh + 1) >> 1,
                (0, 3): (hh + px(x, y + 1) + 1) >> 1,
                (2, 1): (b + j + 1) >> 1, (2, 3): (j + s + 1) >> 1,
                (1, 2): (hh + j + 1) >> 1, (3, 2): (j + m + 1) >> 1,
                (1, 1): (b + hh + 1) >> 1, (3, 1): (b + m + 1) >> 1,
                (1, 3): (hh + s + 1) >> 1, (3, 3): (s + m + 1) >> 1,
            }
            out[r, c] = tab[(fx, fy)]
    return out


def test_mc_luma_matches_naive_spec_all_16_positions():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (24, 28), dtype=np.uint8)
    for fy in range(4):
        for fx in range(4):
            for x0, y0 in ((12, 8), (-2, -3), (22, 18)):  # incl. edges
                got = P.mc_luma(ref, 4 * x0 + fx, 4 * y0 + fy, 8, 8)
                want = _naive_luma(ref, 4 * x0 + fx, 4 * y0 + fy, 8, 8)
                assert (got == want).all(), (fx, fy, x0, y0)


def test_mc_chroma_matches_naive_bilinear_all_64_fracs():
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    H_, W_ = ref.shape
    for fy in range(8):
        for fx in range(8):
            got = P.mc_chroma(ref, 8 * 3 + fx, 8 * 2 + fy, 6, 6)
            want = np.zeros((6, 6), np.uint8)
            for r in range(6):
                for c in range(6):
                    x, y = 3 + c, 2 + r
                    A = int(ref[min(y, H_ - 1), min(x, W_ - 1)])
                    B = int(ref[min(y, H_ - 1), min(x + 1, W_ - 1)])
                    C = int(ref[min(y + 1, H_ - 1), min(x, W_ - 1)])
                    D = int(ref[min(y + 1, H_ - 1), min(x + 1, W_ - 1)])
                    want[r, c] = (
                        (8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
                        + (8 - fx) * fy * C + fx * fy * D + 32
                    ) >> 6
            assert (got == want).all(), (fx, fy)


def test_half_pel_on_linear_ramp_is_exact_midpoint():
    ramp = np.tile(np.arange(0, 112, 2, dtype=np.uint8), (40, 1))
    half = P.mc_luma(ramp, 4 * 8 + 2, 4 * 6, 16, 16)
    mid = (ramp[6:22, 8:24].astype(int) + ramp[6:22, 9:25].astype(int) + 1) >> 1
    assert (half == mid).all()


def test_hostile_mv_is_edge_clipped_not_overread():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blk = P.mc_luma(ref, 4 * 10**7, -(4 * 10**7), 16, 16)
    assert (blk == ref[0, -1]).all()  # far top-right corner everywhere


# --- MV prediction (8.4.1.3) and P_Skip (8.4.1.1) -----------------------------


def _grid(mb_w, mb_h, entries):
    mvs = [[(0, 0)] * mb_w for _ in range(mb_h)]
    inter = [[False] * mb_w for _ in range(mb_h)]
    for (mx, my), mv in entries.items():
        mvs[my][mx] = mv
        inter[my][mx] = True
    return mvs, inter


def test_mv_pred_median_and_row0_copy_rule():
    # interior: median of A, B, C componentwise
    mvs, inter = _grid(4, 3, {(0, 1): (4, -8), (1, 0): (12, 0), (2, 0): (8, 4)})
    assert P.mv_pred_16x16(mvs, inter, 1, 1, 4) == (8, 0)
    # row 0 with left available: B and C copy A -> predictor is A
    mvs, inter = _grid(4, 3, {(0, 0): (20, -4)})
    assert P.mv_pred_16x16(mvs, inter, 1, 0, 4) == (20, -4)
    # top-left corner: everything unavailable -> zero
    mvs, inter = _grid(4, 3, {})
    assert P.mv_pred_16x16(mvs, inter, 0, 0, 4) == (0, 0)


def test_mv_pred_single_matching_ref_shortcut_with_intra_neighbors():
    # only B is inter (A intra, C off-picture -> D intra): mvp = mvB
    mvs, inter = _grid(2, 2, {(1, 0): (-16, 24)})
    assert P.mv_pred_16x16(mvs, inter, 1, 1, 2) == (-16, 24)


def test_mv_pred_c_falls_back_to_d():
    # right edge: C off-picture, D (top-left) substitutes into the median
    mvs, inter = _grid(
        2, 2, {(0, 1): (8, 8), (1, 0): (0, 0), (0, 0): (8, 8)}
    )
    assert P.mv_pred_16x16(mvs, inter, 1, 1, 2) == (8, 8)


def test_skip_mv_zero_short_circuits():
    # top row / left column: unavailable neighbour -> zero
    mvs, inter = _grid(3, 3, {})
    assert P.skip_mv(mvs, inter, 0, 1, 3) == (0, 0)
    assert P.skip_mv(mvs, inter, 1, 0, 3) == (0, 0)
    # a zero-MV ref-0 neighbour forces zero even when the median isn't
    mvs, inter = _grid(
        3, 3, {(0, 1): (8, 8), (1, 0): (0, 0), (2, 0): (8, 8)}
    )
    assert P.mv_pred_16x16(mvs, inter, 1, 1, 3) == (8, 8)
    assert P.skip_mv(mvs, inter, 1, 1, 3) == (0, 0)
    # otherwise skip uses the median predictor
    mvs, inter = _grid(
        3, 3, {(0, 1): (8, 8), (1, 0): (8, 4), (2, 0): (4, 8)}
    )
    assert P.skip_mv(mvs, inter, 1, 1, 3) == (8, 8)


# --- slice roundtrip -----------------------------------------------------------


def test_p_slice_decode_equals_encoder_recon_byte_exact():
    rng = np.random.default_rng(11)
    sps = _sps(48, 32)
    ref = _rand_planes(rng)
    cur = tuple(
        np.pad(p, ((1, 0), (2, 0)), mode="edge")[: p.shape[0], : p.shape[1]]
        for p in ref
    )
    nal, recon = P.encode_p_slice(
        *cur, ref, frame_num=1, return_recon=True,
        intra_mbs=frozenset({(1, 1)}),
    )
    dec = P.decode_p_slice(nal, sps, ref)
    for a, b in zip(recon, dec):
        assert (a == b).all()


def test_fractional_motion_is_recovered_exactly():
    """Current frame := the interpolator's own output at a known
    fractional MV -> the search must find it and the roundtrip is
    byte-exact (encoder search, mvd coding, decoder MC all agree).
    Textured content, so the SAD landscape has a unique sharp minimum
    (a smooth plane has near-ties a heuristic search may legally pick
    — the roundtrip tests cover that case)."""
    sps = _sps(48, 32)
    rng = np.random.default_rng(21)
    tex = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    refs = (tex, tex[::2, ::2].copy(), (255 - tex)[::2, ::2].copy())
    for mv in ((5, -3), (-2, 7), (1, 1), (0, -5)):
        cur_y = np.zeros((32, 48), np.uint8)
        cur_cb = np.zeros((16, 24), np.uint8)
        cur_cr = np.zeros((16, 24), np.uint8)
        for my in range(2):
            for mx in range(3):
                py, pcb, pcr = P.mc_predict_mb(*refs, mx, my, mv)
                cur_y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = py
                cur_cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcb
                cur_cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcr
        nal, recon = P.encode_p_slice(
            cur_y, cur_cb, cur_cr, refs, frame_num=2, search_range=3,
            return_recon=True,
        )
        dec = P.decode_p_slice(nal, sps, refs)
        assert (dec[0] == cur_y).all(), mv
        assert (dec[1] == cur_cb).all() and (dec[2] == cur_cr).all(), mv


def test_static_frame_codes_as_one_skip_run():
    rng = np.random.default_rng(12)
    sps = _sps(64, 48)
    ref = _rand_planes(rng, 64, 48)
    nal = P.encode_p_slice(*ref, ref, frame_num=1)
    # 12 MBs of pure skip: header + one trailing skip-run ue + stop bit
    assert len(nal) <= 6
    dec = P.decode_p_slice(nal, sps, ref)
    for a, b in zip(ref, dec):
        assert (a == b).all()


def test_intra_refresh_mbs_do_not_feed_mv_prediction():
    """An intra MB between two moving MBs contributes (0,0,ref -1), so
    the next MB's predictor comes from the single matching inter
    neighbour — pinned by exact roundtrip with forced intra columns."""
    rng = np.random.default_rng(13)
    sps = _sps(80, 16)
    ref = _rand_planes(rng, 80, 16)
    cur = tuple(
        np.pad(p, ((0, 0), (3, 0)), mode="edge")[:, : p.shape[1]] for p in ref
    )
    nal, recon = P.encode_p_slice(
        *cur, ref, frame_num=1, return_recon=True,
        intra_mbs=frozenset({(2, 0)}),
    )
    dec = P.decode_p_slice(nal, sps, ref)
    for a, b in zip(recon, dec):
        assert (a == b).all()


# --- classification ------------------------------------------------------------


def _p_header(w: H._BitWriter, slice_type=5, qp=36):
    w.ue(0)
    w.ue(slice_type)
    w.ue(0)
    w.u(1, 4)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(qp - 26)


def test_unimplemented_p_tools_classify_from_syntax():
    sps = _sps(32, 32)
    ref = _rand_planes(np.random.default_rng(1), 32, 32)

    # B slice routed to the wrong decoder (decode_b_slice handles it)
    w = H._BitWriter()
    w.ue(0)
    w.ue(6)  # slice_type B
    with pytest.raises(ValueError, match="B slice handed"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # partitioned P macroblock: the seam CLOSED (tests/test_h264_parts.py)
    # — a stream that ends mid-partition now classifies as corruption
    w = H._BitWriter()
    _p_header(w)
    w.ue(0)  # mb_skip_run
    w.ue(1)  # mb_type P_L0_L0_16x8
    with pytest.raises(ValueError, match="truncated"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # hostile sub_mb_type
    w = H._BitWriter()
    _p_header(w)
    w.ue(0)
    w.ue(3)  # mb_type P_8x8
    w.ue(4)  # sub_mb_type 4 > 3
    with pytest.raises(ValueError, match="sub_mb_type"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # inter residuals (cbp != 0) DECODE now (seam closed); a stream
    # that ends mid-residual classifies as corruption, not capability
    w = H._BitWriter()
    _p_header(w)
    w.ue(0)
    w.ue(0)  # P_L0_16x16
    w.se(0)
    w.se(0)
    w.ue(2)  # coded_block_pattern codeNum 2 -> cbp 1 (luma 8x8 #0 coded)
    with pytest.raises(ValueError, match="truncated"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # invalid cbp codeNum
    w = H._BitWriter()
    _p_header(w)
    w.ue(0)
    w.ue(0)
    w.se(0)
    w.se(0)
    w.ue(48)
    with pytest.raises(ValueError, match="coded_block_pattern"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # skip run overrunning the picture
    w = H._BitWriter()
    _p_header(w)
    w.ue(5)  # only 4 MBs in 32x32
    with pytest.raises(ValueError, match="overruns"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # slice data exhausted before the picture is full
    w = H._BitWriter()
    _p_header(w)
    w.ue(2)
    with pytest.raises(ValueError, match="ends before"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w.rbsp_trailing()), sps, ref)

    # IDR NAL handed to the P decoder
    with pytest.raises(ValueError, match="IDR"):
        P.decode_p_slice(b"\x65\x88", sps, ref)


def test_gop_decoder_requires_an_idr_first():
    sps_nal = H.make_sps(32, 32, ref_frames=1)
    avcc = H.make_avcc(sps_nal, H.make_pps())
    dec = P.GopDecoder(avcc)
    ref = _rand_planes(np.random.default_rng(2), 32, 32)
    nal = P.encode_p_slice(*ref, ref, frame_num=1)
    with pytest.raises(ValueError, match="no reference"):
        dec.decode(len(nal).to_bytes(4, "big") + nal)


def test_fuzz_corrupted_p_samples_always_classify():
    """Mutations of a valid GOP payload decode or classify
    (ValueError / NotImplementedError), never a raw numpy error —
    the same contract the intra and I_PCM fuzzers pin."""
    import random

    rng = random.Random(23)
    payload = make_h264_gop_bytes(5)
    for _ in range(300):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            for _ in mp4_frames(bytes(b)):
                pass
        except (ValueError, NotImplementedError):
            pass


# --- container integration ------------------------------------------------------


def test_gop_mp4_sampled_decode_matches_motion_theory():
    """Frame means must track the per-frame (+2, +1) in-GOP drift —
    a decoder that ignored motion compensation would sit 2*dt off the
    G theory (far outside tolerance)."""
    for i in (0, 7, 14):
        payload = make_h264_gop_bytes(i)
        info = parse_mp4(payload)
        n, w, h = video_params(i)
        assert info["codec"] == "avc1"
        assert info["sync"] == list(range(0, n, 4))
        seen = []
        for k, t_ms, px in mp4_frames(payload, every_n=2):
            seen.append(k)
            dt, g = k % 4, k // 4
            assert abs(
                px[:, :, 0].astype(float).mean() - (7 * i + 11 * g) % 256
            ) < 1.5
            assert abs(
                px[:, :, 1].astype(float).mean() - ((w - 1) / 2 + 2 * dt)
            ) < 2.0
            assert abs(
                px[:, :, 2].astype(float).mean() - ((h - 1) / 2 + dt)
            ) < 3.5
        assert seen == list(range(0, n, 2))


def test_gop_sampling_is_consistent_across_strides():
    """A frame decoded via every_n=3 equals the same frame decoded via
    every_n=1 byte-for-byte: the roll-forward from the sync sample
    reproduces the full-decode state exactly."""
    payload = make_h264_gop_bytes(4)
    full = {k: px for k, _, px in mp4_frames(payload, every_n=1)}
    for k, _, px in mp4_frames(payload, every_n=3):
        assert (px == full[k]).all(), k


# --- inter coded residuals (cbp != 0, spec 7.3.5.3 / Table 9-4 inter) ----------


def _noisy_shift(ref, rng, amp=8):
    """Shifted planes + noise: motion the search finds, residual energy
    the quantizer must carry."""
    out = []
    for p in ref:
        s = np.pad(p, ((1, 0), (2, 0)), mode="edge")[: p.shape[0], : p.shape[1]]
        n = rng.integers(-amp, amp + 1, s.shape)
        out.append(np.clip(s.astype(np.int64) + n, 0, 255).astype(np.uint8))
    return tuple(out)


def test_cbp_inter_table_is_the_spec_permutation():
    assert sorted(P._CBP_INTER) == list(range(48))
    # spot anchors from the published table
    assert P._CBP_INTER[0] == 0 and P._CBP_INTER[1] == 16
    assert P._CBP_INTER[12] == 47 and P._CBP_INTER[47] == 41
    assert P._CBP_INTER_CODE[15] == 11  # all-luma-no-chroma


@pytest.mark.parametrize("qp", [8, 16, 26, 36])
def test_residual_p_slice_decode_equals_encoder_recon(qp):
    rng = np.random.default_rng(100 + qp)
    sps = _sps(48, 32)
    ref = _rand_planes(rng)
    cur = _noisy_shift(ref, rng)
    nal, recon = P.encode_p_slice(
        *cur, ref, frame_num=1, qp=qp, code_residual=True, return_recon=True,
        intra_mbs=frozenset({(0, 1)}),
    )
    dec = P.decode_p_slice(nal, sps, ref)
    for a, b in zip(recon, dec):
        assert (a == b).all()


def test_residual_improves_fidelity_and_rate_scales_with_qp():
    rng = np.random.default_rng(7)
    ref = _rand_planes(rng, w=64, h=48)
    cur = _noisy_shift(ref, rng)
    maes, sizes = [], []
    for qp, code in ((12, True), (28, True), (12, False)):
        nal, recon = P.encode_p_slice(
            *cur, ref, frame_num=1, qp=qp, code_residual=code,
            return_recon=True,
        )
        maes.append(
            float(np.abs(recon[0].astype(int) - cur[0].astype(int)).mean())
        )
        sizes.append(len(nal))
    assert maes[0] < maes[1] < maes[2]  # finer qp -> closer; off -> worst
    assert sizes[0] > sizes[1] > sizes[2]  # and costs more bits


def test_residual_off_bitstream_unchanged():
    """code_residual=False must produce the round-4 zero-residual
    bitstream bit-for-bit (the pinned GOP fixtures depend on it)."""
    rng = np.random.default_rng(5)
    ref = _rand_planes(rng)
    cur = _noisy_shift(ref, rng)
    a = P.encode_p_slice(*cur, ref, frame_num=1, code_residual=False)
    b = P.encode_p_slice(*cur, ref, frame_num=1)
    assert a == b


def test_residual_skip_requires_zero_levels():
    """A static frame still skips every MB even with residual coding
    on (residual quantizes to nothing at moderate qp); a noisy frame
    with zero motion must NOT skip — 7.4.4 conformance."""
    rng = np.random.default_rng(9)
    ref = _rand_planes(rng)
    nal, _ = P.encode_p_slice(
        *ref, ref, frame_num=1, qp=26, code_residual=True, return_recon=True
    )
    sps = _sps(48, 32)
    assert len(nal) < 16  # header + one skip run
    noisy = tuple(
        np.clip(p.astype(np.int64) + rng.integers(-30, 31, p.shape), 0, 255)
        .astype(np.uint8)
        for p in ref
    )
    nal2, recon2 = P.encode_p_slice(
        *noisy, ref, frame_num=1, qp=8, code_residual=True, return_recon=True
    )
    assert len(nal2) > 100
    dec2 = P.decode_p_slice(nal2, sps, ref)
    for a, b in zip(recon2, dec2):
        assert (a == b).all()
    # and fidelity is real: reconstruction ~tracks the noisy source
    assert float(np.abs(recon2[0].astype(int) - noisy[0].astype(int)).mean()) < 2.0


def test_residual_mb_qp_delta_decodes():
    """Hand-splice a nonzero mb_qp_delta: encoder always writes 0, so
    pin the decoder's QP update path with a crafted stream."""
    rng = np.random.default_rng(21)
    sps = _sps(16, 16)
    ref = _rand_planes(rng, w=16, h=16)
    # encode one residual MB at qp 20, then rebuild the same stream
    # with slice qp 24 and mb_qp_delta -4: identical reconstruction
    cur = _noisy_shift(ref, rng)
    from flow_indexer_spark.operators.h264intra import chroma_qp

    nal, recon = P.encode_p_slice(
        *cur, ref, frame_num=1, qp=20, code_residual=True, return_recon=True
    )
    mv, qp = (0, 0), 20
    # decode the original to get levels? simpler: craft directly
    y, cb, cr = cur
    from flow_indexer_spark.operators.h264inter import (
        _emit_inter_residual,
        _quant_inter_luma,
    )
    from flow_indexer_spark.operators.h264intra import (
        NzcCtx,
        _quant_chroma_full,
    )

    py, pcb, pcr = P.mc_predict_mb(ref[0], ref[1], ref[2], 0, 0, (0, 0))
    cbp, levels = _quant_inter_luma(y[:16, :16], py, 20)
    cdcs, cacs = {}, {}
    for comp, (plane, cpred) in enumerate(((cb, pcb), (cr, pcr))):
        cdcs[comp], cacs[comp] = _quant_chroma_full(
            plane[:8, :8], cpred.astype(np.int64), chroma_qp(20)
        )
    if any(c for d in cacs.values() for b in d for c in b):
        cbp |= 2 << 4
    elif any(c for d in cdcs.values() for c in d):
        cbp |= 1 << 4
    assert cbp, "fixture must produce residual energy"
    w = H._BitWriter()
    w.ue(0)
    w.ue(5)
    w.ue(0)
    w.u(1, 4)  # frame_num
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(24 - 26)  # slice qp 24
    w.ue(0)  # mb_skip_run
    w.ue(0)  # P_L0_16x16
    w.se(0)
    w.se(0)
    w.ue(P._CBP_INTER_CODE[cbp])
    w.se(-4)  # mb_qp_delta: 24 -> 20
    nzc = NzcCtx(1, 1)
    _emit_inter_residual(w, cbp, levels, cdcs, cacs, 0, 0, nzc)
    crafted = H.rbsp_to_nal(0x41, w.rbsp_trailing())
    dec = P.decode_p_slice(crafted, sps, ref)
    from flow_indexer_spark.operators.h264inter import _recon_inter_mb

    want = _recon_inter_mb(
        py, pcb, pcr, cbp, levels, cdcs, cacs, 20, chroma_qp(20)
    )
    for a, b in zip(want, dec):
        assert (a == b).all()

    # out-of-range delta classifies
    w2 = H._BitWriter()
    w2.ue(0)
    w2.ue(5)
    w2.ue(0)
    w2.u(1, 4)
    w2.u(0, 1)
    w2.u(0, 1)
    w2.u(0, 1)
    w2.se(24 - 26)
    w2.ue(0)
    w2.ue(0)
    w2.se(0)
    w2.se(0)
    w2.ue(P._CBP_INTER_CODE[1])
    w2.se(40)  # qp 64: out of range
    with pytest.raises(ValueError, match="QP"):
        P.decode_p_slice(H.rbsp_to_nal(0x41, w2.rbsp_trailing()), sps, ref)
