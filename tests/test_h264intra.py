"""H.264 I_16x16 DC-mode intra prediction + CAVLC residuals
(operators/h264intra.py). No SparkSession needed — plain numpy.

The bit layer (CAVLC tables, transforms, prediction chain) is pinned
EXACTLY; frame-level tests gate means within the quantizer envelope
because DC-only coding is genuinely lossy (the module docstring's
contract)."""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264intra as I
from flow_indexer_spark.operators.mp4codec import (
    make_h264_intra_bytes,
    mp4_frames,
    parse_mp4,
    video_params,
)


# --- CAVLC (spec 9.2) ---------------------------------------------------------


def _rt(coeffs, chroma):
    w = H._BitWriter()
    I.cavlc_encode_dc(w, coeffs, chroma=chroma)
    w.u(1, 1)  # stop bit so the reader never runs dry
    r = H._BitReader(w.rbsp_trailing())
    out = I.cavlc_decode_dc(r, chroma=chroma)
    assert r.u(1) == 1  # decoder consumed exactly the encoded bits
    return out


def test_cavlc_roundtrip_every_position_and_level_class():
    """Every scan position x every level class of the TotalCoeff<=1
    alphabet round-trips bit-exactly: trailing-one (+/-1), small levels
    (prefix codes), the prefix-14 4-bit-suffix escape, the prefix-15
    12-bit-suffix escape, and the clip bound +/-2063."""
    # level_code = 2*(|L|-1) + sign - 2: classes by |L|
    levels = [1, -1, 2, -2, 3, 7, -7, 8, -8, 9, 16, -16, 17, 2048, 2064, -2064]
    for chroma, n in ((False, 16), (True, 4)):
        assert _rt([0] * n, chroma) == [0] * n
        for pos in range(n):
            for lvl in levels:
                coeffs = [0] * n
                coeffs[pos] = lvl
                assert _rt(coeffs, chroma) == coeffs, (chroma, pos, lvl)


def test_cavlc_clip_bound_is_the_escape_ceiling():
    assert I._clip_level(10**6) == 2064
    assert I._clip_level(-(10**6)) == -2064
    with pytest.raises(ValueError, match="exceeds"):
        w = H._BitWriter()
        I.cavlc_encode_dc(w, [2065] + [0] * 15, chroma=False)


def test_cavlc_two_coefficients_classify_not_misdecode():
    """A TotalCoeff>=2 coeff_token (outside the implemented alphabet)
    must classify as NotImplementedError, never silently misdecode."""
    w = H._BitWriter()
    I.cavlc_encode_dc(w, [0] * 16, chroma=False)
    with pytest.raises(ValueError, match="at most one"):
        I.cavlc_encode_dc(w, [1, 1] + [0] * 14, chroma=False)
    # Table 9-5 nC<2: TotalCoeff=2,TrailingOnes=2 is '001'; feed it raw
    w = H._BitWriter()
    for b in "001":
        w.u(int(b), 1)
    w.u(1, 1)
    with pytest.raises(NotImplementedError, match="TotalCoeff"):
        I.cavlc_decode_dc(H._BitReader(w.rbsp_trailing()), chroma=False)


# --- dequant / transform (spec 8.5) --------------------------------------------


def test_luma_dc_dequant_matches_spec_formula():
    """8.5.10: dcY = (f * LevelScale(qP%6,0,0)) << (qP/6-6) for qP>=36,
    else (f * LS + 2^(5-qP/6)) >> (6-qP/6), elementwise."""
    f = np.array([[7, -3], [0, 255]], dtype=np.int64)
    pad = np.zeros((2, 2), dtype=np.int64)
    blk = np.block([[f, pad], [pad, pad]])
    for qp in (0, 5, 11, 23, 35, 36, 40, 47, 51):
        # LevelScale = weightScale (flat 16) * normAdjust
        ls = 16 * (10, 11, 13, 14, 16, 18)[qp % 6]
        got = I.dequant_luma_dc(blk, qp)
        if qp >= 36:
            want = (blk * ls) << (qp // 6 - 6)
        else:
            want = (blk * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)
        assert np.array_equal(got, want), qp


def test_chroma_qp_table_8_15():
    assert I.chroma_qp(26) == 26  # identity below 30
    assert I.chroma_qp(30) == 29
    assert I.chroma_qp(36) == 34
    assert I.chroma_qp(44) == 37
    assert I.chroma_qp(51) == 39
    assert I.chroma_qp(51, offset=12) == 39  # clamped to 51 first


def test_inverse_hadamard_dc_only_reconstruction():
    """A single f00 coefficient spreads uniformly over all 4x4 (luma) /
    2x2 (chroma) DC positions: the Hadamard of a delta is constant."""
    res = I._luma_dc_residual([64] + [0] * 15, qp=36)
    assert res.shape == (4, 4) and len(np.unique(res)) == 1
    cres = I._chroma_dc_residual([32, 0, 0, 0], qpc=34)
    assert cres.shape == (2, 2) and len(np.unique(cres)) == 1


# --- prediction chain (spec 8.3.3/8.3.4) ---------------------------------------


def _slice_with_coeffs(mb_w, mb_h, qp, luma_levels):
    """Hand-build an IDR slice: MB k gets Intra16x16DCLevel f00 =
    luma_levels[k], chroma residuals all zero (mb_type 3 =
    Intra_16x16_2_0_0: DC pred, cbp 0)."""
    w = H._BitWriter()
    w.ue(0)
    w.ue(7)  # slice_type I
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(qp - 26)
    for k in range(mb_w * mb_h):
        w.ue(3)  # Intra_16x16_2_0_0
        w.ue(0)  # chroma pred DC
        w.se(0)
        I.cavlc_encode_dc(w, [luma_levels[k]] + [0] * 15, chroma=False)
    return H.rbsp_to_nal(0x65, w.rbsp_trailing())


def test_dc_prediction_chains_across_macroblocks():
    """Zero residuals everywhere but MB0: every later MB must inherit
    MB0's reconstruction through the DC prediction chain — the property
    a decoder bug anywhere would break."""
    sps = H.parse_sps(H.make_sps(64, 48))  # 4x3 MBs
    lvl = I._best_level_luma(72, qp=36)  # target ~200 = 128 + 72
    y, cb, cr = I.decode_idr_any(
        _slice_with_coeffs(4, 3, 36, [lvl] + [0] * 11), sps
    )
    v0 = int(y[0, 0])
    assert abs(v0 - 200) <= 3  # 128 + dequantized residual
    # the whole plane collapsed to MB0's value via chained DC prediction
    assert np.array_equal(y, np.full_like(y, v0))
    # chroma: zero residuals + no-neighbour default = flat 128
    assert np.array_equal(cb, np.full_like(cb, 128))
    assert np.array_equal(cr, np.full_like(cr, 128))
    # and with NO residual anywhere the plane is the 128 default
    y2, _, _ = I.decode_idr_any(_slice_with_coeffs(4, 3, 36, [0] * 12), sps)
    assert np.array_equal(y2, np.full_like(y2, 128))


def test_decoder_is_bit_faithful_to_encoder_recon():
    """decode(encode(planes)) must equal the encoder's own closed-loop
    reconstruction EXACTLY — both sides run the same integer pipeline,
    so per-MB means agree within the quantizer step and re-encoding the
    decoded planes is a fixed point (already-flat MBs need no residual
    adjustment beyond quantization). DC-restricted encode: the flat-MB
    and fixed-point properties are DC-mode contracts; the adaptive
    encoder is pinned by test_adaptive_encode_decoder_matches_encoder."""
    rng = np.random.default_rng(23)
    dc = {"modes": ("dc",), "chroma_modes": ("dc",)}
    for mbw, mbh, qp in ((3, 2, 36), (2, 4, 44), (4, 4, 51)):
        y = rng.integers(0, 256, (mbh * 16, mbw * 16), dtype=np.uint8)
        cb = rng.integers(0, 256, (mbh * 8, mbw * 8), dtype=np.uint8)
        cr = rng.integers(0, 256, (mbh * 8, mbw * 8), dtype=np.uint8)
        sps = H.parse_sps(H.make_sps(mbw * 16, mbh * 16))
        dy, dcb, dcr = I.decode_idr_any(
            I.encode_idr_i16(y, cb, cr, qp, **dc), sps
        )
        # quantizer step per sample: LS00[qp%6] << (qp//6-6) / 64
        # LevelScale = 16 * normAdjust (flat weightScale)
        step = 16 * (10, 11, 13, 14, 16, 18)[qp % 6] * (1 << (qp // 6 - 6)) / 64
        for my in range(mbh):
            for mx in range(mbw):
                tgt = y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                got = dy[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                assert len(np.unique(got)) == 1  # DC-only: flat MB
                assert abs(float(tgt.mean()) - float(got[0, 0])) <= step + 1
        # fixed point: decoded planes re-encode to the same reconstruction
        dy2, dcb2, dcr2 = I.decode_idr_any(
            I.encode_idr_i16(dy, dcb, dcr, qp, **dc), sps
        )
        assert np.array_equal(dy, dy2)
        assert np.array_equal(dcb, dcb2)
        assert np.array_equal(dcr, dcr2)


def test_ipcm_stream_decodes_identically_via_decode_idr_any():
    rng = np.random.default_rng(31)
    y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    cb = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    sps = H.parse_sps(H.make_sps(48, 32))
    nal = H.encode_idr_ipcm(y, cb, cr)
    a = H.decode_idr_ipcm(nal, sps)
    b = I.decode_idr_any(nal, sps)
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb)


# --- V/H/Plane prediction modes (spec 8.3.3.1-4, 8.3.4) -------------------------


def _naive_pred16(mode, recon, mx, my):
    """Literal loop transcription of spec 8.3.3 — the differential
    oracle for the vectorized pred16."""
    x0, y0 = 16 * mx, 16 * my
    p = lambda xx, yy: int(recon[y0 + yy, x0 + xx])  # noqa: E731
    out = np.zeros((16, 16), dtype=np.int64)
    if mode == 0:
        for yy in range(16):
            for xx in range(16):
                out[yy, xx] = p(xx, -1)
    elif mode == 1:
        for yy in range(16):
            for xx in range(16):
                out[yy, xx] = p(-1, yy)
    elif mode == 3:
        h = sum((i + 1) * (p(8 + i, -1) - p(6 - i, -1)) for i in range(8))
        v = sum((i + 1) * (p(-1, 8 + i) - p(-1, 6 - i)) for i in range(8))
        a = 16 * (p(-1, 15) + p(15, -1))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        for yy in range(16):
            for xx in range(16):
                out[yy, xx] = min(
                    255, max(0, (a + b * (xx - 7) + c * (yy - 7) + 16) >> 5)
                )
    return out


def _naive_pred_chroma(mode, recon, mx, my):
    """Literal loop transcription of spec 8.3.4 (4:2:0)."""
    x0, y0 = 8 * mx, 8 * my
    p = lambda xx, yy: int(recon[y0 + yy, x0 + xx])  # noqa: E731
    out = np.zeros((8, 8), dtype=np.int64)
    if mode == 1:
        for yy in range(8):
            for xx in range(8):
                out[yy, xx] = p(-1, yy)
    elif mode == 2:
        for yy in range(8):
            for xx in range(8):
                out[yy, xx] = p(xx, -1)
    elif mode == 3:
        h = sum((i + 1) * (p(4 + i, -1) - p(2 - i, -1)) for i in range(4))
        v = sum((i + 1) * (p(-1, 4 + i) - p(-1, 2 - i)) for i in range(4))
        a = 16 * (p(-1, 7) + p(7, -1))
        b = (34 * h + 32) >> 6
        c = (34 * v + 32) >> 6
        for yy in range(8):
            for xx in range(8):
                out[yy, xx] = min(
                    255, max(0, (a + b * (xx - 3) + c * (yy - 3) + 16) >> 5)
                )
    return out


def test_pred_modes_match_naive_spec_transcription():
    rng = np.random.default_rng(47)
    luma = rng.integers(0, 256, (48, 64), dtype=np.uint8)  # 4x3 MBs
    chroma = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    for mx, my in ((1, 1), (3, 2), (2, 0), (0, 2)):
        for mode in (0, 1, 3):
            if (mode in (0, 3) and my == 0) or (mode in (1, 3) and mx == 0):
                continue
            assert np.array_equal(
                I.pred16(mode, luma, mx, my), _naive_pred16(mode, luma, mx, my)
            ), ("luma", mode, mx, my)
        for mode in (1, 2, 3):
            if (mode in (2, 3) and my == 0) or (mode in (1, 3) and mx == 0):
                continue
            assert np.array_equal(
                I.pred_chroma(mode, chroma, mx, my),
                _naive_pred_chroma(mode, chroma, mx, my),
            ), ("chroma", mode, mx, my)


def test_adaptive_encode_decoder_matches_encoder_recon_exactly():
    """For arbitrary content and the full mode alphabet, the decoder
    must reproduce the encoder's closed-loop reconstruction BIT-EXACTLY
    (same integer prediction + CAVLC + transform chain on both sides).
    Content mixes flats, ramps, and noise so every mode gets chosen."""
    rng = np.random.default_rng(59)
    mbw, mbh = 5, 4
    y = np.empty((mbh * 16, mbw * 16), dtype=np.uint8)
    y[:, :] = np.arange(mbw * 16, dtype=np.uint8)[None, :]  # h-ramp
    y[16:32] = 200  # flat band
    y[32:48] = np.arange(mbh * 16, dtype=np.uint8)[32:48, None]  # v-ramp
    y[48:] = rng.integers(0, 256, (16, mbw * 16), dtype=np.uint8)
    cb = np.add.outer(
        np.arange(mbh * 8) * 2, np.arange(mbw * 8) * 3
    ).astype(np.uint8)
    cr = rng.integers(0, 256, (mbh * 8, mbw * 8), dtype=np.uint8)
    for qp in (36, 44):
        nal, (ry, rcb, rcr) = I.encode_idr_i16(
            y, cb, cr, qp=qp, return_recon=True
        )
        sps = H.parse_sps(H.make_sps(mbw * 16, mbh * 16))
        dy, dcb, dcr = I.decode_idr_any(nal, sps)
        assert np.array_equal(dy, ry)
        assert np.array_equal(dcb, rcb)
        assert np.array_equal(dcr, rcr)


def test_forced_modes_roundtrip_and_fall_back_when_unavailable():
    """modes=('v',) uses vertical wherever a top neighbour exists and
    DC elsewhere; same for ('h',) / ('plane',). Every restriction stays
    bit-faithful decoder-vs-encoder."""
    rng = np.random.default_rng(61)
    y = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    cb = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    sps = H.parse_sps(H.make_sps(48, 48))
    for modes, cmodes in (
        (("v",), ("v",)),
        (("h",), ("h",)),
        (("plane",), ("plane",)),
    ):
        nal, (ry, rcb, rcr) = I.encode_idr_i16(
            y, cb, cr, modes=modes, chroma_modes=cmodes, return_recon=True
        )
        dy, dcb, dcr = I.decode_idr_any(nal, sps)
        assert np.array_equal(dy, ry), modes
        assert np.array_equal(dcb, rcb), modes
        assert np.array_equal(dcr, rcr), modes


def test_vertical_mode_propagates_ipcm_row_exactly():
    """Hand-built mixed stream: MB row 0 is I_PCM (exact), rows 1..2
    are Intra_16x16_0_0_0 (vertical, zero residual) — every decoded row
    must replicate the PCM row's bottom line exactly, pinning the
    directional predictor against hand-computable truth."""
    rng = np.random.default_rng(67)
    mbw, mbh = 3, 3
    pcm_y = rng.integers(0, 256, (16, mbw * 16), dtype=np.uint8)
    pcm_cb = rng.integers(0, 256, (8, mbw * 8), dtype=np.uint8)
    pcm_cr = rng.integers(0, 256, (8, mbw * 8), dtype=np.uint8)
    w = H._BitWriter()
    w.ue(0)
    w.ue(7)  # slice_type I
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(10)  # qp 36
    for mx in range(mbw):  # row 0: I_PCM
        w.ue(25)
        w.align_zero()
        w.raw_bytes(pcm_y[:, 16 * mx : 16 * mx + 16].tobytes())
        w.raw_bytes(pcm_cb[:, 8 * mx : 8 * mx + 8].tobytes())
        w.raw_bytes(pcm_cr[:, 8 * mx : 8 * mx + 8].tobytes())
    # rows 1..: vertical, no residual. The DC block's coeff_token
    # context is REAL here: MBs below the I_PCM row see nC 8..16
    # (9.2.1 counts PCM as TotalCoeff 16) and must use the 6-bit FLC,
    # not the nC<2 VLC — the conformance case the NzcCtx layer added.
    from flow_indexer_spark.operators import h264cavlc as cavlc

    nzc = I.NzcCtx(mbw, mbh)
    nzc.y[0:4, :] = 16  # the PCM row
    for k in range(mbw * (mbh - 1)):
        mx, my = k % mbw, k // mbw + 1
        w.ue(1)  # Intra_16x16_0_0_0
        w.ue(2)  # chroma vertical
        w.se(0)
        cavlc.encode_block(
            w, [0] * 16, cavlc.nc_from_plane(nzc.y, 4 * mx, 4 * my)
        )
        nzc.y[4 * my : 4 * my + 4, 4 * mx : 4 * mx + 4] = 0
    nal = H.rbsp_to_nal(0x65, w.rbsp_trailing())
    sps = H.parse_sps(H.make_sps(mbw * 16, mbh * 16))
    y, cb, cr = I.decode_idr_any(nal, sps)
    assert np.array_equal(y[:16], pcm_y)
    for row in range(16, mbh * 16):
        assert np.array_equal(y[row], pcm_y[15])
    for row in range(8, mbh * 8):
        assert np.array_equal(cb[row], pcm_cb[7])
        assert np.array_equal(cr[row], pcm_cr[7])


def test_horizontal_mode_propagates_ipcm_column_exactly():
    """The H twin of the vertical-propagation test: MB column 0 is
    I_PCM, the rest of each row is Intra_16x16_1_0_0 (horizontal, zero
    residual) — every decoded column must replicate the PCM column's
    right edge exactly.

    Note: without luma AC residuals the ENCODER cannot seed detail into
    the first MB row/column (DC-only residuals flatten it), so these
    hand-built PCM-seeded streams are the honest demonstration that the
    directional predictors carry real information."""
    rng = np.random.default_rng(71)
    mbw, mbh = 3, 2
    pcm_y = rng.integers(0, 256, (mbh * 16, 16), dtype=np.uint8)
    pcm_cb = rng.integers(0, 256, (mbh * 8, 8), dtype=np.uint8)
    pcm_cr = rng.integers(0, 256, (mbh * 8, 8), dtype=np.uint8)
    w = H._BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(10)
    from flow_indexer_spark.operators import h264cavlc as cavlc

    nzc = I.NzcCtx(mbw, mbh)
    for my in range(mbh):
        w.ue(25)  # I_PCM for MB (0, my)
        w.align_zero()
        w.raw_bytes(pcm_y[16 * my : 16 * my + 16].tobytes())
        w.raw_bytes(pcm_cb[8 * my : 8 * my + 8].tobytes())
        w.raw_bytes(pcm_cr[8 * my : 8 * my + 8].tobytes())
        nzc.y[4 * my : 4 * my + 4, 0:4] = 16  # 9.2.1: PCM counts as 16
        for k in range(mbw - 1):
            mx = k + 1
            w.ue(2)  # Intra_16x16_1_0_0: horizontal
            w.ue(1)  # chroma horizontal
            w.se(0)
            cavlc.encode_block(
                w, [0] * 16, cavlc.nc_from_plane(nzc.y, 4 * mx, 4 * my)
            )
            nzc.y[4 * my : 4 * my + 4, 4 * mx : 4 * mx + 4] = 0
    nal = H.rbsp_to_nal(0x65, w.rbsp_trailing())
    sps = H.parse_sps(H.make_sps(mbw * 16, mbh * 16))
    y, cb, cr = I.decode_idr_any(nal, sps)
    assert np.array_equal(y[:, :16], pcm_y)
    for col in range(16, mbw * 16):
        assert np.array_equal(y[:, col], pcm_y[:, 15])
    for col in range(8, mbw * 8):
        assert np.array_equal(cb[:, col], pcm_cb[:, 7])
        assert np.array_equal(cr[:, col], pcm_cr[:, 7])


# --- classification boundaries --------------------------------------------------


def _mb_header(mb_type, chroma_mode=0):
    w = H._BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(10)  # qp 36
    w.ue(mb_type)
    if 1 <= mb_type <= 24:
        w.ue(chroma_mode)
        w.se(0)
    return H.rbsp_to_nal(0x65, w.rbsp_trailing())


def test_remaining_tools_classify_from_parsed_syntax():
    sps = H.parse_sps(H.make_sps(16, 16))
    # I_4x4 now DECODES; a bare MB header with no mode/cbp payload is a
    # truncated stream and classifies as corruption, not a seam
    with pytest.raises(ValueError, match="truncated"):
        I.decode_idr_any(_mb_header(0), sps)
    # directional/plane modes now DECODE; using one where its required
    # neighbour doesn't exist (MB 0,0 here) is a non-conformant stream
    with pytest.raises(ValueError, match="Vertical without a top"):
        I.decode_idr_any(_mb_header(1), sps)
    with pytest.raises(ValueError, match="Plane without top"):
        I.decode_idr_any(_mb_header(4), sps)
    # luma AC (cbp_luma 15) and chroma AC (cbp_chroma 2) now DECODE
    # through the full CAVLC layer; a bare header with no residual
    # payload is a truncated stream, not a seam
    with pytest.raises(ValueError, match="truncated"):
        I.decode_idr_any(_mb_header(15), sps)  # cbp_luma 15
    with pytest.raises(ValueError, match="truncated"):
        I.decode_idr_any(_mb_header(11), sps)  # cbp_chroma 2
    with pytest.raises(ValueError, match="Chroma_Horizontal without"):
        I.decode_idr_any(_mb_header(3, chroma_mode=1), sps)
    with pytest.raises(ValueError, match="invalid intra_chroma_pred_mode"):
        I.decode_idr_any(_mb_header(3, chroma_mode=4), sps)
    with pytest.raises(ValueError, match="invalid I-slice mb_type"):
        I.decode_idr_any(_mb_header(26), sps)
    # P slice / non-IDR routed identically to the I_PCM decoder
    w = H._BitWriter()
    w.ue(0)
    w.ue(5)
    with pytest.raises(NotImplementedError, match="P/B slice"):
        I.decode_idr_any(H.rbsp_to_nal(0x65, w.rbsp_trailing()), sps)
    with pytest.raises(NotImplementedError, match="non-IDR"):
        I.decode_idr_any(bytes([0x61, 0x88, 0x80]), sps)


def test_hostile_sps_classifies_before_allocating():
    z16 = np.zeros((16, 16), np.uint8)
    z8 = np.zeros((8, 8), np.uint8)
    nal = I.encode_idr_i16(z16, z8, z8)
    sps = H.parse_sps(H.make_sps(16, 16))
    for mbs in ((200_000, 200_000), (1 << 16, 1 << 12)):
        hostile = dict(sps, mb_width=mbs[0], mb_height=mbs[1])
        with pytest.raises(ValueError, match="corrupt stream"):
            I.decode_idr_any(nal, hostile)


def test_fuzz_corruption_is_always_classifiable():
    """Random byte mutations of an intra-coded sample must decode or
    classify (ValueError/NotImplementedError) — never a raw
    numpy/struct/index error (same contract as test_h264.py's I_PCM
    fuzz; the CAVLC layer adds the new attack surface here)."""
    import random

    rng = random.Random(17)
    px = np.empty((12, 16, 3), dtype=np.uint8)
    px[:, :, 0] = 77
    px[:, :, 1] = np.arange(16, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(12, dtype=np.uint8)[:, None]
    avcc = H.make_avcc(H.make_sps(16, 12), H.make_pps())
    sample = I.encode_frame_sample_i16(px)
    for _ in range(500):
        b = bytearray(sample)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            I.decode_frame_sample_any(bytes(b), avcc)
        except (ValueError, NotImplementedError):
            pass


# --- container integration -------------------------------------------------------


def test_intra_mp4_container_and_sampled_decode():
    """The deterministic fixture family decodes through the container
    path within the measured lossy envelope (r<=1.0, g<=1.17, b<=2.5)
    and the DC flattening kills intra-MB gradients."""
    for i in (0, 7, 14):
        payload = make_h264_intra_bytes(i)
        info = parse_mp4(payload)
        n, w, h = video_params(i)
        assert info["codec"] == "avc1" and info["avcc"] is not None
        assert (info["n_frames"], info["width"], info["height"]) == (n, w, h)
        seen = []
        for k, t_ms, px in mp4_frames(payload, every_n=2):
            seen.append(k)
            want_r = (7 * i + 11 * k) % 256
            assert abs(px[:, :, 0].astype(float).mean() - want_r) < 1.5
            assert abs(px[:, :, 1].astype(float).mean() - (w - 1) / 2) < 1.5
            assert abs(px[:, :, 2].astype(float).mean() - (h - 1) / 2) < 3.0
        assert seen == list(range(0, n, 2))


def test_qp_sweep_stays_within_quantizer_envelope():
    px = np.empty((28, 40, 3), dtype=np.uint8)
    px[:, :, 0] = 123
    px[:, :, 1] = np.arange(40, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(28, dtype=np.uint8)[:, None]
    avcc = H.make_avcc(H.make_sps(40, 28), H.make_pps())
    prev_err = None
    for qp in (36, 42, 48, 51):
        out = I.decode_frame_sample_any(
            I.encode_frame_sample_i16(px, qp=qp), avcc
        )
        err = abs(out[:, :, 0].astype(float).mean() - 123)
        # LevelScale = 16 * normAdjust (flat weightScale)
        step = 16 * (10, 11, 13, 14, 16, 18)[qp % 6] * (1 << (qp // 6 - 6)) / 64
        assert err <= step / 2 + 1.5, (qp, err)
        prev_err = err
    del prev_err
    with pytest.raises(ValueError, match="qp out of range"):
        I.encode_idr_i16(
            np.zeros((16, 16), np.uint8),
            np.zeros((8, 8), np.uint8),
            np.zeros((8, 8), np.uint8),
            qp=52,
        )
