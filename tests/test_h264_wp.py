"""Explicit weighted prediction for P slices (spec 7.3.3.2 / 8.4.2.3).

The PPS sets weighted_pred_flag, the slice header carries a
pred_weight_table (per-reference luma/chroma weights + offsets), and
every inter prediction — including P_Skip — applies
Clip1(((p*w + 2^(logWD-1)) >> logWD) + o) after interpolation. The
fade fixture is the discriminator: a grayscale scene halving/doubling
brightness every frame predicts EXACTLY under the matching weights
(macroblocks skip), while a decoder that ignored the weight table
would reconstruct at the wrong brightness entirely.

Reference analogue: the pcap backend decodes every packet format its
library supports (/root/reference/backend/pcap.go:17-54).
"""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators.h264inter import (
    _wp_block,
    decode_p_slice,
    encode_p_slice,
)

_SPS = {"log2_max_frame_num": 4, "poc_type": 2}


def _gray_planes(h, w, seed, scale=1.0):
    r = np.random.default_rng(seed)
    v = (r.integers(0, 128, (h, w)) * 2).astype(np.int64)  # even values
    v = np.clip(np.round(v * scale), 0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    cr = cb.copy()
    return v, cb, cr


def _half_weights(n_refs=1):
    # new = 0.5 * ref: lw 16/denom 5; chroma offset 64 keeps the
    # 128-centred axis fixed (c' = 0.5 c + 64)
    return {
        "luma_denom": 5,
        "chroma_denom": 5,
        "refs": [(16, 0, (16, 16), (64, 64))] * n_refs,
    }


def test_wp_block_formula():
    p = np.array([[0, 2, 100, 255]], dtype=np.uint8)
    # logWD 5, w 16, o 0 -> exact halving with round-half-up
    assert _wp_block(p, 16, 0, 5).tolist() == [[0, 1, 50, 128]]
    # logWD 0 path with negative weight clips at 0
    assert _wp_block(p, -1, 10, 0).tolist() == [[10, 8, 0, 0]]
    # offset clips at 255
    assert _wp_block(p, 32, 100, 5).tolist() == [[100, 102, 200, 255]]


def test_fade_roundtrip_is_byte_exact_and_skips():
    h, w = 32, 48
    sps = dict(_SPS, mb_width=3, mb_height=2)
    ref = _gray_planes(h, w, 5)
    cur = (
        (ref[0] // 2).astype(np.uint8),  # exact halving (even values)
        ref[1],
        ref[2],
    )
    nal, rec, stats = encode_p_slice(
        *cur, ref, 1, qp=10, search_range=2, return_recon=True,
        code_residual=True, weights=_half_weights(), return_stats=True,
    )
    got = decode_p_slice(nal, sps, ref, weighted=True)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))
    # the weighted prediction is exact -> macroblocks genuinely skip
    assert stats["skip"] == 6, stats
    assert np.array_equal(rec[0], cur[0])


def test_wp_with_partitions_and_multiref_roundtrip():
    h, w = 32, 48
    sps = dict(_SPS, mb_width=3, mb_height=2)
    rng = np.random.default_rng(17)
    ref0 = _gray_planes(h, w, 11)
    ref1 = _gray_planes(h, w, 12)
    # current: quadrant-mixed copies at half brightness
    y = np.empty((h, w), np.uint8)
    y[:, :24] = ref1[0][:, :24] // 2
    y[:, 24:] = ref0[0][:, 24:] // 2
    cur = (y, ref0[1], ref0[2])
    weights = _half_weights(n_refs=2)
    nal, rec, stats = encode_p_slice(
        *cur, [ref0, ref1], 2, qp=12, search_range=3, return_recon=True,
        code_residual=True, partitions=True, weights=weights,
        return_stats=True,
    )
    got = decode_p_slice(nal, sps, [ref0, ref1], weighted=True)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))
    assert set(stats["ref_idx"]) >= {0, 1}, stats


def test_default_weight_entries_code_single_flag_bits():
    """An identity entry ((1<<denom, 0) weights) codes as bare zero
    flags — round-trips and stays cheap."""
    h, w = 16, 16
    sps = dict(_SPS, mb_width=1, mb_height=1)
    ref = _gray_planes(h, w, 3)
    cur = tuple(np.roll(p, 1, 1) for p in ref)
    weights = {
        "luma_denom": 5,
        "chroma_denom": 5,
        "refs": [(32, 0, (32, 32), (0, 0))],
    }
    nal, rec = encode_p_slice(
        *cur, ref, 1, qp=12, search_range=2, return_recon=True,
        code_residual=True, weights=weights,
    )
    got = decode_p_slice(nal, sps, ref, weighted=True)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))


def test_hostile_weights_classify():
    h, w = 16, 16
    sps = dict(_SPS, mb_width=1, mb_height=1)
    ref = _gray_planes(h, w, 4)
    cur = ref

    with pytest.raises(ValueError, match="denom"):
        encode_p_slice(
            *cur, ref, 1, weights={"luma_denom": 9, "chroma_denom": 0,
                                   "refs": [(512, 0, (1, 1), (0, 0))]},
        )
    with pytest.raises(ValueError, match="range"):
        encode_p_slice(
            *cur, ref, 1, weights={"luma_denom": 5, "chroma_denom": 5,
                                   "refs": [(200, 0, (32, 32), (0, 0))]},
        )
    with pytest.raises(ValueError, match="per active reference"):
        encode_p_slice(
            *cur, ref, 1, weights={"luma_denom": 5, "chroma_denom": 5,
                                   "refs": []},
        )
    # a weighted stream handed to an unweighted decode misparses the
    # weight table as macroblock data -> must CLASSIFY, never crash
    nal = encode_p_slice(
        *cur, ref, 1, qp=10, code_residual=True, weights=_half_weights()
    )
    try:
        decode_p_slice(nal, sps, ref, weighted=False)
    except (ValueError, NotImplementedError):
        pass


# --- explicit weighted BI-prediction (weighted_bipred_idc 1) -----------------


def test_b_weighted_bipred_roundtrip_and_distinct_from_default():
    """cur = the exact 3:1 weighted mix of the two references
    (w0=6, w1=2, logWD=2 — spec 8.4.2.3.2): under the weight table
    every MB codes as B_Bi with zero residual and decode is byte-exact
    against recon AND source; the DEFAULT bi average differs from the
    mix by construction, so unweighted decoding could not reproduce
    it."""
    import numpy as np

    from flow_indexer_spark.operators import h264codec as H
    from flow_indexer_spark.operators import h264inter as P

    rng = np.random.default_rng(71)
    sps = H.parse_sps(
        H.make_sps(48, 32, ref_frames=2, poc_type=0, log2_max_poc_lsb=6)
    )

    def _planes(shift):
        return (
            ((rng.integers(0, 196, (32, 48)) + shift) % 256).astype(
                np.uint8
            ),
            rng.integers(0, 256, (16, 24), dtype=np.uint8),
            rng.integers(0, 256, (16, 24), dtype=np.uint8),
        )

    ref0 = _planes(60)
    ref1 = _planes(0)
    wp = {
        "luma_denom": 2,
        "chroma_denom": 2,
        "l0": (6, 0, (6, 6), (0, 0)),
        "l1": (2, 0, (2, 2), (0, 0)),
    }
    cur = (
        P._wp_bi_block(ref0[0], ref1[0], (6, 0), (2, 0), 2),
        P._wp_bi_block(ref0[1], ref1[1], (6, 0), (2, 0), 2),
        P._wp_bi_block(ref0[2], ref1[2], (6, 0), (2, 0), 2),
    )
    default = P._bi_avg(ref0[0], ref1[0])
    assert np.abs(default.astype(int) - cur[0].astype(int)).mean() > 5
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=(2, 6), return_recon=True,
        code_residual=True, weights=wp,
    )
    dec = P.decode_b_slice(nal, sps, ref0, ref1, weighted_bipred=True)
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()
    # single-list weighted modes: cur == weighted ref0 -> B_L0 path
    lcur = (
        P._wp_block(ref0[0], 6, 0, 2),
        P._wp_block(ref0[1], 6, 0, 2),
        P._wp_block(ref0[2], 6, 0, 2),
    )
    nal2, recon2 = P.encode_b_slice(
        *lcur, ref0, ref1, frame_num=2, poc=(2, 6), return_recon=True,
        code_residual=True, weights=wp,
    )
    dec2 = P.decode_b_slice(nal2, sps, ref0, ref1, weighted_bipred=True)
    for a, b in zip(recon2, dec2):
        assert (a == b).all()
    # weight-table range guard
    import pytest

    bad = dict(wp, luma_denom=9)
    with pytest.raises(ValueError, match="denom"):
        P.encode_b_slice(
            *cur, ref0, ref1, frame_num=2, poc=(2, 6), weights=bad
        )


def test_b_implicit_bipred_roundtrip_and_poc_proportionality():
    """IMPLICIT weights (idc 2): POC (2, 0, 6) derives (w0, w1) =
    (43, 21) — the B close to its past anchor weights it harder; the
    same content roundtrips byte-exact, the POC midpoint degenerates
    to 32/32 == the default average, and decoding without POC context
    CLASSIFIES."""
    import numpy as np

    from flow_indexer_spark.operators import h264codec as H
    from flow_indexer_spark.operators import h264inter as P

    assert P.implicit_bi_weights(2, 0, 6) == (43, 21)
    assert P.implicit_bi_weights(4, 0, 6) == (22, 42)
    assert P.implicit_bi_weights(3, 0, 6) == (32, 32)
    assert P.implicit_bi_weights(2, 2, 2) == (32, 32)  # td 0 fallback
    rng = np.random.default_rng(73)
    sps = H.parse_sps(
        H.make_sps(48, 32, ref_frames=2, poc_type=0, log2_max_poc_lsb=6)
    )

    def _planes():
        return (
            rng.integers(0, 256, (32, 48), dtype=np.uint8),
            rng.integers(0, 256, (16, 24), dtype=np.uint8),
            rng.integers(0, 256, (16, 24), dtype=np.uint8),
        )

    ref0, ref1 = _planes(), _planes()
    cur = tuple(
        P._wp_bi_block(a, b, (43, 0), (21, 0), 5)
        for a, b in zip(ref0, ref1)
    )
    # the 43:21 mix is NOT the default average
    assert (
        np.abs(
            P._bi_avg(ref0[0], ref1[0]).astype(int) - cur[0].astype(int)
        ).mean()
        > 3
    )
    nal, recon = P.encode_b_slice(
        *cur, ref0, ref1, frame_num=2, poc=(2, 6), return_recon=True,
        code_residual=True, implicit_bi=True, ref_pocs=(0, 6),
    )
    dec = P.decode_b_slice(
        nal, sps, ref0, ref1, pocs=(2, 0, 6), weighted_bipred=2
    )
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()
    import pytest

    with pytest.raises(NotImplementedError, match="implicit"):
        P.decode_b_slice(nal, sps, ref0, ref1, weighted_bipred=2)
    with pytest.raises(ValueError, match="ref_pocs"):
        P.encode_b_slice(
            *cur, ref0, ref1, frame_num=2, poc=(2, 6), implicit_bi=True
        )
