"""Temporal direct mode (spec 8.4.1.2.3) through the MP4 GOP layer:
the fixture family really codes direct_spatial_mv_pred_flag = 0, its
direct macroblocks are genuinely emitted (B_Skip runs / mb_type 0 on
the wire), POC-scaled motion reproduces the translating content, and
the decoder classifies rather than guessing when POC context is
missing (tests/test_h264_bslice.py covers the slice-level math)."""

from __future__ import annotations

import numpy as np

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264inter as P
from flow_indexer_spark.operators.mp4codec import (
    make_h264_b_bytes,
    make_h264_tdirect_bytes,
    mp4_frames,
    parse_mp4,
    video_params,
)


def _b_nals(payload: bytes):
    info = parse_mp4(payload)
    buf = bytes(payload)
    for off, size in zip(info["offsets"], info["sizes"]):
        sample = buf[off : off + size]
        p = 0
        while p + 4 <= len(sample):
            ln = int.from_bytes(sample[p : p + 4], "big")
            nal = sample[p + 4 : p + 4 + ln]
            p += 4 + ln
            if nal and (nal[0] & 0x1F) == 1:
                _, rbsp = H.nal_to_rbsp(nal)
                r = P._BitReader(rbsp)
                r.ue("first_mb_in_slice")
                if r.ue("slice_type") % 5 == 1:
                    yield nal


def _b_header(nal: bytes, sps: dict) -> tuple[int, int, int | None]:
    """(direct_spatial_mv_pred_flag, first mb_skip_run, first mb_type
    or None when the whole picture is one skip run)."""
    _, rbsp = H.nal_to_rbsp(nal)
    r = P._BitReader(rbsp)
    r.ue("first_mb")
    assert r.ue("slice_type") % 5 == 1
    r.ue("pps")
    r.u(sps["log2_max_frame_num"], "frame_num")
    r.u(sps["log2_max_poc_lsb"], "poc_lsb")
    flag = r.u(1, "direct_spatial_mv_pred_flag")
    r.u(3, "flags")
    r.se("slice_qp_delta")
    run = r.ue("mb_skip_run")
    mb_type = r.ue("mb_type") if r.more_data() else None
    return flag, run, mb_type


def test_flag_zero_and_direct_mbs_genuinely_emitted():
    i = 3
    n, w, h = video_params(i)
    sps = H.parse_sps(
        H.make_sps(w, h, ref_frames=2, poc_type=0, log2_max_poc_lsb=6)
    )
    t_nals = list(_b_nals(make_h264_tdirect_bytes(i)))
    s_nals = list(_b_nals(make_h264_b_bytes(i)))
    assert t_nals and s_nals
    direct_used = 0
    for nal in t_nals:
        flag, run, mb_type = _b_header(nal, sps)
        assert flag == 0  # temporal on the wire, every B slice
        if run > 0 or mb_type == 0:
            direct_used += 1
    assert direct_used > 0  # skip/B_Direct really happen
    for nal in s_nals:
        assert _b_header(nal, sps)[0] == 1  # the spatial twin stays 1


def test_tdirect_decode_matches_content_theory():
    """POC-scaled co-located motion must carry the (+1, +1)/frame
    translation and the CAVLC residual the 11-level R step — both
    within the codec family's +-2 mean gate, across geometries."""
    for i in (0, 5, 10):
        b = make_h264_tdirect_bytes(i)
        n, w, h = video_params(i)
        for t, _tms, px in mp4_frames(b, every_n=2):
            dt = t % 6
            exp_r = (7 * i + 11 * t) % 256
            exp_g = (np.arange(w, dtype=np.uint16) + dt).astype(
                np.uint8
            ).mean()
            exp_b = (np.arange(h, dtype=np.uint16) + dt).astype(
                np.uint8
            ).mean()
            assert abs(px[:, :, 0].mean() - exp_r) <= 2, (i, t)
            assert abs(px[:, :, 1].mean() - exp_g) <= 2, (i, t)
            assert abs(px[:, :, 2].mean() - exp_b) <= 2, (i, t)


def test_direct_mode_guard():
    import pytest

    from flow_indexer_spark.operators.mp4codec import encode_mp4_h264_bgop

    frames = [np.zeros((16, 16, 3), dtype=np.uint8) for _ in range(3)]
    with pytest.raises(ValueError, match="direct_mode"):
        encode_mp4_h264_bgop(frames, direct_mode="diagonal")
