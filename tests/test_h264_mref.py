"""Multi-reference P prediction (num_ref_idx_l0_active > 1).

The slice header overrides num_ref_idx_l0_active, every inter
partition signals ref_idx_l0 as te(v) (one inverted bit for two active
references, ue(v) beyond), motion compensation reads list0[ref_idx],
and MV prediction compares ACTUAL refIdx values on the 4x4 grid.
Encode/decode parity stays byte-exact; a phase-alternating scene is
the discriminator — only the two-frames-back reference matches, so the
encoder must pick ref_idx 1 and a decoder that ignored ref_idx would
reconstruct the wrong phase entirely.

Reference analogue: the pcap backend decodes every packet format its
library supports (/root/reference/backend/pcap.go:17-54).
"""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators.h264codec import _BitWriter, rbsp_to_nal
from flow_indexer_spark.operators.h264inter import (
    decode_p_slice,
    encode_p_slice,
)

_SPS = {"log2_max_frame_num": 4, "poc_type": 2}


def _planes(h, w, seed):
    r = np.random.default_rng(seed)
    return (
        r.integers(0, 256, (h, w), dtype=np.uint8),
        r.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        r.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


def _phase_planes(h, w, phase, shift=0):
    """Structurally distinct phases: phase 0 is an x-frequency-3 ramp,
    phase 1 an x-frequency-5 ramp — no translation maps one onto the
    other, so only a same-phase reference predicts well."""
    xs = np.arange(w, dtype=np.int64)[None, :] - shift
    ys = np.arange(h, dtype=np.int64)[:, None] - shift
    freq = 3 if phase == 0 else 5
    y = ((xs * freq + ys * 2) % 256).astype(np.uint8)
    y = np.broadcast_to(y, (h, w)).copy()
    cb = ((y[::2, ::2].astype(np.int64) + 64) % 256).astype(np.uint8)
    cr = ((y[1::2, ::2].astype(np.int64) + 32) % 256).astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("partitions", [False, True])
def test_two_ref_roundtrip_byte_exact_and_uses_ref1(partitions):
    h, w = 32, 48
    sps = dict(_SPS, mb_width=w // 16, mb_height=h // 16)
    ref1 = _phase_planes(h, w, 0)          # two back: SAME phase
    ref0 = _phase_planes(h, w, 1)          # one back: other phase
    cur = _phase_planes(h, w, 0, shift=2)  # current: phase 0, +2 px
    nal, rec, stats = encode_p_slice(
        *cur, [ref0, ref1], 2, qp=12, search_range=4,
        return_recon=True, code_residual=True,
        partitions=partitions, return_stats=True,
    )
    got = decode_p_slice(nal, sps, [ref0, ref1])
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))
    # every inter MB should have preferred the matching-phase ref 1
    assert stats["ref_idx"].get(1, 0) >= 1, stats


def test_three_ref_roundtrip_byte_exact():
    h, w = 32, 32
    sps = dict(_SPS, mb_width=2, mb_height=2)
    refs = [_planes(h, w, s) for s in (1, 2, 3)]
    cur = tuple(np.roll(p, (1, 2), (0, 1)) for p in refs[2])
    nal, rec = encode_p_slice(
        *cur, refs, 3, qp=14, search_range=4,
        return_recon=True, code_residual=True,
    )
    got = decode_p_slice(nal, sps, refs)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))


def test_single_ref_list_is_bitstream_identical_to_tuple():
    h, w = 32, 48
    ref = _planes(h, w, 9)
    cur = tuple(np.roll(p, (0, 1), (0, 1)) for p in ref)
    a = encode_p_slice(*cur, ref, 1, qp=12, search_range=2)
    b = encode_p_slice(*cur, [ref], 1, qp=12, search_range=2)
    assert a == b


def test_mv_prediction_is_refidx_aware():
    """A neighbour predicting from ref 1 must NOT shortcut-match a
    partition predicting from ref 0 — encode a two-ref stream and check
    decode parity on content engineered to mix ref choices."""
    h, w = 32, 48
    sps = dict(_SPS, mb_width=3, mb_height=2)
    rng = np.random.default_rng(21)
    ref0 = _planes(h, w, 31)
    ref1 = _planes(h, w, 32)
    # current: left MBs copy ref1 regions, right MBs copy ref0 regions
    y = np.empty((h, w), np.uint8)
    y[:, :24] = ref1[0][:, :24]
    y[:, 24:] = ref0[0][:, 24:]
    cb = ref0[1].copy()
    cr = ref1[2].copy()
    nal, rec, stats = encode_p_slice(
        y, cb, cr, [ref0, ref1], 5, qp=16, search_range=3,
        return_recon=True, code_residual=True, return_stats=True,
    )
    got = decode_p_slice(nal, sps, [ref0, ref1])
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))
    assert set(stats["ref_idx"]) >= {0, 1}, stats


def _p_header(w, n_active_minus1=None):
    w.ue(0)  # first_mb_in_slice
    w.ue(5)  # slice_type P
    w.ue(0)  # pps id
    w.u(1, 4)  # frame_num
    if n_active_minus1 is None:
        w.u(0, 1)  # no override
    else:
        w.u(1, 1)
        w.ue(n_active_minus1)
    w.u(0, 1)  # no list modification
    w.u(0, 1)  # no adaptive marking
    w.se(12 - 26)


def test_hostile_ref_counts_classify():
    h, w = 32, 32
    sps = dict(_SPS, mb_width=2, mb_height=2)
    ref = _planes(h, w, 3)

    # slice wants 2 refs, decoder given 1
    wr = _BitWriter()
    _p_header(wr, n_active_minus1=1)
    with pytest.raises(ValueError, match="reference pictures"):
        decode_p_slice(rbsp_to_nal(0x41, wr.rbsp_trailing()), sps, ref)

    # absurd num_ref_idx override
    wr = _BitWriter()
    _p_header(wr, n_active_minus1=40)
    with pytest.raises(ValueError, match="> 16"):
        decode_p_slice(
            rbsp_to_nal(0x41, wr.rbsp_trailing()), sps, [ref] * 2
        )

    # ref_idx beyond the active count (3 active -> ue(v) coding)
    refs3 = [_planes(h, w, s) for s in (4, 5, 6)]
    wr = _BitWriter()
    _p_header(wr, n_active_minus1=2)
    wr.ue(0)  # mb_skip_run
    wr.ue(0)  # mb_type P_L0_16x16
    wr.ue(7)  # ref_idx_l0 7 >= 3
    with pytest.raises(ValueError, match="ref_idx_l0"):
        decode_p_slice(rbsp_to_nal(0x41, wr.rbsp_trailing()), sps, refs3)

    # list modification DECODES since round 5 (tests/test_h264_listmod)
    # — but a LONG-TERM command still classifies as the boundary
    wr = _BitWriter()
    wr.ue(0)
    wr.ue(5)
    wr.ue(0)
    wr.u(1, 4)
    wr.u(0, 1)
    wr.u(1, 1)  # ref_pic_list_modification_flag_l0
    wr.ue(2)  # modification_of_pic_nums_idc: long_term_pic_num
    wr.ue(0)
    with pytest.raises(NotImplementedError, match="long-term"):
        decode_p_slice(rbsp_to_nal(0x41, wr.rbsp_trailing()), sps, ref)
