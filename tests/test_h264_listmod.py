"""Reference picture list modification (spec 7.3.3.1 / 8.2.4.3.1):
command synthesis <-> replay inverse property, PicNum wrap, on-wire
roundtrip where ref_idx 0 genuinely names the two-back picture, and
the classification boundaries. Pure numpy — no SparkSession."""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators import h264codec as H
from flow_indexer_spark.operators import h264inter as P


def _replay(cmds, frame_num, max_pic_num, n_refs):
    w = H._BitWriter()
    for idc, v in cmds:
        w.ue(idc)
        w.ue(v)
    w.ue(3)
    r = H._BitReader(w.rbsp_trailing())
    return P._apply_l0_modification(r, frame_num, max_pic_num, n_refs)


@pytest.mark.parametrize("frame_num", [1, 2, 7, 15])
@pytest.mark.parametrize(
    "order", [(0, 1), (1, 0), (2, 0, 1), (1, 2, 0), (0, 2, 1)]
)
def test_commands_replay_to_requested_order(order, frame_num):
    """_l0_modification_commands composed with the decoder's replay is
    the identity on permutations — including frame_num values that
    force PicNum wrap (frame_num < len(refs))."""
    n = len(order)
    got = _replay(
        P._l0_modification_commands(order, frame_num), frame_num, 16, n
    )
    assert tuple(got[:n]) == order


def test_replay_boundaries():
    # long-term command classifies
    w = H._BitWriter()
    w.ue(2)
    w.ue(0)
    w.ue(3)
    r = H._BitReader(w.rbsp_trailing())
    with pytest.raises(NotImplementedError, match="long-term"):
        P._apply_l0_modification(r, 4, 16, 2)
    # a command naming an absent picture is corrupt
    w = H._BitWriter()
    w.ue(0)
    w.ue(7)  # abs_diff 8: PicNum 4-8 wraps to a picture we don't hold
    w.ue(3)
    r = H._BitReader(w.rbsp_trailing())
    with pytest.raises(ValueError, match="no such short-term"):
        P._apply_l0_modification(r, 4, 16, 2)
    # idc > 3 is invalid syntax
    w = H._BitWriter()
    w.ue(4)
    r = H._BitReader(w.rbsp_trailing())
    with pytest.raises(ValueError, match="invalid"):
        P._apply_l0_modification(r, 4, 16, 2)


def _rand_planes(rng, w=48, h=32):
    return (
        rng.integers(0, 256, (h, w), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


def test_p_slice_l0_reorder_roundtrip_byte_exact():
    """Content that predicts ONLY from two-frames-back: with
    l0_reorder=(1, 0) the stream carries the modification commands,
    every ref_idx stays 0, and decode equals recon equals the source
    byte-exactly — a decoder that ignored the modification would MC
    from the wrong picture entirely (random planes, huge error)."""
    rng = np.random.default_rng(91)
    sps = H.parse_sps(H.make_sps(48, 32, ref_frames=2))
    back2 = _rand_planes(rng)
    back1 = _rand_planes(rng)
    cur = back2  # only the older picture matches
    nal, recon = P.encode_p_slice(
        *cur, [back1, back2], frame_num=2, return_recon=True,
        l0_reorder=(1, 0), search_range=4, quarter=False,
    )
    # flag is genuinely on the wire
    _, rbsp = H.nal_to_rbsp(nal)
    r = H._BitReader(rbsp)
    r.ue("first_mb")
    assert r.ue("slice_type") % 5 == 0
    r.ue("pps")
    r.u(sps["log2_max_frame_num"], "frame_num")
    assert r.u(1, "override") == 1
    r.ue("n_active_minus1")
    assert r.u(1, "ref_pic_list_modification_flag_l0") == 1
    dec = P.decode_p_slice(nal, sps, [back1, back2])
    for a, b in zip(recon, dec):
        assert (a == b).all()
    for a, b in zip(cur, dec):
        assert (a == b).all()  # the reorder really reached the MC
    # encoder guard: not a permutation
    with pytest.raises(ValueError, match="permutation"):
        P.encode_p_slice(
            *cur, [back1, back2], frame_num=2, l0_reorder=(0, 0)
        )


def test_modified_stream_differs_from_refidx_stream_only_in_header():
    """Sanity: the same two-back prediction is reachable either via
    ref_idx 1 (multi-ref path) or via modification + ref_idx 0; both
    decode to the same planes."""
    rng = np.random.default_rng(92)
    sps = H.parse_sps(H.make_sps(32, 32, ref_frames=2))
    back2 = _rand_planes(rng, 32, 32)
    back1 = _rand_planes(rng, 32, 32)
    cur = back2
    nal_mod = P.encode_p_slice(
        *cur, [back1, back2], frame_num=2, l0_reorder=(1, 0),
        search_range=4, quarter=False,
    )
    nal_ref = P.encode_p_slice(
        *cur, [back1, back2], frame_num=2,
        search_range=4, quarter=False,
    )
    a = P.decode_p_slice(nal_mod, sps, [back1, back2])
    b = P.decode_p_slice(nal_ref, sps, [back1, back2])
    for x, y in zip(a, b):
        assert (x == y).all()
