"""P macroblock partitions (P_16x8 / P_8x16 / P_8x8 + sub-partitions).

Verification layers:

* **Byte-stability pin**: the partition work migrated ALL P-slice motion
  state to the spec's 4x4 granularity (spec 8.4.1.3 predicts from 4x4
  luma blocks, not macroblocks). The pre-migration encoder's bitstreams
  and reconstructions for 16x16-only streams are pinned by sha256 so the
  migration provably changed nothing it wasn't supposed to.
* **Encode/decode parity**: partitioned streams must decode byte-exactly
  to the encoder's reconstruction (the module's standing contract), and
  the fixture asserts the bitstream genuinely contains partitioned
  mb_types — a mode-decision that silently always picks 16x16 fails.
* **MV-prediction unit oracles**: the 8.4.1.3 directional rules
  (16x8 top<-B / bottom<-A, 8x16 left<-A / right<-C) and the
  single-matching-refIdx shortcut against hand-computed cases.

Reference analogue: the pcap backend decodes every packet format its
library supports (/root/reference/backend/pcap.go:17-54).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from flow_indexer_spark.operators.h264inter import (
    Motion4,
    decode_p_slice,
    encode_p_slice,
    mv_pred_part,
)

# sha256[:16] of (nal, recon-planes) from the round-4 MB-granularity
# encoder, captured immediately before the 4x4 motion-grid migration.
_PINS = {
    "a_res0": ("76192f6a6409ff7b", "b3ee6c3dd86a5608"),
    "a_res1": ("afdce5b8180a9bce", "2fac49b4eb62637e"),
    "a_mix": ("0b6ae19bebadf84b", "e06df966118643d5"),
    "b_res0": ("9e85e2a03dcf9974", "b77f01976ae23522"),
    "b_res1": ("5fcc158d90419e32", "5ee33dfc65c6bb76"),
    "b_mix": ("fffc06da95be9269", "8c580a1a7d53741d"),
}

_SPS = {
    "log2_max_frame_num": 4,
    "poc_type": 2,
}


def _planes(h, w, seed):
    r = np.random.default_rng(seed)
    return (
        r.integers(0, 256, (h, w), dtype=np.uint8),
        r.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        r.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
    )


def _h(nal, rec):
    return (
        hashlib.sha256(nal).hexdigest()[:16],
        hashlib.sha256(
            rec[0].tobytes() + rec[1].tobytes() + rec[2].tobytes()
        ).hexdigest()[:16],
    )


def test_16x16_bitstreams_pinned_across_grid_migration():
    for case, (h, w, seed) in {"a": (32, 48, 1), "b": (48, 32, 2)}.items():
        ref = _planes(h, w, seed)
        y = np.roll(ref[0], (1, 2), (0, 1))
        cb = np.roll(ref[1], (0, 1), (0, 1))
        cr = np.roll(ref[2], (0, 1), (0, 1))
        for flag in (False, True):
            nal, rec = encode_p_slice(
                y, cb, cr, ref, 1, qp=12, search_range=4,
                return_recon=True, code_residual=flag,
            )
            assert _h(nal, rec) == _PINS[f"{case}_res{int(flag)}"]
        nal, rec = encode_p_slice(
            y, cb, cr, ref, 2, qp=20, search_range=2,
            intra_mbs=frozenset({(0, 0), (1, 1)}),
            return_recon=True, code_residual=True,
        )
        assert _h(nal, rec) == _PINS[f"{case}_mix"]


def _quadrant_scene(h, w, t, seed=0):
    """Four regions translating differently; boundaries sit at 8-px
    offsets inside macroblocks so partitions genuinely win."""
    yy, xx = np.mgrid[0:h, 0:w]
    sx, sy = (w // 2) // 8 * 8 + 8, (h // 2) // 8 * 8 + 8
    motion = {
        (0, 0): (2, 1),
        (0, 1): (-2, 1),
        (1, 0): (2, -1),
        (1, 1): (0, 0),
    }
    y = np.zeros((h, w), np.int64)
    for (ry, rx), (vx, vy) in motion.items():
        m = ((yy >= sy) == ry) & ((xx >= sx) == rx)
        y[m] = (
            (xx[m] - t * vx) * 3 + (yy[m] - t * vy) * 7 + 37 * (2 * ry + rx)
        ) % 256
    cb = (y[::2, ::2] // 2 + 64) % 256
    cr = (y[1::2, ::2] // 3 + 32) % 256
    return (
        y.astype(np.uint8),
        cb.astype(np.uint8),
        cr.astype(np.uint8),
    )


@pytest.mark.parametrize("code_residual", [False, True])
def test_partitioned_roundtrip_is_byte_exact(code_residual):
    h, w = 48, 64
    ref = _quadrant_scene(h, w, 0)
    cur = _quadrant_scene(h, w, 1)
    sps = dict(_SPS, mb_width=w // 16, mb_height=h // 16)
    nal, rec, stats = encode_p_slice(
        *cur, ref, 1, qp=12, search_range=4,
        return_recon=True, code_residual=code_residual,
        partitions=True, return_stats=True,
    )
    got = decode_p_slice(nal, sps, ref)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))
    # the mode decision must actually have used partitions
    part_types = (
        stats["mb_types"].get(1, 0)
        + stats["mb_types"].get(2, 0)
        + stats["mb_types"].get(3, 0)
    )
    assert part_types >= 2, stats["mb_types"]


def test_sub_partitions_roundtrip_property():
    rng = np.random.default_rng(11)
    for trial in range(6):
        h, w = 32, 32
        ref = _planes(h, w, 50 + trial)
        # per-8x8-quadrant independent motion forces P_8x8 + sub types
        y = np.empty((h, w), np.uint8)
        cb = np.empty((h // 2, w // 2), np.uint8)
        cr = np.empty((h // 2, w // 2), np.uint8)
        for qy in range(h // 8):
            for qx in range(w // 8):
                dy, dx = int(rng.integers(-2, 3)), int(rng.integers(-2, 3))
                src_r = np.clip(np.arange(8 * qy + dy, 8 * qy + dy + 8), 0, h - 1)
                src_c = np.clip(np.arange(8 * qx + dx, 8 * qx + dx + 8), 0, w - 1)
                y[8 * qy : 8 * qy + 8, 8 * qx : 8 * qx + 8] = ref[0][
                    np.ix_(src_r, src_c)
                ]
        cb[:] = ref[1]
        cr[:] = ref[2]
        sps = dict(_SPS, mb_width=w // 16, mb_height=h // 16)
        nal, rec, stats = encode_p_slice(
            y, cb, cr, ref, 1, qp=16, search_range=4,
            return_recon=True, code_residual=True,
            partitions=True, return_stats=True,
        )
        got = decode_p_slice(nal, sps, ref)
        assert all(np.array_equal(a, b) for a, b in zip(got, rec))


def test_partitioned_with_intra_refresh_roundtrip():
    h, w = 48, 48
    ref = _quadrant_scene(h, w, 0, seed=3)
    cur = _quadrant_scene(h, w, 1, seed=3)
    sps = dict(_SPS, mb_width=w // 16, mb_height=h // 16)
    nal, rec = encode_p_slice(
        *cur, ref, 1, qp=14, search_range=4, return_recon=True,
        code_residual=True, partitions=True,
        intra_mbs=frozenset({(1, 1)}),
    )
    got = decode_p_slice(nal, sps, ref)
    assert all(np.array_equal(a, b) for a, b in zip(got, rec))


# --- 8.4.1.3 directional / median unit oracles -------------------------------


def _grid(mb_w=2, mb_h=2):
    return Motion4(mb_w, mb_h)


def test_mv_pred_16x8_directional():
    m = _grid()
    # fill the whole top MB row with a known MV so B is available
    m.fill(0, 0, 8, 4, (12, -4), 0)
    # left MB of the current row
    m.fill(0, 4, 4, 4, (-8, 8), 0)
    # top partition of MB (1,1) -> B neighbour wins when refIdx matches
    assert mv_pred_part(m, 4, 4, 4, 2, 0, "16x8t") == (12, -4)
    # bottom partition -> A neighbour (the left MB's cells at row y4=6)
    assert mv_pred_part(m, 4, 6, 4, 2, 0, "16x8b") == (-8, 8)


def test_mv_pred_8x16_directional():
    m = _grid()
    m.fill(0, 0, 8, 4, (4, 4), 0)  # top MB row
    m.fill(0, 4, 4, 4, (-4, 0), 0)  # left MB
    # left 8x16 partition of MB (1,1): A wins
    assert mv_pred_part(m, 4, 4, 2, 4, 0, "8x16l") == (-4, 0)
    # right 8x16 partition: C at x4=8 is outside the picture -> D
    # fallback at (5,3), which carries the top row's MV
    assert mv_pred_part(m, 6, 4, 2, 4, 0, "8x16r") == (4, 4)


def test_mv_pred_single_match_shortcut():
    m = _grid()
    m.fill(0, 0, 4, 4, (0, 0), -1)  # intra above-left region
    m.fill(4, 0, 4, 4, (20, 8), 0)  # above: the only refIdx-0 neighbour
    m.fill(0, 4, 4, 4, (0, 0), -1)  # intra left
    assert mv_pred_part(m, 4, 4, 4, 4, 0, "16x16") == (20, 8)


def test_mv_pred_median_when_all_match():
    m = _grid()
    m.fill(0, 0, 4, 4, (1, 9), 0)  # D region (unused when C avail)
    m.fill(4, 0, 4, 4, (5, 1), 0)  # B
    m.fill(0, 4, 4, 4, (3, 5), 0)  # A
    # C at (8, 3) is outside a 2x2-MB picture? x4=8 == w4 -> unavailable,
    # falls back to D=(1,9). median over A(3,5) B(5,1) C(1,9) = (3,5)
    assert mv_pred_part(m, 4, 4, 4, 4, 0, "16x16") == (3, 5)


def test_row0_copy_a_rule():
    m = _grid()
    m.fill(0, 0, 4, 4, (7, -3), 0)  # A = left MB, picture row 0
    # B/C/D all outside the picture -> copy A into B and C -> median = A
    assert mv_pred_part(m, 4, 0, 4, 4, 0, "16x16") == (7, -3)


def test_part_fixture_decodes_to_scene_means():
    """The MP4 partition family end-to-end (container + GOP chain):
    decoded sampled-frame means track the source generator within the
    oracle gate, and the bytes builder itself asserts partitioned
    mb_types were emitted (min_part_mbs)."""
    from flow_indexer_spark.operators.mp4codec import (
        make_h264_part_bytes,
        mp4_frames,
        part_scene,
    )

    for i in (0, 7, 23):
        payload = make_h264_part_bytes(i)
        n_frames = 0
        for k, _t_ms, px in mp4_frames(payload, 2):
            src = part_scene(i, k)
            for c in range(3):
                assert abs(px[:, :, c].mean() - src[:, :, c].mean()) < 1.0
            n_frames += 1
        assert n_frames >= 3


def test_hostile_sub_mb_type_classifies():
    h, w = 32, 32
    ref = _quadrant_scene(h, w, 0)
    cur = _quadrant_scene(h, w, 1)
    sps = dict(_SPS, mb_width=2, mb_height=2)
    nal, rec, stats = encode_p_slice(
        *cur, ref, 1, qp=12, search_range=4, return_recon=True,
        partitions=True, return_stats=True,
    )
    # flip bits through the payload; every mutation must classify
    for pos in range(6, min(len(nal), 40)):
        for bit in (0x01, 0x40):
            bad = bytearray(nal)
            bad[pos] ^= bit
            try:
                decode_p_slice(bytes(bad), sps, ref)
            except (ValueError, NotImplementedError):
                pass
