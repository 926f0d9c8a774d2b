"""H.264 P slices — motion-compensated inter prediction (pure numpy).

Closes the next span of the codec seam after round-4's Intra_16x16
stack (:mod:`operators.h264intra`): non-IDR NAL units whose
macroblocks predict from the PREVIOUS reconstructed picture. The
implemented subset is the one a no-codec-library sandbox can host
bit-exactly and verify end-to-end:

* **Quarter-sample luma interpolation (spec 8.4.2.2.1)** — the 6-tap
  (1,-5,20,20,-5,1) half-sample filter horizontally, vertically, and
  the two-stage centre position ``j`` computed from UNROUNDED
  intermediates with the (+512)>>10 final rounding, then the rounded
  quarter-sample averages a..r. Reference-picture coordinates are
  clipped to the picture bounds (edge extension), so hostile motion
  vectors cannot over-read.
* **Eighth-sample chroma interpolation (spec 8.4.2.2.2)** — the
  bilinear ((8-dx)(8-dy)A + ...) >> 6 kernel; the luma quarter-sample
  MV IS the chroma eighth-sample MV in 4:2:0.
* **Median motion-vector prediction (spec 8.4.1.3)** — neighbours
  A/B/C (C falling back to D, the top-left, when unavailable), the
  8.4.1.3.2 rule copying A into B and C when row 0 makes both
  unavailable, the single-matching-refIdx shortcut, and the
  componentwise median; intra neighbours contribute (mv 0, ref -1).
* **P_Skip (spec 8.4.1.1)** — the zero-MV short-circuits (A or B
  unavailable, or either has refIdx 0 with a zero MV) over the 16x16
  median predictor, and ``mb_skip_run`` run-length coding in the
  slice data (CAVLC, spec 7.3.4).
* **P_L0_16x16 with zero coded residual** — one MV per macroblock,
  mvd against the median predictor, coded_block_pattern 0 via the
  Table 9-4 inter mapping (codeNum 0), reconstruction = the motion-
  compensated prediction. Intra-refresh macroblocks inside P slices
  (mb_type >= 5, Table 7-13) reuse the full Intra_16x16 encode/decode
  from h264intra.
* **The non-IDR slice header** (frame_num, the empty ref-pic-list
  modification and dec_ref_pic_marking for a 1-reference stream).

The encoder is a real motion-search encoder: exhaustive integer-pel
SAD search in a window, then quarter-pel refinement through the SAME
interpolation the decoder runs, skip-biased mode decision. Because
coded residuals are zero, the decoder's reconstruction must equal the
encoder's motion-compensated prediction EXACTLY — every test gates
byte equality of the full reconstruction chain, not means.

* **Inter coded residuals (cbp != 0)** — the Table 9-4 inter
  coded_block_pattern mapping, full-scan 4x4 core-transform luma
  levels (inter DC rides inside the block, no Hadamard pass), the
  shared Hadamard-DC + AC chroma path, mb_qp_delta, all through the
  full CAVLC layer (:mod:`operators.h264cavlc`) with real 9.2.1 nC
  neighbour contexts. Encoder and decoder reconstruct through ONE
  shared integer routine (:func:`_recon_inter_mb`), so parity is by
  construction; a macroblock skips only when its MV matches the
  P_Skip derivation AND the residual quantizes to nothing (7.4.4).

* **P macroblock partitions (Table 7-13/7-17)** — P_L0_L0_16x8,
  P_L0_L0_8x16 and P_8x8 (all four sub_mb_types: 8x8/8x4/4x8/4x4,
  plus the P_8x8ref0 decode alias). Motion state lives on the spec's
  4x4 block grid (:class:`Motion4`); per-partition MV prediction
  applies the 8.4.1.3 directional rules (16x8 top<-B / bottom<-A,
  8x16 left<-A / right<-C) before the single-match/median fallback,
  with within-MB partition availability reproduced by progressive
  grid writes (6.4.11.7). The encoder searches every partitioning
  and picks by SAD + bits-proxy; ``partitions=False`` (the default)
  stays byte-identical to the pre-partition encoder, pinned by
  tests/test_h264_parts.py.

* **Multi-reference lists (spec 8.2.4 / 8.4.2.1)** — the slice header
  overrides num_ref_idx_l0_active, inter partitions signal ref_idx_l0
  as te(v) (one inverted bit at two active references, ue(v) beyond),
  motion compensation reads list0[ref_idx], and MV prediction
  compares ACTUAL refIdx values on the 4x4 grid. GopDecoder keeps a
  two-deep sliding window and hands the list most-recent-first
  (decode recency == PicNum order in these closed GOPs).

* **Explicit weighted prediction (spec 7.3.3.2 / 8.4.2.3)** — PPS
  weighted_pred_flag, pred_weight_table emit/parse (per-reference
  luma/chroma weights + offsets, default entries coded as bare
  flags), and Clip1(((p*w + 2^(logWD-1)) >> logWD) + o) applied after
  interpolation to every inter prediction including P_Skip. The
  encoder searches weighted reference planes and takes a caller
  weight table (the fade fixture's weights make prediction exact, so
  macroblocks genuinely skip).

* **B slices (spec 8.4.1.2 / 8.4.2.3)** — B_L0/B_L1/B_Bi_16x16, the
  two-partition Table 7-14 types 4..21 (16x8 / 8x16 with per-
  partition list choice, round 5) on per-list :class:`Motion4` state,
  B_Skip / B_Direct_16x16 under BOTH direct derivations: spatial
  (8.4.1.2.2, :func:`spatial_direct4`) and temporal (8.4.1.2.3,
  :func:`temporal_direct` — POC-distance scaling with trunc-division
  tx and arithmetic shifts; GopDecoder tracks POC from slice headers
  and the decoder CLASSIFIES when the context is missing).

* **Reference picture list modification (spec 7.3.3.1 / 8.2.4.3)** —
  P slices parse the abs-diff short-term command loop and replay
  8.2.4.3.1 over the recency list (picNumL0Pred chaining, PicNum
  wrap, move-and-filter), so ref_idx 0 can name any stored picture;
  the encoder's ``l0_reorder`` emits the commands for an arbitrary
  permutation. Long-term commands (idc 2) classify.

Still classified from parsed syntax: B_8x8 sub-macroblock partitions
(sub_mb_type), B-slice reference list modification, weighted
BI-prediction (weighted_bipred_idc != 0), CABAC (PPS), and everything
h264codec already classifies.

Reference analogue: the pcap backend decodes every packet format its
library supports (/root/reference/backend/pcap.go:17-54) — the same
completeness pressure on the one format this sandbox has no library
for.
"""

from __future__ import annotations

import numpy as np

from flow_indexer_spark.operators.h264codec import (
    _BitReader,
    _BitWriter,
    nal_to_rbsp,
    rbsp_to_nal,
)
from flow_indexer_spark.operators.h264intra import (
    _C4,
    _Z4,
    NzcCtx,
    chroma_qp,
    decode_i_mb,
    encode_i16_mb,
)

# --- motion-compensated interpolation (spec 8.4.2.2) -------------------------

_TAPS = (1, -5, 20, 20, -5, 1)


def _filt6(a: np.ndarray, axis: int) -> np.ndarray:
    """Apply the 6-tap half-sample filter along ``axis`` (length shrinks
    by 5); int64 intermediates, NO rounding/shift (the caller decides
    whether this is a one-stage (+16)>>5 or two-stage (+512)>>10 use)."""
    sl = [slice(None)] * a.ndim
    out = None
    for k, t in enumerate(_TAPS):
        sl[axis] = slice(k, a.shape[axis] - 5 + k)
        term = t * a[tuple(sl)]
        out = term if out is None else out + term
    return out


def mc_luma(ref: np.ndarray, x_q: int, y_q: int, h: int, w: int) -> np.ndarray:
    """Motion-compensated (h, w) luma block whose top-left sits at the
    absolute quarter-sample position (x_q, y_q) in ``ref``. Implements
    Figure 8-4 / Table 8-12: integer grid G, half samples b (horizontal
    6-tap), h (vertical 6-tap), centre j (vertical 6-tap over unrounded
    horizontal intermediates, (+512)>>10), and the 16 quarter positions
    as rounded averages. Coordinates clip to the picture (edge
    extension), so any mvd value is safe."""
    H, W = ref.shape
    xi, fx = x_q >> 2, x_q & 3
    yi, fy = y_q >> 2, y_q & 3
    rows = np.clip(np.arange(yi - 2, yi + h + 3), 0, H - 1)
    cols = np.clip(np.arange(xi - 2, xi + w + 3), 0, W - 1)
    E = ref[np.ix_(rows, cols)].astype(np.int64)  # (h+5, w+5)
    G = E[2 : h + 4, 2 : w + 4]  # (h+2, w+2): integer grid + 1 right/down
    if fx == 0 and fy == 0:
        return np.clip(G[:h, :w], 0, 255).astype(np.uint8)
    bu = _filt6(E, axis=1)  # (h+5, w) horizontal intermediates, unrounded
    b = np.clip((bu[2 : h + 4, :] + 16) >> 5, 0, 255)  # (h+2, w)
    hu = _filt6(E, axis=0)  # (h, w+5)
    hh = np.clip((hu[:, 2 : w + 4] + 16) >> 5, 0, 255)  # (h, w+2)
    j = np.clip((_filt6(bu, axis=0) + 512) >> 10, 0, 255)  # (h, w)
    # Table 8-12 quarter-position averages. s = b one full sample below,
    # m = hh one full sample right.
    table = {
        (1, 0): (G[:h, :w] + b[:h] + 1) >> 1,          # a
        (2, 0): b[:h],                                  # b
        (3, 0): (b[:h] + G[:h, 1 : w + 1] + 1) >> 1,    # c
        (0, 1): (G[:h, :w] + hh[:, :w] + 1) >> 1,       # d
        (0, 2): hh[:, :w],                              # h
        (0, 3): (hh[:, :w] + G[1 : h + 1, :w] + 1) >> 1,  # n
        (2, 1): (b[:h] + j + 1) >> 1,                   # f
        (2, 2): j,                                      # j
        (2, 3): (j + b[1 : h + 1] + 1) >> 1,            # q
        (1, 2): (hh[:, :w] + j + 1) >> 1,               # i
        (3, 2): (j + hh[:, 1 : w + 1] + 1) >> 1,        # k
        (1, 1): (b[:h] + hh[:, :w] + 1) >> 1,           # e
        (3, 1): (b[:h] + hh[:, 1 : w + 1] + 1) >> 1,    # g
        (1, 3): (hh[:, :w] + b[1 : h + 1] + 1) >> 1,    # p
        (3, 3): (b[1 : h + 1] + hh[:, 1 : w + 1] + 1) >> 1,  # r
    }
    return np.clip(table[(fx, fy)], 0, 255).astype(np.uint8)


def mc_chroma(ref: np.ndarray, x8: int, y8: int, h: int, w: int) -> np.ndarray:
    """(h, w) chroma block at absolute eighth-sample (x8, y8): the
    spec 8.4.2.2.2 bilinear kernel, coordinates edge-clipped."""
    H, W = ref.shape
    xi, fx = x8 >> 3, x8 & 7
    yi, fy = y8 >> 3, y8 & 7
    rows = np.clip(np.arange(yi, yi + h + 1), 0, H - 1)
    cols = np.clip(np.arange(xi, xi + w + 1), 0, W - 1)
    A = ref[np.ix_(rows, cols)].astype(np.int64)
    out = (
        (8 - fx) * (8 - fy) * A[:h, :w]
        + fx * (8 - fy) * A[:h, 1 : w + 1]
        + (8 - fx) * fy * A[1 : h + 1, :w]
        + fx * fy * A[1 : h + 1, 1 : w + 1]
        + 32
    ) >> 6
    return out.astype(np.uint8)


def mc_predict_mb(
    ref_y: np.ndarray,
    ref_cb: np.ndarray,
    ref_cr: np.ndarray,
    mx: int,
    my: int,
    mv: tuple[int, int],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Motion-compensated 16x16 luma + 8x8 chroma prediction for MB
    (mx, my) with quarter-sample MV ``mv``. The luma quarter-sample MV
    doubles as the chroma eighth-sample MV (4:2:0, spec 8.4.1.4)."""
    mvx, mvy = mv
    py = mc_luma(ref_y, 64 * mx + mvx, 64 * my + mvy, 16, 16)
    pcb = mc_chroma(ref_cb, 64 * mx + mvx, 64 * my + mvy, 8, 8)
    pcr = mc_chroma(ref_cr, 64 * mx + mvx, 64 * my + mvy, 8, 8)
    return py, pcb, pcr


# --- motion-vector prediction (spec 8.4.1.3) ---------------------------------


def _neighbor(mvs, inter, mx, my, mb_w):
    """(A, B, C) neighbour (mvx, mvy, refIdx) triples for MB (mx, my),
    after the C->D substitution and the row-0 copy-A rule of
    8.4.1.3.2. Unavailable or intra neighbours read (0, 0, -1)."""

    def val(nx, ny, ok):
        if not ok or not inter[ny][nx]:
            return (0, 0, -1)
        return (mvs[ny][nx][0], mvs[ny][nx][1], 0)

    avail_a = mx > 0
    avail_b = my > 0
    avail_c = my > 0 and mx + 1 < mb_w
    avail_d = my > 0 and mx > 0
    a = val(mx - 1, my, avail_a)
    if avail_c:
        c = val(mx + 1, my - 1, True)
        avail_c_mb = True
    else:
        c = val(mx - 1, my - 1, avail_d)
        avail_c_mb = avail_d
    b = val(mx, my - 1, avail_b)
    if not avail_b and not avail_c_mb and avail_a:
        b = c = a
    return a, b, c


def mv_pred_16x16(mvs, inter, mx, my, mb_w) -> tuple[int, int]:
    """Median luma MV prediction for a 16x16 partition with refIdx 0
    (spec 8.4.1.3): the single-matching-refIdx shortcut, else the
    componentwise median of A/B/C."""
    a, b, c = _neighbor(mvs, inter, mx, my, mb_w)
    match = [n for n in (a, b, c) if n[2] == 0]
    if len(match) == 1:
        return match[0][0], match[0][1]
    xs = sorted(n[0] for n in (a, b, c))
    ys = sorted(n[1] for n in (a, b, c))
    return xs[1], ys[1]


def skip_mv(mvs, inter, mx, my, mb_w) -> tuple[int, int]:
    """P_Skip motion vector (spec 8.4.1.1): zero when the left or top
    macroblock is unavailable or either references picture 0 with a
    zero MV; otherwise the 16x16 median predictor."""
    if mx == 0 or my == 0:
        return 0, 0
    for nx, ny in ((mx - 1, my), (mx, my - 1)):
        if inter[ny][nx] and mvs[ny][nx] == (0, 0):
            return 0, 0
    return mv_pred_16x16(mvs, inter, mx, my, mb_w)


class Motion4:
    """4x4-granularity motion state for one picture. Spec 8.4.1.3
    predicts from 4x4 luma blocks, not macroblocks — partitioned
    macroblocks (P_16x8 / P_8x16 / P_8x8 sub-partitions) give different
    4x4 cells of one MB different motion, so the P-slice coders keep
    their state here. ``ref`` is the refIdx (-1 = intra); ``done``
    marks cells already decoded this picture (spec availability for a
    single-slice picture = inside bounds AND earlier in decoding
    order, which progressive writes reproduce exactly, including the
    within-MB partition ordering of 6.4.11.7)."""

    __slots__ = ("w4", "h4", "mv", "ref", "done")

    def __init__(self, mb_w: int, mb_h: int) -> None:
        self.w4, self.h4 = 4 * mb_w, 4 * mb_h
        self.mv = np.zeros((self.h4, self.w4, 2), dtype=np.int32)
        self.ref = np.full((self.h4, self.w4), -1, dtype=np.int16)
        self.done = np.zeros((self.h4, self.w4), dtype=bool)

    def fill(self, x4: int, y4: int, w4: int, h4: int, mv, ref: int) -> None:
        self.mv[y4 : y4 + h4, x4 : x4 + w4] = mv
        self.ref[y4 : y4 + h4, x4 : x4 + w4] = ref
        self.done[y4 : y4 + h4, x4 : x4 + w4] = True

    def cell(self, x4: int, y4: int):
        """(mvx, mvy, refIdx, available). Outside the picture or not
        yet decoded reads (0, 0, -1, False); decoded intra cells read
        (0, 0, -1, True) — available (they block the row-0 copy-A
        rule) but never refIdx-matching."""
        if not (0 <= x4 < self.w4 and 0 <= y4 < self.h4):
            return (0, 0, -1, False)
        if not self.done[y4, x4]:
            return (0, 0, -1, False)
        return (
            int(self.mv[y4, x4, 0]),
            int(self.mv[y4, x4, 1]),
            int(self.ref[y4, x4]),
            True,
        )


def _export_mb_motion(m4: Motion4, mb_w: int, mb_h: int):
    """Macroblock-level (mvs, inter) grids from the 4x4 state — the
    contract the B-slice spatial-direct path consumes for colZeroFlag
    (each MB reads its top-left 4x4 cell; exact for the 16x16-coded
    anchor pictures the B-GOP fixtures write, and a documented
    top-left-cell approximation for partitioned anchors)."""
    mvs = [
        [
            (int(m4.mv[4 * my, 4 * mx, 0]), int(m4.mv[4 * my, 4 * mx, 1]))
            for mx in range(mb_w)
        ]
        for my in range(mb_h)
    ]
    inter = [
        [bool(m4.ref[4 * my, 4 * mx] >= 0) for mx in range(mb_w)]
        for my in range(mb_h)
    ]
    return mvs, inter


def _neighbors4(m4: Motion4, x4: int, y4: int, w4: int):
    """8.4.1.3.1 neighbour triples (A, B, C) for the partition whose
    top-left 4x4 block is (x4, y4) and whose width is ``w4`` blocks:
    C falls back to D (top-left) when unavailable, and when B, C and D
    are ALL unavailable with A available, A is copied into B and C."""
    a = m4.cell(x4 - 1, y4)
    b = m4.cell(x4, y4 - 1)
    c = m4.cell(x4 + w4, y4 - 1)
    if not c[3]:
        c = m4.cell(x4 - 1, y4 - 1)
    if not b[3] and not c[3] and a[3]:
        b = c = a
    return a[:3], b[:3], c[:3]


def mv_pred_part(
    m4: Motion4,
    x4: int,
    y4: int,
    w4: int,
    h4: int,
    ref_idx: int,
    kind: str,
) -> tuple[int, int]:
    """Luma MV prediction for one partition (spec 8.4.1.3): the 16x8 /
    8x16 directional shortcuts first (top<-B, bottom<-A, left<-A,
    right<-C when the neighbour's refIdx matches), then the
    single-matching-refIdx shortcut, then the componentwise median.
    ``kind`` is one of 16x16 / 16x8t / 16x8b / 8x16l / 8x16r / sub."""
    a, b, c = _neighbors4(m4, x4, y4, w4)
    if kind == "16x8t" and b[2] == ref_idx:
        return b[0], b[1]
    if kind == "16x8b" and a[2] == ref_idx:
        return a[0], a[1]
    if kind == "8x16l" and a[2] == ref_idx:
        return a[0], a[1]
    if kind == "8x16r" and c[2] == ref_idx:
        return c[0], c[1]
    match = [n for n in (a, b, c) if n[2] == ref_idx]
    if len(match) == 1:
        return match[0][0], match[0][1]
    xs = sorted(n[0] for n in (a, b, c))
    ys = sorted(n[1] for n in (a, b, c))
    return xs[1], ys[1]


def skip_mv4(m4: Motion4, mx: int, my: int) -> tuple[int, int]:
    """P_Skip motion vector (spec 8.4.1.1) on the 4x4 grid: zero when
    the left or top neighbour block is unavailable or either references
    picture 0 with a zero MV; otherwise the 16x16 median predictor."""
    a = m4.cell(4 * mx - 1, 4 * my)
    b = m4.cell(4 * mx, 4 * my - 1)
    if not a[3] or not b[3]:
        return 0, 0
    for n in (a, b):
        if n[2] == 0 and n[0] == 0 and n[1] == 0:
            return 0, 0
    return mv_pred_part(m4, 4 * mx, 4 * my, 4, 4, 0, "16x16")


#: mb_type -> [(ox, oy, w, h, kind)] luma partition geometry (Table 7-13)
_MB_PARTS = {
    0: ((0, 0, 16, 16, "16x16"),),
    1: ((0, 0, 16, 8, "16x8t"), (0, 8, 16, 8, "16x8b")),
    2: ((0, 0, 8, 16, "8x16l"), (8, 0, 8, 16, "8x16r")),
}

#: sub_mb_type -> [(ox, oy, w, h)] inside an 8x8 quadrant (Table 7-17, P)
_SUB_PARTS = {
    0: ((0, 0, 8, 8),),
    1: ((0, 0, 8, 4), (0, 4, 8, 4)),
    2: ((0, 0, 4, 8), (4, 0, 4, 8)),
    3: ((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)),
}

#: 8x8 quadrant origins in Z (decoding) order
_QUADS = ((0, 0), (8, 0), (0, 8), (8, 8))


def mc_predict_parts(refs, mx, my, parts, wp=None):
    """Assemble one MB's (py, pcb, pcr) prediction planes from luma
    partitions ``[(ox, oy, w, h, mv, ref_idx)]`` over the reference
    list ``refs`` = [(y, cb, cr), ...]. Chroma geometry is the luma's
    halved (4:2:0); the luma quarter-sample MV doubles as the chroma
    eighth-sample MV, both on 4*pixel+mv coordinates. ``wp`` applies
    explicit weighted prediction per partition AFTER interpolation
    (the spec 8.4.2.3 order), using reference ri's weights."""
    py = np.empty((16, 16), dtype=np.uint8)
    pcb = np.empty((8, 8), dtype=np.uint8)
    pcr = np.empty((8, 8), dtype=np.uint8)
    for ox, oy, w, h, mv, ri in parts:
        ref_y, ref_cb, ref_cr = refs[ri]
        px, pyy = 16 * mx + ox, 16 * my + oy
        xq, yq = 4 * px + mv[0], 4 * pyy + mv[1]
        blk_y = mc_luma(ref_y, xq, yq, h, w)
        blk_cb = mc_chroma(ref_cb, xq, yq, h // 2, w // 2)
        blk_cr = mc_chroma(ref_cr, xq, yq, h // 2, w // 2)
        if wp is not None:
            lw, lo, cw, co = wp["refs"][ri]
            blk_y = _wp_block(blk_y, lw, lo, wp["luma_denom"])
            blk_cb = _wp_block(blk_cb, cw[0], co[0], wp["chroma_denom"])
            blk_cr = _wp_block(blk_cr, cw[1], co[1], wp["chroma_denom"])
        py[oy : oy + h, ox : ox + w] = blk_y
        cys, cye = oy // 2, (oy + h) // 2
        cxs, cxe = ox // 2, (ox + w) // 2
        pcb[cys:cye, cxs:cxe] = blk_cb
        pcr[cys:cye, cxs:cxe] = blk_cr
    return py, pcb, pcr


# --- explicit weighted prediction (spec 7.3.3.2 / 8.4.2.3) -------------------


def _wp_block(p: np.ndarray, w: int, o: int, logwd: int) -> np.ndarray:
    """8.4.2.3.2 unidirectional weighted sample prediction:
    Clip1(((p * w + 2^(logWD-1)) >> logWD) + o) for logWD >= 1, else
    Clip1(p * w + o). numpy's int64 >> is the spec's arithmetic
    shift."""
    p = p.astype(np.int64)
    if logwd >= 1:
        v = ((p * w + (1 << (logwd - 1))) >> logwd) + o
    else:
        v = p * w + o
    return np.clip(v, 0, 255).astype(np.uint8)


def _wp_planes(planes, wp, ri):
    """Apply reference ri's explicit weights to (py, pcb, pcr)
    prediction blocks; identity when ``wp`` is None."""
    if wp is None:
        return planes
    lw, lo, cw, co = wp["refs"][ri]
    py, pcb, pcr = planes
    return (
        _wp_block(py, lw, lo, wp["luma_denom"]),
        _wp_block(pcb, cw[0], co[0], wp["chroma_denom"]),
        _wp_block(pcr, cw[1], co[1], wp["chroma_denom"]),
    )


def _validate_weights(wp, n_active: int) -> None:
    if not 0 <= wp["luma_denom"] <= 7 or not 0 <= wp["chroma_denom"] <= 7:
        raise ValueError("log2 weight denom out of range 0..7")
    if len(wp["refs"]) != n_active:
        raise ValueError("one weight entry per active reference required")
    for lw, lo, cw, co in wp["refs"]:
        for v in (lw, lo, *cw, *co):
            if not -128 <= v <= 127:
                raise ValueError(f"weight/offset {v} out of range -128..127")


def _emit_pred_weight_table(w, wp, n_active: int) -> None:
    """pred_weight_table (7.3.3.2), list 0 only (P slices)."""
    w.ue(wp["luma_denom"])
    w.ue(wp["chroma_denom"])
    dl, dc = 1 << wp["luma_denom"], 1 << wp["chroma_denom"]
    for lw, lo, cw, co in wp["refs"]:
        if (lw, lo) == (dl, 0):
            w.u(0, 1)  # luma_weight_l0_flag
        else:
            w.u(1, 1)
            w.se(lw)
            w.se(lo)
        if cw == (dc, dc) and co == (0, 0):
            w.u(0, 1)  # chroma_weight_l0_flag
        else:
            w.u(1, 1)
            for j in (0, 1):
                w.se(cw[j])
                w.se(co[j])


def _parse_pred_weight_table(r, n_active: int) -> dict:
    ld = r.ue("luma_log2_weight_denom")
    cd = r.ue("chroma_log2_weight_denom")
    if ld > 7 or cd > 7:
        raise ValueError(f"log2 weight denom {max(ld, cd)} > 7")
    refs = []
    for _ in range(n_active):
        lw, lo = 1 << ld, 0
        if r.u(1, "luma_weight_l0_flag"):
            lw = r.se("luma_weight_l0")
            lo = r.se("luma_offset_l0")
        cw, co = [1 << cd, 1 << cd], [0, 0]
        if r.u(1, "chroma_weight_l0_flag"):
            for j in (0, 1):
                cw[j] = r.se("chroma_weight_l0")
                co[j] = r.se("chroma_offset_l0")
        for v in (lw, lo, *cw, *co):
            if not -128 <= v <= 127:
                raise ValueError(f"weight/offset {v} out of range -128..127")
        refs.append((lw, lo, tuple(cw), tuple(co)))
    return {"luma_denom": ld, "chroma_denom": cd, "refs": refs}


def _write_ref_idx(w, ref_idx: int, n_active: int) -> None:
    """ref_idx_l0 as te(v) (spec 9.1.1): nothing when one reference is
    active, one INVERTED bit when two are, ue(v) beyond."""
    if n_active == 2:
        w.u(1 - ref_idx, 1)
    elif n_active > 2:
        w.ue(ref_idx)


def _read_ref_idx(r, n_active: int) -> int:
    if n_active == 1:
        return 0
    if n_active == 2:
        return 1 - r.u(1, "ref_idx_l0")
    ri = r.ue("ref_idx_l0")
    if ri >= n_active:
        raise ValueError(f"ref_idx_l0 {ri} >= num_ref_idx_active {n_active}")
    return ri


def _wp_bi_block(
    p0: np.ndarray, p1: np.ndarray, e0, e1, logwd: int
) -> np.ndarray:
    """Explicit weighted BI-prediction for one block (spec 8.4.2.3.2,
    weighted_bipred_idc 1): Clip1(((p0*w0 + p1*w1 + 2^logWD) >>
    (logWD + 1)) + ((o0 + o1 + 1) >> 1)).  ``e0``/``e1`` = (weight,
    offset) for list 0 / list 1."""
    w0, o0 = e0
    w1, o1 = e1
    v = (
        p0.astype(np.int64) * w0 + p1.astype(np.int64) * w1 + (1 << logwd)
    ) >> (logwd + 1)
    return np.clip(v + ((o0 + o1 + 1) >> 1), 0, 255).astype(np.uint8)


def _emit_pred_weight_table_b(w, wp) -> None:
    """pred_weight_table for a B slice (7.3.3.2): denoms, then the
    list-0 entry, then the list-1 entry (one active picture per
    list).  ``wp`` = {"luma_denom", "chroma_denom", "l0": entry,
    "l1": entry} with entry = (lw, lo, (cw0, cw1), (co0, co1))."""
    w.ue(wp["luma_denom"])
    w.ue(wp["chroma_denom"])
    dl, dc = 1 << wp["luma_denom"], 1 << wp["chroma_denom"]
    for entry in (wp["l0"], wp["l1"]):
        lw, lo, cw, co = entry
        if (lw, lo) == (dl, 0):
            w.u(0, 1)
        else:
            w.u(1, 1)
            w.se(lw)
            w.se(lo)
        if tuple(cw) == (dc, dc) and tuple(co) == (0, 0):
            w.u(0, 1)
        else:
            w.u(1, 1)
            for j in (0, 1):
                w.se(cw[j])
                w.se(co[j])


def _parse_pred_weight_table_b(r) -> dict:
    ld = r.ue("luma_log2_weight_denom")
    cd = r.ue("chroma_log2_weight_denom")
    if ld > 7 or cd > 7:
        raise ValueError(f"log2 weight denom {max(ld, cd)} > 7")
    entries = []
    for lx in (0, 1):
        lw, lo = 1 << ld, 0
        if r.u(1, f"luma_weight_l{lx}_flag"):
            lw = r.se(f"luma_weight_l{lx}")
            lo = r.se(f"luma_offset_l{lx}")
        cw, co = [1 << cd, 1 << cd], [0, 0]
        if r.u(1, f"chroma_weight_l{lx}_flag"):
            for j in (0, 1):
                cw[j] = r.se(f"chroma_weight_l{lx}")
                co[j] = r.se(f"chroma_offset_l{lx}")
        for v in (lw, lo, *cw, *co):
            if not -128 <= v <= 127:
                raise ValueError(f"weight/offset {v} out of range -128..127")
        entries.append((lw, lo, tuple(cw), tuple(co)))
    return {
        "luma_denom": ld,
        "chroma_denom": cd,
        "l0": entries[0],
        "l1": entries[1],
    }


def implicit_bi_weights(
    poc_cur: int, poc0: int, poc1: int
) -> tuple[int, int]:
    """IMPLICIT weighted-bi weights (spec 8.4.2.3.1,
    weighted_bipred_idc 2): (w0, w1) derived from picture-order-count
    distances — the 8.4.1.2.3 DistScaleFactor recursion with the
    default fallback w0 = w1 = 32 when td is zero or the scale leaves
    [-64, 128] after >> 2.  logWD is fixed at 5 and offsets at 0; a B
    frame closer to its future anchor weights list 1 harder, exactly
    distance-proportional."""
    clip3 = lambda lo, hi, v: max(lo, min(hi, v))  # noqa: E731
    tb = clip3(-128, 127, poc_cur - poc0)
    td = clip3(-128, 127, poc1 - poc0)
    if td == 0:
        return 32, 32
    tx = _div_trunc(16384 + abs(td) // 2, td)
    dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return 32, 32
    return 64 - w1, w1


def _predict_b_mb_wp(refs, mx, my, mode, mv0, mv1, wp):
    """Weighted twin of :func:`_predict_b_mb` (explicit B weights):
    single-list modes weight per 8.4.2.3.1, bi per 8.4.2.3.2."""
    if wp is None:
        return _predict_b_mb(refs, mx, my, mode, mv0, mv1)
    if wp.get("implicit"):
        # implicit weighting applies ONLY to bi-predicted partitions;
        # single-list prediction stays default (8.4.2.3.1)
        if mode in (1, 2):
            return _predict_b_mb(refs, mx, my, mode, mv0, mv1)
        w0, w1 = wp["w0"], wp["w1"]
        p0 = mc_predict_mb(*refs[0], mx, my, mv0)
        p1 = mc_predict_mb(*refs[1], mx, my, mv1)
        return tuple(
            _wp_bi_block(a, b, (w0, 0), (w1, 0), 5)
            for a, b in zip(p0, p1)
        )
    ld, cdn = wp["luma_denom"], wp["chroma_denom"]
    if mode in (1, 2):
        ref = refs[0] if mode == 1 else refs[1]
        lw, lo, cw, co = wp["l0"] if mode == 1 else wp["l1"]
        py, pcb, pcr = mc_predict_mb(*ref, mx, my, mv0 if mode == 1 else mv1)
        return (
            _wp_block(py, lw, lo, ld),
            _wp_block(pcb, cw[0], co[0], cdn),
            _wp_block(pcr, cw[1], co[1], cdn),
        )
    p0 = mc_predict_mb(*refs[0], mx, my, mv0)
    p1 = mc_predict_mb(*refs[1], mx, my, mv1)
    lw0, lo0, cw0, co0 = wp["l0"]
    lw1, lo1, cw1, co1 = wp["l1"]
    return (
        _wp_bi_block(p0[0], p1[0], (lw0, lo0), (lw1, lo1), ld),
        _wp_bi_block(p0[1], p1[1], (cw0[0], co0[0]), (cw1[0], co1[0]), cdn),
        _wp_bi_block(p0[2], p1[2], (cw0[1], co0[1]), (cw1[1], co1[1]), cdn),
    )


def spatial_direct(grids, mx, my, mb_w, col_motion):
    """Spatial direct-mode motion for a whole 16x16 B macroblock (spec
    8.4.1.2.2 with one picture per list): ({0: mvL0, 1: mvL1},
    {0: predFlagL0, 1: predFlagL1}).

    refIdxLX = the minimum non-negative A/B/C neighbour refIdx per
    list (0 or -1 here); when BOTH lists draw -1 the macroblock
    bi-predicts from picture 0 of each list with zero MVs
    (directZeroPredictionFlag). Otherwise each predicted list takes
    the 8.4.1.3 median — zeroed by colZeroFlag: the co-located
    macroblock of RefPicList1[0] is inter with |mv| <= 1 quarter
    sample per component (stationary co-located content anchors the
    direct prediction). ``col_motion`` is that picture's (mvs, inter)
    grid pair; None means it has no inter motion anywhere (an
    all-intra/IDR anchor) — colZeroFlag 0, exactly the spec's
    intra-co-located case."""
    refs = {}
    for lx in (0, 1):
        a, b, c = _neighbor(grids[lx][0], grids[lx][1], mx, my, mb_w)
        refs[lx] = min((n[2] for n in (a, b, c) if n[2] >= 0), default=-1)
    if refs[0] < 0 and refs[1] < 0:
        return {0: (0, 0), 1: (0, 0)}, {0: True, 1: True}
    col_zero = False
    if col_motion is not None:
        col_mvs, col_inter = col_motion
        if col_inter[my][mx]:
            cmv = col_mvs[my][mx]
            col_zero = abs(cmv[0]) <= 1 and abs(cmv[1]) <= 1
    mvs_out, pred = {}, {}
    for lx in (0, 1):
        pred[lx] = refs[lx] >= 0
        if not pred[lx] or col_zero:
            mvs_out[lx] = (0, 0)
        else:
            mvs_out[lx] = mv_pred_16x16(*grids[lx], mx, my, mb_w)
    return mvs_out, pred


def spatial_direct4(m4s, mx, my, col_motion):
    """Spatial direct-mode motion for a whole 16x16 B macroblock on
    the per-list 4x4 motion state (spec 8.4.1.2.2 with one picture per
    list): the Motion4 twin of :func:`spatial_direct` — identical
    output on pictures whose macroblocks are all 16x16 (the per-MB
    A/B/C neighbours coincide with the 4x4-grid ones there), and
    partition-exact when 16x8/8x16 macroblocks give a neighbour MB
    different motion per cell. ``m4s`` = {0: Motion4, 1: Motion4}."""
    refs = {}
    for lx in (0, 1):
        a, b, c = _neighbors4(m4s[lx], 4 * mx, 4 * my, 4)
        refs[lx] = min((n[2] for n in (a, b, c) if n[2] >= 0), default=-1)
    if refs[0] < 0 and refs[1] < 0:
        return {0: (0, 0), 1: (0, 0)}, {0: True, 1: True}
    col_zero = False
    if col_motion is not None:
        col_mvs, col_inter = col_motion
        if col_inter[my][mx]:
            cmv = col_mvs[my][mx]
            col_zero = abs(cmv[0]) <= 1 and abs(cmv[1]) <= 1
    mvs_out, pred = {}, {}
    for lx in (0, 1):
        pred[lx] = refs[lx] >= 0
        if not pred[lx] or col_zero:
            mvs_out[lx] = (0, 0)
        else:
            mvs_out[lx] = mv_pred_part(
                m4s[lx], 4 * mx, 4 * my, 4, 4, 0, "16x16"
            )
    return mvs_out, pred


#: Table 7-14 two-partition B macroblock types 4..21: per-partition
#: prediction modes as _predict_b_mb ints (1 = L0, 2 = L1, 3 = Bi),
#: row index (mb_type - 4) // 2; odd mb_type = 8x16, even = 16x8
_B_PART_MODES = (
    (1, 1), (2, 2), (1, 2), (2, 1), (1, 3), (2, 3), (3, 1), (3, 2), (3, 3),
)
#: per-partition (ox, oy, w, h, mv-pred kind) in luma pixels
_B_PART_GEOM_16x8 = ((0, 0, 16, 8, "16x8t"), (0, 8, 16, 8, "16x8b"))
_B_PART_GEOM_8x16 = ((0, 0, 8, 16, "8x16l"), (8, 0, 8, 16, "8x16r"))

#: Table 7-18 B sub_mb_type -> (_predict mode int 1=L0/2=L1/3=Bi,
#: _SUB_PARTS shape key 0=8x8/1=8x4/2=4x8/3=4x4).  sub_mb_type 0
#: (B_Direct_8x8) CLASSIFIES: per-quadrant direct needs the 8.4.1.2
#: derivation at sub-macroblock granularity this decoder doesn't model.
_B_SUB_MODES = {
    1: (1, 0), 2: (2, 0), 3: (3, 0),
    4: (1, 1), 5: (1, 2), 6: (2, 1), 7: (2, 2), 8: (3, 1), 9: (3, 2),
    10: (1, 3), 11: (2, 3), 12: (3, 3),
}
_B_SUB_CODE = {v: k for k, v in _B_SUB_MODES.items()}


def _predict_b_parts(refs, mx, my, parts, wp=None):
    """Assemble one B macroblock's (py, pcb, pcr) prediction from
    partitions ``[(ox, oy, w, h, pmode, {lx: mv})]`` — per partition a
    single-list MC block or the bi combination (8.4.2.3), chroma at
    halved geometry with the shared eighth-sample MVs.  ``wp`` (the B
    explicit weight table, weighted_bipred_idc 1) applies 8.4.2.3.1
    per single-list block and 8.4.2.3.2 per bi block AFTER
    interpolation; None = default-weighted averaging."""
    py = np.empty((16, 16), dtype=np.uint8)
    pcb = np.empty((8, 8), dtype=np.uint8)
    pcr = np.empty((8, 8), dtype=np.uint8)
    for ox, oy, pw, ph, pmode, mvs in parts:
        blocks, used = [], []
        for lx in (0, 1):
            if pmode == 3 or pmode == 1 + lx:
                ry, rcb, rcr = refs[lx]
                xq = 4 * (16 * mx + ox) + mvs[lx][0]
                yq = 4 * (16 * my + oy) + mvs[lx][1]
                blocks.append(
                    (
                        mc_luma(ry, xq, yq, ph, pw),
                        mc_chroma(rcb, xq, yq, ph // 2, pw // 2),
                        mc_chroma(rcr, xq, yq, ph // 2, pw // 2),
                    )
                )
                used.append(lx)
        if len(blocks) == 1:
            blk = blocks[0]
            if wp is not None and wp.get("implicit"):
                pass  # implicit weights never touch single-list blocks
            elif wp is not None:
                lw, lo, cw, co = wp["l0"] if used[0] == 0 else wp["l1"]
                blk = (
                    _wp_block(blk[0], lw, lo, wp["luma_denom"]),
                    _wp_block(blk[1], cw[0], co[0], wp["chroma_denom"]),
                    _wp_block(blk[2], cw[1], co[1], wp["chroma_denom"]),
                )
        elif wp is None:
            blk = tuple(_bi_avg(a, b) for a, b in zip(*blocks))
        elif wp.get("implicit"):
            w0, w1 = wp["w0"], wp["w1"]
            blk = tuple(
                _wp_bi_block(a, b, (w0, 0), (w1, 0), 5)
                for a, b in zip(*blocks)
            )
        else:
            lw0, lo0, cw0, co0 = wp["l0"]
            lw1, lo1, cw1, co1 = wp["l1"]
            ld, cdn = wp["luma_denom"], wp["chroma_denom"]
            b0, b1 = blocks
            blk = (
                _wp_bi_block(b0[0], b1[0], (lw0, lo0), (lw1, lo1), ld),
                _wp_bi_block(
                    b0[1], b1[1], (cw0[0], co0[0]), (cw1[0], co1[0]), cdn
                ),
                _wp_bi_block(
                    b0[2], b1[2], (cw0[1], co0[1]), (cw1[1], co1[1]), cdn
                ),
            )
        py[oy : oy + ph, ox : ox + pw] = blk[0]
        pcb[oy // 2 : (oy + ph) // 2, ox // 2 : (ox + pw) // 2] = blk[1]
        pcr[oy // 2 : (oy + ph) // 2, ox // 2 : (ox + pw) // 2] = blk[2]
    return py, pcb, pcr


def _div_trunc(a: int, b: int) -> int:
    """Spec integer division: truncation toward zero (Python's // is
    floor — they differ on negative quotients, and 8.4.1.2.3's tx
    formula is sign-sensitive)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def temporal_direct(
    col_motion, mx: int, my: int, poc_cur: int, poc0: int, poc1: int
):
    """TEMPORAL direct-mode motion for a whole 16x16 B macroblock
    (spec 8.4.1.2.3 with one short-term picture per list, macroblock
    granularity): the co-located L0 motion of RefPicList1[0] is scaled
    by picture-order-count distances —

        tb = Clip3(-128, 127, poc_cur - poc0)
        td = Clip3(-128, 127, poc1  - poc0)
        tx = (16384 + Abs(td/2)) / td                 (trunc division)
        DistScaleFactor = Clip3(-1024, 1023, (tb*tx + 32) >> 6)
        mvL0 = (DistScaleFactor * mvCol + 128) >> 8   (per component)
        mvL1 = mvL0 - mvCol

    both lists always predict from refIdx 0.  An intra or absent
    co-located macroblock contributes mvCol = (0, 0) (8.4.1.2.3's
    colRefIdx/ mvCol zeroing), and td == 0 degrades to the spec's
    long-term shape mvL0 = mvCol, mvL1 = 0.  Granularity note: this
    operates on the exported per-MB motion grid (_export_mb_motion) —
    exact for 16x16-coded anchors (everything this repo's encoders
    emit), a documented top-left-cell approximation for partitioned
    anchors, same contract as the spatial path's colZeroFlag.
    Returns ({0: mvL0, 1: mvL1}, {0: True, 1: True})."""
    mv_col = (0, 0)
    if col_motion is not None:
        col_mvs, col_inter = col_motion
        if col_inter[my][mx]:
            mv_col = col_mvs[my][mx]
    clip3 = lambda lo, hi, v: max(lo, min(hi, v))  # noqa: E731
    tb = clip3(-128, 127, poc_cur - poc0)
    td = clip3(-128, 127, poc1 - poc0)
    if td == 0:
        return {0: tuple(mv_col), 1: (0, 0)}, {0: True, 1: True}
    tx = _div_trunc(16384 + abs(td) // 2, td)
    dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    mv0 = ((dsf * mv_col[0] + 128) >> 8, (dsf * mv_col[1] + 128) >> 8)
    mv1 = (mv0[0] - mv_col[0], mv0[1] - mv_col[1])
    return {0: mv0, 1: mv1}, {0: True, 1: True}


def _direct_mode(pred: dict) -> int:
    """_predict_b_mb mode int for direct predFlags: bi when both
    lists predict, else the single predicted list."""
    if pred[0] and pred[1]:
        return 3
    return 1 if pred[0] else 2


# --- inter coded residuals (spec 7.3.5.3 / 8.5.12, Table 9-4 inter) ----------

#: Table 9-4 codeNum -> coded_block_pattern for Inter prediction modes
#: (the column beside h264intra's _CBP_INTRA; JM NCBP[1][k][1])
_CBP_INTER = (
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
)
_CBP_INTER_CODE = {cbp: k for k, cbp in enumerate(_CBP_INTER)}
assert sorted(_CBP_INTER) == list(range(48)), "Table 9-4 inter: not a permutation"


def _quant_inter_luma(cur: np.ndarray, pred: np.ndarray, qp: int):
    """16x16 luma residual -> (cbp_luma, 16 full-scan level lists in Z
    block order). Inter blocks carry their DC inside the 4x4 core
    transform (no Hadamard pass), so each block is quant4 over all 16
    positions. An 8x8 whose four blocks all quantize to zero clears its
    cbp bit and codes nothing (7.4.5)."""
    from flow_indexer_spark.operators.h264intra import fwd4, quant4

    res = cur.astype(np.int64) - pred.astype(np.int64)
    levels = []
    for bx, by in _Z4:
        w = fwd4(res[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4])
        levels.append(quant4(w, qp, skip_dc=False))
    cbp = 0
    for i8 in range(4):
        if any(c for z in range(4 * i8, 4 * i8 + 4) for c in levels[z]):
            cbp |= 1 << i8
    return cbp, levels


def _recon_inter_mb(
    py: np.ndarray,
    pcb: np.ndarray,
    pcr: np.ndarray,
    cbp: int,
    luma_levels,
    cdcs,
    cacs,
    qp: int,
    qpc: int,
):
    """Prediction planes + decoded levels -> reconstructed (y, cb, cr)
    for one macroblock. Shared by encoder and decoder so their integer
    reconstruction chains agree by construction."""
    from flow_indexer_spark.operators.h264intra import (
        luma4_residual,
        recon_chroma_comp,
    )

    ry = py.astype(np.int64).copy()
    for z, (bx, by) in enumerate(_Z4):
        if not cbp & (1 << (z // 4)):
            continue
        if any(luma_levels[z]):
            ry[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] += luma4_residual(
                luma_levels[z], qp
            )
    out_c = []
    for comp, pc in ((0, pcb), (1, pcr)):
        if cbp >> 4:
            cres = recon_chroma_comp(cdcs[comp], cacs[comp], qpc)
            out_c.append(np.clip(pc.astype(np.int64) + cres, 0, 255))
        else:
            out_c.append(pc.astype(np.int64))
    return (
        np.clip(ry, 0, 255).astype(np.uint8),
        out_c[0].astype(np.uint8),
        out_c[1].astype(np.uint8),
    )


def _emit_inter_residual(w, cbp, luma_levels, cdcs, cacs, mx, my, nzc):
    """Write one inter MB's residual section (7.3.5.3 order: coded
    8x8s' LumaLevel4x4 blocks in Z scan, then chroma DC, then chroma
    AC), updating the nC context planes exactly as decode will."""
    from flow_indexer_spark.operators import h264cavlc as cavlc
    from flow_indexer_spark.operators.h264intra import _emit_chroma

    for z, (bx, by) in enumerate(_Z4):
        gx, gy = 4 * mx + bx, 4 * my + by
        if cbp & (1 << (z // 4)):
            cavlc.encode_block(
                w, luma_levels[z], cavlc.nc_from_plane(nzc.y, gx, gy)
            )
            nzc.y[gy, gx] = sum(1 for c in luma_levels[z] if c)
        else:
            nzc.y[gy, gx] = 0
    _emit_chroma(w, cbp >> 4, cdcs, cacs, mx, my, nzc)


def _parse_inter_residual(r, cbp, mx, my, nzc):
    """Read one inter MB's residual section; the exact inverse of
    :func:`_emit_inter_residual`. Returns (luma_levels, cdcs, cacs)."""
    from flow_indexer_spark.operators import h264cavlc as cavlc
    from flow_indexer_spark.operators.h264intra import _decode_chroma_coeffs

    luma_levels = []
    for z, (bx, by) in enumerate(_Z4):
        gx, gy = 4 * mx + bx, 4 * my + by
        if cbp & (1 << (z // 4)):
            blk = cavlc.decode_block(
                r, cavlc.nc_from_plane(nzc.y, gx, gy), 16
            )
            nzc.y[gy, gx] = sum(1 for c in blk if c)
        else:
            blk = [0] * 16
            nzc.y[gy, gx] = 0
        luma_levels.append(blk)
    cdcs, cacs = _decode_chroma_coeffs(r, cbp >> 4, mx, my, nzc)
    return luma_levels, cdcs, cacs


# --- P-slice encoder ---------------------------------------------------------


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _sad_dc(a: np.ndarray, b: np.ndarray) -> int:
    """Mean-removed SAD: a flat luminance offset between the block and
    its candidate costs ONE cheap DC coefficient to code, while texture
    misalignment costs many AC coefficients — so the partition mode
    decision matches textures, not offsets. (Plain SAD goes blind to
    alignment under a large DC shift: |delta + eps| sums to ~|delta|*N
    for zero-mean eps, making every partitioning tie.)"""
    d = a.astype(np.int64) - b.astype(np.int64)
    return int(np.abs(d - int(np.round(d.mean()))).sum())


def _search_block(
    cur: np.ndarray,
    ref_y: np.ndarray,
    px: int,
    py: int,
    search_range: int,
    quarter: bool,
    metric=_sad,
) -> tuple[int, int, int]:
    """Best quarter-sample MV for the luma block ``cur`` whose top-left
    pixel is (px, py): exhaustive integer-sample search in a
    +-search_range window under ``metric`` (plain SAD by default;
    :func:`_sad_dc` for the partition mode decision), then
    quarter-sample refinement (+-3 quarter steps both axes) through the
    decoder's own interpolation. Deterministic raster-order tie-break
    (first minimum wins). Returns (mvx, mvy, cost).

    The integer stage is one vectorized sliding-window pass: edge
    padding reproduces the clipped-index gather exactly (blocks are
    within-picture, so a window never overruns the pad), and np.argmin
    over the C-ordered (dy, dx) cost grid IS the raster-order
    first-minimum tie-break — byte-stability vs the scalar loop it
    replaced is pinned by tests/test_h264_parts.py."""
    h, w = cur.shape
    sr = search_range
    pad = np.pad(ref_y, sr, mode="edge").astype(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(pad, (h, w))[
        py : py + 2 * sr + 1, px : px + 2 * sr + 1
    ]
    diff = win - cur.astype(np.int64)
    if metric is _sad_dc:
        m = np.round(diff.mean(axis=(2, 3))).astype(np.int64)
        costs = np.abs(diff - m[..., None, None]).sum(axis=(2, 3))
    else:
        costs = np.abs(diff).sum(axis=(2, 3))
    flat = int(np.argmin(costs))
    dy = flat // costs.shape[1] - sr
    dx = flat % costs.shape[1] - sr
    best = (int(costs.reshape(-1)[flat]), dx, dy)
    bx, by = 4 * best[1], 4 * best[2]
    if not quarter:
        return bx, by, best[0]
    bestq = (best[0], bx, by)
    for qy in range(-3, 4):
        for qx in range(-3, 4):
            if qx == 0 and qy == 0:
                continue
            p = mc_luma(ref_y, 4 * px + bx + qx, 4 * py + by + qy, h, w)
            sad = metric(cur, p)
            if sad < bestq[0]:
                bestq = (sad, bx + qx, by + qy)
    return bestq[1], bestq[2], bestq[0]


def _search_mv(
    cur: np.ndarray,
    ref_y: np.ndarray,
    mx: int,
    my: int,
    search_range: int,
    quarter: bool,
) -> tuple[int, int]:
    """16x16 wrapper over :func:`_search_block` at MB (mx, my)."""
    mvx, mvy, _ = _search_block(
        cur, ref_y, 16 * mx, 16 * my, search_range, quarter
    )
    return mvx, mvy


#: deterministic mode-decision penalty per coded motion vector — a bits
#: proxy (each extra MV costs an mvd pair + mode signalling); ties and
#: near-ties resolve toward FEWER partitions
_MV_PENALTY = 96

#: penalty for referencing a picture other than list0[0] (the te(v)/
#: ue(v) ref_idx bits); ties resolve toward the most recent reference
_REF_PENALTY = 16


def _search_refs(blk, refs_y, px, py, search_range, quarter):
    """Best (mv, ref_idx, cost) for one block over every reference
    picture (mean-removed SAD + _REF_PENALTY per ref_idx step;
    deterministic — lower ref_idx wins ties)."""
    best = None
    for ri, ry in enumerate(refs_y):
        mvx, mvy, sad = _search_block(
            blk, ry, px, py, search_range, quarter, metric=_sad_dc
        )
        cost = sad + _REF_PENALTY * ri
        if best is None or cost < best[0]:
            best = (cost, (mvx, mvy), ri)
    return best[1], best[2], best[0]


def _decide_partitions(cur_y, refs_y, mx, my, search_range, quarter):
    """Per-MB partition mode decision: search every partitioning of
    Table 7-13/7-17 (x every reference picture) independently and take
    the minimum of mean-removed-SAD + 96 * n_motion_vectors
    + 16 * ref_idx, preferring fewer partitions on ties (evaluation
    order 16x16, 16x8, 8x16, 8x8; strict < to replace). Returns
    (mb_type, sub_types | None, sig_refs, parts): ``sig_refs`` is the
    ref_idx list in signalling order (one per MB partition, or one per
    8x8 quadrant for P_8x8), ``parts`` =
    [(ox, oy, w, h, kind, mv, ref_idx)] in decoding order."""
    x0, y0 = 16 * mx, 16 * my
    candidates = []
    for mb_type in (0, 1, 2):
        parts, sig_refs = [], []
        total = _MV_PENALTY * len(_MB_PARTS[mb_type])
        for ox, oy, w, h, kind in _MB_PARTS[mb_type]:
            blk = cur_y[oy : oy + h, ox : ox + w]
            mv, ri, cost = _search_refs(
                blk, refs_y, x0 + ox, y0 + oy, search_range, quarter
            )
            parts.append((ox, oy, w, h, kind, mv, ri))
            sig_refs.append(ri)
            total += cost
        candidates.append((total, mb_type, None, sig_refs, parts))
    # P_8x8: per-quadrant joint best (sub_mb_type, ref_idx) — the spec
    # signals ONE ref_idx per quadrant, shared by its sub-partitions
    sub_types, quad_refs, parts8, total8 = [], [], [], 0
    for qx, qy in _QUADS:
        best = None
        for ri in range(len(refs_y)):
            for st in range(4):
                cost = _MV_PENALTY * len(_SUB_PARTS[st]) + _REF_PENALTY * ri
                sub = []
                for sx, sy, w, h in _SUB_PARTS[st]:
                    ox, oy = qx + sx, qy + sy
                    blk = cur_y[oy : oy + h, ox : ox + w]
                    mvx, mvy, sad = _search_block(
                        blk, refs_y[ri], x0 + ox, y0 + oy,
                        search_range, quarter, metric=_sad_dc,
                    )
                    sub.append((ox, oy, w, h, "sub", (mvx, mvy), ri))
                    cost += sad
                if best is None or cost < best[0]:
                    best = (cost, st, ri, sub)
        total8 += best[0]
        sub_types.append(best[1])
        quad_refs.append(best[2])
        parts8.extend(best[3])
    candidates.append((total8, 3, sub_types, quad_refs, parts8))
    best = min(candidates, key=lambda c: (c[0], c[1]))
    return best[1], best[2], best[3], best[4]


def encode_p_slice(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    ref: tuple[np.ndarray, np.ndarray, np.ndarray],
    frame_num: int,
    qp: int = 12,
    search_range: int = 8,
    quarter: bool = True,
    intra_mbs: frozenset[tuple[int, int]] = frozenset(),
    log2_max_frame_num: int = 4,
    return_recon: bool = False,
    code_residual: bool = False,
    poc: tuple[int, int] | None = None,
    return_motion: bool = False,
    partitions: bool = False,
    return_stats: bool = False,
    weights: dict | None = None,
    l0_reorder: tuple | None = None,
):
    """Macroblock-aligned current planes + previous reconstruction ->
    one non-IDR P-slice NAL (nal_ref_idc 2, slice_type 5). With the
    default ``code_residual=False`` every inter macroblock is P_Skip or
    P_L0_16x16 with coded_block_pattern 0 (bitstream identical to the
    round-4 zero-residual encoder), so the reconstruction IS the
    motion-compensated prediction. ``code_residual=True`` quantizes the
    true prediction error (full-scan 4x4 core transform luma, Hadamard
    DC + AC chroma), codes it through CAVLC with the Table 9-4 inter
    cbp mapping, and reconstructs pred+residual — a macroblock only
    skips when its MV matches the P_Skip derivation AND the residual
    quantizes to nothing, as 7.4.4 requires. Either way decode must
    match ``return_recon`` byte-exactly. MBs named in ``intra_mbs``
    encode as Intra_16x16 refresh macroblocks (Table 7-13 mb_type
    offset 5).

    ``partitions=True`` enables the partitioned inter modes
    (P_L0_L0_16x8 / P_L0_L0_8x16 / P_8x8 with all four Table 7-17 sub
    partitionings): per-partition exhaustive motion search and a
    SAD + bits-proxy mode decision (:func:`_decide_partitions`), MV
    prediction per partition on the 4x4 grid with the 8.4.1.3
    directional rules. The default False keeps the bitstream
    byte-identical to the pre-partition encoder (pinned by
    tests/test_h264_parts.py). ``return_stats`` appends a dict of
    mb_type / sub_mb_type / skip counts so fixtures can assert the
    mode decision really used partitions.

    ``ref`` is a (y, cb, cr) planes tuple — or a LIST of them for
    multi-reference prediction: list0 order, most recent picture
    first (the default 8.2.4.2.1 P-list for a closed GOP where decode
    recency == PicNum order). With more than one reference the slice
    header overrides num_ref_idx_l0_active and every inter partition
    signals ref_idx_l0 as te(v); the per-block search tries every
    reference (+16 cost per ref_idx step, most recent wins ties).

    ``l0_reorder`` — a permutation of range(len(refs)) — emits the
    7.3.3.1 ref_pic_list_modification_l0 syntax whose 8.2.4.3.1
    replay builds RefPicList0 in exactly that order (abs-diff
    short-term commands chained through picNumL0Pred), and the
    encoder searches/predicts against the REORDERED list, so ref_idx
    0 can name any stored picture."""
    refs = ref if isinstance(ref, list) else [ref]
    if not 1 <= len(refs) <= 16:
        raise ValueError("reference list must hold 1..16 pictures")
    if l0_reorder is not None:
        if sorted(l0_reorder) != list(range(len(refs))):
            raise ValueError(
                "l0_reorder must be a permutation of range(len(refs))"
            )
        refs = [refs[k] for k in l0_reorder]
    ref_y, ref_cb, ref_cr = refs[0]
    n_active = len(refs)
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    if y.shape != (mb_h * 16, mb_w * 16) or cb.shape != (
        mb_h * 8,
        mb_w * 8,
    ) or cr.shape != cb.shape:
        raise ValueError("planes must be macroblock-aligned")
    for rf in refs:
        if (
            rf[0].shape != y.shape
            or rf[1].shape != cb.shape
            or rf[2].shape != cr.shape
        ):
            raise ValueError("reference planes must match the picture")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    qpc = chroma_qp(qp)
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(5)  # slice_type: P (all slices in picture)
    w.ue(0)  # pic_parameter_set_id
    w.u(frame_num % (1 << log2_max_frame_num), log2_max_frame_num)
    if poc is not None:
        w.u(poc[0] % (1 << poc[1]), poc[1])  # pic_order_cnt_lsb (poc_type 0)
    if n_active > 1:
        w.u(1, 1)  # num_ref_idx_active_override_flag
        w.ue(n_active - 1)  # num_ref_idx_l0_active_minus1
    else:
        w.u(0, 1)  # num_ref_idx_active_override_flag
    if l0_reorder is None:
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
    else:
        w.u(1, 1)  # ref_pic_list_modification_flag_l0
        for idc, v in _l0_modification_commands(l0_reorder, frame_num):
            w.ue(idc)
            w.ue(v)
        w.ue(3)  # end of modification loop
    if weights is not None:
        # explicit weighted prediction: the PPS this stream is wrapped
        # with must set weighted_pred_flag (make_pps(weighted_pred=True))
        _validate_weights(weights, n_active)
        _emit_pred_weight_table(w, weights, n_active)
    w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag (nal_ref_idc != 0)
    w.se(qp - 26)  # slice_qp_delta
    ry = np.zeros_like(y)
    rcb = np.zeros_like(cb)
    rcr = np.zeros_like(cr)
    m4 = Motion4(mb_w, mb_h)
    nzc = NzcCtx(mb_w, mb_h)
    stats = {
        "mb_types": {},
        "sub_types": {},
        "ref_idx": {},
        "skip": 0,
        "intra": 0,
    }
    skip_run = 0

    def _residual_for(mx, my, py, pcb, pcr):
        """(cbp, luma_levels, cdcs, cacs) for the MB at (mx, my) against
        the assembled prediction planes; cbp 0 when residuals are off."""
        if not code_residual:
            return 0, None, None, None
        from flow_indexer_spark.operators.h264intra import _quant_chroma_full

        cur_y = y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
        cbp, luma_levels = _quant_inter_luma(cur_y, py, qp)
        cdcs, cacs = {}, {}
        for comp, (plane, cpred) in enumerate(((cb, pcb), (cr, pcr))):
            src = plane[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
            cdcs[comp], cacs[comp] = _quant_chroma_full(
                src, cpred.astype(np.int64), qpc
            )
        any_ac = any(c for comp in cacs.values() for blk in comp for c in blk)
        any_dc = any(c for comp in cdcs.values() for c in comp)
        if any_ac:
            cbp |= 2 << 4
        elif any_dc:
            cbp |= 1 << 4
            cacs = {c: [[0] * 15] * 4 for c in cacs}
        else:
            cacs = {c: [[0] * 15] * 4 for c in cacs}
            cdcs = {c: [0, 0, 0, 0] for c in cdcs}
        return cbp, luma_levels, cdcs, cacs

    def _store_recon(mx, my, yy, ccb, ccr):
        ry[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = yy
        rcb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = ccb
        rcr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = ccr

    # every encoder-side quality comparison shares one metric: plain
    # SAD for the pinned single-reference 16x16 path, the DC-invariant
    # one once partitions or reference selection are in play (a flat
    # luminance step must not mask which prediction matches the
    # texture — the residual DC codes the step either way)
    met = _sad_dc if (partitions or n_active > 1) else _sad
    # the search scans WEIGHTED reference luma when explicit weighted
    # prediction is on (whole-plane weighting; the actual prediction
    # applies the spec's interpolate-then-weight order, which agrees
    # at integer positions and is residual-corrected elsewhere)
    if weights is None:
        search_y = [rf[0] for rf in refs]
    else:
        search_y = [
            _wp_block(
                rf[0],
                weights["refs"][ri][0],
                weights["refs"][ri][1],
                weights["luma_denom"],
            )
            for ri, rf in enumerate(refs)
        ]

    def _emit_cbp_and_residual(mx, my, py, pcb, pcr, cbp, ll, cdcs, cacs):
        w.ue(_CBP_INTER_CODE[cbp])  # coded_block_pattern (Table 9-4)
        if cbp:
            w.se(0)  # mb_qp_delta
            _emit_inter_residual(w, cbp, ll, cdcs, cacs, mx, my, nzc)
            _store_recon(
                mx, my,
                *_recon_inter_mb(py, pcb, pcr, cbp, ll, cdcs, cacs, qp, qpc),
            )
        else:
            _store_recon(mx, my, py, pcb, pcr)

    for my in range(mb_h):
        for mx in range(mb_w):
            cur_y = y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
            if (mx, my) in intra_mbs:
                w.ue(skip_run)
                skip_run = 0
                encode_i16_mb(
                    w, y, cb, cr, ry, rcb, rcr, mx, my, qp, qpc,
                    mb_type_base=5, nzc=nzc,
                )
                # intra MBs contribute (mv 0, ref -1) to later MV
                # predictions but ARE available (blocking the copy-A rule)
                m4.fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)
                stats["intra"] += 1
                continue
            if partitions:
                mb_type, sub_types, sig_refs, parts = _decide_partitions(
                    cur_y, search_y, mx, my, search_range, quarter
                )
            else:
                best = None
                for ri, _rf in enumerate(refs):
                    mvx, mvy, sad = _search_block(
                        cur_y, search_y[ri], 16 * mx, 16 * my, search_range,
                        quarter, metric=met,
                    )
                    cost = sad + _REF_PENALTY * ri
                    if best is None or cost < best[0]:
                        best = (cost, (mvx, mvy), ri)
                mb_type, sub_types = 0, None
                sig_refs = [best[2]]
                parts = [(0, 0, 16, 16, "16x16", best[1], best[2])]
            if mb_type == 0:
                mv, ri = parts[0][5], parts[0][6]
                smv = skip_mv4(m4, mx, my)
                if (mv, ri) != (smv, 0):
                    # skip-biased decision: take skip when it predicts
                    # as well as the searched MV
                    ps = mc_luma(
                        refs[0][0], 64 * mx + smv[0], 64 * my + smv[1], 16, 16
                    )
                    pm = mc_luma(
                        refs[ri][0], 64 * mx + mv[0], 64 * my + mv[1], 16, 16
                    )
                    if weights is not None:
                        ld = weights["luma_denom"]
                        w0 = weights["refs"][0]
                        wr = weights["refs"][ri]
                        ps = _wp_block(ps, w0[0], w0[1], ld)
                        pm = _wp_block(pm, wr[0], wr[1], ld)
                    if met(cur_y, ps) <= met(cur_y, pm):
                        mv, ri = smv, 0
                py, pcb, pcr = _wp_planes(
                    mc_predict_mb(*refs[ri], mx, my, mv), weights, ri
                )
                cbp, ll, cdcs, cacs = _residual_for(mx, my, py, pcb, pcr)
                if mv == smv and ri == 0 and cbp == 0:
                    skip_run += 1
                    stats["skip"] += 1
                    _store_recon(mx, my, py, pcb, pcr)
                else:
                    w.ue(skip_run)
                    skip_run = 0
                    mvp = mv_pred_part(m4, 4 * mx, 4 * my, 4, 4, ri, "16x16")
                    w.ue(0)  # mb_type: P_L0_16x16
                    _write_ref_idx(w, ri, n_active)
                    w.se(mv[0] - mvp[0])  # mvd_l0 x
                    w.se(mv[1] - mvp[1])  # mvd_l0 y
                    stats["mb_types"][0] = stats["mb_types"].get(0, 0) + 1
                    stats["ref_idx"][ri] = stats["ref_idx"].get(ri, 0) + 1
                    _emit_cbp_and_residual(
                        mx, my, py, pcb, pcr, cbp, ll, cdcs, cacs
                    )
                m4.fill(4 * mx, 4 * my, 4, 4, mv, ri)
                continue
            # partitioned macroblock
            w.ue(skip_run)
            skip_run = 0
            w.ue(mb_type)
            stats["mb_types"][mb_type] = stats["mb_types"].get(mb_type, 0) + 1
            if mb_type == 3:
                for st in sub_types:
                    w.ue(st)  # sub_mb_type (Table 7-17, P)
                    stats["sub_types"][st] = stats["sub_types"].get(st, 0) + 1
            # ref_idx loop (7.3.5.1/7.3.5.2: ALL ref_idx_l0 precede the
            # mvd loop; one per MB partition / per 8x8 quadrant)
            for ri in sig_refs:
                _write_ref_idx(w, ri, n_active)
                stats["ref_idx"][ri] = stats["ref_idx"].get(ri, 0) + 1
            # mvd loop in decoding order, grid filled progressively so
            # each partition's prediction sees its predecessors
            for ox, oy, pw, ph, kind, mv, ri in parts:
                x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                mvp = mv_pred_part(m4, x4, y4, pw // 4, ph // 4, ri, kind)
                w.se(mv[0] - mvp[0])
                w.se(mv[1] - mvp[1])
                m4.fill(x4, y4, pw // 4, ph // 4, mv, ri)
            py, pcb, pcr = mc_predict_parts(
                refs, mx, my,
                [(p[0], p[1], p[2], p[3], p[5], p[6]) for p in parts],
                wp=weights,
            )
            cbp, ll, cdcs, cacs = _residual_for(mx, my, py, pcb, pcr)
            _emit_cbp_and_residual(mx, my, py, pcb, pcr, cbp, ll, cdcs, cacs)
    if skip_run:
        w.ue(skip_run)  # trailing skip run
    nal = rbsp_to_nal(0x41, w.rbsp_trailing())  # nal_ref_idc 2, type 1
    out = (nal,)
    if return_recon:
        out += ((ry, rcb, rcr),)
    if return_motion:
        out += (_export_mb_motion(m4, mb_w, mb_h),)
    if return_stats:
        out += (stats,)
    return out if len(out) > 1 else nal


# --- P-slice decoder ---------------------------------------------------------


def _l0_modification_commands(order, frame_num: int):
    """Modification commands (idc, abs_diff_pic_num_minus1) whose
    8.2.4.3.1 replay builds RefPicList0 = [refs[k] for k in order]
    from the default recency list, CurrPicNum = ``frame_num``:
    each command moves the short-term picture with PicNum =
    frame_num - 1 - k to the next list position; picNumL0Pred chains
    through the commands exactly as the decoder re-derives it."""
    cmds = []
    pred = frame_num
    for k in order:
        pic_num = frame_num - 1 - k
        diff = pred - pic_num
        if diff == 0:
            raise ValueError("modification cannot re-target picNumL0Pred")
        cmds.append((0, diff - 1) if diff > 0 else (1, -diff - 1))
        pred = pic_num
    return cmds


def _apply_l0_modification(r, frame_num: int, max_pic_num: int, n_refs: int):
    """Parse the ref_pic_list_modification_l0 loop (7.3.3.1) and apply
    8.2.4.3.1 on RECENCY INDICES: returns the modified list (index k =
    k+1 pictures back, PicNum = frame_num - 1 - k).  Short-term
    abs-diff commands only; idc 2 (long-term) CLASSIFIES — this
    decoder keeps no long-term pictures.  A command naming an absent
    PicNum is a ValueError (corrupt or non-conformant stream)."""
    lst = list(range(n_refs))
    pred = frame_num
    ins = 0
    while True:
        idc = r.ue("modification_of_pic_nums_idc")
        if idc == 3:
            break
        if idc == 2:
            raise NotImplementedError(
                "long-term reference picture list modification"
            )
        if idc > 3:
            raise ValueError(f"modification_of_pic_nums_idc {idc} invalid")
        diff = r.ue("abs_diff_pic_num_minus1") + 1
        nowrap = (pred - diff) % max_pic_num if idc == 0 else (
            pred + diff
        ) % max_pic_num
        pred = nowrap
        pic_num = nowrap - max_pic_num if nowrap > frame_num else nowrap
        k = frame_num - 1 - pic_num
        if not 0 <= k < n_refs:
            raise ValueError(
                f"list modification names PicNum {pic_num}: no such "
                "short-term reference picture"
            )
        # insert at the running position, drop the LATER duplicate
        # (8.2.4.3.1's shift-and-filter; earlier duplicates are legal)
        lst = lst[:ins] + [k] + [x for x in lst[ins:] if x != k]
        ins += 1
    return lst


def decode_p_slice(
    nal: bytes,
    sps: dict,
    ref: tuple[np.ndarray, np.ndarray, np.ndarray],
    return_motion: bool = False,
    weighted: bool = False,
):
    """Non-IDR P-slice NAL + previous reconstructed planes -> (y, cb,
    cr). Decodes P_Skip runs, every Table 7-13 inter mb_type —
    P_L0_16x16, P_L0_L0_16x8, P_L0_L0_8x16, P_8x8(/ref0) with all
    Table 7-17 sub partitionings, any coded_block_pattern (CAVLC
    residuals added to the motion-compensated prediction) — through
    real per-partition MV prediction on the 4x4 grid +
    quarter/eighth-sample interpolation, and intra macroblocks
    through the h264intra path;
    narrower tools classify from the syntax element that requires
    them. ``return_motion=True`` appends this picture's (mvs, inter)
    grid pair — the co-located motion B slices need for the 8.4.1.2.2
    colZeroFlag when this picture is RefPicList1[0].

    ``ref`` is one (y, cb, cr) tuple or a LIST of them in list0 order
    (most recent first); a slice whose num_ref_idx override asks for
    more references than supplied classifies as ValueError."""
    refs = ref if isinstance(ref, list) else [ref]
    header, rbsp = nal_to_rbsp(nal)
    nal_type = header & 0x1F
    if nal_type == 5:
        raise ValueError("IDR slice handed to the P-slice decoder")
    if nal_type != 1:
        raise ValueError(f"not a coded-slice NAL (type {nal_type})")
    ref_y, ref_cb, ref_cr = refs[0]
    r = _BitReader(rbsp)
    if r.ue("first_mb_in_slice") != 0:
        raise NotImplementedError("multi-slice pictures")
    slice_type = r.ue("slice_type")
    if slice_type % 5 == 1:
        raise ValueError(
            "B slice handed to the P-slice decoder (decode_b_slice / "
            "GopDecoder route it)"
        )
    if slice_type % 5 != 0:
        raise ValueError(f"slice_type {slice_type} invalid in a non-IDR NAL")
    r.ue("pic_parameter_set_id")
    frame_num = r.u(sps["log2_max_frame_num"], "frame_num")
    if sps.get("poc_type", 2) == 0:
        r.u(sps["log2_max_poc_lsb"], "pic_order_cnt_lsb")
    n_active = 1
    if r.u(1, "num_ref_idx_active_override_flag"):
        n_active = r.ue("num_ref_idx_l0_active_minus1") + 1
        if n_active > 16:
            raise ValueError(f"num_ref_idx_l0_active {n_active} > 16")
    if n_active > len(refs):
        raise ValueError(
            f"slice needs {n_active} reference pictures, "
            f"{len(refs)} available"
        )
    if r.u(1, "ref_pic_list_modification_flag_l0"):
        order = _apply_l0_modification(
            r, frame_num, 1 << sps["log2_max_frame_num"], len(refs)
        )
        refs = [refs[k] for k in order]
        ref_y, ref_cb, ref_cr = refs[0]
    # explicit weighted prediction (PPS weighted_pred_flag, which the
    # caller resolves — GopDecoder reads it from the avcC's PPS)
    wp = _parse_pred_weight_table(r, n_active) if weighted else None
    if header >> 5:  # nal_ref_idc != 0
        if r.u(1, "adaptive_ref_pic_marking_mode_flag"):
            raise NotImplementedError("adaptive reference picture marking")
    qp = 26 + r.se("slice_qp_delta")
    if not 0 <= qp <= 51:
        raise ValueError(f"slice QP {qp} out of range")
    mb_w, mb_h = sps["mb_width"], sps["mb_height"]
    for rf in refs:
        if rf[0].shape != (mb_h * 16, mb_w * 16):
            raise ValueError("reference planes do not match the SPS geometry")
    if mb_w * mb_h > max(len(rbsp) * 64, 1 << 26):
        # hostile-SPS allocation gate: even an all-skip picture costs
        # >= 1 bit per ~64 MBs (the skip-run exp-golomb length)
        raise ValueError(
            f"SPS claims {mb_w}x{mb_h} macroblocks but the slice has "
            f"only {len(rbsp)} RBSP bytes: corrupt stream"
        )
    y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    m4 = Motion4(mb_w, mb_h)
    modes = np.full((4 * mb_h, 4 * mb_w), -1, dtype=np.int8)
    nzc = NzcCtx(mb_w, mb_h)  # skipped/uncoded blocks stay TotalCoeff 0
    n_mbs = mb_w * mb_h
    addr = 0

    def _store_pred(mx, my, py, pcb, pcr):
        y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = py
        cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcb
        cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = pcr

    def _recon_skip(mx: int, my: int) -> None:
        mv = skip_mv4(m4, mx, my)
        planes = mc_predict_mb(ref_y, ref_cb, ref_cr, mx, my, mv)
        _store_pred(mx, my, *_wp_planes(planes, wp, 0))
        m4.fill(4 * mx, 4 * my, 4, 4, mv, 0)

    def _apply_residual(mx, my, py, pcb, pcr):
        """Parse coded_block_pattern (+ residual when coded) and store
        the reconstruction — the shared tail of every inter mb_type."""
        nonlocal qp
        code = r.ue("coded_block_pattern")
        if code > 47:
            raise ValueError(f"coded_block_pattern codeNum {code} > 47")
        cbp = _CBP_INTER[code]
        if cbp == 0:
            _store_pred(mx, my, py, pcb, pcr)
            return
        qp += r.se("mb_qp_delta")
        if not 0 <= qp <= 51:
            raise ValueError(f"mb_qp_delta drove QP to {qp}")
        qpc = chroma_qp(qp)
        luma_levels, cdcs, cacs = _parse_inter_residual(r, cbp, mx, my, nzc)
        _store_pred(
            mx, my,
            *_recon_inter_mb(py, pcb, pcr, cbp, luma_levels, cdcs, cacs, qp, qpc),
        )

    while addr < n_mbs:
        run = r.ue("mb_skip_run")
        if run > n_mbs - addr:
            raise ValueError("mb_skip_run overruns the picture")
        for _ in range(run):
            mx, my = addr % mb_w, addr // mb_w
            _recon_skip(mx, my)
            addr += 1
        if addr == n_mbs:
            break
        if not r.more_data():
            raise ValueError("slice data ends before the picture is full")
        mx, my = addr % mb_w, addr // mb_w
        mb_type = r.ue("mb_type")
        if mb_type >= 5:
            if mb_type > 30:
                raise ValueError(f"invalid P-slice mb_type {mb_type}")
            qp = decode_i_mb(
                r, mb_type - 5, qp, y, cb, cr, mx, my, modes, nzc
            )
            # intra MB: available with (mv 0, ref -1) for neighbours
            m4.fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)
        elif mb_type == 0:
            ri = _read_ref_idx(r, n_active)
            mvp = mv_pred_part(m4, 4 * mx, 4 * my, 4, 4, ri, "16x16")
            mvd = (r.se("mvd_l0 x"), r.se("mvd_l0 y"))
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            m4.fill(4 * mx, 4 * my, 4, 4, mv, ri)
            py, pcb, pcr = _wp_planes(
                mc_predict_mb(*refs[ri], mx, my, mv), wp, ri
            )
            _apply_residual(mx, my, py, pcb, pcr)
        elif mb_type <= 4:
            # P_L0_L0_16x8 / P_L0_L0_8x16 / P_8x8 / P_8x8ref0 (which
            # infers every quadrant's ref_idx as 0 and codes none)
            if mb_type in (1, 2):
                geometry = [
                    (ox, oy, pw, ph, kind, sig)
                    for sig, (ox, oy, pw, ph, kind) in enumerate(
                        _MB_PARTS[mb_type]
                    )
                ]
                n_sig = 2
            else:
                geometry = []
                for sig, (qx, qy) in enumerate(_QUADS):
                    st = r.ue("sub_mb_type")
                    if st > 3:
                        raise ValueError(
                            f"P sub_mb_type {st} > 3 (Table 7-17)"
                        )
                    geometry.extend(
                        (qx + sx, qy + sy, pw, ph, "sub", sig)
                        for sx, sy, pw, ph in _SUB_PARTS[st]
                    )
                n_sig = 4
            if mb_type == 4:
                sig_refs = [0] * n_sig
            else:
                sig_refs = [_read_ref_idx(r, n_active) for _ in range(n_sig)]
            parts = []
            for ox, oy, pw, ph, kind, sig in geometry:
                ri = sig_refs[sig]
                x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                mvp = mv_pred_part(m4, x4, y4, pw // 4, ph // 4, ri, kind)
                mvd = (r.se("mvd_l0 x"), r.se("mvd_l0 y"))
                mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                m4.fill(x4, y4, pw // 4, ph // 4, mv, ri)
                parts.append((ox, oy, pw, ph, mv, ri))
            py, pcb, pcr = mc_predict_parts(refs, mx, my, parts, wp=wp)
            _apply_residual(mx, my, py, pcb, pcr)
        else:  # pragma: no cover — unreachable (0..4 and >=5 covered)
            raise ValueError(f"invalid P-slice mb_type {mb_type}")
        addr += 1
    if return_motion:
        return y, cb, cr, _export_mb_motion(m4, mb_w, mb_h)
    return y, cb, cr


# --- B slices: bi-prediction (spec 8.4.2.3, Table 7-14) -----------------------


def _bi_avg(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """Default-weighted bi-prediction (weighted_bipred_idc 0, spec
    8.4.2.3.2 with logWD 5 / w0 = w1 = 32 / o = 0): the rounded
    average."""
    return ((p0.astype(np.int64) + p1.astype(np.int64) + 1) >> 1).astype(
        np.uint8
    )


def _predict_b_mb(refs, mx, my, mode, mv0, mv1):
    """Prediction planes for one B macroblock: mode 1 = B_L0_16x16,
    2 = B_L1_16x16, 3 = B_Bi_16x16."""
    ref0, ref1 = refs
    if mode == 1:
        return mc_predict_mb(*ref0, mx, my, mv0)
    if mode == 2:
        return mc_predict_mb(*ref1, mx, my, mv1)
    p0 = mc_predict_mb(*ref0, mx, my, mv0)
    p1 = mc_predict_mb(*ref1, mx, my, mv1)
    return tuple(_bi_avg(a, b) for a, b in zip(p0, p1))


def encode_b_slice(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
    ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
    frame_num: int,
    poc: tuple[int, int],
    qp: int = 12,
    search_range: int = 8,
    quarter: bool = True,
    code_residual: bool = False,
    intra_mbs: frozenset[tuple[int, int]] = frozenset(),
    log2_max_frame_num: int = 4,
    return_recon: bool = False,
    direct: bool = False,
    col_motion=None,
    direct_temporal: bool = False,
    ref_pocs: tuple[int, int] | None = None,
    stats: dict | None = None,
    partitions: bool = False,
    weights: dict | None = None,
    implicit_bi: bool = False,
):
    """Current planes + BOTH reference reconstructions (ref0 = the
    past picture in display order, list 0; ref1 = the future, list 1)
    -> one non-reference B-slice NAL (nal_ref_idc 0, slice_type 6).
    Every inter macroblock is B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
    (Table 7-14 types 1-3), mode-selected by SAD with the bi average
    preferred on ties; ``code_residual`` adds the same Table-9-4 /
    CAVLC residual layer as the P encoder. With ``direct=True`` the
    spatial direct derivation (8.4.1.2.2) joins the candidate set,
    preferred at equal SAD because it costs zero motion bits: a direct
    macroblock whose residual quantizes away joins a B_Skip run
    (mb_skip_run), otherwise it codes as B_Direct_16x16 (mb_type 0, no
    MVDs) + residual. ``col_motion`` is the future anchor's (mvs,
    inter) grid for colZeroFlag — None = intra co-located picture. A
    poc_type-0 SPS is REQUIRED (``poc`` = (lsb, bits)): reordered
    output under poc_type 2 is non-conformant. ``direct_temporal``
    switches the direct derivation to 8.4.1.2.3 TEMPORAL scaling
    (direct_spatial_mv_pred_flag 0); it needs ``ref_pocs`` =
    (poc_ref0, poc_ref1) and ``col_motion`` carrying RefPicList1[0]'s
    L0 motion — the current POC is ``poc[0]`` (lsb values must BE the
    POCs, i.e. no wrap inside the GOP, which these closed fixtures
    guarantee).  ``partitions=True`` enables the Table 7-14
    two-partition types 4..21 AND B_8x8 with Table 7-18 sub_mb_types
    1..12 in the mode decision (per-quadrant joint (shape, mode)
    search, strict-inequality adoption); the default False keeps the
    bitstream byte-identical to the pre-partition B encoder — the
    same stability discipline as the P encoder's flag."""
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    if (
        y.shape != (mb_h * 16, mb_w * 16)
        or cb.shape != (mb_h * 8, mb_w * 8)
        or cr.shape != cb.shape
        or ref0[0].shape != y.shape
        or ref1[0].shape != y.shape
    ):
        raise ValueError("planes must be macroblock-aligned and match refs")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    if direct_temporal and ref_pocs is None:
        raise ValueError("direct_temporal needs ref_pocs=(poc0, poc1)")
    if weights is not None:
        if implicit_bi:
            raise ValueError("weights and implicit_bi are exclusive")
        if not 0 <= weights["luma_denom"] <= 7 or not (
            0 <= weights["chroma_denom"] <= 7
        ):
            raise ValueError("log2 weight denom out of range 0..7")
        for lw, lo, cw, co in (weights["l0"], weights["l1"]):
            for v in (lw, lo, *cw, *co):
                if not -128 <= v <= 127:
                    raise ValueError(
                        f"weight/offset {v} out of range -128..127"
                    )
    if implicit_bi:
        # implicit weighting (wrapping PPS: weighted_bipred_idc = 2):
        # NO table syntax — weights come from POC distances
        if ref_pocs is None:
            raise ValueError("implicit_bi needs ref_pocs=(poc0, poc1)")
        w0i, w1i = implicit_bi_weights(poc[0], *ref_pocs)
        wp_int: dict | None = {"implicit": True, "w0": w0i, "w1": w1i}
    else:
        wp_int = weights
    qpc = chroma_qp(qp)
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(6)  # slice_type: B (all slices in picture)
    w.ue(0)  # pic_parameter_set_id
    w.u(frame_num % (1 << log2_max_frame_num), log2_max_frame_num)
    w.u(poc[0] % (1 << poc[1]), poc[1])  # pic_order_cnt_lsb
    w.u(0 if direct_temporal else 1, 1)  # direct_spatial_mv_pred_flag
    w.u(0, 1)  # num_ref_idx_active_override_flag
    w.u(0, 1)  # ref_pic_list_modification_flag_l0
    w.u(0, 1)  # ref_pic_list_modification_flag_l1
    if weights is not None:
        # explicit weighted bi-prediction: the wrapping PPS must set
        # weighted_bipred_idc = 1 (make_pps(weighted_bipred=True))
        _emit_pred_weight_table_b(w, weights)
    # nal_ref_idc == 0: no dec_ref_pic_marking
    w.se(qp - 26)  # slice_qp_delta
    ry = np.zeros_like(y)
    rcb = np.zeros_like(cb)
    rcr = np.zeros_like(cr)
    # per-list 4x4 motion state for the 8.4.1.3 median (a cell not
    # using a list carries refIdx -1; partitions give cells of one MB
    # different motion, so the state is Motion4, not per-MB grids)
    m4s = {0: Motion4(mb_w, mb_h), 1: Motion4(mb_w, mb_h)}
    nzc = NzcCtx(mb_w, mb_h)
    refs = (ref0, ref1)
    skip_run = 0
    if weights is not None:
        # search over PRE-weighted luma planes (exact for full-pel
        # search; the actual prediction always weights AFTER
        # interpolation per 8.4.2.3 — same trade as the P encoder)
        ld = weights["luma_denom"]
        sref = (
            _wp_block(ref0[0], weights["l0"][0], weights["l0"][1], ld),
            _wp_block(ref1[0], weights["l1"][0], weights["l1"][1], ld),
        )
    else:
        sref = (ref0[0], ref1[0])

    def _wl(p: np.ndarray, lx: int) -> np.ndarray:
        """weighted single-list luma block (identity without weights)"""
        if weights is None:
            return p
        lw, lo, _, _ = weights["l0"] if lx == 0 else weights["l1"]
        return _wp_block(p, lw, lo, weights["luma_denom"])

    def _wbi(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
        if wp_int is None:
            return _bi_avg(p0, p1)
        if wp_int.get("implicit"):
            return _wp_bi_block(
                p0, p1, (wp_int["w0"], 0), (wp_int["w1"], 0), 5
            )
        return _wp_bi_block(
            p0, p1, weights["l0"][:2], weights["l1"][:2],
            weights["luma_denom"],
        )

    def _residual(cur_y, pred, mx, my):
        cbp, luma_levels, cdcs, cacs = 0, None, None, None
        if code_residual:
            from flow_indexer_spark.operators.h264intra import (
                _quant_chroma_full,
            )

            cbp, luma_levels = _quant_inter_luma(cur_y, pred[0], qp)
            cdcs, cacs = {}, {}
            for comp, (plane, cpred) in enumerate(
                ((cb, pred[1]), (cr, pred[2]))
            ):
                src = plane[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
                cdcs[comp], cacs[comp] = _quant_chroma_full(
                    src, cpred.astype(np.int64), qpc
                )
            any_ac = any(c for d in cacs.values() for blk in d for c in blk)
            any_dc = any(c for d in cdcs.values() for c in d)
            if any_ac:
                cbp |= 2 << 4
            elif any_dc:
                cbp |= 1 << 4
                cacs = {c: [[0] * 15] * 4 for c in cacs}
            else:
                cacs = {c: [[0] * 15] * 4 for c in cacs}
                cdcs = {c: [0, 0, 0, 0] for c in cdcs}
        return cbp, luma_levels, cdcs, cacs

    for my in range(mb_h):
        for mx in range(mb_w):
            if (mx, my) in intra_mbs:
                w.ue(skip_run)
                skip_run = 0
                encode_i16_mb(
                    w, y, cb, cr, ry, rcb, rcr, mx, my, qp, qpc,
                    mb_type_base=23, nzc=nzc,
                )
                for lx in (0, 1):  # intra cells: decoded, never matching
                    m4s[lx].fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)
                continue
            cur_y = y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
            smv0 = _search_mv(cur_y, sref[0], mx, my, search_range, quarter)
            smv1 = _search_mv(cur_y, sref[1], mx, my, search_range, quarter)
            p0 = mc_luma(
                ref0[0], 64 * mx + smv0[0], 64 * my + smv0[1], 16, 16
            )
            p1 = mc_luma(
                ref1[0], 64 * mx + smv1[0], 64 * my + smv1[1], 16, 16
            )
            zz = (0, 0)
            p0z = mc_luma(ref0[0], 64 * mx, 64 * my, 16, 16)
            p1z = mc_luma(ref1[0], 64 * mx, 64 * my, 16, 16)
            # the zero-MV bi pair joins the candidates: the per-list
            # searches minimize |cur - w*refL| and a bi MIX need not be
            # best matched by either list's own optimum (visible under
            # explicit weights, where cur ~ w0*ref0 + w1*ref1 at rest)
            cand = (
                (_sad(cur_y, _wbi(p0, p1)), 3, smv0, smv1),
                (_sad(cur_y, _wbi(p0z, p1z)), 3, zz, zz),
                (_sad(cur_y, _wl(p0, 0)), 1, smv0, smv1),
                (_sad(cur_y, _wl(p1, 1)), 2, smv0, smv1),
            )
            best = min(cand, key=lambda t: (t[0], t[1]))
            best_sad, mode, mv0, mv1 = best
            use_direct = False
            if direct:
                if direct_temporal:
                    d_mvs, d_pred = temporal_direct(
                        col_motion, mx, my, poc[0], *ref_pocs
                    )
                else:
                    d_mvs, d_pred = spatial_direct4(m4s, mx, my, col_motion)
                d_mode = _direct_mode(d_pred)
                d_planes = _predict_b_mb_wp(
                    refs, mx, my, d_mode, d_mvs[0], d_mvs[1], wp_int
                )
                # zero motion bits: direct wins any SAD tie
                if _sad(cur_y, d_planes[0]) <= best_sad:
                    use_direct = True
                    mode = d_mode
                    mv0, mv1 = d_mvs[0], d_mvs[1]
                    pred = d_planes
            use_split = None
            if partitions and not use_direct:
                # two-partition candidates (Table 7-14 types 4..21):
                # per partition the best of L0 / L1 / Bi under SAD +
                # the _MV_PENALTY bits proxy; a split must be STRICTLY
                # cheaper than the 16x16 candidate (incl. its own MV
                # penalties) so identical-motion content never
                # fragments
                best16_cost = best_sad + _MV_PENALTY * (
                    2 if mode == 3 else 1
                )
                for geom, shape_bit in (
                    (_B_PART_GEOM_16x8, 0),
                    (_B_PART_GEOM_8x16, 1),
                ):
                    total = _MV_PENALTY  # second-partition signalling
                    cand_parts = []
                    for ox, oy, pw, ph, kind in geom:
                        px_, py_ = 16 * mx + ox, 16 * my + oy
                        blk = y[py_ : py_ + ph, px_ : px_ + pw]
                        m0x, m0y, s0 = _search_block(
                            blk, sref[0], px_, py_, search_range, quarter
                        )
                        m1x, m1y, s1 = _search_block(
                            blk, sref[1], px_, py_, search_range, quarter
                        )
                        pb0 = mc_luma(
                            ref0[0], 4 * px_ + m0x, 4 * py_ + m0y, ph, pw
                        )
                        pb1 = mc_luma(
                            ref1[0], 4 * px_ + m1x, 4 * py_ + m1y, ph, pw
                        )
                        s0 = _sad(blk, _wl(pb0, 0))
                        s1 = _sad(blk, _wl(pb1, 1))
                        sbi = _sad(blk, _wbi(pb0, pb1))
                        c, pm, pmvs = min(
                            (
                                (s0 + _MV_PENALTY, 1, {0: (m0x, m0y)}),
                                (s1 + _MV_PENALTY, 2, {1: (m1x, m1y)}),
                                (
                                    sbi + 2 * _MV_PENALTY,
                                    3,
                                    {0: (m0x, m0y), 1: (m1x, m1y)},
                                ),
                            ),
                            key=lambda t: (t[0], t[1]),
                        )
                        total += c
                        cand_parts.append((ox, oy, pw, ph, kind, pm, pmvs))
                    if total < best16_cost and (
                        use_split is None or total < use_split[0]
                    ):
                        use_split = (total, shape_bit, cand_parts)
                # B_8x8 candidate: per quadrant the jointly best
                # (shape, prediction mode) — Table 7-18 signals ONE
                # mode per quadrant shared by its sub-partitions
                total8 = _MV_PENALTY
                quads = []
                for qx, qy in _QUADS:
                    best_q = None
                    for shape in (0, 1, 2, 3):
                        per_mode = {1: 0, 2: 0, 3: 0}
                        mvs_sh = []
                        for sx, sy, pw, ph in _SUB_PARTS[shape]:
                            px_ = 16 * mx + qx + sx
                            py_ = 16 * my + qy + sy
                            blk = y[py_ : py_ + ph, px_ : px_ + pw]
                            m0x, m0y, s0 = _search_block(
                                blk, sref[0], px_, py_, search_range,
                                quarter,
                            )
                            m1x, m1y, s1 = _search_block(
                                blk, sref[1], px_, py_, search_range,
                                quarter,
                            )
                            pb0 = mc_luma(
                                ref0[0], 4 * px_ + m0x, 4 * py_ + m0y,
                                ph, pw,
                            )
                            pb1 = mc_luma(
                                ref1[0], 4 * px_ + m1x, 4 * py_ + m1y,
                                ph, pw,
                            )
                            s0 = _sad(blk, _wl(pb0, 0))
                            s1 = _sad(blk, _wl(pb1, 1))
                            sbi = _sad(blk, _wbi(pb0, pb1))
                            per_mode[1] += s0 + _MV_PENALTY
                            per_mode[2] += s1 + _MV_PENALTY
                            per_mode[3] += sbi + 2 * _MV_PENALTY
                            mvs_sh.append(((m0x, m0y), (m1x, m1y)))
                        for pm in (1, 2, 3):
                            key = (per_mode[pm], shape, pm)
                            if best_q is None or key < best_q[0]:
                                best_q = (key, pm, shape, mvs_sh)
                    total8 += best_q[0][0]
                    quads.append((qx, qy, best_q[1], best_q[2], best_q[3]))
                if total8 < best16_cost and (
                    use_split is None or total8 < use_split[0]
                ):
                    use_split = (total8, "8x8", quads)
            if use_split is not None and use_split[1] == "8x8":
                _, _, quads = use_split
                if stats is not None:
                    stats["part_mbs"] = stats.get("part_mbs", 0) + 1
                    stats["b8x8_mbs"] = stats.get("b8x8_mbs", 0) + 1
                parts, mvds = [], {0: [], 1: []}
                for qx, qy, pm, shape, mvs_sh in quads:
                    for (sx, sy, pw, ph), (mva, mvb) in zip(
                        _SUB_PARTS[shape], mvs_sh
                    ):
                        ox, oy = qx + sx, qy + sy
                        x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                        w4, h4 = pw // 4, ph // 4
                        pmvs = {}
                        for lx, mv in ((0, mva), (1, mvb)):
                            if pm == 3 or pm == 1 + lx:
                                mvp = mv_pred_part(
                                    m4s[lx], x4, y4, w4, h4, 0, "sub"
                                )
                                mvds[lx].append(
                                    (mv[0] - mvp[0], mv[1] - mvp[1])
                                )
                                m4s[lx].fill(x4, y4, w4, h4, mv, 0)
                                pmvs[lx] = mv
                            else:
                                m4s[lx].fill(x4, y4, w4, h4, (0, 0), -1)
                        parts.append((ox, oy, pw, ph, pm, pmvs))
                pred = _predict_b_parts(refs, mx, my, parts, wp=wp_int)
                cbp, luma_levels, cdcs, cacs = _residual(
                    cur_y, pred, mx, my
                )
                w.ue(skip_run)
                skip_run = 0
                w.ue(22)  # mb_type B_8x8
                for qx, qy, pm, shape, _m in quads:
                    w.ue(_B_SUB_CODE[(pm, shape)])
                for lx in (0, 1):  # 7.3.5.2: all L0 mvds, then all L1
                    for d in mvds[lx]:
                        w.se(d[0])
                        w.se(d[1])
                w.ue(_CBP_INTER_CODE[cbp])
                if cbp:
                    w.se(0)  # mb_qp_delta
                    _emit_inter_residual(
                        w, cbp, luma_levels, cdcs, cacs, mx, my, nzc
                    )
                    rec = _recon_inter_mb(
                        *pred, cbp, luma_levels, cdcs, cacs, qp, qpc
                    )
                else:
                    rec = pred
                ry[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = rec[0]
                rcb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[1]
                rcr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[2]
                continue
            if use_split is not None:
                _, shape_bit, cand_parts = use_split
                pair_idx = _B_PART_MODES.index(
                    tuple(p[5] for p in cand_parts)
                )
                parts, mvds = [], {0: {}, 1: {}}
                for pi, (ox, oy, pw, ph, kind, pm, pmvs) in enumerate(
                    cand_parts
                ):
                    x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                    w4, h4 = pw // 4, ph // 4
                    for lx in (0, 1):
                        if pm == 3 or pm == 1 + lx:
                            mvp = mv_pred_part(
                                m4s[lx], x4, y4, w4, h4, 0, kind
                            )
                            mvds[lx][pi] = (
                                pmvs[lx][0] - mvp[0],
                                pmvs[lx][1] - mvp[1],
                            )
                            m4s[lx].fill(x4, y4, w4, h4, pmvs[lx], 0)
                        else:
                            m4s[lx].fill(x4, y4, w4, h4, (0, 0), -1)
                    parts.append((ox, oy, pw, ph, pm, pmvs))
                pred = _predict_b_parts(refs, mx, my, parts, wp=wp_int)
                cbp, luma_levels, cdcs, cacs = _residual(
                    cur_y, pred, mx, my
                )
                if stats is not None:
                    stats["part_mbs"] = stats.get("part_mbs", 0) + 1
                w.ue(skip_run)
                skip_run = 0
                w.ue(4 + 2 * pair_idx + shape_bit)  # mb_type
                for lx in (0, 1):  # 7.3.5.1: all L0 mvds, then all L1
                    for pi in sorted(mvds[lx]):
                        w.se(mvds[lx][pi][0])
                        w.se(mvds[lx][pi][1])
                w.ue(_CBP_INTER_CODE[cbp])
                if cbp:
                    w.se(0)  # mb_qp_delta
                    _emit_inter_residual(
                        w, cbp, luma_levels, cdcs, cacs, mx, my, nzc
                    )
                    rec = _recon_inter_mb(
                        *pred, cbp, luma_levels, cdcs, cacs, qp, qpc
                    )
                else:
                    rec = pred
                ry[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = rec[0]
                rcb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[1]
                rcr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[2]
                continue
            if not use_direct:
                pred = _predict_b_mb_wp(refs, mx, my, mode, mv0, mv1, wp_int)
            cbp, luma_levels, cdcs, cacs = _residual(cur_y, pred, mx, my)
            if use_direct and cbp == 0 and (
                code_residual or np.array_equal(pred[0], cur_y)
            ):
                # B_Skip: direct motion, nothing coded (7.4.4 shape —
                # without the residual layer, only an exact luma match
                # may skip, or the recon would silently diverge)
                skip_run += 1
                rec = pred
            else:
                w.ue(skip_run)
                skip_run = 0
                if use_direct:
                    w.ue(0)  # mb_type: B_Direct_16x16 (no MVDs)
                else:
                    w.ue(mode)  # mb_type: 1 B_L0 / 2 B_L1 / 3 B_Bi
                    for lx, mv in ((0, mv0), (1, mv1)):
                        if mode == 3 or mode == 1 + lx:
                            mvp = mv_pred_part(
                                m4s[lx], 4 * mx, 4 * my, 4, 4, 0, "16x16"
                            )
                            w.se(mv[0] - mvp[0])
                            w.se(mv[1] - mvp[1])
                w.ue(_CBP_INTER_CODE[cbp])
                if cbp:
                    w.se(0)  # mb_qp_delta
                    _emit_inter_residual(
                        w, cbp, luma_levels, cdcs, cacs, mx, my, nzc
                    )
                    rec = _recon_inter_mb(
                        *pred, cbp, luma_levels, cdcs, cacs, qp, qpc
                    )
                else:
                    rec = pred
            ry[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = rec[0]
            rcb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[1]
            rcr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[2]
            if use_direct:
                used = {lx: d_pred[lx] for lx in (0, 1)}
            else:
                used = {lx: mode == 3 or mode == 1 + lx for lx in (0, 1)}
            for lx, mv in ((0, mv0), (1, mv1)):
                if used[lx]:
                    m4s[lx].fill(4 * mx, 4 * my, 4, 4, mv, 0)
                else:
                    m4s[lx].fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)
    if skip_run:
        w.ue(skip_run)  # trailing skip run
    nal = rbsp_to_nal(0x01, w.rbsp_trailing())  # nal_ref_idc 0, type 1
    return (nal, (ry, rcb, rcr)) if return_recon else nal


def decode_b_slice(
    nal: bytes,
    sps: dict,
    ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
    ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
    col_motion=None,
    pocs: tuple[int, int, int] | None = None,
    weighted_bipred: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Non-reference B-slice NAL + both reference reconstructions ->
    (y, cb, cr): B_L0/B_L1/B_Bi_16x16 through per-list median MV
    prediction, quarter/eighth-sample interpolation, default-weighted
    bi averaging, and the full inter residual layer; B_Skip runs and
    B_Direct_16x16 through the 8.4.1.2.2 spatial direct derivation
    (``col_motion`` = RefPicList1[0]'s (mvs, inter) grid for
    colZeroFlag; None = an intra co-located picture); the Table 7-14
    two-partition types 4..21 (16x8 / 8x16, per-partition list choice)
    through per-list 4x4 motion state with the 8.4.1.3 directional
    predictors; intra refresh MBs via Table 7-14's +23 offset.  B_8x8
    sub-macroblock partitions and weighted bi-prediction classify from
    the syntax element that requires them.
    A stream with direct_spatial_mv_pred_flag == 0 uses the 8.4.1.2.3
    TEMPORAL derivation, which needs ``pocs`` = (poc_cur, poc_ref0,
    poc_ref1) — the caller owns POC bookkeeping (GopDecoder tracks it
    from the slice headers); without it the decoder CLASSIFIES rather
    than silently decoding a temporal stream against spatial motion
    (the round-4 CABAC-qp bug class)."""
    header, rbsp = nal_to_rbsp(nal)
    if header & 0x1F != 1:
        raise ValueError(f"not a non-IDR coded-slice NAL (type {header & 0x1F})")
    r = _BitReader(rbsp)
    if r.ue("first_mb_in_slice") != 0:
        raise NotImplementedError("multi-slice pictures")
    slice_type = r.ue("slice_type")
    if slice_type % 5 != 1:
        raise ValueError(f"slice_type {slice_type} handed to the B decoder")
    r.ue("pic_parameter_set_id")
    r.u(sps["log2_max_frame_num"], "frame_num")
    if sps.get("poc_type", 2) == 0:
        r.u(sps["log2_max_poc_lsb"], "pic_order_cnt_lsb")
    spatial_flag = r.u(1, "direct_spatial_mv_pred_flag")
    if r.u(1, "num_ref_idx_active_override_flag"):
        raise NotImplementedError("multi-reference lists")
    if r.u(1, "ref_pic_list_modification_flag_l0"):
        raise NotImplementedError("reference picture list modification")
    if r.u(1, "ref_pic_list_modification_flag_l1"):
        raise NotImplementedError("reference picture list modification")
    # weighted bi-prediction per the PPS idc the caller resolves:
    # 1 = explicit (pred_weight_table in the slice header), 2 =
    # implicit (no syntax — weights derived from POC distances, which
    # the caller owns; GopDecoder tracks them)
    if weighted_bipred == 2:
        if pocs is None:
            raise NotImplementedError(
                "implicit weighted bi-prediction needs POC context: "
                "pass pocs=(poc_cur, poc_ref0, poc_ref1)"
            )
        w0i, w1i = implicit_bi_weights(*pocs)
        wp = {"implicit": True, "w0": w0i, "w1": w1i}
    elif weighted_bipred:
        wp = _parse_pred_weight_table_b(r)
    else:
        wp = None
    if header >> 5:  # nal_ref_idc != 0: reference B (marking present)
        if r.u(1, "adaptive_ref_pic_marking_mode_flag"):
            raise NotImplementedError("adaptive reference picture marking")
    qp = 26 + r.se("slice_qp_delta")
    if not 0 <= qp <= 51:
        raise ValueError(f"slice QP {qp} out of range")
    mb_w, mb_h = sps["mb_width"], sps["mb_height"]
    if ref0[0].shape != (mb_h * 16, mb_w * 16) or ref1[0].shape != ref0[0].shape:
        raise ValueError("reference planes do not match the SPS geometry")
    if mb_w * mb_h > max(len(rbsp) * 16, 1 << 26):
        raise ValueError(
            f"SPS claims {mb_w}x{mb_h} macroblocks but the slice has "
            f"only {len(rbsp)} RBSP bytes: corrupt stream"
        )
    y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    # per-list 4x4 motion state (Motion4): the 16x8/8x16 partitions
    # give different cells of one MB different motion, and 8.4.1.3
    # predicts from 4x4 neighbours — per-MB grids stopped being exact
    # the moment partitions joined the B surface
    m4s = {0: Motion4(mb_w, mb_h), 1: Motion4(mb_w, mb_h)}
    modes = np.full((4 * mb_h, 4 * mb_w), -1, dtype=np.int8)
    nzc = NzcCtx(mb_w, mb_h)
    refs = (ref0, ref1)
    n_mbs = mb_w * mb_h

    def _store(mx, my, rec, mvs):
        y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = rec[0]
        cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[1]
        cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = rec[2]
        if mvs is None:  # partitioned MB: cells filled during derivation
            return
        for lx in (0, 1):
            if lx in mvs:
                m4s[lx].fill(4 * mx, 4 * my, 4, 4, mvs[lx], 0)
            else:
                m4s[lx].fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)

    def _direct(mx, my):
        if spatial_flag:
            return spatial_direct4(m4s, mx, my, col_motion)
        if pocs is None:
            raise NotImplementedError(
                "temporal direct (direct_spatial_mv_pred_flag 0) needs POC "
                "context: pass pocs=(poc_cur, poc_ref0, poc_ref1)"
            )
        return temporal_direct(col_motion, mx, my, *pocs)

    addr = 0
    while addr < n_mbs:
        run = r.ue("mb_skip_run")
        if run > n_mbs - addr:
            raise ValueError("mb_skip_run overruns the picture")
        for _ in range(run):  # B_Skip: direct motion, nothing coded
            mx, my = addr % mb_w, addr // mb_w
            d_mvs, d_pred = _direct(mx, my)
            rec = _predict_b_mb_wp(
                refs, mx, my, _direct_mode(d_pred), d_mvs[0], d_mvs[1], wp
            )
            _store(mx, my, rec, {lx: d_mvs[lx] for lx in (0, 1) if d_pred[lx]})
            addr += 1
        if addr == n_mbs:
            break
        if not r.more_data():
            raise ValueError("slice data ends before the picture is full")
        mx, my = addr % mb_w, addr // mb_w
        mb_type = r.ue("mb_type")
        if mb_type >= 23:
            if mb_type > 48:
                raise ValueError(f"invalid B-slice mb_type {mb_type}")
            qp = decode_i_mb(
                r, mb_type - 23, qp, y, cb, cr, mx, my, modes, nzc
            )
            for lx in (0, 1):  # intra cells: decoded, never matching
                m4s[lx].fill(4 * mx, 4 * my, 4, 4, (0, 0), -1)
            addr += 1
            continue
        mvs = {}
        part_pred = None
        if mb_type == 0:  # B_Direct_16x16: derived motion, no MVDs
            d_mvs, d_pred = _direct(mx, my)
            mode = _direct_mode(d_pred)
            mvs = {lx: d_mvs[lx] for lx in (0, 1) if d_pred[lx]}
        elif mb_type <= 3:
            mode = mb_type
            for lx in (0, 1):
                if mb_type == 3 or mb_type == 1 + lx:
                    mvp = mv_pred_part(
                        m4s[lx], 4 * mx, 4 * my, 4, 4, 0, "16x16"
                    )
                    mvd = (r.se("mvd x"), r.se("mvd y"))
                    mvs[lx] = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        elif mb_type <= 21:  # Table 7-14 two-partition types (16x8/8x16)
            k = mb_type - 4
            pmodes = _B_PART_MODES[k // 2]
            geom = _B_PART_GEOM_8x16 if k % 2 else _B_PART_GEOM_16x8
            # 7.3.5.1 syntax order: every L0 mvd in partition order,
            # then every L1 mvd
            mvd = {0: {}, 1: {}}
            for lx in (0, 1):
                for pi, pm in enumerate(pmodes):
                    if pm == 3 or pm == 1 + lx:
                        mvd[lx][pi] = (r.se("mvd x"), r.se("mvd y"))
            # derivation in PARTITION order: partition 1's predictors
            # read partition 0's freshly filled cells (8.4.1.3 /
            # 6.4.11.7 ordering)
            parts = []
            for pi, (ox, oy, pw, ph, kind) in enumerate(geom):
                x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                w4, h4 = pw // 4, ph // 4
                pmvs = {}
                for lx in (0, 1):
                    if pmodes[pi] == 3 or pmodes[pi] == 1 + lx:
                        mvp = mv_pred_part(
                            m4s[lx], x4, y4, w4, h4, 0, kind
                        )
                        d = mvd[lx][pi]
                        pmvs[lx] = (mvp[0] + d[0], mvp[1] + d[1])
                        m4s[lx].fill(x4, y4, w4, h4, pmvs[lx], 0)
                    else:
                        m4s[lx].fill(x4, y4, w4, h4, (0, 0), -1)
                parts.append((ox, oy, pw, ph, pmodes[pi], pmvs))
            part_pred = _predict_b_parts(refs, mx, my, parts, wp=wp)
            mvs = None
        else:  # B_8x8: per-quadrant sub_mb_type (Table 7-18)
            subs = []
            for qx, qy in _QUADS:
                st = r.ue("sub_mb_type")
                if st > 12:
                    raise ValueError(f"B sub_mb_type {st} > 12 (Table 7-18)")
                if st == 0:
                    raise NotImplementedError(
                        "B_Direct_8x8: sub-macroblock direct derivation"
                    )
                subs.append((qx, qy, *_B_SUB_MODES[st]))
            # single reference per list: no ref_idx syntax.  7.3.5.2
            # order: every L0 mvd quadrant-major sub-part order, then
            # every L1 mvd
            mvd = {0: [], 1: []}
            for lx in (0, 1):
                for qx, qy, pm, shape in subs:
                    if pm == 3 or pm == 1 + lx:
                        for _ in _SUB_PARTS[shape]:
                            mvd[lx].append((r.se("mvd x"), r.se("mvd y")))
            pos = {0: 0, 1: 0}
            parts = []
            for qx, qy, pm, shape in subs:
                for sx, sy, pw, ph in _SUB_PARTS[shape]:
                    ox, oy = qx + sx, qy + sy
                    x4, y4 = 4 * mx + ox // 4, 4 * my + oy // 4
                    w4, h4 = pw // 4, ph // 4
                    pmvs = {}
                    for lx in (0, 1):
                        if pm == 3 or pm == 1 + lx:
                            mvp = mv_pred_part(
                                m4s[lx], x4, y4, w4, h4, 0, "sub"
                            )
                            d = mvd[lx][pos[lx]]
                            pos[lx] += 1
                            pmvs[lx] = (mvp[0] + d[0], mvp[1] + d[1])
                            m4s[lx].fill(x4, y4, w4, h4, pmvs[lx], 0)
                        else:
                            m4s[lx].fill(x4, y4, w4, h4, (0, 0), -1)
                    parts.append((ox, oy, pw, ph, pm, pmvs))
            part_pred = _predict_b_parts(refs, mx, my, parts, wp=wp)
            mvs = None
        code = r.ue("coded_block_pattern")
        if code > 47:
            raise ValueError(f"coded_block_pattern codeNum {code} > 47")
        cbp = _CBP_INTER[code]
        pred = (
            part_pred
            if part_pred is not None
            else _predict_b_mb_wp(
                refs, mx, my, mode, mvs.get(0, (0, 0)), mvs.get(1, (0, 0)),
                wp,
            )
        )
        if cbp:
            qp += r.se("mb_qp_delta")
            if not 0 <= qp <= 51:
                raise ValueError(f"mb_qp_delta drove QP to {qp}")
            luma_levels, cdcs, cacs = _parse_inter_residual(
                r, cbp, mx, my, nzc
            )
            rec = _recon_inter_mb(
                *pred, cbp, luma_levels, cdcs, cacs, qp, chroma_qp(qp)
            )
        else:
            for z, (bx, by) in enumerate(_Z4):
                nzc.y[4 * my + by, 4 * mx + bx] = 0
            rec = pred
        _store(mx, my, rec, mvs)
        addr += 1
    return y, cb, cr


# --- GOP / MP4-sample layer ---------------------------------------------------


def encode_frame_sample_p(
    px: np.ndarray,
    ref: tuple[np.ndarray, np.ndarray, np.ndarray],
    frame_num: int,
    qp: int = 12,
    search_range: int = 8,
    intra_mbs: frozenset[tuple[int, int]] = frozenset(),
    code_residual: bool = False,
    poc: tuple[int, int] | None = None,
    quarter: bool = True,
    return_motion: bool = False,
    partitions: bool = False,
    return_stats: bool = False,
    weights: dict | None = None,
    l0_reorder: tuple | None = None,
):
    """RGB frame + previous reconstruction -> (length-prefixed P-slice
    MP4 sample, this frame's reconstruction for the next P[, this
    picture's (mvs, inter) motion grid when ``return_motion``][, the
    encoder's mb_type stats when ``return_stats``])."""
    from flow_indexer_spark.operators.h264codec import frame_to_planes

    y, cb, cr = frame_to_planes(px)
    out = encode_p_slice(
        y, cb, cr, ref, frame_num, qp=qp, search_range=search_range,
        intra_mbs=intra_mbs, return_recon=True, code_residual=code_residual,
        poc=poc, quarter=quarter, return_motion=return_motion,
        partitions=partitions, return_stats=return_stats, weights=weights,
        l0_reorder=l0_reorder,
    )
    sample = len(out[0]).to_bytes(4, "big") + out[0]
    return (sample, *out[1:])


def encode_frame_sample_b(
    px: np.ndarray,
    ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
    ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
    frame_num: int,
    poc: tuple[int, int],
    qp: int = 12,
    search_range: int = 8,
    code_residual: bool = False,
    quarter: bool = True,
    direct: bool = False,
    col_motion=None,
    direct_temporal: bool = False,
    ref_pocs: tuple[int, int] | None = None,
    stats: dict | None = None,
    partitions: bool = False,
    weights: dict | None = None,
    implicit_bi: bool = False,
) -> bytes:
    """RGB frame + both anchor reconstructions (past, future) -> one
    length-prefixed non-reference B-slice MP4 sample. No recon is
    returned: nal_ref_idc 0 pictures never enter the reference
    window, so nothing downstream predicts from them. ``direct`` /
    ``col_motion``: the direct mode (B_Skip / B_Direct_16x16) and the
    future anchor's motion grid (colZeroFlag for spatial, mvCol for
    temporal); ``direct_temporal`` + ``ref_pocs`` select the
    8.4.1.2.3 temporal derivation (see encode_b_slice)."""
    from flow_indexer_spark.operators.h264codec import frame_to_planes

    y, cb, cr = frame_to_planes(px)
    nal = encode_b_slice(
        y, cb, cr, ref0, ref1, frame_num, poc, qp=qp,
        search_range=search_range, code_residual=code_residual,
        quarter=quarter, direct=direct, col_motion=col_motion,
        direct_temporal=direct_temporal, ref_pocs=ref_pocs, stats=stats,
        partitions=partitions, weights=weights, implicit_bi=implicit_bi,
    )
    return len(nal).to_bytes(4, "big") + nal


class GopDecoder:
    """Stateful sample decoder for an avc1 GOP track: IDR samples reset
    the reference state, P samples motion-compensate against the most
    recent reference picture, B samples bi-predict between the two most
    recent reference pictures (decode order = [past, future] for the
    closed B-GOPs this repo writes — the default 8.2.4.2 list
    construction with exactly two stored pictures). Reference
    management follows nal_ref_idc: only marked pictures (idc != 0)
    enter the 2-deep sliding window; non-reference B samples never do.
    ``decode(sample)`` -> RGB pixels (cropped)."""

    def __init__(self, avcc: bytes) -> None:
        from flow_indexer_spark.operators.h264codec import (
            parse_avcc,
            parse_pps,
            parse_sps,
        )

        sps_nal, pps_nal = parse_avcc(avcc)
        self.sps = parse_sps(sps_nal)
        self.pps = parse_pps(pps_nal)
        if self.pps.get("cabac"):
            raise NotImplementedError(
                "CABAC P/B slices: only CABAC I_PCM IDR pictures decode "
                "(operators/h264cabac.py); inter prediction under CABAC "
                "needs the full residual/mvd bin syntax"
            )
        self._refs: list[tuple] = []

    def _poc_lsb(self, nal: bytes) -> int | None:
        """pic_order_cnt_lsb from a coded-slice header (poc_type 0
        only — type 2 has none; closed GOPs keep lsb == POC, no wrap).
        The decoder owns POC bookkeeping so temporal direct can scale
        by real picture distances."""
        if self.sps.get("poc_type", 2) != 0:
            return None
        from flow_indexer_spark.operators.h264codec import (
            _BitReader,
            nal_to_rbsp,
        )

        _, rbsp = nal_to_rbsp(nal)
        r = _BitReader(rbsp)
        r.ue("first_mb_in_slice")
        r.ue("slice_type")
        r.ue("pic_parameter_set_id")
        r.u(self.sps["log2_max_frame_num"], "frame_num")
        if (nal[0] & 0x1F) == 5:
            r.ue("idr_pic_id")
        return r.u(self.sps["log2_max_poc_lsb"], "pic_order_cnt_lsb")

    @staticmethod
    def _slice_type(nal: bytes) -> int:
        from flow_indexer_spark.operators.h264codec import (
            _BitReader,
            nal_to_rbsp,
        )

        _, rbsp = nal_to_rbsp(nal)
        r = _BitReader(rbsp)
        r.ue("first_mb_in_slice")
        return r.ue("slice_type") % 5

    def decode(self, sample: bytes) -> np.ndarray:
        from flow_indexer_spark.operators.h264codec import planes_to_frame
        from flow_indexer_spark.operators.h264intra import (
            decode_idr_picture,
        )

        planes = None
        idr_nals = []  # an IDR picture's slices (one sample = one pic)
        p = 0
        while p + 4 <= len(sample):
            ln = int.from_bytes(sample[p : p + 4], "big")
            nal = sample[p + 4 : p + 4 + ln]
            if len(nal) != ln:
                raise ValueError("NAL length prefix overruns sample")
            p += 4 + ln
            nal_type = nal[0] & 0x1F if nal else 0
            if nal_type == 5:
                idr_nals.append(nal)
            elif nal_type == 1:
                if idr_nals:
                    raise ValueError(
                        "IDR and non-IDR slices mixed in one sample"
                    )
                if not self._refs:
                    raise ValueError(
                        "predicted slice before any IDR: no reference"
                    )
                motion = None
                if self._slice_type(nal) == 1:  # B
                    if len(self._refs) < 2:
                        raise ValueError(
                            "B slice with fewer than two reference pictures"
                        )
                    p0, p1 = self._refs[-2][2], self._refs[-1][2]
                    poc_cur = self._poc_lsb(nal)
                    planes = decode_b_slice(
                        nal, self.sps, self._refs[-2][0], self._refs[-1][0],
                        col_motion=self._refs[-1][1],
                        pocs=(
                            (poc_cur, p0, p1)
                            if None not in (poc_cur, p0, p1)
                            else None
                        ),
                        weighted_bipred=self.pps.get(
                            "weighted_bipred_idc", 0
                        ),
                    )
                else:
                    # list0 = stored reference pictures, most recent
                    # first (decode recency == PicNum order in these
                    # closed GOPs); slices that override
                    # num_ref_idx_l0_active consume as many as they ask
                    *planes, motion = decode_p_slice(
                        nal, self.sps,
                        [rp for rp, *_ in reversed(self._refs)],
                        return_motion=True,
                        weighted=self.pps.get("weighted_pred", False),
                    )
                    planes = tuple(planes)
                if nal[0] >> 5:  # nal_ref_idc != 0: mark as reference
                    self._refs = (
                        self._refs + [(planes, motion, self._poc_lsb(nal))]
                    )[-2:]
            # SEI / parameter-set NALs are skipped
        if idr_nals:
            planes = decode_idr_picture(idr_nals, self.sps)
            # IDR carries no inter motion: colZeroFlag reads 0
            self._refs = [(planes, None, self._poc_lsb(idr_nals[0]))]
        if planes is None:
            raise ValueError("sample contains no coded-slice NAL")
        return planes_to_frame(
            *planes, self.sps["width"], self.sps["height"]
        )
