"""CABAC entropy coding (ITU-T H.264 clause 9.3) for I_PCM IDR slices.

The arithmetic-coding core is the spec's: 6-bit probability-state
machine with the 64x4 rangeTabLPS (Table 9-44) and transIdxLPS
(Table 9-45), context initialization from (m, n) pairs (9.3.1.1,
Table 9-12 ctxIdx 3..5 — the I-slice mb_type contexts), renormalization
by doubling with outstanding-bit carry resolution (9.3.4.3.3), and the
special no-context terminate decision (9.3.3.2.2.3) used by both the
I_PCM mb_type suffix bin and end_of_slice_flag.

Supported surface: encoding and byte-exact decoding of CABAC IDR
slices whose every macroblock is I_PCM — the lossless tier, mirroring
the CAVLC I_PCM pair in operators/h264codec.py (reference analogue:
the pcap backend decodes every packet format its library supports,
/root/reference/backend/pcap.go:17-54).  Narrower tools still
CLASSIFY from parsed syntax: a bin trajectory selecting I_NxN or
I_16x16 under CABAC raises NotImplementedError (prediction under
CABAC needs the full residual syntax), corrupt alignment or
end_of_slice miscounts raise ValueError.

I_PCM byte positioning: after the I_PCM terminate bin the reader is
ALREADY on the encoder's post-flush bit — per segment the decoder has
consumed ``9 + S`` bits (9-bit engine init + one per renormalization
shift), and the encoder emitted ``S + 9`` (one per shift, plus the
10-bit EncodeFlush tail — 7 RenormE shifts at codIRange=2 then
PutBit + 2 WriteBits — minus the suppressed first bit).  Shift counts
are equal on both sides by construction of the range recursion, so
the positions coincide exactly: the decoder just skips the pcm
alignment zeros, reads the PCM bytes, and re-initializes the engine
per 9.3.1.2.
"""

from __future__ import annotations

import numpy as np

from flow_indexer_spark.operators.h264codec import (
    _BitReader,
    _BitWriter,
    nal_to_rbsp,
    rbsp_to_nal,
)

__all__ = [
    "encode_idr_ipcm_cabac",
    "decode_idr_ipcm_cabac",
    "make_pps_cabac",
]

# Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx]
_RANGE_TAB_LPS = [
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
]

# Table 9-45: transIdxLPS (MPS transition is min(state + 1, 62))
_TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24, 24, 25, 26, 26, 27,
    27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33, 33, 34, 34, 35, 35,
    35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
]

#: Table 9-12 (m, n) for the I-slice mb_type bin0 contexts, ctxIdx 3..5
_CTX_INIT_MB_TYPE_I = ((20, -15), (2, 54), (3, 74))


def _init_ctx(m: int, n: int, qp: int = 26) -> list:
    """9.3.1.1: [pStateIdx, valMPS] from the (m, n) init pair."""
    pre = min(max(1, ((m * min(max(0, qp), 51)) >> 4) + n), 126)
    if pre <= 63:
        return [63 - pre, 0]
    return [pre - 64, 1]


class _CabacEncoder:
    """9.3.4: arithmetic encoder over a _BitWriter, restartable per
    I_PCM segment."""

    def __init__(self, w: _BitWriter) -> None:
        self.w = w
        self.start()

    def start(self) -> None:
        self.low = 0
        self.rng = 510
        self.out = 0
        self.first = True

    def _putbit(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.w.u(b, 1)
        while self.out:
            self.w.u(1 - b, 1)
            self.out -= 1

    def _renorm(self) -> None:
        while self.rng < 256:
            if self.low >= 512:
                self._putbit(1)
                self.low -= 512
            elif self.low < 256:
                self._putbit(0)
            else:
                self.out += 1
                self.low -= 256
            self.rng <<= 1
            self.low <<= 1

    def decision(self, ctx: list, bin_val: int) -> None:
        rlps = _RANGE_TAB_LPS[ctx[0]][(self.rng >> 6) & 3]
        self.rng -= rlps
        if bin_val != ctx[1]:
            self.low += self.rng
            self.rng = rlps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = _TRANS_IDX_LPS[ctx[0]]
        else:
            ctx[0] = min(ctx[0] + 1, 62)
        self._renorm()

    def terminate(self, bin_val: int) -> None:
        self.rng -= 2
        if bin_val:
            self.low += self.rng
            self._flush()
        else:
            self._renorm()

    def _flush(self) -> None:
        """9.3.4.3.5 EncodeFlush: codIRange = 2, RenormE (emits the
        top 7 bits of codILow), then PutBit + 2 tail bits; the final
        |1 doubles as the rbsp stop bit when this is the last flush."""
        self.rng = 2
        self._renorm()
        self._putbit((self.low >> 9) & 1)
        self.w.u(((self.low >> 7) & 3) | 1, 2)


class _CabacDecoder:
    """9.3.3: arithmetic decoder over a _BitReader; reads past the
    buffer as zeros (bounded) because terminate's flush looks ahead."""

    _MAX_OVERRUN = 32  # bits of permissible zero-padding look-ahead

    def __init__(self, r: _BitReader) -> None:
        self.r = r
        self.consumed = 0

    def _bit(self) -> int:
        if self.r._pos >= 8 * len(self.r._d):
            if self.r._pos >= 8 * len(self.r._d) + self._MAX_OVERRUN:
                raise ValueError("CABAC codeword overruns the slice RBSP")
            self.r._pos += 1
            self.consumed += 1
            return 0
        self.consumed += 1
        return self.r.u(1, "cabac")

    def start(self) -> None:
        self.rng = 510
        self.offset = 0
        self.consumed = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()
        if self.offset >= 510:
            raise ValueError("illegal CABAC init codIOffset (510/511)")

    def _renorm(self) -> None:
        while self.rng < 256:
            self.rng <<= 1
            self.offset = (self.offset << 1) | self._bit()

    def decision(self, ctx: list) -> int:
        rlps = _RANGE_TAB_LPS[ctx[0]][(self.rng >> 6) & 3]
        self.rng -= rlps
        if self.offset >= self.rng:
            bin_val = 1 - ctx[1]
            self.offset -= self.rng
            self.rng = rlps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = _TRANS_IDX_LPS[ctx[0]]
        else:
            bin_val = ctx[1]
            ctx[0] = min(ctx[0] + 1, 62)
        self._renorm()
        return bin_val

    def terminate(self) -> int:
        self.rng -= 2
        if self.offset >= self.rng:
            return 1  # flush implied; caller re-syncs or ends the slice
        self._renorm()
        return 0

    def pcm_sync(self) -> None:
        """After an I_PCM terminate bin the reader already sits on the
        encoder's post-flush bit (consumed 9 + S == emitted S + 9; see
        the module docstring) — nothing to rewind; kept as the named
        seam where a buffered-window implementation would re-derive
        its pointer."""


def make_pps_cabac() -> bytes:
    """PPS NAL with entropy_coding_mode_flag = 1 (CABAC), otherwise
    identical to operators/h264codec.make_pps."""
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(1, 1)  # entropy_coding_mode_flag: CABAC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    return rbsp_to_nal(0x68, w.rbsp_trailing())


def _mb_type_ctxs(qp: int = 26) -> list[list]:
    """mb_type contexts initialized at SliceQP_Y (9.3.1.1 applies the
    (m, n) pairs to the SLICE qp, not a constant — a nonzero
    pic_init_qp_minus26/slice_qp_delta changes the init states and
    therefore every mb_type bin)."""
    return [_init_ctx(m, n, qp) for m, n in _CTX_INIT_MB_TYPE_I]


def encode_idr_ipcm_cabac(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    idr_pic_id: int = 0,
    qp: int = 26,
) -> bytes:
    """Padded planes -> one CABAC IDR slice NAL, every macroblock
    I_PCM.  Slice header as the CAVLC twin; then
    cabac_alignment_one_bit(s), and per MB: mb_type bin0 (decision,
    ctxInc = availA + availB), the I_PCM terminate bin, flush, pcm
    alignment zeros, raw planes, engine restart, end_of_slice_flag.
    ``qp`` becomes slice_qp_delta (= qp - 26 against this repo's
    pic_init_qp 26) and seeds the mb_type context initialization —
    I_PCM carries no quantized residual, so qp changes only the
    entropy-coder trajectory, not the samples."""
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    if y.shape != (mb_h * 16, mb_w * 16) or cb.shape != (mb_h * 8, mb_w * 8):
        raise ValueError("planes must be macroblock-aligned (16 luma / 8 chroma)")
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all slices in picture)
    w.ue(0)  # pic_parameter_set_id
    w.u(0, 4)  # frame_num
    w.ue(idr_pic_id % 65536)
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    if not 0 <= qp <= 51:
        raise ValueError(f"SliceQP_Y {qp} out of [0, 51]")
    w.se(qp - 26)  # slice_qp_delta (pic_init_qp is 26)
    while not w.bit_aligned:
        w.u(1, 1)  # cabac_alignment_one_bit
    enc = _CabacEncoder(w)
    ctxs = _mb_type_ctxs(qp)
    for my in range(mb_h):
        for mx in range(mb_w):
            ctx_inc = (1 if mx > 0 else 0) + (1 if my > 0 else 0)
            enc.decision(ctxs[ctx_inc], 1)  # bin0: not I_NxN
            enc.terminate(1)  # bin1: I_PCM (flushes)
            w.align_zero()  # pcm_alignment_zero_bit(s)
            w.raw_bytes(y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            w.raw_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            w.raw_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            enc.start()  # 9.3.1.2: engine re-init after PCM
            last = my == mb_h - 1 and mx == mb_w - 1
            enc.terminate(1 if last else 0)  # end_of_slice_flag
    w.align_zero()  # flush tail's |1 is the rbsp stop bit
    return rbsp_to_nal(0x65, bytes(w._bytes))


def decode_idr_ipcm_cabac(
    nal: bytes, sps: dict, pic_init_qp_minus26: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CABAC IDR slice NAL -> exact (y, cb, cr) planes; narrower
    coding tools classify (module docstring).  ``pic_init_qp_minus26``
    comes from the stream's PPS (parse_pps); SliceQP_Y = 26 +
    pic_init_qp_minus26 + slice_qp_delta seeds the mb_type context
    initialization — a conformant stream coded at nonzero qp delta
    decodes correctly instead of silently mis-decoding bins against
    qp-26 contexts (round-4 ADVICE)."""
    header, rbsp = nal_to_rbsp(nal)
    nal_type = header & 0x1F
    if nal_type == 1:
        raise NotImplementedError(
            "non-IDR slice: inter prediction needs motion compensation"
        )
    if nal_type != 5:
        raise ValueError(f"not a coded-slice NAL (type {nal_type})")
    r = _BitReader(rbsp)
    if r.ue("first_mb_in_slice") != 0:
        raise NotImplementedError("multi-slice CABAC pictures")
    if r.ue("slice_type") % 5 != 2:
        raise NotImplementedError(
            "P/B slice under CABAC: inter prediction + cabac_init_idc"
        )
    r.ue("pic_parameter_set_id")
    r.u(sps["log2_max_frame_num"], "frame_num")
    r.ue("idr_pic_id")
    if sps.get("poc_type", 2) == 0:
        r.u(sps["log2_max_poc_lsb"], "pic_order_cnt_lsb")
    r.u(1, "no_output_of_prior_pics_flag")
    r.u(1, "long_term_reference_flag")
    qp = 26 + pic_init_qp_minus26 + r.se("slice_qp_delta")
    if not 0 <= qp <= 51:
        raise ValueError(f"SliceQP_Y {qp} out of [0, 51]: corrupt stream")
    while r._pos & 7:
        if r.u(1, "cabac_alignment_one_bit") != 1:
            raise ValueError("cabac_alignment_one_bit must be 1")
    mb_w, mb_h = sps["mb_width"], sps["mb_height"]
    if mb_w * mb_h * 384 > max(len(rbsp), 1 << 26):
        raise ValueError(
            f"SPS claims {mb_w}x{mb_h} macroblocks but the slice has only "
            f"{len(rbsp)} RBSP bytes (< 384/MB I_PCM floor): corrupt stream"
        )
    y = np.empty((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.empty((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.empty_like(cb)
    dec = _CabacDecoder(r)
    dec.start()
    ctxs = _mb_type_ctxs(qp)
    for my in range(mb_h):
        for mx in range(mb_w):
            ctx_inc = (1 if mx > 0 else 0) + (1 if my > 0 else 0)
            if dec.decision(ctxs[ctx_inc]) == 0:
                raise NotImplementedError(
                    "I_NxN macroblock under CABAC: spatial prediction + "
                    "residual syntax not implemented"
                )
            if dec.terminate() == 0:
                raise NotImplementedError(
                    "I_16x16 macroblock under CABAC: prediction + "
                    "residual syntax not implemented"
                )
            dec.pcm_sync()
            r.align()
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = np.frombuffer(
                r.raw_bytes(256, "pcm_sample_luma"), dtype=np.uint8
            ).reshape(16, 16)
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                r.raw_bytes(64, "pcm_sample_chroma cb"), dtype=np.uint8
            ).reshape(8, 8)
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                r.raw_bytes(64, "pcm_sample_chroma cr"), dtype=np.uint8
            ).reshape(8, 8)
            dec.start()
            eos = dec.terminate()
            last = my == mb_h - 1 and mx == mb_w - 1
            if eos != (1 if last else 0):
                raise ValueError(
                    f"end_of_slice_flag {eos} at macroblock ({my},{mx}) "
                    f"disagrees with the SPS macroblock count"
                )
    return y, cb, cr


def encode_frame_sample_cabac(px: np.ndarray, idr_pic_id: int = 0) -> bytes:
    """RGB frame -> one MP4 sample: the CABAC I_PCM IDR slice NAL with
    a 4-byte length prefix (avcC lengthSizeMinusOne = 3)."""
    from flow_indexer_spark.operators.h264codec import frame_to_planes

    y, cb, cr = frame_to_planes(px)
    nal = encode_idr_ipcm_cabac(y, cb, cr, idr_pic_id)
    return len(nal).to_bytes(4, "big") + nal
