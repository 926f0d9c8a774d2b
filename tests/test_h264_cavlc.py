"""Dedicated conformance + property tests for the full CAVLC codec
(flow_indexer_spark/operators/h264cavlc.py, spec clause 9.2).

The module's import-time audit proves the transcribed tables are
prefix-free (and Kraft-complete where the spec builds complete codes);
these tests prove the *codec logic* around them: the published worked
example bit-for-bit, exhaustive round-trips across every nC context and
coefficient-pattern class, the adaptive suffixLength trajectory, the
escape ceilings, and the corruption contract (bad streams classify as
ValueError, never misdecode silently).
"""
from __future__ import annotations

import random

import pytest

from flow_indexer_spark.operators import h264cavlc as C
from flow_indexer_spark.operators.h264codec import _BitReader, _BitWriter


def _roundtrip(coeffs, nc):
    w = _BitWriter()
    C.encode_block(w, list(coeffs), nc)
    bits = w.rbsp_trailing()
    out = C.decode_block(_BitReader(bits), nc, len(coeffs))
    return out, bits


# --- the published worked example --------------------------------------------


def test_spec_worked_example_bit_exact():
    """The classic 9.2 worked example (Richardson, 'H.264 and MPEG-4
    Video Compression', CAVLC example 1): zigzag coefficients
    0,3,0,1,-1,-1,0,1,0... -> TotalCoeff=5, TrailingOnes=3,
    total_zeros=3, encoded '000010001110010111101101' at nC=0."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    w = _BitWriter()
    C.encode_block(w, coeffs, nc=0)
    got = "".join(
        str((b >> (7 - i)) & 1) for b in w._bytes for i in range(8)
    ) + "".join(str((w._acc >> (w._n - 1 - i)) & 1) for i in range(w._n))
    assert got == "000010001110010111101101"
    out = C.decode_block(_BitReader(w.rbsp_trailing()), 0, 16)
    assert out == coeffs


def test_empty_block_is_one_bit_at_nc0():
    w = _BitWriter()
    C.encode_block(w, [0] * 16, nc=0)
    assert (w._n, w._acc) == (1, 1)  # coeff_token(0,0) = '1'


# --- exhaustive / randomized round-trips --------------------------------------

_NCS = [-1, 0, 1, 2, 3, 4, 5, 7, 8, 12, 16]


@pytest.mark.parametrize("nc", _NCS)
def test_roundtrip_single_coefficient_every_position_and_sign(nc):
    max_coeff = 4 if nc == -1 else 16
    for pos in range(max_coeff):
        for level in (1, -1, 2, -3, 17, -2064):
            coeffs = [0] * max_coeff
            coeffs[pos] = level
            out, _ = _roundtrip(coeffs, nc)
            assert out == coeffs, (nc, pos, level)


@pytest.mark.parametrize("nc", _NCS)
def test_roundtrip_randomized_full_alphabet(nc):
    """2000 random blocks per context: every TotalCoeff 0..max,
    every TrailingOnes class, mixed signs, levels spanning the
    suffixLength ladder and both escape paths."""
    rng = random.Random(0xCAFE + nc)
    max_coeff = 4 if nc == -1 else 16
    for _ in range(2000):
        tc = rng.randint(0, max_coeff)
        positions = sorted(rng.sample(range(max_coeff), tc))
        coeffs = [0] * max_coeff
        for p in positions:
            mag = rng.choice((1, 1, 1, 2, 3, 4, 7, 15, 48, 500, 2000))
            coeffs[p] = mag if rng.random() < 0.5 else -mag
        out, _ = _roundtrip(coeffs, nc)
        assert out == coeffs


def test_roundtrip_dense_blocks_exercise_suffixlen_init_1():
    """TotalCoeff > 10 with TrailingOnes < 3 initializes suffixLength
    to 1 (9.2.2.1) — dense blocks with a large leading level pin it."""
    rng = random.Random(7)
    for _ in range(500):
        coeffs = [rng.choice((-9, -2, 2, 5, 9)) for _ in range(16)]
        k = rng.randint(11, 16)
        for p in rng.sample(range(16), 16 - k):
            coeffs[p] = 0
        out, _ = _roundtrip(coeffs, 0)
        assert out == coeffs


def test_roundtrip_trailing_one_run_longer_than_three():
    """A run of four +/-1s: only three are TrailingOnes; the fourth is
    a regular level with abs==1 and NO first-coefficient adjustment."""
    coeffs = [1, -1, 1, -1] + [0] * 12
    out, _ = _roundtrip(coeffs, 0)
    assert out == coeffs
    coeffs = [1] * 16
    out, _ = _roundtrip(coeffs, 4)
    assert out == coeffs


def test_first_escape_adjustment_levels():
    """TrailingOnes < 3 => the first regular level has abs >= 2 and is
    coded with levelCode -= 2; abs(level) == 2 maps to code 0/1."""
    for lead in (2, -2, 3, -3):
        coeffs = [lead, 1, 1] + [0] * 13  # T1=2 (then the lead level)
        out, _ = _roundtrip(coeffs, 0)
        assert out == coeffs


def test_escape_ceilings_both_suffix_paths():
    # suffix_len == 0 path: max encodable abs level is (30+4096+2)/2
    _roundtrip([2064] + [0] * 15, 0)
    w = _BitWriter()
    with pytest.raises(ValueError, match="escape"):
        C.encode_block(w, [2066] + [0] * 15, 0)
    # adaptive path: second level rides suffix_len >= 1
    out, _ = _roundtrip([2000, 5] + [0] * 14, 0)
    assert out == [2000, 5] + [0] * 14


# --- corruption contract -------------------------------------------------------


def test_truncated_stream_classifies():
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    w = _BitWriter()
    C.encode_block(w, coeffs, 0)
    bits = w.rbsp_trailing()
    for cut in range(len(bits) - 1):
        with pytest.raises(ValueError):
            C.decode_block(_BitReader(bits[:cut]), 0, 16)


def test_flc_coeff_token_rejects_t1_gt_totalcoeff():
    w = _BitWriter()
    # FLC (nC>=8): TotalCoeff = (code>>2)+1 = 1, TrailingOnes = 2 -> bad
    w.u((0 << 2) | 2, 6)
    with pytest.raises(ValueError, match="TrailingOnes"):
        C.decode_block(_BitReader(w.rbsp_trailing()), 8, 16)


def test_totalcoeff_exceeding_max_coeff_classifies():
    w = _BitWriter()
    C.encode_block(w, [1, 1, 1, 1, 1] + [0] * 11, 0)  # TotalCoeff=5
    with pytest.raises(ValueError, match="maxNumCoeff"):
        C.decode_block(_BitReader(w.rbsp_trailing()), 0, 4)


def test_run_before_exceeding_zeros_left_classifies():
    # Hand-build: TotalCoeff=2,T1=2 at nC=0 ('001'), signs '00',
    # total_zeros=1 for TC=2 ('110'), then run_before=1 at zerosLeft=1
    # ('0') is legal -- craft the illegal variant via zerosLeft mismatch:
    # total_zeros=0 ('111') leaves zeros_left=0 so no run_before is read
    # and the stream must still decode; the illegal case needs
    # total_zeros>max. TC=2, tz codes len 15: pick tz=14 ('000000')
    w = _BitWriter()
    # ... + run_before=0 at zerosLeft=14 (>6 column: '111')
    for b in "001" + "00" + "000000" + "111":
        w.u(int(b), 1)
    out = C.decode_block(_BitReader(w.rbsp_trailing()), 0, 16)
    assert out == [0] * 14 + [1, 1]  # tz=14: both coeffs at the top
    # now the same prefix against max_coeff=16 but TC+tz overflowing is
    # impossible by table construction -- assert the guard exists for
    # the chroma column where it can: TC=1, tz=3 on a 2x2 block is fine;
    # decode with max_coeff=2 so tz=3 > max_coeff-tc
    w2 = _BitWriter()
    for b in "1" + "0" + "000":  # chromaDC TC=1,T1=1; sign +; tz=3
        w2.u(int(b), 1)
    with pytest.raises(ValueError):
        C.decode_block(_BitReader(w2.rbsp_trailing()), -1, 2)


def test_random_bitstreams_never_return_garbage_silently():
    """Fuzz: random bytes either decode to a structurally-valid block
    (coefficient count == TotalCoeff <= max) or raise ValueError."""
    rng = random.Random(99)
    decoded = failed = 0
    for _ in range(3000):
        data = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 12)))
        for nc in (-1, 0, 2, 4, 8):
            max_coeff = 4 if nc == -1 else 16
            try:
                out = C.decode_block(_BitReader(data), nc, max_coeff)
            except ValueError:
                failed += 1
                continue
            decoded += 1
            assert len(out) == max_coeff
            assert all(isinstance(v, int) for v in out)
    assert decoded and failed  # both branches exercised


# --- nC neighbour contexts ------------------------------------------------------


def test_nc_from_plane_neighbour_rule():
    import numpy as np

    nzc = np.full((4, 4), -1, dtype=np.int16)
    assert C.nc_from_plane(nzc, 0, 0) == 0  # nothing available
    nzc[0, 0] = 3
    assert C.nc_from_plane(nzc, 1, 0) == 3  # only A
    assert C.nc_from_plane(nzc, 0, 1) == 3  # only B
    nzc[0, 1] = 6
    nzc[1, 0] = 1
    # both: (nA + nB + 1) >> 1, A=left=nzc[1,0]=1? no: A is (gy,gx-1)
    assert C.nc_from_plane(nzc, 1, 1) == (1 + 6 + 1) >> 1


def test_nc_from_plane_ipcm_counts_as_16():
    import numpy as np

    nzc = np.full((2, 2), -1, dtype=np.int16)
    nzc[0, 0] = 16  # I_PCM convention: treated as 16 nonzero coeffs
    assert C.nc_from_plane(nzc, 1, 0) == 16
    nzc[0, 1] = 16
    assert C.nc_from_plane(nzc, 1, 1) == 16  # (16+16+1)>>1
