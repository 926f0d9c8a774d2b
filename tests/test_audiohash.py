"""Audio spectral fingerprint: invariances (lossless WAV re-encode,
volume gain), near/far separation on the seeded clip family, and
banded-join ground-truth recall with zero false pairs."""

from __future__ import annotations

import numpy as np

from flow_indexer_spark.operators.audiohash import (
    audio_fingerprint,
    audio_fingerprint64,
    audio_near_pairs,
    colored_clip,
    make_audiofp_media,
    noisy_twin,
)
from flow_indexer_spark.operators.codecs import decode_wav_samples, encode_wav


def _ham(a, b):
    return bin((a ^ b) & (1 << 64) - 1).count("1")


def test_fingerprint_separation():
    fps = {}
    for k in range(16):
        base = colored_clip(k)
        fps[2 * k] = audio_fingerprint64(base)
        fps[2 * k + 1] = audio_fingerprint64(noisy_twin(base, k))
    near = [_ham(fps[2 * k], fps[2 * k + 1]) for k in range(16)]
    far = [
        _ham(fps[i], fps[j])
        for i in fps
        for j in fps
        if i < j and i // 2 != j // 2
    ]
    assert max(near) <= 4
    assert min(far) >= 16
    for v in fps.values():
        assert -(1 << 63) <= v < 1 << 63  # valid Spark long


def test_fingerprint_invariant_under_reencode_and_gain():
    clip = colored_clip(3)
    _, back = decode_wav_samples(encode_wav(clip))
    assert audio_fingerprint64(back) == audio_fingerprint64(clip)
    # volume change multiplies every band energy equally; the adjacent
    # log-difference bits cancel it (integer rounding aside, a clean
    # halving stays within a couple of bits)
    half = (clip.astype(np.int32) // 2).astype(np.int16)
    assert _ham(audio_fingerprint64(half), audio_fingerprint64(clip)) <= 2


def test_audio_near_pairs_exact_ground_truth(spark):
    fp = audio_fingerprint(make_audiofp_media(spark, 10)).cache()
    got = sorted(
        (r.id_a, r.id_b, r.dist) for r in audio_near_pairs(fp).collect()
    )
    assert [(a, b) for a, b, _ in got] == [
        (f"m{2 * k:05d}", f"m{2 * k + 1:05d}") for k in range(10)
    ]
    assert all(d <= 4 for _, _, d in got)
