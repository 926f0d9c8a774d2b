"""Perceptual image hash: bit-level invariances (lossless re-encode,
brightness shift), near/far separation on the seeded fixture family,
banded-join ground-truth recall with zero false pairs, and the
degenerate-bucket cap."""

from __future__ import annotations

import numpy as np
import pytest

from flow_indexer_spark.operators.codecs import decode_pixels, encode_png
from flow_indexer_spark.operators.imagehash import (
    image_phash,
    make_phash_media,
    noisy_twin,
    phash64_pixels,
    phash_near_pairs,
    smooth_image,
)


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_phash_separation_near_vs_far():
    hashes = {}
    for k in range(16):
        base = smooth_image(k)
        hashes[2 * k] = phash64_pixels(base)
        hashes[2 * k + 1] = phash64_pixels(noisy_twin(base, k))
    near = [_ham(hashes[2 * k], hashes[2 * k + 1]) for k in range(16)]
    far = [
        _ham(hashes[i], hashes[j])
        for i in hashes
        for j in hashes
        if i < j and i // 2 != j // 2
    ]
    assert max(near) <= 4
    assert min(far) >= 16
    for v in hashes.values():
        assert 0 <= v < 1 << 63  # 63-bit: always a valid signed long


def test_phash_invariant_under_lossless_reencode():
    for k in (0, 3, 9):
        px = smooth_image(k)
        assert phash64_pixels(decode_pixels(encode_png(px))) == phash64_pixels(
            px
        )


def test_phash_brightness_invariant():
    """Dropping the DC coefficient makes a uniform brightness shift a
    no-op (values stay in range, so no clipping nonlinearity)."""
    px = smooth_image(1)
    brighter = (px.astype(np.int16) + 20).astype(np.uint8)
    assert int(brighter.max()) <= 255
    assert phash64_pixels(brighter) == phash64_pixels(px)


def test_near_pairs_exact_ground_truth(spark):
    h = image_phash(make_phash_media(spark, 12)).cache()
    got = sorted(
        (r.id_a, r.id_b, r.dist) for r in phash_near_pairs(h).collect()
    )
    assert [(a, b) for a, b, _ in got] == [
        (f"m{2 * k:05d}", f"m{2 * k + 1:05d}") for k in range(12)
    ]
    assert all(d <= 4 for _, _, d in got)


def test_near_pairs_bucket_cap_drops_degenerate(spark):
    # 50 identical hashes = one degenerate bucket per band; a cap of 10
    # must drop them all (no quadratic join), and a tolerant cap keeps
    # the full clique
    rows = [(f"d{i:03d}", 12345) for i in range(50)]
    h = spark.createDataFrame(rows, "media_id string, phash long")
    assert phash_near_pairs(h, max_bucket_df=10).count() == 0
    assert phash_near_pairs(h, max_bucket_df=100).count() == 50 * 49 // 2


def test_near_pairs_rejects_bad_bands(spark):
    h = spark.createDataFrame([("a", 1)], "media_id string, phash long")
    with pytest.raises(ValueError):
        phash_near_pairs(h, n_bands=5)
