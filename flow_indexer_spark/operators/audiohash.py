"""Spectral audio fingerprinting + banded Hamming near-dup join.

The audio member of the multimodal dedup trio (text simhash —
operators/dedup.py; image pHash — operators/imagehash.py): a corpus
carries the same clip re-encoded / slightly-noised many times, and
byte-level dedup misses every re-encode. The signature here is the
Haitsma-Kalker family idea reduced to a whole-clip form: decode PCM
(operators/codecs.py — real RIFF/WAV parser), full-clip FFT power
spectrum, fold into 65 linear bands, and take the sign of adjacent
log-band-energy differences -> 64 bits that survive low-amplitude
wideband noise (measured on the fixture family: twin distance <= 2,
unrelated >= 22) while staying volume-invariant (a gain multiplies
every band equally; log differences cancel it).

Pairing reuses the generic banded-Hamming join from imagehash —
4 x 16-bit band buckets, equi-join candidates, exact bit_count verify,
degenerate-bucket cap — so audio, image, and text near-dup all ride the
same join topology and the same scale guards.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flow_indexer_spark.operators.codecs import (
    AUDIO_SR,
    decode_wav_samples,
    encode_wav,
)
from flow_indexer_spark.operators.imagehash import phash_near_pairs

#: the banded join is hash-agnostic; re-export under its generic name
banded_hamming_pairs = phash_near_pairs

_BANDS = 65  # 65 band energies -> 64 adjacent-difference bits


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint of int16 mono samples: sign of
    adjacent log-band-energy differences over a 65-band fold of the
    full-clip power spectrum. Non-negative (top bit is bit 63 of 64 —
    value < 2**64; stored as the int64 two's-complement view)."""
    s = samples.astype(np.float64) / 32768.0
    spec = np.abs(np.fft.rfft(s)) ** 2
    nfreq = spec.size
    band = np.minimum((np.arange(nfreq) * _BANDS) // nfreq, _BANDS - 1)
    e = np.zeros(_BANDS)
    np.add.at(e, band, spec)
    le = np.log(e + 1e-12)
    v = 0
    for b in le[:-1] > le[1:]:
        v = (v << 1) | int(b)
    # two's-complement view so the value always fits a Spark LongType
    return v - (1 << 64) if v >= 1 << 63 else v


# --- deterministic fixture family: colored-noise clips + noisy twins -------


def colored_clip(base: int, n: int = 16000) -> np.ndarray:
    """A clip whose 64-band spectral envelope is seeded-random and
    BROADBAND: every fingerprint bit is structural signal (a sparse
    tone stack would leave most bands as numerical dust and the
    adjacent-difference bits unstable — same lesson as the image
    fixture's smooth-random grids)."""
    rng = np.random.default_rng(2000 + base)
    env = rng.uniform(0.1, 1.0, 64)
    nfreq = n // 2 + 1
    amp = env[np.minimum((np.arange(nfreq) * 64) // nfreq, 63)]
    phase = rng.uniform(0, 2 * np.pi, nfreq)
    spec = amp * np.exp(1j * phase)
    spec[0] = 0
    s = np.fft.irfft(spec, n)
    s = s / np.max(np.abs(s)) * 0.5
    return np.round(s * 32767).astype(np.int16)


def noisy_twin(samples: np.ndarray, base: int, noise_amp: float = 0.01) -> np.ndarray:
    """The 're-encoded copy' stand-in: additive seeded white noise at
    ~1% of full scale — audible damage, fingerprint-invisible."""
    rng = np.random.default_rng(7000 + base)
    noise = rng.normal(0, noise_amp * 16384, samples.size)
    return np.clip(samples.astype(np.float64) + noise, -32768, 32767).astype(
        np.int16
    )


def make_audiofp_media(spark, n_pairs: int = 24) -> DataFrame:
    """2*n_pairs real WAV payloads synthesized on executors: media 2k
    is a colored-noise clip, 2k+1 its noisy twin — ground truth for the
    near-dup join is exactly the (2k, 2k+1) pair list."""
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            payloads = []
            for i in ids:
                base = colored_clip(i // 2)
                clip = base if i % 2 == 0 else noisy_twin(base, i // 2)
                payloads.append(encode_wav(clip, AUDIO_SR))
            yield pd.DataFrame(
                {
                    "media_id": [f"m{i:05d}" for i in ids],
                    "payload": payloads,
                }
            )

    return spark.range(2 * n_pairs).repartition(
        max(2, spark.sparkContext.defaultParallelism // 4)
    ).mapInPandas(_gen, schema)


_FP_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("fingerprint", LongType(), False),
    ]
)


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, fingerprint): Arrow-batched
    WAV decode + spectral hash per clip, same mapInPandas seam as every
    codec stage."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for p in pdf["payload"]:
                _sr, samples = decode_wav_samples(bytes(p))
                fps.append(audio_fingerprint64(samples))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "fingerprint": fps}
            )

    return df.mapInPandas(_fp, _FP_SCHEMA)


def audio_near_pairs(
    fingerprints: DataFrame,
    max_dist: int = 8,
    n_bands: int = 4,
    max_bucket_df: int | None = 10_000,
) -> DataFrame:
    """Banded-LSH candidate join + exact Hamming verify over audio
    fingerprints — the shared topology, pointed at the fingerprint
    column."""
    return banded_hamming_pairs(
        fingerprints,
        max_dist=max_dist,
        n_bands=n_bands,
        id_col="media_id",
        hash_col="fingerprint",
        max_bucket_df=max_bucket_df,
    )
