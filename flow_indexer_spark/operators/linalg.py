"""Distributed dense linear algebra over embedding columns: gram /
covariance matrices and PCA — the whitening / dimensionality-reduction
building blocks of an embedding-curation pipeline (SemDeDup-style
clustering pre-whitening, PQ rotation, low-rank diagnostics).

Public-source analogues: Spark MLlib's ``RowMatrix.computeGramianMatrix``
/ ``computePrincipalComponents`` (org/apache/spark/mllib/linalg/
distributed/RowMatrix.scala) use the same shape — per-partition BLAS
partials reduced to one small driver-side matrix; the reference engine
has no embedding surface (its values are scalar counters,
/root/reference/store/leveldb.go), so this extends the platform the way
its stats extend search.

Scale shape (the ONLY thing that moves at 100 TB):
- one pass over the rows, ``mapInPandas`` accumulating a d x d int64/
  float64 partial PER PARTITION (one numpy matmul per Arrow batch —
  BLAS for floats, C integer loops for int64);
- each partition emits d*(d+1)/2 upper-triangle rows ONCE (not per
  batch), so the single Exchange carries O(partitions * d^2) tiny rows
  — never O(rows);
- the reduced matrix is driver-sized (d <= a few thousand); eigen-
  decomposition happens there, and the projection back over the corpus
  is a stateless in-row Pandas UDF (no shuffle, no second reduce).

``quantized_gram`` floors values to an integer grid first, making the
reduction EXACT integer arithmetic — bit-identical across partitionings
and engines (the oracle-twinned query path; float reductions commute
only approximately). ``floor`` (not ``round``) because its tie behavior
is identical everywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_GRAM_SCHEMA = StructType(
    [
        StructField("i", IntegerType()),
        StructField("j", IntegerType()),
        StructField("g", LongType()),
    ]
)


def quantized_gram(
    df: DataFrame, col: str = "embedding", scale: int = 1000
) -> DataFrame:
    """Upper-triangle gram matrix of ``floor(x * scale)`` int64 vectors.

    Returns (i, j, g) with 0-based ``i <= j``; exact integer sums, so
    the result is independent of partitioning and bit-identical to any
    other engine's evaluation (the DuckDB oracle twin).

    Overflow headroom: |q| <= scale * max|x|; with unit-norm-ish
    embeddings and scale=1000 each product is ~1e6 and int64 holds
    ~9.2e18 — 1e12 rows of margin. Callers with larger grids pick a
    smaller scale.
    """
    d_col = col

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[d_col]], dtype=np.float64
            )
            q = np.floor(x * scale).astype(np.int64)
            g = q.T @ q  # int64 matmul: numpy C loops, exact
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu.astype(np.int32),
                "j": ju.astype(np.int32),
                "g": acc[iu, ju],
            }
        )

    partials = df.select(F.col(d_col)).mapInPandas(part, _GRAM_SCHEMA)
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


_MOMENTS_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


def _moments(df: DataFrame, col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One pass -> (n, sum vector, gram matrix) in float64. Per-partition
    numpy partials; the driver reduces O(partitions) rows."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s: np.ndarray | None = None
        g: np.ndarray | None = None
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[col]], dtype=np.float64
            )
            n += x.shape[0]
            bs = x.sum(axis=0)
            bg = x.T @ x
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    rows = df.select(F.col(col)).mapInPandas(part, _MOMENTS_SCHEMA).collect()
    if not rows:
        raise ValueError("empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def pca_fit(df: DataFrame, col: str = "embedding", k: int = 2) -> dict:
    """Fit PCA: one distributed moments pass + driver-side eigh of the
    d x d covariance. Returns {mean, components (k x d), explained}.

    Component sign is normalized (largest-|coef| entry positive) so the
    fit is deterministic under eigenvector sign ambiguity.
    """
    n, s, g = _moments(df, col)
    if n < 2:
        raise ValueError("need >= 2 rows to fit PCA")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return {
        "mean": mean,
        "components": comps,
        "explained": w[order] / max(w.sum(), 1e-300),
    }


def pca_transform(
    df: DataFrame, model: dict, col: str = "embedding", out: str = "proj"
) -> DataFrame:
    """Project rows onto the fitted components: stateless in-row Pandas
    UDF over broadcast-small (k x d) weights — no shuffle, no join."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def proj(embs: pd.Series) -> pd.Series:
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in embs], dtype=np.float64
        )
        p = (x - mean) @ comps.T
        return pd.Series(list(p.astype(np.float32)))

    return df.withColumn(out, proj(F.col(col)))
