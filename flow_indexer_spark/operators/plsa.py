"""pLSA topic modeling on-engine: fixed-iteration EM over doc-term
counts, bit-pinned across engines.

Probabilistic Latent Semantic Analysis (Hofmann, SIGIR 1999) factors
the doc-term matrix as p(w|d) = sum_z p(w|z) p(z|d) and fits the two
conditionals by EM.  It is the classic corpus topic model that needs
no sampling (unlike LDA's collapsed Gibbs), which makes it exactly
reproducible — the property every other trained-on-engine operator
here pins (logreg GD, FS-EM, Bradley-Terry MM, k-means).

Scale shape (what survives 100 TB):

- Sufficient statistics are the distinct (doc, term) counts — one
  exploded, map-side-combined groupBy, cached once and reused by
  every iteration.
- phi (vocab x K) is broadcast to the E-step; theta (docs x K) joins
  co-partitioned on doc.  The per-iteration cost is ONE shuffle join
  over the nd table plus two map-combined groupBys (doc-major for
  theta', term-major for phi') and a K-row global fold for phi's
  normalizer.  Iteration count is fixed and small — jobs scale with
  T, never with corpus size.
- K is a column-wise constant: responsibilities are K wide columns
  computed in one fixed-order expression, never an exploded topic
  dimension — no K-fold row blowup, no nondeterministic float
  reduction over topics.

Determinism (the bit-pinned trajectory discipline, as
operators/recordlinkage.py fs_em — but strictly tighter): every
corpus-sized float SUM is replaced by an integer sum (the E-step
emits responsibilities as scaled bigints, so M-step numerators are
SUM(n * R_z) over exact integers: associative, order-free, identical
at any parallelism), and every PARAMETER division is the exact
half-up integer formula ``units = (2a + b) div (2b)`` on the 10^-dp
lattice rather than a float ``round(a/b, dp)`` — float rounding of a
rational that lands exactly on a half-grid point is engine-dependent
(Spark rounds the double's decimal expansion, C libm rounds the
scaled product; they disagree one ulp around ties — observed on this
corpus), while the integer formula cannot tie.  The only float
round() left is the E-step responsibility quantization, whose input
is an identical double on both engines.  The phi update's
``2 * s * 10^dp`` exceeds int64, so that one division runs in
DECIMAL(38,0) / HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flow_indexer_spark.operators.dedup import md5_int32, tokens

__all__ = ["doc_term_counts", "plsa_em"]

_RAW_MOD = 1000  # hash-init raw weights in 1..1000


def doc_term_counts(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, token, n): the pLSA sufficient statistics — one exploded
    map-combined groupBy."""
    return (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("doc", "token")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _hash_raw(prefix: str, key, z: int) -> F.Column:
    """Deterministic engine-portable init weight in 1.._RAW_MOD."""
    h = md5_int32(F.concat_ws(":", F.lit(prefix), key.cast("string"), F.lit(str(z))))
    return (h % _RAW_MOD + 1).cast("bigint")


def plsa_em(
    nd: DataFrame,
    k: int = 3,
    n_iter: int = 2,
    dp: int = 9,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_iter`` EM iterations; returns (theta, phi):
    theta = (doc, th1..thK) with p(z|d), phi = (token, ph1..phK) with
    p(w|z), every value on the 10^-dp grid.

    Init is hash-based and engine-portable: raw weight
    md5('d:'|doc|':'|z) % 1000 + 1 (resp. 'w:'|token) normalized per
    doc (resp. per topic over the vocab), rounded to ``dp``."""
    if k < 2 or n_iter < 1:
        raise ValueError(f"need k >= 2, n_iter >= 1; got k={k} T={n_iter}")
    grid = float(10**dp)
    zs = range(1, k + 1)

    nd = nd.select("doc", "token", "n")

    # --- init theta: per-doc normalized hash weights ---------------------
    raws = [_hash_raw("d", F.col("doc"), z).alias(f"_r{z}") for z in zs]
    docs = nd.select("doc").distinct().select("doc", *raws)
    rsum = " + ".join(f"_r{z}" for z in zs)
    gi = 10**dp
    theta = docs.select(
        "doc",
        *[
            (
                F.expr(
                    f"(2 * _r{z} * {gi} + ({rsum})) div (2 * ({rsum}))"
                )
                / grid
            ).alias(f"th{z}")
            for z in zs
        ],
    )

    # --- init phi: per-topic normalized over the vocab -------------------
    vraws = [_hash_raw("w", F.col("token"), z).alias(f"_r{z}") for z in zs]
    vocab = nd.select("token").distinct().select("token", *vraws)
    vsums = vocab.agg(
        *[F.sum(f"_r{z}").cast("bigint").alias(f"_s{z}") for z in zs]
    )
    phi = vocab.join(F.broadcast(vsums)).select(
        "token",
        *[
            (
                F.expr(f"(2 * _r{z} * {gi} + _s{z}) div (2 * _s{z})") / grid
            ).alias(f"ph{z}")
            for z in zs
        ],
    )

    for _ in range(n_iter):
        # E-step: responsibilities as scaled bigints on the 10^-dp grid
        j = nd.join(theta, "doc").join(F.broadcast(phi), "token")
        nums = [F.col(f"th{z}") * F.col(f"ph{z}") for z in zs]
        denom = nums[0]
        for t in nums[1:]:
            denom = denom + t
        resp = j.select(
            "doc",
            "token",
            "n",
            *[
                F.round(nums[i] / denom * grid).cast("bigint").alias(f"R{z}")
                for i, z in enumerate(zs)
            ],
        )

        # M-step theta': per-doc integer sums (exact, order-free)
        theta = resp.groupBy("doc").agg(
            *[F.sum(F.col("n") * F.col(f"R{z}")).alias(f"_s{z}") for z in zs],
            F.sum("n").alias("_nd"),
        )
        theta = theta.select(
            "doc",
            *[
                (F.expr(f"(2 * _s{z} + _nd) div (2 * _nd)") / grid).alias(
                    f"th{z}"
                )
                for z in zs
            ],
        )

        # M-step phi': per-term integer numerators + K-row global fold
        wnum = resp.groupBy("token").agg(
            *[F.sum(F.col("n") * F.col(f"R{z}")).alias(f"_s{z}") for z in zs]
        )
        wden = wnum.agg(
            *[F.sum(f"_s{z}").cast("bigint").alias(f"_d{z}") for z in zs]
        )
        phi = wnum.join(F.broadcast(wden)).select(
            "token",
            *[
                (
                    F.expr(
                        f"(2 * CAST(_s{z} AS DECIMAL(38,0)) * {gi} + _d{z})"
                        f" div (2 * _d{z})"
                    )
                    / grid
                ).alias(f"ph{z}")
                for z in zs
            ],
        )
        # tiny param tables; materialize to keep each iteration's plan
        # flat (checkpoint=False leaves the full lineage visible for
        # plan-shape pins)
        if checkpoint:
            theta = theta.localCheckpoint(eager=False)
            phi = phi.localCheckpoint(eager=False)

    return theta, phi
