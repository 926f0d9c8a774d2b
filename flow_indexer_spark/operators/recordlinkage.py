"""Probabilistic record linkage: Fellegi-Sunter with unsupervised EM.

The reference links records only by exact entity-key equality (a
posting-list hit, store/leveldb.go:147-205); `operators/entitymatch.py`
relaxes that to single-field fuzzy equality.  Real entity resolution
over profile-like records (user accounts, customers, document
metadata) is MULTI-field and probabilistic: Fellegi & Sunter (JASA
1969) score a candidate pair by the likelihood ratio of its field-
agreement vector under the match vs non-match hypotheses, and Winkler
(1988) showed the m/u parameters can be estimated UNSUPERVISED with EM
— no labeled pairs needed.

Scale shape (the classic trick that makes FS-EM embarrassingly cheap
at any corpus size):

- **Blocking** bounds the candidate space: an equi-join on a blocking
  key, never a global cross join.  Block sizes are the skew knob — a
  hot block is the same problem as a hot posting key, and the same
  salting/cap answers apply upstream.
- **Gamma compression**: with k binary comparators every pair maps to
  one of 2^k agreement patterns, so EM's sufficient statistics are the
  pattern COUNTS.  One groupBy over the pairs produces a <= 2^k-row
  contingency table; EM then iterates on the driver over that tiny
  table (pure arithmetic — +, *, / only, no libm), and posteriors map
  back to pairs through a broadcast join of <= 2^k rows.  The corpus
  is scanned exactly once regardless of iteration count.
- Every EM quantity is rounded half-away-from-zero to ``dp`` decimals
  per step on BOTH engines (same discipline as the logreg trainer's
  bit-pinned trajectory) so cross-engine float drift is absorbed at
  each step instead of compounding.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _round_away(x: float, dp: int) -> float:
    """Round half away from zero (SQL ROUND semantics; Python's built-in
    round is banker's).  Inputs here are probabilities in [0, 1], so
    x*10^dp stays far below 2^52 and the +0.5/floor sequence is exact."""
    scale = 10.0**dp
    return math.floor(x * scale + 0.5) / scale if x >= 0 else -math.floor(
        -x * scale + 0.5
    ) / scale


def agreement_pairs(
    a: DataFrame,
    b: DataFrame,
    block_key: str,
    comparators: dict[str, Column],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Blocked candidate pairs with the binary agreement vector.

    ``comparators`` maps gamma-column name -> boolean Column over the
    joined row (reference columns of ``a`` and ``b`` by name; callers
    disambiguate with aliases).  Output: id_a, id_b, g_<name> ints.
    """
    pairs = a.join(b, block_key)
    gammas = [
        F.when(cond, 1).otherwise(0).cast("int").alias(f"g_{name}")
        for name, cond in comparators.items()
    ]
    return pairs.select(id_a, id_b, *gammas)


def pattern_counts(pairs: DataFrame, gamma_cols: list[str]) -> DataFrame:
    """Gamma-pattern contingency table: the sufficient statistics of
    FS-EM (one shuffle over the pairs, <= 2^k output rows)."""
    return pairs.groupBy(*gamma_cols).agg(F.count("*").cast("bigint").alias("n"))


def fs_em(
    patterns: list[tuple[tuple[int, ...], int]],
    k: int,
    n_iter: int = 3,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    dp: int = 9,
) -> tuple[float, list[float], list[float]]:
    """EM for (p, m_i, u_i) over the pattern contingency table.

    ``patterns`` is [(gamma_tuple, count)].  Pure driver-side
    arithmetic on <= 2^k rows; every parameter is rounded to ``dp``
    after each M-step, matching the SQL oracle's unrolled iterations
    bit-for-bit.  Products run in field order (the same left-to-right
    association the oracle SQL spells out).
    """
    patterns = sorted(patterns)  # deterministic float-sum order
    total_n = float(sum(n for _, n in patterns))
    p = p0
    m = [m0] * k
    u = [u0] * k
    for _ in range(n_iter):
        sw = swn = 0.0
        smg = [0.0] * k
        sug = [0.0] * k
        for g, n in patterns:
            w = _posterior(g, p, m, u)
            sw += n * w
            swn += n * (1.0 - w)
            for i in range(k):
                if g[i]:
                    smg[i] += n * w
                    sug[i] += n * (1.0 - w)
        p = _round_away(sw / total_n, dp)
        m = [_round_away(smg[i] / sw, dp) for i in range(k)]
        u = [_round_away(sug[i] / swn, dp) for i in range(k)]
    return p, m, u


def _posterior(g: tuple[int, ...], p: float, m: list[float], u: list[float]) -> float:
    lm = p
    lu = 1.0 - p
    for i in range(len(g)):
        lm = lm * (m[i] if g[i] else 1.0 - m[i])
        lu = lu * (u[i] if g[i] else 1.0 - u[i])
    return lm / (lm + lu)


def fs_link(
    pairs: DataFrame,
    gamma_cols: list[str],
    n_iter: int = 3,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    dp: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Full FS-EM linkage.  Returns (pattern_report, scored_pairs):

    - pattern_report: one row per observed gamma pattern with its pair
      count and converged match posterior (<= 2^k rows).
    - scored_pairs: every candidate pair with its posterior, via a
      broadcast join of the pattern report back onto the pairs.

    The contingency-table collect is the documented driver edge —
    <= 2^k rows regardless of corpus size (the same contract as the
    metrics/manifest collects in plans/pipeline.py).
    """
    k = len(gamma_cols)
    counts = pattern_counts(pairs, gamma_cols)
    rows = counts.collect()
    patterns = [
        (tuple(int(r[c]) for c in gamma_cols), int(r["n"])) for r in rows
    ]
    p, m, u = fs_em(patterns, k, n_iter=n_iter, p0=p0, m0=m0, u0=u0, dp=dp)
    scored = [
        (*g, n, _round_away(_posterior(g, p, m, u), dp)) for g, n in patterns
    ]
    spark = pairs.sparkSession
    report = spark.createDataFrame(
        scored, ", ".join(f"{c} int" for c in gamma_cols) + ", n_pairs bigint, posterior double"
    )
    scored_pairs = pairs.join(
        F.broadcast(report.select(*gamma_cols, "posterior")), gamma_cols
    )
    return report, scored_pairs


def fs_em_oracle_sql(
    pairs_cte: str,
    gamma_cols: list[str],
    n_iter: int = 3,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    dp: int = 9,
) -> str:
    """Unrolled-EM SQL replica (the logreg-oracle pattern): iteration
    i's M-step aggregates the <= 2^k-row pattern CTE weighted by
    iteration i's 1-row parameter CTE.  Returns SQL producing
    (gamma..., n_pairs, posterior) — round(..., dp) at every step in
    the same places the Python EM rounds."""
    gs = gamma_cols
    parts = [
        f"pat AS (SELECT {', '.join(gs)}, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM ({pairs_cte}) GROUP BY {', '.join(gs)})"
    ]
    e0 = [f"CAST({p0} AS DOUBLE) AS p"]
    for g in gs:
        e0.append(f"CAST({m0} AS DOUBLE) AS m_{g}")
        e0.append(f"CAST({u0} AS DOUBLE) AS u_{g}")
    parts.append(f"e0 AS (SELECT {', '.join(e0)})")

    def lik(prefix: str) -> str:
        terms = ["p" if prefix == "m" else "(1.0 - p)"]
        for g in gs:
            terms.append(
                f"(CASE WHEN {g} = 1 THEN {prefix}_{g} ELSE 1.0 - {prefix}_{g} END)"
            )
        expr = terms[0]
        for t in terms[1:]:
            expr = f"({expr} * {t})"
        return expr

    w_expr = f"({lik('m')} / ({lik('m')} + {lik('u')}))"
    for i in range(n_iter):
        parts.append(
            f"w{i} AS (SELECT {', '.join(gs)}, n, {w_expr} AS w FROM pat, e{i})"
        )
        msel = [f"round(SUM(n * w) / SUM(n), {dp}) AS p"]
        for g in gs:
            msel.append(
                f"round(SUM(n * w * {g}) / SUM(n * w), {dp}) AS m_{g}"
            )
            msel.append(
                f"round(SUM(n * (1.0 - w) * {g}) / SUM(n * (1.0 - w)), {dp}) AS u_{g}"
            )
        parts.append(f"e{i + 1} AS (SELECT {', '.join(msel)} FROM w{i})")
    parts.append(
        f"fin AS (SELECT {', '.join(gs)}, n AS n_pairs, "
        f"round({w_expr}, {dp}) AS posterior FROM pat, e{n_iter})"
    )
    return "WITH " + ",\n".join(parts)
