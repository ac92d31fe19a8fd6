"""F15 — prior transforms + sample-parallel posterior estimation.

Reference priors (enterprise_models.py:578-589 + bilby adapters
bilby_warp.py:40-106): Uniform, LinearExponential (log-uniform amplitude),
Normal, TruncatedNormal, Constant. Here each prior is a column expression
over rand(seed) — deterministic, reproducible, and generated distributed
(no driver-side RNG loops).

Posterior estimation: importance weights w_i = exp(lnl_i - max lnl) over the
prior sample; summaries (mean, credible intervals) are weighted aggregates.
Replaces the reference's sequential MCMC with a sample-parallel scheme — the
number of likelihood evaluations is the same, but they all run at once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Prior:
    name: str
    kind: str  # uniform | linearexp | normal | truncnormal | constant
    a: float = 0.0  # lo / mu / value
    b: float = 1.0  # hi / sigma
    lo: float = float("-inf")  # truncnormal bounds
    hi: float = float("inf")


# Acklam's inverse normal CDF — a piecewise rational approximation
# (~1.15e-9 relative error), published algorithm; expressed as pure column
# arithmetic so truncated-normal sampling stays JVM-side (no erfinv in
# Spark SQL and no scipy in this environment).
_ACK_A = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
          1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
_ACK_B = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
          6.680131188771972e01, -1.328068155288572e01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
          -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
          3.754408661907416e00)


def _poly(q: F.Column, coeffs) -> F.Column:
    out = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        out = out * q + F.lit(float(c))
    return out


def probit(p: F.Column) -> F.Column:
    """Inverse standard-normal CDF as a column expression (Acklam)."""
    # clamp away the open-interval endpoints: F.rand() can return exactly
    # 0.0 (and an infinite truncation bound maps it there), where
    # sqrt(-2*log(0)) = inf and the rational tail becomes inf/inf = NaN —
    # one poisoned sample row. 1e-15 keeps ~|z| <= 8, far outside any
    # realistic truncation window.
    p = F.greatest(F.least(p, F.lit(1.0 - 1e-15)), F.lit(1e-15))
    p_low = 0.02425
    q_c = p - 0.5
    r_c = q_c * q_c
    central = (_poly(r_c, _ACK_A) * q_c) / (_poly(r_c, _ACK_B) * r_c + F.lit(1.0))
    q_l = F.sqrt(-2.0 * F.log(p))
    lower = _poly(q_l, _ACK_C) / (_poly(q_l, _ACK_D) * q_l + F.lit(1.0))
    q_u = F.sqrt(-2.0 * F.log(1.0 - p))
    upper = -_poly(q_u, _ACK_C) / (_poly(q_u, _ACK_D) * q_u + F.lit(1.0))
    return (
        F.when(p < p_low, lower)
        .when(p > 1.0 - p_low, upper)
        .otherwise(central)
    )


def _column(p: Prior, u: F.Column, g: F.Column) -> F.Column:
    if p.kind == "uniform":
        return u * (p.b - p.a) + p.a
    if p.kind == "linearexp":  # log10-amplitude uniform in [a, b]
        return u * (p.b - p.a) + p.a
    if p.kind == "normal":
        return g * p.b + p.a
    if p.kind == "truncnormal":
        # exact inverse-CDF sampling of N(a, b) truncated to [lo, hi]
        # (bilby_warp.py:67-68 TruncatedGaussian): the bound CDFs are
        # plain driver-side constants, only probit runs per row
        import math as _math

        alpha = ( _math.erf(((p.lo - p.a) / p.b) / _math.sqrt(2.0)) + 1.0) / 2.0 \
            if _math.isfinite(p.lo) else 0.0
        beta = (_math.erf(((p.hi - p.a) / p.b) / _math.sqrt(2.0)) + 1.0) / 2.0 \
            if _math.isfinite(p.hi) else 1.0
        return probit(u * (beta - alpha) + F.lit(alpha)) * p.b + p.a
    if p.kind == "constant":
        return F.lit(p.a)
    raise ValueError(f"unknown prior kind {p.kind}")


def sample_priors(
    spark: SparkSession, priors: list[Prior], n: int, seed: int = 42
) -> DataFrame:
    """(sample_id, <param columns>) — one rand/randn stream per parameter."""
    df = spark.range(n).withColumnRenamed("id", "sample_id")
    for i, p in enumerate(priors):
        u = F.rand(seed + 1000 * i)
        g = F.randn(seed + 1000 * i)
        df = df.withColumn(p.name, _column(p, u, g))
    return df


def posterior_summary(samples_lnl: DataFrame, param_cols: list[str]) -> DataFrame:
    """Importance-weighted posterior mean/std per parameter + the MAP sample.

    samples_lnl: (sample_id, <params...>, lnl). Weights are normalized
    against max(lnl) for stability; all aggregates are single-shuffle.
    """
    mx = samples_lnl.agg(F.max("lnl").alias("_mx"))
    weighted = samples_lnl.join(F.broadcast(mx)).withColumn(
        "w", F.exp(F.col("lnl") - F.col("_mx"))
    )
    aggs = []
    for c in param_cols:
        aggs += [
            (F.sum(F.col(c) * F.col("w")) / F.sum("w")).alias(f"{c}_mean"),
            F.sqrt(
                F.sum(F.col(c) * F.col(c) * F.col("w")) / F.sum("w")
                - F.pow(F.sum(F.col(c) * F.col("w")) / F.sum("w"), 2)
            ).alias(f"{c}_std"),
            F.max_by(F.col(c), F.col("lnl")).alias(f"{c}_map"),
        ]
    return weighted.agg(*aggs)


def refined_samples(
    spark: SparkSession,
    priors: list[Prior],
    centers: dict[str, float],
    scales: dict[str, float],
    n: int,
    seed: int,
) -> DataFrame:
    """Gaussian proposal around `centers`, clipped to the prior box —
    one adaptive-importance-sampling round (all rand/randn columns)."""
    df = spark.range(n).withColumnRenamed("id", "sample_id")
    for i, p in enumerate(priors):
        if p.kind == "constant":
            df = df.withColumn(p.name, F.lit(p.a))
            continue
        g = F.randn(seed + 1000 * i)
        col = g * float(scales[p.name]) + float(centers[p.name])
        if p.kind in ("uniform", "linearexp"):
            col = F.greatest(F.lit(p.a), F.least(F.lit(p.b), col))
        elif p.kind == "truncnormal":
            import math as _math

            if _math.isfinite(p.lo):
                col = F.greatest(F.lit(p.lo), col)
            if _math.isfinite(p.hi):
                col = F.least(F.lit(p.hi), col)
        df = df.withColumn(p.name, col)
    return df


# adaptive_posterior round-trips each round's scored samples through the
# driver (the CEM refit is a driver-side pandas moment fit). That is fine at
# the design scale — hundreds to thousands of samples of tens of params —
# but it is NOT a distributed reduction: the cap below turns a silent
# 10^7-samples-per-round driver OOM into a loud plan-time error. Rounds
# times n_per_round rows are also retained driver-side across rounds.
MAX_ADAPTIVE_N_PER_ROUND = 65_536


def adaptive_posterior(
    spark: SparkSession,
    priors: list[Prior],
    score_fn,
    rounds: int = 4,
    n_per_round: int = 256,
    seed: int = 42,
    elite_frac: float = 0.2,
):
    """Cross-entropy-method posterior search: each round fits the Gaussian
    proposal to the ELITE set (top lnl) of ALL samples scored so far, so a
    lucky early sample is refined rather than lost and a mediocre first
    round cannot trap the proposal (greedy weighted-moment refits measurably
    did). Replaces the reference's sequential MCMC exploration with waves of
    embarrassingly parallel scoring; deterministic given the seed.

    score_fn(samples_df) -> DataFrame(sample_id, lnl).
    Returns (all_scored_df, summary_row_df over the final elite-weighted set).
    """
    import numpy as _np
    import pandas as _pd

    if n_per_round > MAX_ADAPTIVE_N_PER_ROUND:
        raise ValueError(
            f"adaptive_posterior n_per_round={n_per_round} exceeds the "
            f"driver-collect contract ({MAX_ADAPTIVE_N_PER_ROUND}): each "
            "round's samples are refit driver-side (CEM moments); for more "
            "posterior mass per round, raise `rounds` or score more chains "
            "in parallel instead"
        )

    def _np_isfinite(series):
        return _np.isfinite(series.to_numpy())

    sampled = [p for p in priors if p.kind != "constant"]
    names = [p.name for p in sampled]
    widths = {p.name: (p.b - p.a) if p.kind in ("uniform", "linearexp") else p.b
              for p in sampled}
    samples = sample_priors(spark, priors, n_per_round, seed)
    seen: _pd.DataFrame | None = None
    joined = None
    n_elite = max(int(n_per_round * elite_frac), 12)
    for rnd in range(rounds):
        joined = score_fn(samples).join(samples, "sample_id")
        part = joined.toPandas()
        part = part[_np_isfinite(part["lnl"])]  # -inf/NaN scores carry no info
        part["sample_id"] = part["sample_id"] + rnd * n_per_round
        seen = part if seen is None else _pd.concat([seen, part], ignore_index=True)
        if rnd == rounds - 1:
            break
        elites = seen.nlargest(n_elite, "lnl")
        centers = {c: float(elites[c].mean()) for c in names}
        scales = {
            c: max(float(elites[c].std()), 0.02 * abs(widths[c])) for c in names
        }
        samples = refined_samples(
            spark, priors, centers, scales, n_per_round, seed + 7919 * (rnd + 1)
        )
    all_scored = spark.createDataFrame(seen)
    # guard exp() against overflow across rounds of very different lnl
    return all_scored, posterior_summary(all_scored, names)
