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
    kind: str  # uniform | linearexp | normal | constant
    a: float = 0.0  # lo / mu / value
    b: float = 1.0  # hi / sigma


def _column(p: Prior, u: F.Column, g: F.Column) -> F.Column:
    if p.kind == "uniform":
        return u * (p.b - p.a) + p.a
    if p.kind == "linearexp":  # log10-amplitude uniform in [a, b]
        return u * (p.b - p.a) + p.a
    if p.kind == "normal":
        return g * p.b + p.a
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
