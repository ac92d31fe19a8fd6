"""F14 — seeded noise injection (simulation) for inject-recover validation.

Reference: libstempo_warp.add_noise (libstempo_warp.py:53-225) injects
efac/equad white noise and powerlaw red/DM noise realizations with a fixed
seed into synthetic TOAs.

Spark shape: white noise is randn(seed) columns; the red-noise realization
draws one (a_k, b_k) pair per frequency from N(0, sqrt(phi_k)) and sums the
Fourier series per TOA — a broadcast join of the tiny per-frequency
amplitude table against the TOA table, then a groupBy sum. Fully
deterministic given the seed; no Python in the row path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.likelihood.gp import FYR


def inject_white_noise(
    toas: DataFrame, efac: float, equad_s: float, seed: int = 42
) -> DataFrame:
    sigma = F.sqrt(
        F.lit(efac**2) * (F.col("toa_err_s") * F.col("toa_err_s") + F.lit(equad_s**2))
    )
    return toas.withColumn("white_s", F.randn(seed) * sigma)


def red_noise_amplitudes(
    freqs: DataFrame, log10_A: float, gamma: float, seed: int = 43
) -> DataFrame:
    """Per-(group, k) Fourier amplitudes a_k, b_k ~ N(0, sqrt(phi_k))."""
    norm = 10.0 ** (2.0 * log10_A) / (12.0 * math.pi**2) * FYR ** (-3.0)
    phi = F.lit(norm) * F.pow(F.col("f_hz") / F.lit(FYR), F.lit(-gamma)) * F.col("df_hz")
    return freqs.select(
        "*",
        (F.randn(seed) * F.sqrt(phi)).alias("a_k"),
        (F.randn(seed + 1) * F.sqrt(phi)).alias("b_k"),
    )


def inject_red_noise(
    toas: DataFrame, amplitudes: DataFrame, join_cols: list[str], t_col: str = "toa_s"
) -> DataFrame:
    """red(t) = sum_k a_k sin(2 pi f_k t) + b_k cos(2 pi f_k t)."""
    two_pi = 2.0 * math.pi
    term = toas.join(F.broadcast(amplitudes), join_cols).select(
        *toas.columns,
        (
            F.col("a_k") * F.sin(F.lit(two_pi) * F.col("f_hz") * F.col(t_col))
            + F.col("b_k") * F.cos(F.lit(two_pi) * F.col("f_hz") * F.col(t_col))
        ).alias("_term"),
    )
    return (
        term.groupBy(*toas.columns)
        .agg(F.sum("_term").alias("red_s"))
    )
