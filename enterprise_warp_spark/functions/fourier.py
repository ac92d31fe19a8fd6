"""F7/A14 — Fourier design-matrix machinery.

Reference: red-noise bases are sin/cos pairs at f_k = k/T, k=1..nfreqs
(FourierBasisGP at enterprise_models.py:218-219, 317-322); nfreqs is bounded
by span/cadence: round((1/60d - 1/T) / (1/T)) (enterprise_models.py:474-506,
option grammar '30_nfreqs'/'10_ndays' at :170-199); per-selection Tspan
(enterprise_models.py:508-539) makes nfreqs selection-dependent.

Spark shape: the freqs table is sequence+explode (no data motion); the basis
is a toas x freqs join producing long-form (toa row, k, sin, cos) — at scale
this stays partitioned by psr and the join is broadcast (freqs is tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nfreqs_from_span(tspan_s: F.Column, cadence_days: float = 60.0) -> F.Column:
    """A14 — round((1/cadence - 1/T) / (1/T)) with T in seconds."""
    cad_s = cadence_days * 86400.0
    return F.round((1.0 / F.lit(cad_s) - 1.0 / tspan_s) / (1.0 / tspan_s), 0).cast("int")


def freqs_table(spans: DataFrame, nfreqs_col: str = "nfreqs", tspan_col: str = "tspan_s") -> DataFrame:
    """Per-group frequency grid: (group cols..., k, f_hz, df_hz)."""
    return spans.select(
        "*", F.explode(F.expr(f"sequence(1, {nfreqs_col})")).alias("k")
    ).select(
        *spans.columns,
        "k",
        (F.col("k") / F.col(tspan_col)).alias("f_hz"),
        (1.0 / F.col(tspan_col)).alias("df_hz"),
    )


def fourier_basis(toas: DataFrame, freqs: DataFrame, join_cols: list[str], t_col: str = "toa_s") -> DataFrame:
    """Long-form design matrix: one row per (TOA, k) with sin/cos values.

    freqs is tiny (nfreqs per group) -> broadcast join, no shuffle of toas.
    """
    two_pi = 2.0 * 3.141592653589793
    return toas.join(F.broadcast(freqs), join_cols).select(
        *toas.columns,
        "k",
        "f_hz",
        "df_hz",
        F.sin(F.lit(two_pi) * F.col("f_hz") * F.col(t_col)).alias("basis_sin"),
        F.cos(F.lit(two_pi) * F.col("f_hz") * F.col(t_col)).alias("basis_cos"),
    )
