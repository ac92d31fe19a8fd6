"""F13 — Solar-System ephemeris perturbation basis (BayesEphem).

Reference: enterprise_models.py:465-470 enables a physical ephemeris signal
with 11 COMMON sampled parameters — frame_drift_rate, d_jupiter_mass,
d_saturn_mass, d_uranus_mass, d_neptune_mass and six Jupiter orbital-element
corrections — each multiplying a precomputed partial-derivative time series
of the Earth–SSB vector projected onto the pulsar direction.

The basis is pluggable, three sources in decreasing fidelity:

  - ``attach_basis_table`` / ``ingest_basis_table`` — join a precomputed
    per-(psr, toa) basis parquet (e.g. tabulated from a JPL DE ephemeris)
    onto the residuals (SURVEY §2 F13: "deterministic column from
    precomputed basis table"). Pure DataFrame join, no UDF; at cluster
    scale co-partition both sides on psr (the basis table has the same
    cardinality as the TOAs).
  - ``functions.solar_system.physical_basis`` — REAL physical partials
    computed from the PUBLIC Keplerian mean elements of the major planets
    (textbook approximate ephemerides, r5): frame-drift, outer-planet mass
    and Jupiter orbital-element partials of the Earth–SSB Roemer delay,
    vectorized per Arrow batch. Accurate to the mean-element ephemeris
    (~arcminutes), which is ample for perturbation PARTIALS; no external
    data files needed.
  - ``synthetic_basis`` — a clearly-marked DETERMINISTIC STAND-IN with the
    physically right shape and scales; kept as the cheap test fixture.

Either path adds the columns ``ephem_b_<param>``; the GP kernel consumes
them through ``DetComponent`` (likelihood/gp.py): r -> r - B c per sample.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# enterprise's PhysicalEphemerisSignal parameter set (order fixed)
BAYESEPHEM_PARAMS: tuple[str, ...] = (
    "frame_drift_rate",
    "d_jupiter_mass",
    "d_saturn_mass",
    "d_uranus_mass",
    "d_neptune_mass",
    "jup_orb_1",
    "jup_orb_2",
    "jup_orb_3",
    "jup_orb_4",
    "jup_orb_5",
    "jup_orb_6",
)

# sampling ranges (reference uses these scales for the setabs/mass priors)
BAYESEPHEM_PRIOR_RANGES: dict[str, tuple[float, float]] = {
    "frame_drift_rate": (-1e-9, 1e-9),  # rad/yr
    "d_jupiter_mass": (-1.55e-11, 1.55e-11),  # Msun
    "d_saturn_mass": (-8.17e-12, 8.17e-12),
    "d_uranus_mass": (-5.72e-11, 5.72e-11),
    "d_neptune_mass": (-7.96e-11, 7.96e-11),
    **{f"jup_orb_{k}": (-0.05, 0.05) for k in range(1, 7)},
}

BASIS_COLS: tuple[str, ...] = tuple(f"ephem_b_{p}" for p in BAYESEPHEM_PARAMS)

YEAR_S = 365.25 * 86400.0
_PERIODS_YR = {"jupiter": 11.862, "saturn": 29.457, "uranus": 84.02, "neptune": 164.8}
# Roemer-delay partial scales: d(delay)/d(mass) ~ GM sensitivity of the
# SSB position (~5e3 s/Msun), frame drift ~ 499 s (1 AU light time) per rad
_MASS_SCALE_S = 5e3
_FRAME_SCALE_S = 499.0


def attach_basis_table(residuals: DataFrame, basis: DataFrame) -> DataFrame:
    """Join a precomputed per-(psr, toa_s) ephemeris-partial table carrying
    the BASIS_COLS columns. This is the production path."""
    missing = [c for c in BASIS_COLS if c not in basis.columns]
    if missing:
        raise ValueError(f"basis table missing columns {missing}")
    return residuals.join(basis, ["psr", "toa_s"], "left").fillna(
        0.0, subset=list(BASIS_COLS)
    )


def ingest_basis_table(
    spark,
    path: str,
    fmt: str | None = None,
    column_map: dict[str, str] | None = None,
    mjd_col: str | None = None,
    mjd0: float = 0.0,
) -> DataFrame:
    """Ingest a PUBLISHED ephemeris-perturbation table (parquet or CSV) into
    the attach_basis_table schema (psr, toa_s, ephem_b_*).

    Published SSE partial tables — the inputs enterprise builds its
    PhysicalEphemerisSignal from (enterprise_models.py:465-470: frame drift,
    outer-planet mass partials, Jupiter orbital-element partials projected on
    each pulsar direction) — come as one row per (pulsar, epoch) with one
    column per partial. ``column_map`` renames source columns to the
    canonical BASIS_COLS names; ``mjd_col`` converts an MJD epoch column to
    seconds (toa_s = (mjd - mjd0) * 86400). Missing partials fail loudly.

    The result feeds ``attach_basis_table`` unchanged — at cluster scale
    write it back out partitioned/bucketed by psr so the join with the TOA
    table is co-located.
    """
    fmt = fmt or ("csv" if path.endswith(".csv") else "parquet")
    if fmt == "csv":
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unknown basis table format {fmt!r}")
    for src, dst in (column_map or {}).items():
        df = df.withColumnRenamed(src, dst)
    if mjd_col:
        if mjd_col not in df.columns:
            # silently skipping the conversion could leave a stale toa_s
            # column in raw MJD days — 86400x wrong with no error
            raise ValueError(
                f"ephemeris basis table {path} has no column {mjd_col!r} "
                f"(columns: {df.columns})"
            )
        df = df.withColumn(
            "toa_s", (F.col(mjd_col) - F.lit(mjd0)) * 86400.0
        )
    missing = [c for c in ("psr", "toa_s", *BASIS_COLS) if c not in df.columns]
    if missing:
        raise ValueError(
            f"ephemeris basis table {path} lacks columns {missing}; "
            "map source names via column_map"
        )
    return df.select(
        "psr",
        F.col("toa_s").cast("double"),
        *[F.col(c).cast("double").alias(c) for c in BASIS_COLS],
    )


def synthetic_basis(residuals: DataFrame, t0_s: float = 0.0) -> DataFrame:
    """SYNTHETIC STAND-IN basis (no JPL ephemeris in this container).

    Deterministic JVM-side column expressions: per-pulsar projection factor
    from a hash of the pulsar name (stands in for pos . partial), secular
    drift for the frame rotation, one harmonic per outer-planet mass at its
    orbital period, sin/cos pairs at the Jupiter period and its first
    harmonic for the six orbital elements. NOT physical partials — same
    shape and scale only.
    """
    t_yr = (F.col("toa_s") - F.lit(t0_s)) / YEAR_S
    # per-pulsar projection in [-1, 1], deterministic in the pulsar name
    proj = (F.pmod(F.xxhash64(F.col("psr")), F.lit(2000)) - 1000.0) / 1000.0

    def harm(period_yr: float, phase: float = 0.0):
        return F.sin(t_yr * (2.0 * math.pi / period_yr) + F.lit(phase))

    out = residuals
    exprs = {
        "frame_drift_rate": _FRAME_SCALE_S * t_yr * proj,
        "d_jupiter_mass": _MASS_SCALE_S * harm(_PERIODS_YR["jupiter"]) * proj,
        "d_saturn_mass": _MASS_SCALE_S * harm(_PERIODS_YR["saturn"]) * proj,
        "d_uranus_mass": _MASS_SCALE_S * harm(_PERIODS_YR["uranus"]) * proj,
        "d_neptune_mass": _MASS_SCALE_S * harm(_PERIODS_YR["neptune"]) * proj,
    }
    p_j = _PERIODS_YR["jupiter"]
    for k in range(1, 7):
        period = p_j if k <= 3 else p_j / 2.0
        phase = (k - 1) * math.pi / 3.0
        exprs[f"jup_orb_{k}"] = 1e2 * harm(period, phase) * proj
    for p in BAYESEPHEM_PARAMS:
        out = out.withColumn(f"ephem_b_{p}", exprs[p])
    return out
