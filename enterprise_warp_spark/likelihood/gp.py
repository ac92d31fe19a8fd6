"""F10 — GP-marginalized Gaussian likelihood per pulsar.

Model (assembled by the reference at enterprise_warp.py:485-559, evaluated
via pta.get_lnlikelihood at bilby_warp.py:19-35):

    C = N + F phi F^T
    N   = diag white noise: EFAC^2 (sigma_toa^2 + EQUAD^2)   [t2 convention,
          enterprise_models.py:115-145; TempoNest variant in
          functions/whitenoise.py]
    F   = Fourier design matrix, sin/cos pairs at k/T (functions/fourier.py)
    phi = diag powerlaw PSD: A^2/(12 pi^2) fyr^-3 (f/fyr)^-gamma * df

    lnL = -1/2 [ r^T C^-1 r + logdet C + n ln(2 pi) ]

computed with the Woodbury identity so only a 2k x 2k system is solved:

    C^-1 = N^-1 - N^-1 F (phi^-1 + F^T N^-1 F)^-1 F^T N^-1
    logdet C = logdet N + logdet phi + logdet(phi^-1 + F^T N^-1 F)

Execution shape: `groupBy('psr').applyInPandas` — one Arrow batch per
pulsar; ALL parameter samples are evaluated vectorized inside the kernel
(the per-sample work reuses the per-pulsar basis F), then A13 sums lnL over
pulsars per sample. TOA data crosses the wire once regardless of how many
samples are scored. At 100 TB / many pulsars this is embarrassingly parallel
over the psr partition key with skew handled by AQE.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FYR = 1.0 / (365.25 * 86400.0)

RESIDUAL_COLS = ("psr", "toa_s", "residual_s", "toa_err_s", "efac", "equad")


def powerlaw_phi(f: np.ndarray, df: np.ndarray, log10_A: float, gamma: float) -> np.ndarray:
    a2 = 10.0 ** (2.0 * log10_A)
    return a2 / (12.0 * math.pi**2) * FYR ** (-3.0) * (f / FYR) ** (-gamma) * df


def _lnlike_one(
    r: np.ndarray,
    ndiag: np.ndarray,
    Fmat: np.ndarray,
    phi: np.ndarray,
) -> float:
    """Woodbury lnL for one (pulsar, sample)."""
    ninv_r = r / ndiag
    ninv_F = Fmat / ndiag[:, None]
    Sigma = np.diag(1.0 / phi) + Fmat.T @ ninv_F  # phi^-1 + F^T N^-1 F
    cf = np.linalg.cholesky(Sigma)
    x = Fmat.T @ ninv_r
    y = np.linalg.solve(cf, x)
    rCr = float(r @ ninv_r - y @ y)
    logdet = (
        float(np.sum(np.log(ndiag)))
        + float(np.sum(np.log(phi)))
        + 2.0 * float(np.sum(np.log(np.diag(cf))))
    )
    return -0.5 * (rCr + logdet + len(r) * math.log(2.0 * math.pi))


def gp_loglik_per_pulsar(
    residuals: DataFrame,
    samples: pd.DataFrame,
    nfreqs: int = 20,
) -> DataFrame:
    """Score every sample against every pulsar: -> (psr, sample_id, lnl).

    residuals: DataFrame with RESIDUAL_COLS (efac/equad may be per-backend
    columns already joined in); an optional `epoch_id` column enables ECORR.
    samples: small pandas DataFrame with columns sample_id, log10_A, gamma,
    and optionally log10_ecorr — serialized into the kernel closure (a few
    KB; the Arrow-heavy TOA data moves only once).

    ECORR (epoch-correlated white noise, enterprise_models.py:155-168) is
    handled as extra GP basis columns: the per-epoch indicator matrix U with
    prior variance 10^(2*log10_ecorr) per epoch — so C gains U diag(ec^2) U^T
    and the same Woodbury path covers it (the standard basis-augmentation
    trick; no dense blocks materialize).
    """
    has_ecorr = "log10_ecorr" in samples.columns
    has_efac = "efac" in samples.columns  # sampled white noise overrides the
    has_equad = "log10_equad" in samples.columns  # per-TOA data columns
    cols = (
        ["sample_id", "log10_A", "gamma"]
        + (["log10_ecorr"] if has_ecorr else [])
        + (["efac"] if has_efac else [])
        + (["log10_equad"] if has_equad else [])
    )
    samp = samples[cols].to_records(index=False)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        psr = pdf["psr"].iloc[0]
        order = np.argsort(pdf["toa_s"].to_numpy())
        t = pdf["toa_s"].to_numpy()[order]
        r = pdf["residual_s"].to_numpy()[order]
        sig = pdf["toa_err_s"].to_numpy()[order]
        efac = pdf["efac"].to_numpy()[order]
        equad = pdf["equad"].to_numpy()[order]
        ndiag = efac**2 * (sig**2 + equad**2)  # t2 convention (F11)

        tspan = float(t.max() - t.min())
        k = np.arange(1, nfreqs + 1)
        f = k / tspan
        df = np.full(nfreqs, 1.0 / tspan)
        arg = 2.0 * math.pi * np.outer(t, f)
        Fmat = np.empty((len(t), 2 * nfreqs))
        Fmat[:, 0::2] = np.sin(arg)
        Fmat[:, 1::2] = np.cos(arg)
        f2 = np.repeat(f, 2)
        df2 = np.repeat(df, 2)

        U = None
        if has_ecorr and "epoch_id" in pdf.columns:
            epochs = pdf["epoch_id"].to_numpy()[order]
            uniq, inv = np.unique(epochs, return_inverse=True)
            U = np.zeros((len(t), len(uniq)))
            U[np.arange(len(t)), inv] = 1.0

        out = np.empty(len(samp))
        for i, rec in enumerate(samp):
            if has_efac or has_equad:
                ef = float(rec.efac) if has_efac else efac
                eq = (10.0 ** float(rec.log10_equad)) if has_equad else equad
                nd = ef**2 * (sig**2 + eq**2)
            else:
                nd = ndiag
            phi = powerlaw_phi(f2, df2, rec.log10_A, rec.gamma)
            if U is not None:
                ec2 = (10.0 ** float(rec.log10_ecorr)) ** 2
                basis = np.hstack([Fmat, U])
                phi_aug = np.concatenate([phi, np.full(U.shape[1], ec2)])
                out[i] = _lnlike_one(r, nd, basis, phi_aug)
            else:
                out[i] = _lnlike_one(r, nd, Fmat, phi)
        return pd.DataFrame(
            {
                "psr": psr,
                "sample_id": [int(s[0]) for s in samp],
                "lnl": out,
            }
        )

    return residuals.groupBy("psr").applyInPandas(
        kernel, "psr string, sample_id long, lnl double"
    )


def total_loglik(per_pulsar: DataFrame) -> DataFrame:
    """A13 — the PTA likelihood factorizes over pulsars given common params
    (signal_base.PTA at enterprise_warp.py:542): sum lnL per sample."""
    return per_pulsar.groupBy("sample_id").agg(F.sum("lnl").alias("lnl"))


def dense_lnlike_reference(
    r: np.ndarray, ndiag: np.ndarray, Fmat: np.ndarray, phi: np.ndarray
) -> float:
    """O(n^3) direct evaluation (C built densely) — test oracle for the
    Woodbury kernel; never used in production plans."""
    C = np.diag(ndiag) + Fmat @ np.diag(phi) @ Fmat.T
    sign, logdet = np.linalg.slogdet(C)
    assert sign > 0
    return -0.5 * (
        float(r @ np.linalg.solve(C, r)) + logdet + len(r) * math.log(2.0 * math.pi)
    )
