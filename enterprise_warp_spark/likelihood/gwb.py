"""Full-PTA GWB likelihood with Hellings–Downs inter-pulsar correlations.

The per-pulsar kernel (gp.py) factorizes over pulsars — exact for intrinsic
noise and for a COMMON UNCORRELATED process (CURN), but a correlated GWB
(the reference's `gwb: hd_*` signals, enterprise_models.py:379-470) couples
pulsars through the overlap reduction function. The covariance is

    C = N + F_g  (Gamma x diag(phi))  F_g^T

with F_g = blockdiag(F_p) the stacked common Fourier bases (shared
frequencies from the ARRAY Tspan) and Gamma the npsr x npsr HD ORF matrix
(auto term = 1). The Kronecker structure keeps Woodbury cheap:

    Sigma      = Gamma^-1 x diag(1/phi) + blockdiag(S_p)
    logdet Phi = 2k logdet(Gamma) + npsr * sum log phi
    lnL        = -1/2 [ sum_p r^T N^-1 r  -  x^T Sigma^-1 x
                        + sum_p logdet N_p + logdet Phi + logdet Sigma
                        + n_tot ln 2pi ],    x = stacked u_p

Execution shape: the ONLY pass over TOA data is the distributed per-pulsar
reduction (u_p, S_p, r^T N^-1 r, logdet N — analytics/optimal_statistic.py);
the remaining work is a (2k*npsr)-dimensional solve per sample — a few
thousand dims even for a 50-pulsar array — distributed over the samples via
mapInPandas. TOA volume and sample count scale independently.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.likelihood.gp import FYR, powerlaw_phi


def hd_matrix(pos: np.ndarray) -> np.ndarray:
    """HD ORF matrix with unit auto-correlation (enterprise convention).

    x clamped to 1e-15: two pulsars at identical sky positions (zeta=0) get
    the analytic off-diagonal limit 0.5 (x ln x -> 0) instead of a math
    domain error from log(0)."""
    npsr = pos.shape[0]
    g = np.eye(npsr)
    for a in range(npsr):
        for b in range(a + 1, npsr):
            x = max((1.0 - float(pos[a] @ pos[b])) / 2.0, 1e-15)
            g[a, b] = g[b, a] = 1.5 * x * math.log(x) - 0.25 * x + 0.5
    return g


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class GwbKernelData:
    """Collected-once reduction for the GWB kernel: everything the
    sample-parallel evaluator needs, so a sampler calling gwb_loglik many
    times pays the reduction collect exactly once (prepare_gwb_kernel)."""

    psrs: tuple[str, ...]
    x: np.ndarray  # stacked u_p, (npsr*2k,)
    S_block: np.ndarray  # blockdiag(S_p), (npsr*2k, npsr*2k)
    f2: np.ndarray
    rtn: float
    logdet_n: float
    n_tot: int
    gamma_m: np.ndarray
    gamma_inv: np.ndarray
    logdet_gamma: float
    df: float
    intr: list | None  # fixed intrinsic phi per pulsar (or None)


# Dense Sigma solves are O((npsr*2k)^3) on the DRIVER-side prepared arrays;
# past this dimension the (npsr*2k)^2 matrices stop being "tiny next to the
# TOA data" and the dense path must be replaced (block solvers / low-rank).
MAX_GWB_DIM = 8192


def prepare_gwb_kernel(
    reduced: DataFrame,
    positions: DataFrame,
    tspan_s: float,
    orf: str = "hd",
    intrinsic: dict[str, tuple[float, float]] | None = None,
    max_dim: int = MAX_GWB_DIM,
) -> GwbKernelData:
    """Collect the (tiny) per-pulsar reduction once and precompute the
    sample-independent pieces. Guards npsr*2k <= max_dim with a clear error
    instead of dying quietly-late in a dense O(d^3) solve."""
    rows = reduced.join(positions, "psr").orderBy("psr").collect()
    psrs = [r["psr"] for r in rows]
    us = [np.array(r["u"]) for r in rows]
    twok = len(us[0])
    npsr = len(psrs)
    dim = npsr * twok
    if dim > max_dim:
        raise ValueError(
            f"gwb kernel dimension npsr*2k = {npsr}*{twok} = {dim} exceeds "
            f"max_dim={max_dim}: the dense Sigma solve is O(d^3) and "
            f"O(d^2) memory per sample — reduce nfreqs, split the array, "
            f"or raise max_dim explicitly if you accept the cost"
        )
    Ss = [np.array(r["s"]).reshape(twok, twok) for r in rows]
    f2 = np.array(rows[0]["f"])
    rtn = sum(r["rtn_r"] for r in rows)
    logdet_n = sum(r["logdet_n"] for r in rows)
    n_tot = sum(r["n_toa"] for r in rows)
    pos = np.array([r["pos"] for r in rows])

    if orf == "hd":
        gamma_m = hd_matrix(pos)
    elif orf == "monopole":
        gamma_m = np.ones((npsr, npsr))
        gamma_m += np.eye(npsr) * 1e-6  # keep invertible
    elif orf == "dipole":
        gamma_m = pos @ pos.T
        np.fill_diagonal(gamma_m, 1.0)
    else:
        raise ValueError(f"unknown orf {orf}")
    gamma_inv = np.linalg.inv(gamma_m)
    sign, logdet_gamma = np.linalg.slogdet(gamma_m)
    assert sign > 0, "ORF matrix must be positive definite"

    df = 1.0 / tspan_s
    df_arr = np.full(len(f2), df)
    intr = None
    if intrinsic:
        intr = [powerlaw_phi(f2, df_arr, *intrinsic[p]) for p in psrs]

    x = np.concatenate(us)
    S_block = np.zeros((dim, dim))
    for p, S in enumerate(Ss):
        S_block[p * twok : (p + 1) * twok, p * twok : (p + 1) * twok] = S
    return GwbKernelData(
        psrs=tuple(psrs),
        x=x,
        S_block=S_block,
        f2=f2,
        rtn=float(rtn),
        logdet_n=float(logdet_n),
        n_tot=int(n_tot),
        gamma_m=gamma_m,
        gamma_inv=gamma_inv,
        logdet_gamma=float(logdet_gamma),
        df=df,
        intr=intr,
    )


def gwb_loglik(
    reduced: DataFrame | GwbKernelData,
    positions: DataFrame | None,
    samples: DataFrame,
    tspan_s: float,
    orf: str = "hd",
    intrinsic: dict[str, tuple[float, float]] | None = None,
    intrinsic_columns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """-> (sample_id, lnl) for a GWB with spatial correlations.

    reduced: per_pulsar_reduction output (common basis, ARRAY Tspan) — or an
    already-prepared GwbKernelData (prepare_gwb_kernel) so repeated calls,
    e.g. from a sampler loop, do not re-collect the reduction per call.
    samples: DataFrame with (sample_id, gw_log10_A, gw_gamma).
    intrinsic: optional per-pulsar FIXED red noise {psr: (log10_A, gamma)} —
    the reference's GWB-search workflow holds single-pulsar noise at its
    posterior values (noise files, results.py:791-803); it adds to the
    DIAGONAL pulsar blocks of Phi, which therefore loses its pure Kronecker
    form — Phi is built densely (it is only (2k*npsr)^2, tiny next to the
    TOA data, bounded by MAX_GWB_DIM).
    intrinsic_columns: JOINT sampling — per-pulsar SAMPLED red noise
    {psr: (log10_A_col, gamma_col)} naming columns of `samples`, so every
    sample row carries its own intrinsic parameters alongside the GWB ones
    (the reference's full joint model, enterprise_models.py:379-470 with
    per-pulsar red-noise signals left free). Mutually exclusive with
    `intrinsic`.

    The prepared arrays ship to executors via an explicit Spark broadcast
    (sent once per executor), not closure capture (re-serialized per task).
    """
    if intrinsic and intrinsic_columns:
        raise ValueError("pass either intrinsic (fixed) or intrinsic_columns (sampled)")
    data = (
        reduced
        if isinstance(reduced, GwbKernelData)
        else prepare_gwb_kernel(reduced, positions, tspan_s, orf, intrinsic)
    )
    # column order is positional in the kernel: arbitrary pulsar names (J...+...)
    # are not valid itertuples attributes
    sel_cols = ["sample_id", "gw_log10_A", "gw_gamma"]
    if intrinsic_columns:
        for p in data.psrs:
            sel_cols += list(intrinsic_columns[p])
    has_intr_cols = bool(intrinsic_columns)
    bc = samples.sparkSession.sparkContext.broadcast(data)

    def kernel(batches):
        d = bc.value
        f2, df, S_block, x = d.f2, d.df, d.S_block, d.x
        twok = len(f2)
        npsr = len(d.psrs)
        df_arr = np.full(len(f2), df)
        for pdf in batches:
            out = []
            for row in pdf[sel_cols].to_numpy():
                a2 = 10.0 ** (2.0 * float(row[1]))
                phi = (
                    a2
                    / (12.0 * math.pi**2)
                    * FYR ** (-3.0)
                    * (f2 / FYR) ** (-float(row[2]))
                    * df
                )
                if has_intr_cols:
                    intr_s = [
                        powerlaw_phi(f2, df_arr, float(row[3 + 2 * i]), float(row[4 + 2 * i]))
                        for i in range(npsr)
                    ]
                else:
                    intr_s = d.intr
                if intr_s is None:
                    phi_inv = np.kron(d.gamma_inv, np.diag(1.0 / phi))
                    logdet_phi = twok * d.logdet_gamma + npsr * float(np.sum(np.log(phi)))
                else:
                    # dense Phi: Kronecker GWB + intrinsic diagonal blocks
                    Phi = np.kron(d.gamma_m, np.diag(phi))
                    for p in range(npsr):
                        Phi[p * twok : (p + 1) * twok, p * twok : (p + 1) * twok] += np.diag(intr_s[p])
                    cphi = np.linalg.cholesky(Phi)
                    logdet_phi = 2.0 * float(np.sum(np.log(np.diag(cphi))))
                    eye = np.eye(npsr * twok)
                    phi_inv = np.linalg.solve(cphi.T, np.linalg.solve(cphi, eye))
                sigma = phi_inv + S_block
                try:
                    cf = np.linalg.cholesky(sigma)
                except np.linalg.LinAlgError:
                    jit = 1e-12 * float(np.max(np.diag(sigma)))
                    cf = np.linalg.cholesky(sigma + jit * np.eye(sigma.shape[0]))
                y = np.linalg.solve(cf, x)
                logdet_sigma = 2.0 * float(np.sum(np.log(np.diag(cf))))
                lnl = -0.5 * (
                    d.rtn
                    - float(y @ y)
                    + d.logdet_n
                    + logdet_phi
                    + logdet_sigma
                    + d.n_tot * math.log(2.0 * math.pi)
                )
                out.append((int(row[0]), lnl))
            yield pd.DataFrame(out, columns=["sample_id", "lnl"])

    return samples.select(*sel_cols).mapInPandas(kernel, "sample_id long, lnl double")


def dense_gwb_reference(
    toas: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    pos: dict[str, np.ndarray],
    tspan_s: float,
    nfreqs: int,
    gw_log10_A: float,
    gw_gamma: float,
    intrinsic: dict[str, tuple[float, float]] | None = None,
) -> float:
    """O(n^3) dense oracle: builds the full HD-correlated covariance across
    ALL pulsars explicitly; `intrinsic` adds per-pulsar powerlaw red noise
    to the diagonal blocks. Test-only."""
    psrs = sorted(toas)
    blocks_t = [toas[p][0] for p in psrs]
    r = np.concatenate([toas[p][1] for p in psrs])
    nd = np.concatenate([toas[p][2] ** 2 for p in psrs])
    f = np.arange(1, nfreqs + 1) / tspan_s
    f2 = np.repeat(f, 2)
    a2 = 10.0 ** (2.0 * gw_log10_A)
    phi = a2 / (12.0 * math.pi**2) * FYR ** (-3.0) * (f2 / FYR) ** (-gw_gamma) / tspan_s
    Fs = []
    for t in blocks_t:
        arg = 2.0 * math.pi * np.outer(t, f)
        Fm = np.empty((len(t), 2 * nfreqs))
        Fm[:, 0::2] = np.sin(arg)
        Fm[:, 1::2] = np.cos(arg)
        Fs.append(Fm)
    posm = np.array([pos[p] for p in psrs])
    gamma_m = hd_matrix(posm)
    n_tot = len(r)
    C = np.diag(nd)
    offs = np.cumsum([0] + [len(t) for t in blocks_t])
    for a in range(len(psrs)):
        for b in range(len(psrs)):
            Cab = Fs[a] @ np.diag(gamma_m[a, b] * phi) @ Fs[b].T
            C[offs[a] : offs[a + 1], offs[b] : offs[b + 1]] += Cab
        if intrinsic:
            phi_int = powerlaw_phi(f2, np.full(len(f2), 1.0 / tspan_s), *intrinsic[psrs[a]])
            C[offs[a] : offs[a + 1], offs[a] : offs[a + 1]] += Fs[a] @ np.diag(phi_int) @ Fs[a].T
    sign, logdet = np.linalg.slogdet(C)
    assert sign > 0
    return -0.5 * (float(r @ np.linalg.solve(C, r)) + logdet + n_tot * math.log(2.0 * math.pi))
