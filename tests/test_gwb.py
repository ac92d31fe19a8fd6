"""HD-correlated GWB likelihood: Kronecker-Woodbury vs the dense full-array
oracle, and an inject-recover with a correlated signal."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.analytics.optimal_statistic import per_pulsar_reduction
from enterprise_warp_spark.likelihood.gwb import (
    dense_gwb_reference,
    gwb_loglik,
    hd_matrix,
)

NPSR, NFREQ = 4, 6
TSPAN = 10 * 365.25 * 86400.0


def _setup(spark, seed=3, inject=None):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(NPSR, 3))
    pos /= np.linalg.norm(pos, axis=1)[:, None]
    f = np.arange(1, NFREQ + 1) / TSPAN
    gamma_m = hd_matrix(pos)
    # correlated Fourier coefficients: cov between pulsars = Gamma_ab * phi_i
    coeffs = None
    if inject is not None:
        lga, gam = inject
        a2 = 10.0 ** (2 * lga)
        from enterprise_warp_spark.likelihood.gp import FYR

        phi = a2 / (12 * math.pi**2) * FYR**-3 * (np.repeat(f, 2) / FYR) ** (-gam) / TSPAN
        L = np.linalg.cholesky(gamma_m)
        coeffs = (L @ rng.normal(size=(NPSR, 2 * NFREQ))) * np.sqrt(phi)
    toas, posd, rows = {}, {}, []
    for p in range(NPSR):
        psr = f"J{p:04d}+0000"
        n = 60 + 10 * p
        t = np.sort(rng.uniform(0, TSPAN, n))
        sig = np.full(n, 1e-6)
        r = rng.normal(0, sig)
        if coeffs is not None:
            arg = 2 * math.pi * np.outer(t, f)
            Fm = np.empty((n, 2 * NFREQ))
            Fm[:, 0::2] = np.sin(arg)
            Fm[:, 1::2] = np.cos(arg)
            r = r + Fm @ coeffs[p]
        toas[psr] = (t, r, sig)
        posd[psr] = pos[p]
        rows += [
            (psr, float(a), float(b), float(c), 1.0, 0.0)
            for a, b, c in zip(t, r, sig)
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, efac double, equad double",
    )
    posdf = spark.createDataFrame(
        [(k, v.tolist()) for k, v in posd.items()], "psr string, pos array<double>"
    )
    return res, posdf, toas, posd


def test_gwb_matches_dense_oracle(spark):
    res, posdf, toas, posd = _setup(spark, seed=5)
    red = per_pulsar_reduction(res, NFREQ, TSPAN)
    samples = spark.createDataFrame(
        [(0, -13.5, 13.0 / 3.0), (1, -14.2, 3.1)],
        "sample_id long, gw_log10_A double, gw_gamma double",
    )
    got = {
        r["sample_id"]: r["lnl"]
        for r in gwb_loglik(red, posdf, samples, TSPAN).collect()
    }
    for sid, lga, gam in [(0, -13.5, 13.0 / 3.0), (1, -14.2, 3.1)]:
        want = dense_gwb_reference(toas, posd, TSPAN, NFREQ, lga, gam)
        assert got[sid] == pytest.approx(want, rel=1e-9), sid


def test_gwb_inject_recover(spark):
    """HD-correlated injection: the correlated likelihood must prefer the
    injected amplitude over much smaller/larger ones."""
    res, posdf, toas, posd = _setup(spark, seed=11, inject=(-13.0, 13.0 / 3.0))
    red = per_pulsar_reduction(res, NFREQ, TSPAN)
    grid = [(i, lga, 13.0 / 3.0) for i, lga in enumerate(np.linspace(-15.0, -12.0, 13))]
    samples = spark.createDataFrame(
        [(i, float(a), float(g)) for i, a, g in grid],
        "sample_id long, gw_log10_A double, gw_gamma double",
    )
    lnl = {r["sample_id"]: r["lnl"] for r in gwb_loglik(red, posdf, samples, TSPAN).collect()}
    best = max(lnl, key=lnl.get)
    best_lga = grid[best][1]
    assert abs(best_lga - (-13.0)) <= 0.5


def test_gwb_joint_sampled_intrinsic_matches_dense(spark):
    """JOINT sampling: per-pulsar red-noise params vary PER SAMPLE alongside
    the GWB params (intrinsic_columns mode). Each sample must match the dense
    oracle evaluated at that sample's full parameter vector."""
    res, posdf, toas, posd = _setup(spark, seed=13)
    red = per_pulsar_reduction(res, NFREQ, TSPAN)
    psrs = sorted(toas)
    cols = {p: (f"rn_lga_{i}", f"rn_gam_{i}") for i, p in enumerate(psrs)}
    sample_params = [
        (0, -13.9, 13.0 / 3.0, {p: (-13.5 - 0.2 * i, 2.5 + 0.4 * i) for i, p in enumerate(psrs)}),
        (1, -14.3, 3.8, {p: (-14.0 + 0.1 * i, 4.0 - 0.3 * i) for i, p in enumerate(psrs)}),
    ]
    rows = [
        tuple([sid, lga, gam] + [v for p in psrs for v in intr[p]])
        for sid, lga, gam, intr in sample_params
    ]
    schema = "sample_id long, gw_log10_A double, gw_gamma double, " + ", ".join(
        f"{c} double" for p in psrs for c in cols[p]
    )
    samples = spark.createDataFrame(rows, schema)
    got = {
        r["sample_id"]: r["lnl"]
        for r in gwb_loglik(red, posdf, samples, TSPAN, intrinsic_columns=cols).collect()
    }
    for sid, lga, gam, intr in sample_params:
        want = dense_gwb_reference(toas, posd, TSPAN, NFREQ, lga, gam, intrinsic=intr)
        assert got[sid] == pytest.approx(want, rel=1e-9), sid


def test_gwb_with_intrinsic_noise_matches_dense(spark):
    """GWB + per-pulsar FIXED intrinsic red noise (the reference's GWB-search
    configuration) vs the dense oracle with both terms."""
    res, posdf, toas, posd = _setup(spark, seed=7)
    red = per_pulsar_reduction(res, NFREQ, TSPAN)
    intrinsic = {
        f"J{p:04d}+0000": (-13.6 - 0.1 * p, 3.0 + 0.3 * p) for p in range(NPSR)
    }
    samples = spark.createDataFrame(
        [(0, -13.8, 13.0 / 3.0)], "sample_id long, gw_log10_A double, gw_gamma double"
    )
    got = gwb_loglik(red, posdf, samples, TSPAN, intrinsic=intrinsic).first()["lnl"]

    # dense oracle: full HD covariance + per-pulsar intrinsic blocks
    from enterprise_warp_spark.likelihood.gp import FYR, powerlaw_phi

    psrs = sorted(toas)
    f = np.arange(1, NFREQ + 1) / TSPAN
    f2 = np.repeat(f, 2)
    a2 = 10.0 ** (2 * -13.8)
    phi_gw = a2 / (12 * math.pi**2) * FYR**-3 * (f2 / FYR) ** (-13.0 / 3.0) / TSPAN
    posm = np.array([posd[p] for p in psrs])
    gm = hd_matrix(posm)
    r = np.concatenate([toas[p][1] for p in psrs])
    nd = np.concatenate([toas[p][2] ** 2 for p in psrs])
    Fs = []
    for p in psrs:
        t = toas[p][0]
        arg = 2 * math.pi * np.outer(t, f)
        Fm = np.empty((len(t), 2 * NFREQ))
        Fm[:, 0::2] = np.sin(arg)
        Fm[:, 1::2] = np.cos(arg)
        Fs.append(Fm)
    C = np.diag(nd)
    offs = np.cumsum([0] + [len(toas[p][0]) for p in psrs])
    for a in range(NPSR):
        for b in range(NPSR):
            C[offs[a]:offs[a+1], offs[b]:offs[b+1]] += Fs[a] @ np.diag(gm[a, b] * phi_gw) @ Fs[b].T
        lga, gam = intrinsic[psrs[a]]
        phi_int = powerlaw_phi(f2, np.full(2 * NFREQ, 1 / TSPAN), lga, gam)
        C[offs[a]:offs[a+1], offs[a]:offs[a+1]] += Fs[a] @ np.diag(phi_int) @ Fs[a].T
    sign, logdet = np.linalg.slogdet(C)
    want = -0.5 * (float(r @ np.linalg.solve(C, r)) + logdet + len(r) * math.log(2 * math.pi))
    assert got == pytest.approx(want, rel=1e-9)


def test_gwb_inject_recover_on_tm_projected_reduction(spark):
    """The gwb kernel consumes per_pulsar_reduction output unchanged, so the
    round-4 timing-model projection composes for free: HD inject-recover
    still works when every pulsar also carries a (projected-out) spin trend."""
    import numpy as np
    import pandas as pd

    from enterprise_warp_spark.analytics.optimal_statistic import (
        per_pulsar_reduction,
    )
    from enterprise_warp_spark.likelihood.gp import powerlaw_phi
    from enterprise_warp_spark.likelihood.gwb import gwb_loglik

    rng = np.random.default_rng(97)
    npsr, nf = 4, 5
    tspan = 8.0 * 365.25 * 86400.0
    pos = rng.normal(size=(npsr, 3))
    pos /= np.linalg.norm(pos, axis=1)[:, None]
    f = np.arange(1, nf + 1) / tspan
    f2 = np.repeat(f, 2)
    lga_true = -13.2
    phi = powerlaw_phi(f2, np.full(2 * nf, 1.0 / tspan), lga_true, 13.0 / 3.0)
    # HD-correlated coefficients across pulsars
    def hd(zeta):
        x = max((1.0 - math.cos(zeta)) / 2.0, 1e-15)
        return 1.5 * x * math.log(x) - 0.25 * x + 0.5

    orf = np.array(
        [
            [
                1.0 if a == b
                else hd(float(np.arccos(np.clip(pos[a] @ pos[b], -1, 1))))
                for b in range(npsr)
            ]
            for a in range(npsr)
        ]
    )
    L = np.linalg.cholesky(orf + 1e-10 * np.eye(npsr))
    z = rng.normal(size=(npsr, 2 * nf))
    coeffs = (L @ z) * np.sqrt(phi)[None, :]
    rows = []
    for p in range(npsr):
        n = 140
        t = np.sort(rng.uniform(0, tspan, n))
        t[0], t[-1] = 0.0, tspan
        arg = 2 * math.pi * np.outer(t, f)
        Fm = np.empty((n, 2 * nf))
        Fm[:, 0::2] = np.sin(arg)
        Fm[:, 1::2] = np.cos(arg)
        r = Fm @ coeffs[p] + rng.normal(0, 1e-7, n) + 4e-6 * (t / tspan) ** 2
        rows += [
            (f"J{p:02d}", float(ti), float(ri), 1e-7, 1.0, 0.0)
            for ti, ri in zip(t, r)
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    spec = (("offset",), ("spin", 1, 0.0), ("spin", 2, 0.0))
    red = per_pulsar_reduction(res, nfreqs=nf, tspan_s=tspan, tm_specs=spec)
    positions = spark.createDataFrame(
        pd.DataFrame(
            {"psr": [f"J{p:02d}" for p in range(npsr)], "pos": [x.tolist() for x in pos]}
        )
    )
    grid = np.linspace(-14.2, -12.2, 9)
    samples = spark.createDataFrame(
        pd.DataFrame(
            {"sample_id": range(len(grid)), "gw_log10_A": grid, "gw_gamma": 13.0 / 3.0}
        )
    )
    out = gwb_loglik(red, positions, samples, tspan).toPandas()
    best = float(grid[out.set_index("sample_id")["lnl"].idxmax()])
    assert abs(best - lga_true) <= 0.5, best
