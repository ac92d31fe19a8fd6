"""F13 BayesEphem: sampled common coefficients over a per-TOA deterministic
basis (DetComponent) — dense-oracle equality, inject-recover on the synthetic
stand-in basis, and model compilation."""

import math

import numpy as np
import pandas as pd
import pytest

from enterprise_warp_spark.functions.ephemeris import (
    BASIS_COLS,
    BAYESEPHEM_PARAMS,
    attach_basis_table,
    synthetic_basis,
)
from enterprise_warp_spark.likelihood.gp import (
    DetComponent,
    RedComponent,
    dense_lnlike_reference,
    gp_loglik_per_pulsar,
    powerlaw_phi,
)

TSPAN = 8.0 * 365.25 * 86400.0
NFREQ = 8


def _residual_rows(rng, psr, n=120, basis=None, coeffs=None):
    t = np.sort(rng.uniform(0, TSPAN, n))
    sig = rng.uniform(0.3e-6, 2e-6, n)
    r = rng.normal(0, sig)
    b = basis(t) if basis else None
    if b is not None and coeffs is not None:
        r = r + b @ coeffs
    return t, r, sig, b


def test_det_component_matches_dense(spark):
    """lnL with sampled deterministic coefficients == dense oracle at the
    shifted residuals r - B c."""
    rng = np.random.default_rng(21)
    k = 3

    def basis(t):
        out = np.empty((len(t), k))
        out[:, 0] = t / TSPAN
        out[:, 1] = np.sin(2 * math.pi * t / (11.862 * 365.25 * 86400.0))
        out[:, 2] = np.cos(2 * math.pi * t / (29.457 * 365.25 * 86400.0))
        return out

    rows, dense_in = [], {}
    for psr in ["J0001+0001", "J0002-0002"]:
        t, r, sig, b = _residual_rows(rng, psr, basis=basis)
        dense_in[psr] = (t, r, sig, b)
        for i in range(len(t)):
            rows.append(
                (psr, float(t[i]), float(r[i]), float(sig[i]), 1.0, 0.0)
                + tuple(float(x) for x in b[i])
            )
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, b0 double, b1 double, b2 double",
    )
    c0 = np.array([2e-7, -1.5e-7, 3e-7])
    c1 = np.array([-1e-7, 5e-8, 0.0])
    samples = pd.DataFrame(
        {
            "sample_id": [0, 1],
            "log10_A": [-13.1, -13.6],
            "gamma": [3.8, 4.2],
            "c_0": [c0[0], c1[0]],
            "c_1": [c0[1], c1[1]],
            "c_2": [c0[2], c1[2]],
        }
    )
    comps = (
        RedComponent(nfreqs=NFREQ),
        DetComponent(("c_0", "c_1", "c_2"), ("b0", "b1", "b2")),
    )
    got = {
        (row["psr"], row["sample_id"]): row["lnl"]
        for row in gp_loglik_per_pulsar(res, samples, NFREQ, components=comps).collect()
    }
    for sid, (lga, gam, cv) in enumerate([(-13.1, 3.8, c0), (-13.6, 4.2, c1)]):
        for psr, (t, r, sig, b) in dense_in.items():
            T = t.max() - t.min()
            f = np.arange(1, NFREQ + 1) / T
            arg = 2 * math.pi * np.outer(t, f)
            Fm = np.empty((len(t), 2 * NFREQ))
            Fm[:, 0::2] = np.sin(arg)
            Fm[:, 1::2] = np.cos(arg)
            phi = powerlaw_phi(np.repeat(f, 2), np.full(2 * NFREQ, 1 / T), lga, gam)
            want = dense_lnlike_reference(r - b @ cv, sig**2, Fm, phi)
            assert got[(psr, sid)] == pytest.approx(want, rel=1e-9), (psr, sid)


def test_synthetic_basis_inject_recover(spark):
    """Inject a frame-drift coefficient through the synthetic basis; the
    likelihood over a coefficient grid must peak near the injected value."""
    rng = np.random.default_rng(33)
    rows = []
    for psr in ["J0001+0001", "J0002-0002", "J0003+0003"]:
        t, r, sig, _ = _residual_rows(rng, psr)
        rows += [
            (psr, float(a), float(b), float(c), 1.0, 0.0)
            for a, b, c in zip(t, r, sig)
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    withb = synthetic_basis(res)
    inject = 5e-10
    injected = withb.withColumn(
        "residual_s",
        withb["residual_s"] + inject * withb["ephem_b_frame_drift_rate"],
    )
    grid = np.linspace(-1e-9, 1e-9, 21)
    samples = pd.DataFrame(
        {
            "sample_id": range(len(grid)),
            "log10_A": -20.0,  # negligible red noise
            "gamma": 3.0,
            **{p: 0.0 for p in BAYESEPHEM_PARAMS if p != "frame_drift_rate"},
            "frame_drift_rate": grid,
        }
    )
    comps = (RedComponent(nfreqs=4), DetComponent(BAYESEPHEM_PARAMS, BASIS_COLS))
    lnl = (
        gp_loglik_per_pulsar(injected, samples, 4, components=comps)
        .groupBy("sample_id")
        .sum("lnl")
        .collect()
    )
    best = max(lnl, key=lambda row: row["sum(lnl)"])["sample_id"]
    assert abs(grid[best] - inject) <= 2e-10


def test_attach_basis_table(spark):
    res = spark.createDataFrame(
        [("J1", 1.0, 0.0, 1e-6, 1.0, 0.0), ("J1", 2.0, 0.0, 1e-6, 1.0, 0.0)],
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    basis = spark.createDataFrame(
        [("J1", 1.0) + tuple(float(i) for i in range(11))],
        "psr string, toa_s double, " + ", ".join(f"{c} double" for c in BASIS_COLS),
    )
    out = attach_basis_table(res, basis).orderBy("toa_s").collect()
    assert out[0]["ephem_b_jup_orb_6"] == 10.0
    assert out[1]["ephem_b_jup_orb_6"] == 0.0  # unmatched TOA -> zero partial
    with pytest.raises(ValueError):
        attach_basis_table(res, basis.drop("ephem_b_jup_orb_1"))


def test_compile_model_bayes_ephem():
    import json

    from enterprise_warp_spark.likelihood.gp import DetComponent
    from enterprise_warp_spark.likelihood.inference import compile_model

    rows = [
        {"signal": "spin_noise", "option_json": json.dumps("powerlaw")},
        {"signal": "bayes_ephem", "option_json": json.dumps(True)},
    ]
    priors, comps = compile_model(rows, default_nfreqs=6)
    names = {p.name for p in priors}
    assert set(BAYESEPHEM_PARAMS) <= names
    dets = [c for c in comps if isinstance(c, DetComponent)]
    assert len(dets) == 1 and dets[0].basis_cols == BASIS_COLS
    # fixed constants bind ephemeris coefficients too (O2)
    priors_f, _ = compile_model(rows, fixed={"frame_drift_rate": 1e-10})
    fd = next(p for p in priors_f if p.name == "frame_drift_rate")
    assert fd.kind == "constant" and fd.a == 1e-10


def test_ingest_basis_table_roundtrip_and_inject_recover(spark, tmp_path):
    """SSE basis ingest (VERDICT r4 item 7): a perturbation table written to
    parquet/CSV in a published layout (psr, MJD epoch, renamed partial
    columns) re-ingests through ingest_basis_table into the
    attach_basis_table schema, and inject-recover over the INGESTED basis
    peaks at the injected coefficient — the synthetic generator stays only
    the fixture that produces the table."""
    from enterprise_warp_spark.functions.ephemeris import ingest_basis_table

    rng = np.random.default_rng(53)
    rows = []
    for psr in ["J0001+0001", "J0002-0002", "J0003+0003"]:
        t, r, sig, _ = _residual_rows(rng, psr)
        rows += [
            (psr, float(a), float(b), float(c), 1.0, 0.0)
            for a, b, c in zip(t, r, sig)
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    # fixture: synthetic generator -> "published" table layout (MJD epochs,
    # provider-style column names) -> parquet and CSV files
    basis = synthetic_basis(res).select("psr", "toa_s", *BASIS_COLS)
    published = basis.select(
        "psr",
        (basis["toa_s"] / 86400.0).alias("epoch_mjd"),
        *[basis[c].alias(c.replace("ephem_b_", "partial_")) for c in BASIS_COLS],
    )
    pq_path = str(tmp_path / "sse_basis.parquet")
    csv_path = str(tmp_path / "sse_basis.csv")
    published.write.parquet(pq_path)
    published.write.option("header", "true").csv(csv_path)

    cmap = {c.replace("ephem_b_", "partial_"): c for c in BASIS_COLS}
    for path in (pq_path, csv_path):
        ingested = ingest_basis_table(
            spark, path, column_map=cmap, mjd_col="epoch_mjd", mjd0=0.0
        )
        withb = attach_basis_table(res, ingested)
        inject = 5e-10
        injected = withb.withColumn(
            "residual_s",
            withb["residual_s"] + inject * withb["ephem_b_frame_drift_rate"],
        )
        grid = np.linspace(-1e-9, 1e-9, 11)
        samples = pd.DataFrame(
            {
                "sample_id": range(len(grid)),
                "log10_A": -20.0,
                "gamma": 3.0,
                **{p: 0.0 for p in BAYESEPHEM_PARAMS if p != "frame_drift_rate"},
                "frame_drift_rate": grid,
            }
        )
        comps = (RedComponent(nfreqs=4), DetComponent(BAYESEPHEM_PARAMS, BASIS_COLS))
        lnl = (
            gp_loglik_per_pulsar(injected, samples, 4, components=comps)
            .groupBy("sample_id")
            .sum("lnl")
            .collect()
        )
        best = max(lnl, key=lambda row: row["sum(lnl)"])["sample_id"]
        assert abs(grid[best] - inject) <= 2.5e-10, path
    # missing partials fail loudly
    with pytest.raises(ValueError):
        ingest_basis_table(spark, pq_path, column_map={}, mjd_col="epoch_mjd")
