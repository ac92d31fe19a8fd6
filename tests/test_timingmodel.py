"""Timing-model marginalization (tm: default/fast/ridge) — dense parity,
constant-offset identity, .par-driven spec, and the §3.1 end-to-end run from
the shipped J1832-0836 .par/.tim pair (reference enterprise_warp.py:500-508)."""

import math
import os

import numpy as np
import pandas as pd
import pytest

from enterprise_warp_spark.functions.timingmodel import (
    DAY_S,
    design_matrix,
    fit_residuals,
    tm_spec_from_par_file,
)
from enterprise_warp_spark.likelihood.gp import (
    TM_WEIGHT,
    RedComponent,
    TMComponent,
    _lnlike_one,
    dense_lnlike_reference,
    dense_lnlike_tm_marginalized,
    gp_loglik_per_pulsar,
    powerlaw_phi,
)

DATA = "/root/reference/examples/data"
PAR = os.path.join(DATA, "J1832-0836.par")
TIM = os.path.join(DATA, "J1832-0836.tim")


def _toy_problem(rng, n=120, m_jumps=0):
    tspan = 6.0 * 365.25 * 86400.0
    t = np.sort(rng.uniform(-tspan / 2, tspan / 2, n))
    freq = rng.uniform(700.0, 3100.0, n)
    sig = rng.uniform(0.5e-6, 2e-6, n)
    spec = [
        ("offset",),
        ("spin", 1, 0.0),
        ("spin", 2, 0.0),
        ("dm", 0, 0.0),
        ("harm", 1.0, "sin", 0),
        ("harm", 1.0, "cos", 0),
    ]
    M = design_matrix(tuple(spec), t, freq_mhz=freq)
    nf = 8
    T = t.max() - t.min()
    f = np.arange(1, nf + 1) / T
    arg = 2 * math.pi * np.outer(t, f)
    Fmat = np.empty((n, 2 * nf))
    Fmat[:, 0::2] = np.sin(arg)
    Fmat[:, 1::2] = np.cos(arg)
    phi = powerlaw_phi(np.repeat(f, 2), np.full(2 * nf, 1.0 / T), -13.1, 3.9)
    r = rng.normal(0, 1e-6, n) + M @ rng.normal(0, 0.5, M.shape[1]) * 1e-6
    return t, freq, sig, M, Fmat, phi, r


def test_tm_fast_matches_dense_projection():
    rng = np.random.default_rng(3)
    t, freq, sig, M, Fmat, phi, r = _toy_problem(rng)
    got = _lnlike_one(r, sig**2, np.hstack([M, Fmat]), phi, n_inf=M.shape[1])
    want = dense_lnlike_tm_marginalized(r, sig**2, M, Fmat, phi)
    assert got == pytest.approx(want, rel=1e-9)


def test_tm_default_is_fast_minus_constant():
    """'default' (finite 1e40 prior) == 'fast' - 1/2 m ln(1e40): same
    inference, the enterprise TimingModel-vs-MarginalizingTimingModel
    constant."""
    rng = np.random.default_rng(4)
    t, freq, sig, M, Fmat, phi, r = _toy_problem(rng)
    m = M.shape[1]
    B = np.hstack([M, Fmat])
    fast = _lnlike_one(r, sig**2, B, phi, n_inf=m)
    default = _lnlike_one(
        r, sig**2, B, np.concatenate([np.full(m, TM_WEIGHT), phi])
    )
    assert default == pytest.approx(fast - 0.5 * m * math.log(TM_WEIGHT), abs=1e-6)


def test_tm_ridge_matches_dense_finite():
    rng = np.random.default_rng(5)
    t, freq, sig, M, Fmat, phi, r = _toy_problem(rng)
    v = 10.0**-11.0
    phi_all = np.concatenate([np.full(M.shape[1], v), phi])
    got = _lnlike_one(r, sig**2, np.hstack([M, Fmat]), phi_all)
    want = dense_lnlike_reference(r, sig**2, np.hstack([M, Fmat]), phi_all)
    assert got == pytest.approx(want, rel=1e-9)


def test_tm_spec_from_shipped_par():
    spec = tm_spec_from_par_file(PAR)
    kinds = [e[0] for e in spec]
    # offset + F0/F1 + DM/DM1/DM2 + pos(2) + pm(2) + px(2) + 5 fit JUMPs
    assert kinds.count("offset") == 1
    assert kinds.count("spin") == 2
    assert kinds.count("dm") == 3
    assert kinds.count("harm") == 6
    jumps = [e for e in spec if e[0] == "jump"]
    assert sorted(j[1:] for j in jumps) == sorted(
        [
            ("g", "20CM_PDFB3"),
            ("g", "40CM_PDFB3"),
            ("g", "40CM_CASPSR"),
            ("g", "20CM_PDFB4"),
            ("h", "20CM_H-OH_PDFB4"),
        ]
    )
    assert len(spec) == 17
    # epochs are PEPOCH-relative: PEPOCH==DMEPOCH==57246 in this par
    assert spec[1] == ("spin", 1, 0.0)
    assert spec[3] == ("dm", 0, 0.0)


def _load_j1832(spark):
    """Real .par/.tim -> (residual rows, spec, pepoch-relative arrays)."""
    from enterprise_warp_spark.sources.tim import read_tim

    toas = read_tim(spark, TIM).toPandas()
    spec = tm_spec_from_par_file(PAR)
    t = ((toas["toa_mjd"].astype(float)) - 57246.0) * DAY_S
    return toas, spec, t.to_numpy()


def test_tm_e2e_shipped_par_tim_matches_dense(spark):
    """§3.1 end-to-end: the kernel scoring real J1832-0836 TOAs (with real
    flags driving the JUMP columns) equals the dense M-projection oracle."""
    toas, spec, t = _load_j1832(spark)
    rng = np.random.default_rng(11)
    n = len(t)
    assert n == 326  # golden count from the shipped file
    sig = toas["toa_err_us"].to_numpy() * 1e-6
    freq = toas["freq_mhz"].to_numpy()
    r = rng.normal(0.0, 2e-6, n)
    rows = [
        (
            "J1832-0836",
            float(t[i]),
            float(r[i]),
            float(sig[i]),
            1.0,
            0.0,
            float(freq[i]),
            dict(toas["flags"].iloc[i]),
        )
        for i in range(n)
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, freq_mhz double, flags map<string,string>",
    )
    nf = 5
    samples = pd.DataFrame(
        {"sample_id": [0], "log10_A": [-13.0], "gamma": [4.0]}
    )
    comps = (TMComponent(spec, mode="fast"), RedComponent(nfreqs=nf))
    got = gp_loglik_per_pulsar(res, samples, components=comps).first()["lnl"]

    order = np.argsort(t)
    ts, rs, ss, fs = t[order], r[order], sig[order], freq[order]
    flags_sorted = toas["flags"].iloc[order]

    def flag_of(flag):
        return np.array(
            [dict(m).get(flag) for m in flags_sorted], dtype=object
        )

    M = design_matrix(spec, ts, freq_mhz=fs, flag_of=flag_of)
    # all five fit-JUMP groups are populated in this data set
    assert M.shape == (n, 17)
    T = ts.max() - ts.min()
    f = np.arange(1, nf + 1) / T
    arg = 2 * math.pi * np.outer(ts, f)
    Fmat = np.empty((n, 2 * nf))
    Fmat[:, 0::2] = np.sin(arg)
    Fmat[:, 1::2] = np.cos(arg)
    phi = powerlaw_phi(np.repeat(f, 2), np.full(2 * nf, 1.0 / T), -13.0, 4.0)
    want = dense_lnlike_tm_marginalized(rs, ss**2, M, Fmat, phi)
    assert got == pytest.approx(want, rel=1e-9)


def test_tm_svd_same_inference_shape(spark):
    """use_svd replaces M with an orthonormal span: per-sample lnl DIFFERENCES
    are identical (the basis change only shifts a per-pulsar constant)."""
    rng = np.random.default_rng(12)
    t, freq, sig, M, Fmat, phi, r = _toy_problem(rng, n=90)
    rows = [
        ("J1", float(t[i]), float(r[i]), float(sig[i]), 1.0, 0.0, float(freq[i]))
        for i in range(len(t))
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, freq_mhz double",
    )
    spec = (
        ("offset",),
        ("spin", 1, 0.0),
        ("spin", 2, 0.0),
        ("dm", 0, 0.0),
        ("harm", 1.0, "sin", 0),
        ("harm", 1.0, "cos", 0),
    )
    samples = pd.DataFrame(
        {"sample_id": [0, 1], "log10_A": [-13.5, -12.8], "gamma": [4.0, 3.2]}
    )
    lnl = {}
    for svd in (False, True):
        comps = (TMComponent(spec, mode="fast", use_svd=svd), RedComponent(nfreqs=6))
        got = gp_loglik_per_pulsar(res, samples, components=comps).collect()
        lnl[svd] = {row["sample_id"]: row["lnl"] for row in got}
    d_plain = lnl[False][1] - lnl[False][0]
    d_svd = lnl[True][1] - lnl[True][0]
    assert d_svd == pytest.approx(d_plain, rel=1e-8)


def test_tm_ridge_mode_spark(spark):
    """ridge mode samples tm_log10_variance per sample; parity vs the local
    finite-prior evaluation."""
    rng = np.random.default_rng(13)
    t, freq, sig, M, Fmat, phi, r = _toy_problem(rng, n=80)
    rows = [
        ("J1", float(t[i]), float(r[i]), float(sig[i]), 1.0, 0.0, float(freq[i]))
        for i in range(len(t))
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, freq_mhz double",
    )
    spec = (("offset",), ("spin", 1, 0.0), ("spin", 2, 0.0))
    nf = 6
    samples = pd.DataFrame(
        {
            "sample_id": [0, 1],
            "log10_A": [-13.0, -13.0],
            "gamma": [4.0, 4.0],
            "tm_log10_variance": [-12.0, -15.0],
        }
    )
    comps = (TMComponent(spec, mode="ridge"), RedComponent(nfreqs=nf))
    got = {
        row["sample_id"]: row["lnl"]
        for row in gp_loglik_per_pulsar(res, samples, components=comps).collect()
    }
    order = np.argsort(t)
    ts, rs, ss = t[order], r[order], sig[order]
    Mk = design_matrix(spec, ts)
    T = ts.max() - ts.min()
    f = np.arange(1, nf + 1) / T
    arg = 2 * math.pi * np.outer(ts, f)
    Fk = np.empty((len(ts), 2 * nf))
    Fk[:, 0::2] = np.sin(arg)
    Fk[:, 1::2] = np.cos(arg)
    ph = powerlaw_phi(np.repeat(f, 2), np.full(2 * nf, 1.0 / T), -13.0, 4.0)
    for sid, v in ((0, -12.0), (1, -15.0)):
        phi_all = np.concatenate([np.full(Mk.shape[1], 10.0**v), ph])
        want = _lnlike_one(rs, ss**2, np.hstack([Mk, Fk]), phi_all)
        assert got[sid] == pytest.approx(want, rel=1e-10)
    assert got[0] != pytest.approx(got[1], rel=1e-6)  # variance matters


def test_tm_inject_recover_with_spin_perturbation(spark):
    """A perturbed F0/F1 (linear+quadratic trend in the residuals) must not
    bias the recovered red-noise amplitude when tm marginalization is ON;
    with tm OFF the trend leaks into the lowest Fourier bins and inflates
    the recovered amplitude."""
    rng = np.random.default_rng(21)
    n = 200
    tspan = 8.0 * 365.25 * 86400.0
    t = np.sort(rng.uniform(-tspan / 2, tspan / 2, n))
    sig = np.full(n, 1e-6)
    # injected red noise at log10_A=-13, gamma=4
    nf_inj = 12
    T = t.max() - t.min()
    f = np.arange(1, nf_inj + 1) / T
    phi = powerlaw_phi(np.repeat(f, 2), np.full(2 * nf_inj, 1.0 / T), -13.0, 4.0)
    arg = 2 * math.pi * np.outer(t, f)
    Fmat = np.empty((n, 2 * nf_inj))
    Fmat[:, 0::2] = np.sin(arg)
    Fmat[:, 1::2] = np.cos(arg)
    red = Fmat @ rng.normal(0, np.sqrt(phi))
    white = rng.normal(0, sig)
    # spin perturbation: 30 µs linear + quadratic trend (deltaF0/deltaF1)
    trend = 3e-5 * (t / (tspan / 2)) + 2e-5 * (t / (tspan / 2)) ** 2
    r = red + white + trend
    rows = [
        ("J1", float(t[i]), float(r[i]), float(sig[i]), 1.0, 0.0)
        for i in range(n)
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    ).cache()
    spec = (("offset",), ("spin", 1, 0.0), ("spin", 2, 0.0))
    grid = pd.DataFrame(
        {
            "sample_id": range(13),
            "log10_A": np.linspace(-15.0, -11.0, 13),
            "gamma": 4.0,
        }
    )
    with_tm = (
        gp_loglik_per_pulsar(
            res, grid, components=(TMComponent(spec), RedComponent(nfreqs=12))
        )
        .toPandas()
        .merge(grid, on="sample_id")
    )
    without_tm = (
        gp_loglik_per_pulsar(res, grid, nfreqs=12).toPandas().merge(grid, on="sample_id")
    )
    best_with = with_tm.loc[with_tm["lnl"].idxmax(), "log10_A"]
    best_without = without_tm.loc[without_tm["lnl"].idxmax(), "log10_A"]
    assert abs(best_with - (-13.0)) <= 0.75
    # the un-marginalized trend inflates the apparent red-noise amplitude
    assert best_without > best_with


def test_run_inference_tm_e2e_from_par_tim(spark):
    """§3.1 config-to-posterior flow with the paramfile-level `tm:` option,
    driven end-to-end from the shipped .par/.tim pair: injected red noise on
    the real TOA grid + a spin trend, recovered through run_inference with
    tm marginalization on."""
    import json

    from enterprise_warp_spark.likelihood.inference import run_inference

    toas, spec, t = _load_j1832(spark)
    rng = np.random.default_rng(41)
    n = len(t)
    sig = np.full(n, 1e-6)
    nf_inj = 10
    order = np.argsort(t)
    ts = t[order]
    T = ts.max() - ts.min()
    f = np.arange(1, nf_inj + 1) / T
    phi = powerlaw_phi(np.repeat(f, 2), np.full(2 * nf_inj, 1.0 / T), -13.0, 4.0)
    arg = 2 * math.pi * np.outer(ts, f)
    Fm = np.empty((n, 2 * nf_inj))
    Fm[:, 0::2] = np.sin(arg)
    Fm[:, 1::2] = np.cos(arg)
    r = (
        Fm @ rng.normal(0, np.sqrt(phi))
        + rng.normal(0, sig)
        + 2e-5 * (ts / (T / 2))  # perturbed F0: linear trend
    )
    freq = toas["freq_mhz"].to_numpy()[order]
    rows = [
        (
            "J1832-0836",
            float(ts[i]),
            float(r[i]),
            1e-6,
            1.0,
            0.0,
            float(freq[i]),
            dict(toas["flags"].iloc[order[i]]),
        )
        for i in range(n)
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, freq_mhz double, flags map<string,string>",
    )
    model_rows = [
        {"signal": "spin_noise", "option_json": json.dumps({"psd": "powerlaw"})}
    ]
    joined, summary = run_inference(
        spark,
        res,
        model_rows,
        n_samples=192,
        nfreqs=10,
        seed=7,
        tm=TMComponent(spec, mode="fast"),
    )
    row = summary.first()
    amp_col = next(c for c in summary.columns if c.endswith("log10_A_map"))
    assert abs(row[amp_col] - (-13.0)) <= 1.0


def test_fit_residuals_removes_span():
    rng = np.random.default_rng(31)
    t = np.linspace(-1e8, 1e8, 300)
    M = design_matrix((("offset",), ("spin", 1, 0.0), ("spin", 2, 0.0)), t)
    y = M @ np.array([3.0, -2.0, 5.0]) + rng.normal(0, 1e-7, 300)
    r = fit_residuals(M, y)
    # projection removes the fitted span entirely
    assert np.abs(M.T @ r).max() < 1e-8
    assert np.std(r) < 2e-7


def test_offset_tm_closed_form_matches_kernel():
    """The gp_whitened_loglik gate's lnl_tm_offset closed form — white noise
    + infinite-prior OFFSET column — equals _lnlike_one's n_inf path."""
    rng = np.random.default_rng(61)
    n = 64
    r = rng.normal(0.0, 1e-6, n)
    sig2 = np.full(n, 1e-12)
    got = _lnlike_one(r, sig2, np.ones((n, 1)), np.array([]), n_inf=1)
    t = r / 1e-6
    want = -0.5 * (
        float(t @ t)
        - float(t.sum()) ** 2 / n
        + n * math.log(1e-12)
        + math.log(n * 1e12)
        + n * math.log(2.0 * math.pi)
    )
    assert got == pytest.approx(want, rel=1e-12)


def test_run_adaptive_inference_accepts_tm(spark):
    """run_adaptive_inference wires the tm option like run_inference (ridge
    adds the sampled tm_log10_variance dimension)."""
    import json

    from enterprise_warp_spark.likelihood.inference import run_adaptive_inference

    rng = np.random.default_rng(5)
    rows = [
        ("J1", float(t), float(rng.normal(0, 1e-6)), 1e-6, 1.0, 0.0)
        for t in np.sort(rng.uniform(0, 2.5e8, 80))
    ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    )
    model_rows = [
        {"signal": "spin_noise", "option_json": json.dumps("powerlaw_4_nfreqs")}
    ]
    spec = (("offset",), ("spin", 1, 0.0))
    scored, summary = run_adaptive_inference(
        spark, res, model_rows, rounds=2, n_per_round=48, nfreqs=4, seed=9,
        tm=TMComponent(spec, mode="ridge"),
    )
    row = summary.first()
    assert "tm_log10_variance_map" in row.asDict()
    assert math.isfinite(row["tm_log10_variance_map"])
