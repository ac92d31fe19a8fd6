"""Product-space (HyperModel) sampling: the engine produces nmodel-bearing
posteriors natively (run_example_paramfile.py:31-45 semantics) — inject-
recover on the model indicator, Bayes factors with the right sign and
ordering, and byte-deterministic output given the seed."""

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.likelihood.gp import powerlaw_phi
from enterprise_warp_spark.likelihood.product_space import hypermodel_sample
from enterprise_warp_spark.operators.relational import (
    log_bayes_factors,
    model_counts,
)

NPSR = 2
NFREQ = 8
TSPAN = 10.0 * 365.25 * 86400.0
SIGMA = 1e-7

MODELS = {
    0: [],  # white-noise-only null model
    1: [{"signal": "spin_noise", "option_json": json.dumps("powerlaw_8_nfreqs")}],
}


def _residuals(spark, inject_red: bool):
    rng = np.random.default_rng(17)
    rows = []
    f = np.arange(1, NFREQ + 1) / TSPAN
    f2 = np.repeat(f, 2)
    phi = powerlaw_phi(f2, np.full(2 * NFREQ, 1.0 / TSPAN), -13.5, 13.0 / 3.0)
    for p in range(NPSR):
        n = 150
        t = np.sort(rng.uniform(0, TSPAN, n))
        arg = 2 * math.pi * np.outer(t, f)
        Fmat = np.empty((n, 2 * NFREQ))
        Fmat[:, 0::2] = np.sin(arg)
        Fmat[:, 1::2] = np.cos(arg)
        r = rng.normal(0, SIGMA, n)
        if inject_red:
            r = r + Fmat @ rng.normal(0, np.sqrt(phi))
        rows += [
            (f"J{p:04d}+0000", float(ti), float(ri), SIGMA, 1.0, 0.0)
            for ti, ri in zip(t, r)
        ]
    return spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double",
    ).cache()


@pytest.fixture(scope="module")
def injected_run(spark):
    res = _residuals(spark, inject_red=True)
    return hypermodel_sample(
        spark, res, MODELS, n_samples=768, nfreqs=NFREQ, seed=3
    )


def test_logbf_recovers_injected_model(spark, injected_run):
    chain, log_bf = injected_run
    row = log_bf.collect()[0]
    assert (row["model_a"], row["model_b"]) == (0, 1)
    # strong injected red noise: decisive evidence for model 1
    assert row["log_bf"] > 5.0, row["log_bf"]


def test_null_data_prefers_null_model(spark, injected_run):
    _, bf_inj = injected_run
    res = _residuals(spark, inject_red=False)
    _, log_bf = hypermodel_sample(
        spark, res, MODELS, n_samples=768, nfreqs=NFREQ, seed=3
    )
    lbf_null = log_bf.collect()[0]["log_bf"]
    # no signal: no decisive preference for the extra-parameter model, and
    # far below the injected-data Bayes factor
    assert lbf_null < 2.0, lbf_null
    assert bf_inj.collect()[0]["log_bf"] > lbf_null + 3.0


def test_chain_feeds_a2_a3_analytics(spark, injected_run):
    """The resampled chain IS an nmodel chain: A2/A3 run on the engine's own
    output, and the counts agree with the evidence-based Bayes factor."""
    chain, log_bf = injected_run
    counts = model_counts(chain, "nmodel")
    by_model = {r["nmodel"]: r["n_samples"] for r in counts.collect()}
    total = sum(by_model.values())
    assert by_model.get(1, 0) / total > 0.9  # injected model dominates
    if by_model.get(0, 0) > 0:
        bf_counts = log_bayes_factors(counts).collect()[0]["log_bf"]
        assert bf_counts > 0  # counts odds point the same way as evidence


def test_deterministic_given_seed(spark, injected_run):
    chain, log_bf = injected_run
    res = _residuals(spark, inject_red=True)
    chain2, log_bf2 = hypermodel_sample(
        spark, res, MODELS, n_samples=768, nfreqs=NFREQ, seed=3
    )
    assert log_bf.collect() == log_bf2.collect()
    a = chain.orderBy("step").limit(20).collect()
    b = chain2.orderBy("step").limit(20).collect()
    assert a == b


def test_shared_prior_conflict_raises(spark):
    res = _residuals(spark, inject_red=False).limit(10)
    bad = {
        0: [{"signal": "spin_noise", "option_json": json.dumps("powerlaw_4_nfreqs")}],
        1: [{"signal": "spin_noise", "option_json": json.dumps("powerlaw_4_nfreqs")}],
    }
    # identical priors shared across models is fine (no raise)
    hypermodel_sample(spark, res, bad, n_samples=8, nfreqs=4, seed=1)
    with pytest.raises(ValueError):
        hypermodel_sample(
            spark, res, {1: [], 2: []}, n_samples=8, nfreqs=4, seed=1
        )


def test_adaptive_evidence_differences_agree_with_hypermodel_bf(spark):
    """Two INDEPENDENT Bayes-factor estimators must agree: the
    product-space prior-IS evidence ratio (hypermodel_sample's log_bf)
    vs the difference of per-model adaptive importance evidences
    (run_adaptive_inference(final_is) + log_evidence, r13).

    Models are NESTED with non-empty rows in both (model 0: achromatic
    powerlaw; model 1: + a chromatic DM powerlaw) so both paths compile
    identical physics, and the data is white-only so the BF is the
    moderate Occam factor for the unused DM parameters — the regime
    where both estimators have low variance. Agreement within 1 nat
    cross-validates the product-space evidence and the new logw
    weighting end to end."""
    from enterprise_warp_spark.likelihood.inference import (
        run_adaptive_inference,
    )
    from enterprise_warp_spark.likelihood.sampling import log_evidence

    models = {
        0: [{"signal": "spin_noise",
             "option_json": json.dumps("powerlaw_8_nfreqs")}],
        1: [{"signal": "spin_noise",
             "option_json": json.dumps("powerlaw_8_nfreqs")},
            {"signal": "dm_noise",
             "option_json": json.dumps("powerlaw_8_nfreqs")}],
    }
    rng = np.random.default_rng(29)
    rows = []
    for p in range(NPSR):
        n = 150
        t = np.sort(rng.uniform(0, TSPAN, n))
        r = rng.normal(0, SIGMA, n)
        freq = np.where(np.arange(n) % 2 == 0, 700.0, 3000.0)
        rows += [
            (f"J{p:04d}+0000", float(ti), float(ri), SIGMA, 1.0, 0.0,
             float(fi))
            for ti, ri, fi in zip(t, r, freq)
        ]
    res = spark.createDataFrame(
        rows,
        "psr string, toa_s double, residual_s double, toa_err_s double, "
        "efac double, equad double, freq_mhz double",
    ).cache()

    _, log_bf = hypermodel_sample(
        spark, res, models, n_samples=4096, nfreqs=NFREQ, seed=5
    )
    bf_ps = log_bf.collect()[0]["log_bf"]

    evs = {}
    for m in (0, 1):
        scored, _ = run_adaptive_inference(
            spark, res, models[m], rounds=3, n_per_round=256,
            nfreqs=NFREQ, seed=5, final_is=4096, final_is_waves=3,
        )
        evs[m] = log_evidence(scored)
    bf_is = evs[1] - evs[0]
    assert abs(bf_is - bf_ps) < 1.0, (bf_is, bf_ps, evs)
