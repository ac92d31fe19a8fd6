"""§3.1 end-to-end — the inference-run entry point, config to posterior.

Reference flow (run_example_paramfile.py + enterprise_warp.py:347-559):
paramfile -> noise-model JSON -> per-pulsar signal terms -> PTA -> sequential
sampler. Here the same config compiles to a sample-parallel plan:

    noise-model rows (plans/noisemodel) -> priors (plans/registry)
      -> samples table (likelihood/sampling, rand(seed) columns)
      -> GP kernel x pulsars (likelihood/gp, applyInPandas)
      -> A13 sum -> importance-weighted posterior summary

Supported model family in the kernel: one powerlaw red-noise process +
EFAC/EQUAD white noise (sampled or bound constants) + optional ECORR.
Additional signal terms (chromatic, system noise, multi-term GWB) compose by
extending the kernel's basis exactly like ECORR does — the registry already
carries their priors and basis sizing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from enterprise_warp_spark.likelihood.gp import gp_loglik_per_pulsar, total_loglik
from enterprise_warp_spark.likelihood.sampling import (
    Prior,
    posterior_summary,
    sample_priors,
)
from enterprise_warp_spark.plans.registry import priors_for_model

# registry prior name -> kernel parameter name
KERNEL_PARAMS = {
    "spin_noise_log10_A": "log10_A",
    "spin_noise_gamma": "gamma",
    "efac": "efac",
    "equad": "log10_equad",  # registry prior is already log10 (enterprise_models.py:74)
    "ecorr": "log10_ecorr",
}


def compile_priors(model_rows: list[dict], fixed: dict[str, float] | None = None) -> list[Prior]:
    """Map a normalized model's priors onto the kernel's parameter names,
    binding fixed constants (O2: prior<0 => value from noise files,
    enterprise_warp.py:544-548,561-581)."""
    fixed = fixed or {}
    out = []
    for p in priors_for_model(model_rows):
        name = KERNEL_PARAMS.get(p.name)
        if name is None:
            continue  # signal term not in the MVP kernel family
        if name in fixed:
            out.append(Prior(name, "constant", fixed[name]))
        else:
            out.append(Prior(name, p.kind, p.a, p.b))
    return out


def run_inference(
    spark: SparkSession,
    residuals: DataFrame,
    model_rows: list[dict],
    n_samples: int = 256,
    nfreqs: int = 20,
    seed: int = 42,
    fixed: dict[str, float] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (samples_with_lnl, posterior_summary_row).

    residuals: (psr, toa_s, residual_s, toa_err_s, efac, equad[, epoch_id]).
    model_rows: normalized noise-model rows (plans/noisemodel).
    """
    priors = compile_priors(model_rows, fixed)
    names = [p.name for p in priors]
    if "log10_A" not in names:
        priors.append(Prior("log10_A", "uniform", -20.0, -6.0))
    if "gamma" not in names:
        priors.append(Prior("gamma", "uniform", 0.0, 10.0))
    samples_df = sample_priors(spark, priors, n_samples, seed)
    samples_pd: pd.DataFrame = samples_df.toPandas()
    lnl = total_loglik(gp_loglik_per_pulsar(residuals, samples_pd, nfreqs))
    joined = lnl.join(samples_df, "sample_id")
    sampled_names = [p.name for p in priors if p.kind != "constant"]
    summary = posterior_summary(joined, sampled_names)
    return joined, summary
