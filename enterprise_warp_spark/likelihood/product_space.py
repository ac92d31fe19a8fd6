"""Product-space (HyperModel) sampling — native nmodel-bearing posteriors.

Reference flow (examples/run_example_paramfile.py:31-45): when a paramfile
declares several `{N}` model sections, `enterprise_extensions.hypermodel.
HyperModel({0: pta0, 1: pta1, ...})` samples the UNION of the models'
parameter spaces plus a continuous model indicator `nmodel` uniform in
[-0.5, n_models - 0.5]; each sample is scored by the likelihood of
model `round(nmodel)` only. The nmodel-marginal posterior counts are the
posterior odds (equal model priors), consumed downstream by A2/A3
(results.py:502-511, 605-616).

Spark-native equivalent: importance sampling over the same product space.

  1. compile every model section to (priors, kernel components)
     (likelihood/inference.compile_priors_and_components);
  2. sample the union parameter space + nmodel from the prior
     (rand(seed) columns, sample-parallel);
  3. partition samples by round(nmodel) and score each slice with ITS
     model's GP kernel only (gp_loglik_per_pulsar) — like the reference,
     a sample never pays for the other models' likelihoods;
  4. importance weights w = exp(lnl - max lnl) turn the prior sample into
     a posterior; a deterministic systematic resample produces an
     UNWEIGHTED posterior chain carrying `nmodel`, so the existing A2/A3
     chain analytics (model_counts / log_bayes_factors) run on the
     engine's own output byte-for-byte like on an MCMC chain;
  5. the per-model evidence is estimated directly from the same weights
     (log-mean-exp of lnl over each model's prior slice), giving ln Bayes
     factors with Occam penalty included.

A model section with NO red-noise components (white-only null model) is
scored through the same kernel with the amplitude pinned to 10^-20 — a
basis whose prior variance is ~27 orders below the white-noise level, i.e.
numerically the pure-white likelihood, without a separate code path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enterprise_warp_spark.likelihood.gp import (
    RedComponent,
    gp_loglik_per_pulsar,
    total_loglik,
)
from enterprise_warp_spark.likelihood.inference import (
    compile_priors_and_components,
)
from enterprise_warp_spark.likelihood.sampling import Prior, sample_priors

# amplitude so small the GP term is numerically absent (white-only models)
NULL_LOG10_A = -20.0


def hypermodel_sample(
    spark: SparkSession,
    residuals: DataFrame,
    models: dict[int, list[dict]],
    n_samples: int = 1024,
    n_posterior: int | None = None,
    nfreqs: int = 20,
    seed: int = 42,
    fixed: dict[str, float] | None = None,
    backends: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (posterior_chain, log_bf).

    models: {model_index: normalized model rows (§1.5)} — the paramfile's
    `{N}` sections. Same-named parameters are SHARED across models (the
    reference's HyperModel semantics: one column per unique parameter).

    posterior_chain: (step, nmodel, <params...>, lnl) — an unweighted
    resampled posterior; feed `operators.relational.model_counts` /
    `log_bayes_factors` (A2/A3) directly.
    log_bf: (model_a, model_b, log_bf) from the importance-sampling evidence
    estimate ln(Z_b/Z_a), Z_i = mean over model-i prior draws of exp(lnl).
    """
    n_models = len(models)
    indices = sorted(models)
    if indices != list(range(n_models)):
        raise ValueError(f"model indices must be 0..{n_models - 1}, got {indices}")
    compiled = {
        i: compile_priors_and_components(models[i], fixed, nfreqs, backends)
        for i in indices
    }

    # union parameter space: same-named priors shared, ranges must agree
    union: dict[str, Prior] = {}
    for i in indices:
        for p in compiled[i][0]:
            if p.name in union and union[p.name] != p:
                raise ValueError(
                    f"prior {p.name} differs between models: {union[p.name]} vs {p}"
                )
            union.setdefault(p.name, p)
    priors = list(union.values()) + [
        Prior("nmodel", "uniform", -0.5, n_models - 0.5)
    ]
    samples = sample_priors(spark, priors, n_samples, seed).toPandas()
    samples["_model"] = (
        samples["nmodel"].round().clip(0, n_models - 1).astype("int64")
    )

    scored_parts: list[DataFrame] = []
    for i in indices:
        slice_pd = samples[samples["_model"] == i].copy()
        if slice_pd.empty:
            continue
        comps = compiled[i][1]
        if not comps:
            # white-only null model: pinned negligible-amplitude GP term
            comps = (RedComponent(nfreqs=2),)
            slice_pd["log10_A"] = NULL_LOG10_A
            slice_pd["gamma"] = 2.0
        lnl = total_loglik(
            gp_loglik_per_pulsar(residuals, slice_pd, nfreqs, components=comps)
        )
        scored_parts.append(lnl.withColumn("model", F.lit(i)))
    scored = scored_parts[0]
    for part in scored_parts[1:]:
        scored = scored.unionByName(part)
    lnl_pd = scored.toPandas().merge(
        samples.drop(columns=["_model"]), on="sample_id"
    )

    # evidence per model: ln Z_i = logmeanexp(lnl over model-i prior draws)
    logz = {}
    for i in indices:
        lnls = lnl_pd.loc[lnl_pd["model"] == i, "lnl"].to_numpy()
        lnls = lnls[np.isfinite(lnls)]
        m = float(lnls.max())
        logz[i] = m + math.log(float(np.mean(np.exp(lnls - m))))
    bf_rows = [
        (a, b, logz[b] - logz[a])
        for a in indices
        for b in indices
        if a < b
    ]
    log_bf = spark.createDataFrame(
        pd.DataFrame(bf_rows, columns=["model_a", "model_b", "log_bf"])
    )

    # deterministic systematic resample -> unweighted posterior chain
    finite = lnl_pd[np.isfinite(lnl_pd["lnl"])].reset_index(drop=True)
    w = np.exp(finite["lnl"].to_numpy() - finite["lnl"].max())
    w = w / w.sum()
    n_out = n_posterior or n_samples
    # systematic resampling: one uniform offset, deterministic given seed
    u0 = np.random.default_rng(seed).uniform()
    pos = (u0 + np.arange(n_out)) / n_out
    idx = np.searchsorted(np.cumsum(w), pos)
    chain = finite.iloc[np.clip(idx, 0, len(finite) - 1)].reset_index(drop=True)
    chain = chain.drop(columns=["sample_id", "model"])
    chain.insert(0, "step", np.arange(n_out, dtype="int64"))
    return spark.createDataFrame(chain), log_bf
