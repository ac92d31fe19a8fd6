"""§3.2 end-to-end — the results-pipeline entry point.

Reference: EnterpriseWarpResult.main_pipeline (results.py:359-386): scan psr
run directories (regex P8), resolve chain + pars files, load with burn-in,
then flag-gated stages: model counts/logBF, credible levels, noise files,
covariance accumulation.

Spark shape: each run dir becomes one chains DataFrame (union across dirs
keeps run_id); every stage is a grouped query over the long form. Outputs
are returned as DataFrames; compat sinks (sinks.py) write reference-format
artifacts.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from enterprise_warp_spark.analytics.chains import (
    burn_in,
    credible_levels_by_par,
    log_bayes_factors_from_chain,
    model_posterior_counts,
    mode_positions_by_par,
    noise_summary,
)
from enterprise_warp_spark.sources.chains import chains_long, read_chain_dir

# psr-dir name predicate (results.py:251-257)
PSR_DIR_RE = re.compile(r"^\d+_[JB]\d{2,4}[+-]\d{2,4}[AB]?$")


def discover_run_dirs(base_dir: str, pattern: re.Pattern = PSR_DIR_RE) -> list[str]:
    """P8 — run directories whose basename matches the psr-dir regex; falls
    back to 'any dir containing pars.txt OR a bilby *_result.json' for
    non-reference layouts (the reference picks the parser per run the same
    way: PTMCMC chain files vs BilbyWarpResult, results.py:1050-1081)."""
    import glob as _glob

    out = []
    for name in sorted(os.listdir(base_dir)):
        full = os.path.join(base_dir, name)
        if not os.path.isdir(full):
            continue
        if (
            pattern.match(name)
            or os.path.exists(os.path.join(full, "pars.txt"))
            or _glob.glob(os.path.join(full, "*_result.json"))
        ):
            out.append(full)
    return out


def read_run_dir(spark: SparkSession, run_dir: str, separated: bool = False,
                 par_label: str | None = None):
    """Resolve ONE run directory with the right source: bilby result JSON
    (S6b) when `*_result.json` is present, else PTMCMC chain files (S6).
    Both return (chain, pars) in the same wide schema, so every downstream
    analytics stage is source-agnostic. separated=True loads timestamped
    chain segments instead (the --load_separated flag, results.py:479-495),
    falling back per-dir when none exist."""
    import glob as _glob

    if _glob.glob(os.path.join(run_dir, "*_result.json")):
        from enterprise_warp_spark.sources.bilby import read_bilby_dir

        return read_bilby_dir(spark, run_dir)
    if separated:
        from enterprise_warp_spark.sources.chains import read_separated_chain_dir

        return read_separated_chain_dir(spark, run_dir, par_label=par_label)
    return read_chain_dir(spark, run_dir)


def run_results_pipeline(
    spark: SparkSession,
    base_dir: str,
    burn_frac: float = 0.25,
    load_separated: bool = False,
    par_label: str | None = None,
) -> dict[str, DataFrame]:
    """-> {'chains_long', 'model_counts', 'log_bf', 'credible_levels',
    'modes', 'noise'} — every stage of the reference pipeline as a DataFrame,
    computed over ALL runs at once (the reference loops dirs sequentially)."""
    dirs = discover_run_dirs(base_dir)
    if not dirs:
        raise FileNotFoundError(f"no run directories under {base_dir}")
    long_parts = []
    for d in dirs:
        chain, pars = read_run_dir(
            spark, d, separated=load_separated, par_label=par_label
        )
        long_parts.append(chains_long(chain, pars))
    all_long = long_parts[0]
    for part in long_parts[1:]:
        all_long = all_long.unionByName(part)  # X4

    kept = burn_in(all_long, burn_frac)
    return {
        "chains_long": kept,
        "model_counts": model_posterior_counts(kept),
        "log_bf": log_bayes_factors_from_chain(kept),
        "credible_levels": credible_levels_by_par(kept),
        "modes": mode_positions_by_par(kept),
        "noise": noise_summary(kept),
    }
