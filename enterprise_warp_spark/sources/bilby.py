"""S6b — bilby-result JSON posterior source.

Reference: `BilbyWarpResult` (results.py:1050-1081) loads a run's
`<label>_result.json` (falling back to `glob(outdir + "*_result.json")[0]`,
results.py:1056-1064) via `bilby.result.read_in_result`, then exposes
`chain = np.array(result.posterior)` and `pars = result.parameter_labels`
(results.py:1070-1078) so the whole chain-analytics stack (burn-in, credible
levels, noise summarization, ...) runs on bilby output exactly as on PTMCMC
chain_1.txt matrices.

Public bilby JSON layout (bilby.core.result.Result.to_json with
BilbyJsonEncoder): a single JSON document whose `posterior` field is the
encoded pandas DataFrame {"__dataframe__": true, "content": {col: [values]}}
with one list per column — sampled parameters plus `log_likelihood` /
`log_prior` — and whose `parameter_labels` / `search_parameter_keys` list the
sampled parameter names in order.

Spark shape: `spark.read.json(multiLine)` parses the document JVM-side (one
task per result file; a directory of runs parallelizes per file), the column
lists are zipped with `arrays_zip` and `posexplode` assigns the step index —
no driver-side JSON parse of the (potentially large) posterior arrays. The
output matches `read_chain`'s wide schema (run_id, step, values, lnpost,
lnlike, accept, pt) so every §3.2 analytics operator runs unchanged:
lnpost = log_likelihood + log_prior; bilby stores no accept/pt columns, so
they are filled with 1.0 / 0.0 (the values PTMCMC writes for an always-kept
zero-temperature chain).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_bilby_result(
    spark: SparkSession, path: str, run_id: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """-> (chain, pars): chain in `read_chain`'s wide schema, pars = (idx, par)
    in sampled-parameter order (results.py:1070-1078 semantics)."""
    run_id = run_id or os.path.basename(path).replace("_result.json", "") or "run"
    raw = spark.read.option("multiLine", "true").json(path)
    field_names = [f.name for f in raw.schema.fields]
    label_col = (
        "parameter_labels"
        if "parameter_labels" in field_names
        else "search_parameter_keys"
    )
    labels = list(raw.select(label_col).first()[0])
    content = [f.name for f in raw.schema["posterior"].dataType["content"].dataType.fields]
    missing = [p for p in labels if p not in content]
    if missing:
        raise ValueError(
            f"bilby result {path}: posterior.content lacks sampled parameters "
            f"{missing} (has {content})"
        )
    has_lp = "log_prior" in content
    aliased = raw.select(
        *[
            F.col(f"posterior.content.`{p}`").alias(f"_p{i}")
            for i, p in enumerate(labels)
        ],
        F.col("posterior.content.log_likelihood").alias("_ll"),
        (
            F.col("posterior.content.log_prior")
            if has_lp
            else F.expr("transform(posterior.content.log_likelihood, x -> double(0.0))")
        ).alias("_lp"),
    )
    zipped = aliased.select(
        F.posexplode(
            F.arrays_zip(
                *[F.col(f"_p{i}") for i in range(len(labels))], F.col("_ll"), F.col("_lp")
            )
        ).alias("step", "s")
    )
    chain = zipped.select(
        F.lit(run_id).alias("run_id"),
        F.col("step"),
        F.array(
            *[F.col(f"s._p{i}").cast("double") for i in range(len(labels))]
        ).alias("values"),
        (F.col("s._ll") + F.col("s._lp")).cast("double").alias("lnpost"),
        F.col("s._ll").cast("double").alias("lnlike"),
        F.lit(1.0).alias("accept"),
        F.lit(0.0).alias("pt"),
    )
    pars = spark.createDataFrame(
        pd.DataFrame({"idx": range(len(labels)), "par": labels})
    )
    return chain, pars


def read_bilby_dir(
    spark: SparkSession, run_dir: str, label: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Resolve a run directory the way the reference does (results.py:
    1056-1064): `<label>_result.json` when the label is known, else the first
    `*_result.json` glob match."""
    if label is not None:
        cand = os.path.join(run_dir, f"{label}_result.json")
        if not os.path.isfile(cand):
            raise FileNotFoundError(f"no {label}_result.json in {run_dir}")
    else:
        import glob as _glob

        matches = sorted(_glob.glob(os.path.join(run_dir, "*_result.json")))
        if not matches:
            raise FileNotFoundError(f"no *_result.json in {run_dir}")
        cand = matches[0]
    return read_bilby_result(
        spark, cand, run_id=os.path.basename(run_dir.rstrip("/")) or None
    )
