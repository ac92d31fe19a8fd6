"""Compat sinks (SURVEY §2.1 K1/K2/K4): reference-format artifacts written
from DataFrames. Parquet is the native output everywhere else; these exist
so downstream consumers of the reference's file formats keep working."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_pars_txt(pars: DataFrame, path: str) -> None:
    """K1 — parameter-name sidecar, one name per line in idx order
    (enterprise_warp.py:553-555)."""
    rows = pars.orderBy("idx").select("par").collect()
    with open(path, "w") as fh:
        fh.write("\n".join(r["par"] for r in rows) + "\n")


def write_noise_json_files(noise: DataFrame, out_dir: str) -> list[str]:
    """K2 — one sorted-key flat JSON per run_id (PAL2 format,
    results.py:236-248). noise: (run_id, par, value)."""
    from enterprise_warp_spark.analytics.chains import noise_files_json

    os.makedirs(out_dir, exist_ok=True)
    docs = noise_files_json(noise).collect()
    paths = []
    for r in docs:
        p = os.path.join(out_dir, f"{r['run_id']}_noise.json")
        with open(p, "w") as fh:
            fh.write(r["noise_json"] + "\n")
        paths.append(p)
    return paths


def write_covm_csv(covm: DataFrame, path: str) -> None:
    """K4 — dense CSV export of the long-form covariance
    (results.py:542-553); pivot happens only here, at the edge."""
    from enterprise_warp_spark.analytics.covariance import covm_to_dense

    dense = covm_to_dense(covm).orderBy("row_par")
    pdf = dense.toPandas()
    pdf.to_csv(path, index=False)


def write_freqs_metadata(freqs: DataFrame, path: str) -> None:
    """K5 — per-selection Fourier component counts
    (enterprise_models.py:541-574) as a small parquet metadata table."""
    freqs.groupBy(*[c for c in freqs.columns if c in ("psr", "selection")]).agg(
        F.max("k").alias("nfreqs"), F.min("f_hz").alias("f_min_hz")
    ).write.mode("overwrite").parquet(path)
