"""K8 — tempo2 shell source (feature-flagged; external binary).

Reference: `get_tempo2_prediction` (tempo2_warp.py:4-48) shells out to
``tempo2 -output general2 -f <par> <tim> -s <format>``, retries once with
``-nobs 1000000`` on the "Too many TOAs" failure, scrapes the stdout between
the ``Starting general2 plugin`` / ``Finished general2 plugin`` sentinel
lines, strips quotation marks, and writes a whitespace matrix loadable with
``numpy.loadtxt``.

Here the scrape/parse is a pure function (`parse_general2_output`) so it is
golden-testable on canned stdout without the binary, and the shell-out is
gated behind an explicit opt-in (`enabled=True` or the
SPARK_GRAFT_ENABLE_TEMPO2 env var) — this container has no tempo2. The
parsed matrix lands in a DataFrame through the same whitespace-matrix shape
as the chain source (S6), with columns named from the general2 format
string's ``{field}`` placeholders.
"""

from __future__ import annotations

import os
import re
import subprocess

from pyspark.sql import DataFrame, SparkSession

START_SENTINEL = "Starting general2 plugin"
END_SENTINEL = "Finished general2 plugin"

DEFAULT_FORMAT = '"{bat}\\t{freq}\\t{post}\\t{err}\\t{posttn}\\t{tndm}\\t{tnrn}\\n"'


def format_fields(configuration: str) -> list[str]:
    """['bat', 'freq', ...] from the general2 format string's placeholders."""
    return re.findall(r"\{(\w+)\}", configuration)


def parse_general2_output(stdout_text: str) -> str:
    """The reference's sentinel scrape (tempo2_warp.py:43-46): keep only the
    text between the plugin sentinels, drop quotation marks."""
    body = stdout_text.partition(START_SENTINEL)[2]
    body = body.partition(END_SENTINEL)[0]
    return body.replace('"', "")


def general2_to_df(
    spark: SparkSession, scraped: str, configuration: str = DEFAULT_FORMAT
) -> DataFrame:
    """Scraped general2 text -> DataFrame with one DOUBLE column per format
    field (numpy.loadtxt-equivalent parse, whitespace-separated rows)."""
    import pandas as pd

    fields = format_fields(configuration)
    rows = []
    for line in scraped.splitlines():
        parts = line.split()
        if len(parts) != len(fields):
            continue  # junk lines the reference leaves for loadtxt to reject
        try:
            rows.append([float(x) for x in parts])
        except ValueError:
            continue
    return spark.createDataFrame(pd.DataFrame(rows, columns=fields))


def residuals_from_general2(
    g2: DataFrame,
    psr: str,
    bat_mjd0: float = 0.0,
    residual_col: str = "post",
    err_scale: float = 1e-6,
) -> DataFrame:
    """Bridge general2 noise-reconstruction rows into the GP kernel's
    residual schema (gp.RESIDUAL_COLS + freq_mhz): bat MJD -> seconds
    relative to ``bat_mjd0`` (use PEPOCH so timing-model specs line up),
    post-fit residual seconds from ``residual_col`` ('post' or the
    noise-subtracted 'posttn'), err µs -> seconds. This is the §3.1
    raw-data path: tempo2 fits the nonlinear timing solution, the engine's
    TMComponent marginalizes the remaining LINEAR fit uncertainty, and the
    same rows feed likelihood/gp and the OS reduction unchanged."""
    from pyspark.sql import functions as F

    return g2.select(
        F.lit(psr).alias("psr"),
        ((F.col("bat") - F.lit(bat_mjd0)) * 86400.0).alias("toa_s"),
        F.col(residual_col).cast("double").alias("residual_s"),
        (F.col("err") * F.lit(err_scale)).alias("toa_err_s"),
        F.lit(1.0).alias("efac"),
        F.lit(0.0).alias("equad"),
        F.col("freq").alias("freq_mhz"),
    )


def run_tempo2_prediction(
    spark: SparkSession,
    par: str,
    tim: str,
    configuration: str = DEFAULT_FORMAT,
    execute: str = "tempo2",
    enabled: bool | None = None,
) -> DataFrame:
    """Shell out to tempo2 (general2 plugin) and return the noise
    reconstruction as a DataFrame. Mirrors tempo2_warp.py:28-41 including
    the single ``-nobs 1000000`` retry on a "Too many TOAs" failure.

    Disabled unless `enabled=True` or SPARK_GRAFT_ENABLE_TEMPO2=1: the
    binary is an external dependency the engine must not silently require.
    """
    if enabled is None:
        enabled = os.environ.get("SPARK_GRAFT_ENABLE_TEMPO2") == "1"
    if not enabled:
        raise RuntimeError(
            "tempo2 shell source is disabled: pass enabled=True or set "
            "SPARK_GRAFT_ENABLE_TEMPO2=1 (requires a tempo2 binary with the "
            "general2 plugin on PATH)"
        )
    command = [execute, "-output", "general2", "-f", par, tim, "-s", configuration]
    try:
        result = subprocess.check_output(command)
    except subprocess.CalledProcessError:
        # reference retry: tempo2's "Too many TOAs" failure (tempo2_warp.py:33-41)
        result = subprocess.check_output(command + ["-nobs", "1000000"])
    return general2_to_df(
        spark, parse_general2_output(result.decode("utf-8")), configuration
    )
