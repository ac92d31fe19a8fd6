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


def general2_rows(scraped: str, configuration: str = DEFAULT_FORMAT):
    """Scraped general2 text -> pandas frame in FILE ORDER (tempo2 emits
    TOAs in .tim order — the order-alignment contract read_general2's
    tim-flag attach relies on), one float column per format field
    (numpy.loadtxt-equivalent parse, whitespace-separated rows)."""
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
    return pd.DataFrame(rows, columns=fields)


def general2_to_df(
    spark: SparkSession, scraped: str, configuration: str = DEFAULT_FORMAT
) -> DataFrame:
    """Scraped general2 text -> DataFrame with one DOUBLE column per format
    field."""
    return spark.createDataFrame(general2_rows(scraped, configuration))


def read_general2(
    spark: SparkSession,
    path: str,
    configuration: str = DEFAULT_FORMAT,
    tim_path: str | None = None,
    backend_flag: str = "group",
) -> DataFrame:
    """A saved tempo2 general2 output (raw stdout with the plugin
    sentinels, or an already-scraped matrix) -> DataFrame; with tim_path,
    the .tim's backend group and flags are ATTACHED by file order (tempo2
    emits general2 rows in .tim order), validated per row: equal row
    counts, frequency agreement within 0.5 MHz, and |bat - toa_mjd| under
    0.05 d (generous for any barycentric correction, |Roemer delay| <~
    500 s). The TOA table is metadata-scale (10^2-10^5 rows), so the
    alignment runs driver-side like every other TOA-table bridge.

    backend_flag names the .tim flag carrying the backend/system label
    (default '-group'; NANOGrav-convention files use '-f') — a TOA
    missing it fails loudly with the row and its available flags."""
    text = open(path).read()
    if START_SENTINEL in text:
        text = parse_general2_output(text)
    text = text.replace('"', "")
    pdf = general2_rows(text, configuration)
    if tim_path is None:
        return spark.createDataFrame(pdf)
    from enterprise_warp_spark.sources.tim import read_tim

    toas = read_tim(spark, tim_path).toPandas()
    if len(toas) != len(pdf):
        raise ValueError(
            f"general2 file has {len(pdf)} rows but {tim_path} has "
            f"{len(toas)} TOAs — cannot order-align"
        )
    import numpy as np

    dfreq = np.abs(pdf["freq"].to_numpy() - toas["freq_mhz"].to_numpy())
    dmjd = np.abs(
        pdf["bat"].to_numpy() - toas["toa_mjd"].astype(float).to_numpy()
    )
    bad = (dfreq > 0.5) | (dmjd > 0.05)
    if bad.any():
        i = int(np.argmax(bad))
        raise ValueError(
            "general2/tim order-alignment failed at row "
            f"{i}: |dfreq|={dfreq[i]:.3f} MHz, |dmjd|={dmjd[i]:.5f} d — "
            "the general2 output does not correspond to this .tim"
        )
    out = pdf.copy()
    backends = []
    for i, m in enumerate(toas["flags"]):
        d = dict(m)
        if backend_flag not in d:
            raise ValueError(
                f"TOA row {i} of {tim_path} has no -{backend_flag} flag "
                f"(flags present: {sorted(d) or 'none'}); pass "
                "backend_flag= naming the flag that carries the backend "
                "label (e.g. 'f' for NANOGrav-convention files)"
            )
        backends.append(d[backend_flag])
    out["backend"] = backends
    out["flags"] = [dict(m) for m in toas["flags"]]
    return spark.createDataFrame(out)


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
    same rows feed likelihood/gp and the OS reduction unchanged. backend /
    flags columns (read_general2's tim attach) ride along when present —
    the by-backend white-noise selections need them."""
    from pyspark.sql import functions as F

    cols = [
        F.lit(psr).alias("psr"),
        ((F.col("bat") - F.lit(bat_mjd0)) * 86400.0).alias("toa_s"),
        F.col(residual_col).cast("double").alias("residual_s"),
        (F.col("err") * F.lit(err_scale)).alias("toa_err_s"),
        F.lit(1.0).alias("efac"),
        F.lit(0.0).alias("equad"),
        F.col("freq").alias("freq_mhz"),
    ]
    for extra in ("backend", "flags"):
        if extra in g2.columns:
            cols.append(F.col(extra))
    return g2.select(*cols)


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
