#!/usr/bin/env python
"""Generate tests/data/J1832-0836_general2.txt — a tempo2 `-output
general2` stdout fixture for the real pulsar.

The observing setup is fully real (the shipped J1832-0836.tim's 326 TOA
epochs, uncertainties, frequencies; the .par's timing-model design); the
post-fit residuals are INJECTED at the reference's golden noise values
(examples/example_noisefiles/J1832-0836_noise.json) with a fixed seed —
the same construction as tests/test_golden_recovery.py, serialized in the
exact sentinel-wrapped general2 format the reference scrapes
(tempo2_warp.py:4-48). Columns follow sources/tempo2.DEFAULT_FORMAT:

    bat freq post err posttn tndm tnrn

with bat in MJD (the container cannot barycenter, so the fixture carries
the .tim epochs — the |bat - toa| < 1 min contract the loader checks holds
trivially), err in microseconds, residual columns in seconds, and
posttn/tndm/tnrn mutually consistent (posttn = post - tndm - tnrn).

Deterministic: re-running reproduces the committed file byte-for-byte.
"""

from __future__ import annotations

import json
import os

import numpy as np

EX = "/root/reference/examples"
PSR = "J1832-0836"
SEED = 20250816
NF = 8
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", f"{PSR}_general2.txt",
)


def main() -> None:
    from pyspark.sql import SparkSession

    from enterprise_warp_spark.functions.timingmodel import (
        DAY_S,
        design_matrix,
        flag_array_from_pandas,
        tm_spec_from_par_file,
    )
    from enterprise_warp_spark.likelihood.gp import powerlaw_phi
    from enterprise_warp_spark.sources.tim import read_tim

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    golden = json.load(open(f"{EX}/example_noisefiles/{PSR}_noise.json"))
    toas = read_tim(spark, f"{EX}/data/{PSR}.tim").toPandas()
    mjd = toas["toa_mjd"].astype(float).to_numpy()
    t = (mjd - 57246.0) * DAY_S
    n = len(t)
    assert n == 326
    freq = toas["freq_mhz"].to_numpy()
    sig = toas["toa_err_us"].to_numpy() * 1e-6
    flags = toas["flags"]
    backend = np.array([dict(m)["group"] for m in flags])

    efac_inj = np.array([golden[f"{PSR}_{b}_efac"] for b in backend])
    equad_inj = np.array(
        [10.0 ** golden[f"{PSR}_{b}_log10_equad"] for b in backend]
    )
    rng = np.random.default_rng(SEED)
    white = rng.normal(0.0, efac_inj * np.sqrt(sig**2 + equad_inj**2))
    T = t.max() - t.min()
    f = np.arange(1, NF + 1) / T
    arg = 2 * np.pi * np.outer(t, f)
    Fred = np.empty((n, 2 * NF))
    Fred[:, 0::2] = np.sin(arg)
    Fred[:, 1::2] = np.cos(arg)
    df2 = np.full(2 * NF, 1.0 / T)
    phi_red = powerlaw_phi(
        np.repeat(f, 2), df2,
        golden[f"{PSR}_red_noise_log10_A"], golden[f"{PSR}_red_noise_gamma"],
    )
    phi_dm = powerlaw_phi(
        np.repeat(f, 2), df2,
        golden[f"{PSR}_dm_gp_log10_A"], golden[f"{PSR}_dm_gp_gamma"],
    )
    Fdm = Fred * ((1400.0 / freq) ** 2.0)[:, None]
    spec = tm_spec_from_par_file(f"{EX}/data/{PSR}.par")
    M = design_matrix(
        spec, t, freq_mhz=freq, flag_of=flag_array_from_pandas(flags)
    )
    tnrn = Fred @ rng.normal(0, np.sqrt(phi_red))
    tndm = Fdm @ rng.normal(0, np.sqrt(phi_dm))
    tm_part = M @ (rng.normal(0, 1.0, M.shape[1]) * 1e-6)
    post = white + tnrn + tndm + tm_part
    posttn = post - tnrn - tndm

    lines = ["Starting general2 plugin"]
    for i in range(n):
        lines.append(
            '"%.10f\t%.4f\t%.12e\t%.6f\t%.12e\t%.12e\t%.12e' % (
                mjd[i], freq[i], post[i], sig[i] * 1e6,
                posttn[i], tndm[i], tnrn[i],
            )
        )
    lines.append('"Finished general2 plugin')
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
