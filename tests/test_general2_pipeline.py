"""r13 verdict #5 — the tempo2 general2 real-data loop, end to end:

a CHECKED-IN general2-format fixture for the real pulsar (the shipped
J1832-0836.tim's 326 epochs/errors/frequencies with noise injected at the
reference's golden values — scripts/make_general2_fixture.py, seed-pinned)
drives §3.1 with zero glue: read_general2 (+.tim flag attach) ->
residuals_from_general2 -> run_adaptive_inference -> posterior summary +
evidence + ESS + the PAL2 noise-file JSON under reference parameter names.

Absolute residual formation (JPL barycentering + the nonlinear fit) stays
tempo2's job — the same boundary the reference draws by shelling out to
libstempo (enterprise_warp.py:420, tempo2_warp.py:4-48); this is the first
step a user with real tempo2 output runs INSIDE the engine.
"""

import json
import os

import numpy as np
import pytest

PSR = "J1832-0836"
EX = "/root/reference/examples"
FIXTURE = os.path.join(os.path.dirname(__file__), "data", f"{PSR}_general2.txt")


def test_read_general2_attaches_tim_flags(spark):
    from enterprise_warp_spark.sources.tempo2 import read_general2

    g2 = read_general2(spark, FIXTURE, tim_path=f"{EX}/data/{PSR}.tim")
    assert g2.count() == 326
    assert {"bat", "freq", "post", "err", "backend", "flags"} <= set(g2.columns)
    backs = sorted(r["backend"] for r in g2.select("backend").distinct().collect())
    assert backs == ["CASPSR_40CM", "PDFB_10CM", "PDFB_20CM", "PDFB_40CM"]

    # misalignment is rejected loudly, not silently mismatched: a .tim for
    # a different TOA set must fail the row-count or per-row contract
    with pytest.raises(ValueError, match="order-align|alignment"):
        read_general2(
            spark, FIXTURE, tim_path=f"{EX}/data/fake_psr_0.tim"
        )

    # a backend flag the .tim doesn't carry fails with the row and the
    # flags that ARE present (r14 review: was a bare KeyError), and the
    # message points at the backend_flag= escape hatch
    with pytest.raises(ValueError, match="-sys flag.*flags present.*group"):
        read_general2(
            spark, FIXTURE, tim_path=f"{EX}/data/{PSR}.tim",
            backend_flag="sys",
        )
    # the parkes files also carry -f; selecting it works end-to-end
    g2f = read_general2(
        spark, FIXTURE, tim_path=f"{EX}/data/{PSR}.tim", backend_flag="f"
    )
    assert g2f.select("backend").distinct().count() >= 1


@pytest.fixture(scope="module")
def g2_run(spark, tmp_path_factory):
    from enterprise_warp_spark.likelihood.inference import (
        run_adaptive_from_general2,
    )
    from enterprise_warp_spark.plans.noisemodel import (
        normalize_noise_model,
        signals_for_pulsar,
    )

    nm = json.load(
        open(f"{EX}/example_noisemodels/default_noise_example_1.json")
    )
    out = run_adaptive_from_general2(
        spark, FIXTURE, PSR,
        signals_for_pulsar(normalize_noise_model(nm), PSR),
        tim_path=f"{EX}/data/{PSR}.tim",
        par_path=f"{EX}/data/{PSR}.par",
        rounds=3, n_per_round=384, nfreqs=8, seed=20250817,
        final_is=4096, final_is_waves=3,
        noise_json_dir=str(tmp_path_factory.mktemp("noise")),
    )
    return out


def test_general2_pipeline_posterior_and_evidence(g2_run):
    assert np.isfinite(g2_run["log_evidence"])
    assert g2_run["ess"] is not None and g2_run["ess"] > 5
    assert g2_run["diagnostics"]["n_waves"] == 3
    row = g2_run["summary"].first()
    assert np.isfinite(row["ess"]) and row["n_waves"] == 3
    # the by-backend model resolved its selections from the attached flags
    cols = set(g2_run["scored"].columns)
    assert "efac_PDFB_20CM" in cols and "log10_equad_CASPSR_40CM" in cols


def test_general2_noise_json_matches_reference_key_set(g2_run):
    """The zero-glue loop ends in the reference's own artifact: the
    written noise JSON carries EXACTLY the golden file's key set."""
    golden = json.load(open(f"{EX}/example_noisefiles/{PSR}_noise.json"))
    doc = json.load(open(g2_run["noise_json_path"]))
    assert set(doc) == set(golden)
    assert all(np.isfinite(v) for v in doc.values())


def test_general2_recovers_dominant_backend(g2_run):
    """Loose accuracy gate at this budget (the tight tiered assertions
    live in test_golden_recovery): the 241-TOA backend's efac median must
    land within 40% of the injected golden value, and the DM-GP amplitude
    within 1.0 dex."""
    golden = json.load(open(f"{EX}/example_noisefiles/{PSR}_noise.json"))
    from enterprise_warp_spark.likelihood.sampling import posterior_quantiles

    qs = posterior_quantiles(
        g2_run["scored"], ["efac_PDFB_20CM", "dm_noise_log10_A"],
        qs=(0.5,), logw_col="logw",
    )
    g = golden[f"{PSR}_PDFB_20CM_efac"]
    assert abs(qs["efac_PDFB_20CM"][0.5] - g) <= 0.4 * abs(g)
    assert abs(
        qs["dm_noise_log10_A"][0.5] - golden[f"{PSR}_dm_gp_log10_A"]
    ) <= 1.0
