"""Config front-end: paramfile grammar on the reference's own example .dat
files, noise-model normalization + list-union merge, signal registry."""

import json

import pytest

PARAMS = "/root/reference/examples/example_params"
MODELS = "/root/reference/examples/example_noisemodels"


def test_parse_hypermodel_paramfile():
    from enterprise_warp_spark.plans import parse_paramfile

    p = parse_paramfile(f"{PARAMS}/default_hypermodel.dat")
    assert p.sampler == "ptmcmcsampler"
    assert p.nsamp == 1000000
    assert p.SCAMweight == 30 and p.AMweight == 15 and p.DEweight == 50
    assert p.overwrite is True and p.array_analysis is False
    # two {N} model sections with their own noise_model_file
    assert [m.model_id for m in p.models] == [0, 1]
    assert p.models[0].values["noise_model_file"].endswith("_1.json")
    assert p.models[1].values["noise_model_file"].endswith("_2.json")
    # defaults filled (enterprise_warp.py:260-285)
    assert p.ssephem == "DE438" and p.fref == 1400.0


def test_fixed_white_noise_classification():
    from enterprise_warp_spark.plans import parse_paramfile

    p = parse_paramfile(f"{PARAMS}/system_noise_example.dat")
    # efac: -1 / equad: -1 => fixed, bound from noise files (P10/O2)
    assert p.values["efac"] == -1.0 and p.values["equad"] == -1.0
    assert p.fixed_params() == {"efac": True, "equad": True}
    assert p.values["noisefiles"].startswith("example_noisefiles")


def test_noise_model_normalization():
    from enterprise_warp_spark.plans import normalize_noise_model, read_noise_model_json
    from enterprise_warp_spark.plans.noisemodel import signals_for_pulsar

    model = read_noise_model_json(f"{MODELS}/system_noise_example.json")
    rows = normalize_noise_model(model, model_id=0)
    assert {r["model_name"] for r in rows} == {"sysn_example"}
    univ = [r for r in rows if r["psr"] == "*"]
    assert {r["signal"] for r in univ} == {"white_noise", "spin_noise", "dm_noise"}
    j = signals_for_pulsar(rows, "J1832-0836")
    sigs = {r["signal"]: json.loads(r["option_json"]) for r in j}
    # pulsar-specific section REPLACES universal (enterprise_warp.py:527-530)
    assert "white_noise" not in sigs and "efac" in sigs
    assert sigs["system_noise"] == ["PDFB_40CM", "CASPSR_40CM"]
    # unknown pulsar falls back to universal
    fallback = signals_for_pulsar(rows, "J0000+0000")
    assert {r["signal"] for r in fallback} == {"white_noise", "spin_noise", "dm_noise"}


def test_merge_list_union():
    from enterprise_warp_spark.plans import merge_noise_dicts

    a = {"J1": {"system_noise": ["A", "B"], "spin_noise": "powerlaw"}}
    b = {"J1": {"system_noise": ["B", "C"]}, "J2": {"efac": "by_backend"}}
    merged = merge_noise_dicts(a, b)
    # list-union semantics (enterprise_warp.py:631-646)
    assert merged["J1"]["system_noise"] == ["A", "B", "C"]
    assert merged["J1"]["spin_noise"] == "powerlaw"
    assert merged["J2"] == {"efac": "by_backend"}


def test_registry_builds_and_option_grammar():
    from enterprise_warp_spark.plans.registry import build_signal, parse_option_nfreqs

    assert parse_option_nfreqs("powerlaw_30_nfreqs") == ("powerlaw", 30, None)
    assert parse_option_nfreqs("turnover_10_ndays") == ("turnover", None, 10.0)
    assert parse_option_nfreqs("powerlaw") == ("powerlaw", None, None)

    sn = build_signal("spin_noise", "powerlaw_30_nfreqs")
    assert sn.psd == "powerlaw" and sn.nfreqs == 30
    assert {p.name for p in sn.priors} == {"spin_noise_log10_A", "spin_noise_gamma"}

    to = build_signal("spin_noise", "turnover")
    assert {p.name for p in to.priors} == {
        "spin_noise_log10_A",
        "spin_noise_gamma",
        "spin_noise_log10_fc",
    }

    gwb = build_signal("gwb", "hd_vary_gamma")
    assert gwb.orf == "hd" and gwb.vary_gamma
    multi = build_signal("gwb", "hd_vary_gamma+monopole_5_nfreqs")
    assert len(multi.components) == 2
    assert multi.components[1].orf == "monopole" and multi.components[1].nfreqs == 5

    with pytest.raises(KeyError):
        build_signal("no_such_signal", None)


def test_registry_plugin_api():
    from enterprise_warp_spark.likelihood.sampling import Prior
    from enterprise_warp_spark.plans.registry import (
        SIGNAL_REGISTRY,
        SignalSpec,
        build_signal,
        register_signal,
    )

    @register_signal("custom_wiggle")
    def _wiggle(option):
        return SignalSpec(
            "custom_wiggle", "red", psd="powerlaw",
            priors=(Prior("wiggle_amp", "uniform", 0.0, 1.0),),
        )

    try:
        spec = build_signal("custom_wiggle", "anything")
        assert spec.priors[0].name == "wiggle_amp"
    finally:
        SIGNAL_REGISTRY.pop("custom_wiggle")


def test_priors_for_model_dedup():
    from enterprise_warp_spark.plans import normalize_noise_model, read_noise_model_json
    from enterprise_warp_spark.plans.noisemodel import signals_for_pulsar
    from enterprise_warp_spark.plans.registry import priors_for_model

    model = read_noise_model_json(f"{MODELS}/system_noise_example.json")
    rows = signals_for_pulsar(normalize_noise_model(model), "J1832-0836")
    priors = priors_for_model(rows)
    names = [p.name for p in priors]
    assert len(names) == len(set(names))
    assert "spin_noise_log10_A" in names and "efac" in names


def test_compile_free_spectrum_and_vary_chrom():
    from enterprise_warp_spark.likelihood.inference import (
        compile_priors_and_components,
    )
    from enterprise_warp_spark.plans.noisemodel import normalize_noise_model

    rows = normalize_noise_model(
        {
            "model_name": "fsvary",
            "universal": {
                "spin_noise": "free_spectrum_4_nfreqs",
                "chromred": "vary",
            },
        }
    )
    priors, comps = compile_priors_and_components(rows, default_nfreqs=6)
    names = {p.name for p in priors}
    assert {f"spin_noise_log10_rho_{k}" for k in range(4)} <= names
    assert "chromred_idx" in names
    by_name = {c.name: c for c in comps}
    assert by_name["spin_noise"].psd == "free_spectrum" and by_name["spin_noise"].nfreqs == 4
    assert by_name["chromred"].chrom_idx is None  # sampled per-sample
