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


# ---------------------------------------------------------------------------
# r9 (VERDICT r8 Next #4): compile fixtures for EVERY shipped reference
# paramfile — each parses and its model sections compile to the plan
# dimensions/priors the reference's label-map semantics imply
# (enterprise_warp.py:121-144 typed label map, 186-197 sampler-kwarg
# extension, 251-304 defaults).
# ---------------------------------------------------------------------------

_BACKENDS = ["CASPSR_40CM", "PDFB_10CM", "PDFB_20CM", "PDFB_40CM"]


def _compile_model_file(json_name, psr="J1832-0836", fixed=None):
    from enterprise_warp_spark.likelihood.inference import (
        compile_priors_and_components,
    )
    from enterprise_warp_spark.plans import (
        normalize_noise_model,
        read_noise_model_json,
    )
    from enterprise_warp_spark.plans.noisemodel import signals_for_pulsar

    nm = read_noise_model_json(f"{MODELS}/{json_name}")
    rows = signals_for_pulsar(normalize_noise_model(nm), psr)
    return compile_priors_and_components(
        rows, fixed=fixed, backends=_BACKENDS
    )


def test_compile_default_model_dynesty_paramfile():
    """default_model_dynesty.dat: the dynesty sampler's kwargs (dlogz,
    nlive) land through the DYNAMIC label map the reference extends per
    sampler (enterprise_warp.py:186-197); its single {0} section compiles
    to the 12-dim examp_1 plan for J1832-0836."""
    from enterprise_warp_spark.plans import parse_paramfile

    p = parse_paramfile(f"{PARAMS}/default_model_dynesty.dat")
    assert p.sampler == "dynesty"
    assert p.dlogz == 0.1 and p.nlive == 800
    assert [m.model_id for m in p.models] == [0]
    assert p.models[0].values["noise_model_file"].endswith(
        "default_noise_example_1.json"
    )
    # defaults still filled for the non-ptmcmc sampler
    assert p.ssephem == "DE438" and p.fref == 1400.0

    priors, comps = _compile_model_file("default_noise_example_1.json")
    names = sorted(pr.name for pr in priors)
    want = sorted(
        [f"efac_{b}" for b in _BACKENDS]
        + [f"log10_equad_{b}" for b in _BACKENDS]
        + ["spin_noise_log10_A", "spin_noise_gamma",
           "dm_noise_log10_A", "dm_noise_gamma"]
    )
    assert names == want  # 12 sampling dimensions, nothing extra
    assert {c.name for c in comps} == {"spin_noise", "dm_noise"}
    by_name = {c.name: c for c in comps}
    assert by_name["spin_noise"].chrom_idx == 0.0
    assert by_name["dm_noise"].chrom_idx == 2.0


def test_compile_default_hypermodel_product_space_union():
    """default_hypermodel.dat: two {N} sections -> the product-space union
    the reference's HyperModel samples (one column per unique parameter +
    nmodel): examp_1 is 12-dim, examp_2 is 9-dim (turnover adds log10_fc,
    equad absent), the union is 13 + nmodel. Shared names must carry
    IDENTICAL priors (HyperModel's one-column-per-parameter contract)."""
    from enterprise_warp_spark.plans import parse_paramfile

    p = parse_paramfile(f"{PARAMS}/default_hypermodel.dat")
    assert [m.model_id for m in p.models] == [0, 1]
    pri0, _ = _compile_model_file("default_noise_example_1.json")
    pri1, comps1 = _compile_model_file("default_noise_example_2.json")
    assert len(pri0) == 12 and len(pri1) == 9
    names1 = {pr.name for pr in pri1}
    assert "spin_noise_log10_fc" in names1  # turnover
    assert not any(n.startswith("log10_equad") for n in names1)
    union = {}
    for pr in list(pri0) + list(pri1):
        if pr.name in union:
            assert union[pr.name] == pr, pr.name  # shared = identical
        union[pr.name] = pr
    assert len(union) == 13
    by_name = {c.name: c for c in comps1}
    assert by_name["spin_noise"].psd == "turnover"


def test_compile_custom_hypermodel_with_plugin_signal():
    """custom_hypermodel.dat: {0} uses custom_model_example.json whose
    'my_powerlaw' signal exists only through the plugin registry (the
    reference's StandardModels subclass path, custom_models.py:11-53,
    loaded at results.py:1100-1110). A registered custom red signal must
    compile to a real achromatic GP component with its registered priors —
    not be silently dropped."""
    from enterprise_warp_spark.likelihood.sampling import Prior
    from enterprise_warp_spark.plans import parse_paramfile
    from enterprise_warp_spark.plans.registry import (
        SIGNAL_REGISTRY,
        SignalSpec,
        register_signal,
    )

    p = parse_paramfile(f"{PARAMS}/custom_hypermodel.dat")
    assert [m.model_id for m in p.models] == [0, 1]
    assert p.models[0].values["noise_model_file"].endswith(
        "custom_model_example.json"
    )

    @register_signal("my_powerlaw")
    def _my_powerlaw(option):
        # kernel naming contract: {name}_log10_A / {name}_gamma (the
        # reference's my_amp/my_cc parameterize a custom spectrum; our
        # kernel's powerlaw family carries the same 2-dim role)
        return SignalSpec(
            "my_powerlaw", "red", psd="powerlaw",
            priors=(
                Prior("my_powerlaw_log10_A", "uniform", -18.0, -10.0),
                Prior("my_powerlaw_gamma", "uniform", 0.0, 10.0),
            ),
        )

    try:
        priors, comps = _compile_model_file("custom_model_example.json")
    finally:
        SIGNAL_REGISTRY.pop("my_powerlaw")
    names = {pr.name for pr in priors}
    assert {"my_powerlaw_log10_A", "my_powerlaw_gamma"} <= names
    assert len(priors) == 12  # efac x4 + equad x4 + spin x2 + custom x2
    by_name = {c.name: c for c in comps}
    assert set(by_name) == {"spin_noise", "my_powerlaw"}
    # custom signals are achromatic GPs (chrom_idx 0), never the sampled-
    # index flavor (None requires a my_powerlaw_idx column)
    assert by_name["my_powerlaw"].chrom_idx == 0.0
    assert by_name["my_powerlaw"].psd == "powerlaw"


def test_compile_fixed_white_noise_paramfile(spark):
    """fixed_white_noise.dat: efac/equad -1 => fixed (P10), values bound
    from the noisefiles dir (O2, enterprise_warp.py:544-581) — the
    white-noise dimensions drop out of the sampling space, leaving only
    the 4 red-noise dims of examp_1."""
    from enterprise_warp_spark.plans import parse_paramfile
    from enterprise_warp_spark.sources.noisefiles import (
        read_noise_files,
        white_noise_constants,
    )

    p = parse_paramfile(f"{PARAMS}/fixed_white_noise.dat")
    assert p.fixed_params() == {"efac": True, "equad": True}
    assert p.values["noisefiles"].startswith("example_noisefiles")
    assert [m.model_id for m in p.models] == [0, 1]

    noise = read_noise_files(
        spark,
        "/root/reference/examples/example_noisefiles/J1832-0836_noise.json",
    )
    fixed = white_noise_constants(noise, "J1832-0836")
    priors, comps = _compile_model_file(
        "default_noise_example_1.json", fixed=fixed
    )
    by_name = {pr.name: pr for pr in priors}
    for b in _BACKENDS:
        assert by_name[f"efac_{b}"].kind == "constant"
        assert by_name[f"log10_equad_{b}"].kind == "constant"
    sampled = sorted(pr.name for pr in priors if pr.kind != "constant")
    assert sampled == [
        "dm_noise_gamma", "dm_noise_log10_A",
        "spin_noise_gamma", "spin_noise_log10_A",
    ]
    assert {c.name for c in comps} == {"spin_noise", "dm_noise"}
