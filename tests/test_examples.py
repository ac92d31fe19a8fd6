"""The shipped examples/ directory must work with the reference's
documented command shapes (docs/index.rst) on its GENERATED data tree —
run as real subprocesses from the tree root, exactly as a user would."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture(scope="module")
def demo_tree(tmp_path_factory):
    from examples_loader import load_module

    dest = str(tmp_path_factory.mktemp("demo_tree"))
    mod = load_module("make_example_data")
    prfile = mod.main(["--dest", dest])
    return dest, prfile


def test_generated_tree_layout(demo_tree):
    dest, prfile = demo_tree
    for p in ("data/J0101+0101.par", "data/J0101+0101.tim",
              "data/J0202-0202.par", "example_params/demo_model.dat",
              "example_noisemodels/demo_noise_1.json"):
        assert os.path.isfile(os.path.join(dest, p)), p
    doc = json.load(open(os.path.join(
        dest, "example_noisemodels", "demo_noise_1.json")))
    assert doc["model_name"] == "demo_1"


def test_run_example_paramfile_subprocess(demo_tree):
    """The documented command, verbatim, from the tree root."""
    dest, prfile = demo_tree
    script = os.path.abspath(os.path.join(EXAMPLES, "run_example_paramfile.py"))
    # NO PYTHONPATH injection: the shim itself must make the package
    # importable on the driver AND export it to Spark's python workers
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    p = subprocess.run(
        [sys.executable, script,
         "--prfile", "example_params/demo_model.dat", "--num", "0"],
        cwd=dest, capture_output=True, text=True, timeout=420, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    run_dir = os.path.join(dest, "out", "demo_1_demo", "0_J0101+0101")
    assert os.path.isfile(os.path.join(run_dir, "chain_1.txt"))
    pars = open(os.path.join(run_dir, "pars.txt")).read().split()
    # by_backend white noise for the 2 demo backends + spin noise
    assert any("DEMO_10CM_efac" in q for q in pars)
    # spin_noise compiles to the reference's red_noise par naming
    assert any("red_noise_log10_A" in q for q in pars)
    chain = np.loadtxt(os.path.join(run_dir, "chain_1.txt"))
    assert chain.shape[1] == len(pars) + 4 and np.isfinite(chain).all()


def test_results_cli_on_generated_tree(spark, demo_tree):
    """results CLI stages over the generated run (in-process: the chain
    from the subprocess test above)."""
    dest, prfile = demo_tree
    run_dir = os.path.join(dest, "out", "demo_1_demo", "0_J0101+0101")
    if not os.path.isdir(run_dir):
        pytest.skip("run subprocess test first (pytest order)")
    from enterprise_warp_spark.results import main

    res = main(["--result", prfile, "--info", "1", "--corner", "1",
                "--noisefiles", "1"], spark=spark)
    assert res["run_ids"] == ["0_J0101+0101"]
    assert res["plots"] and all(os.path.isfile(p) for p in res["plots"])
    [noise_path] = res["noisefiles"]
    doc = json.load(open(noise_path))
    assert any(k.endswith("_efac") for k in doc)


def test_custom_models_plugin_registers():
    from examples_loader import load_module

    from enterprise_warp_spark.plans.registry import (
        SIGNAL_REGISTRY,
        build_signal,
    )

    load_module("custom_models")
    try:
        spec = build_signal("my_powerlaw", "30_nfreqs")
        assert spec.nfreqs == 30
        assert [p.name for p in spec.priors] == ["my_amp", "my_cc"]
    finally:
        SIGNAL_REGISTRY.pop("my_powerlaw", None)


def test_bilby_example_in_process(spark, demo_tree):
    """bilby_example: inference -> bilby-style result JSON -> the SAME
    analytics pipeline over the S6b source (read_run_dir dispatch)."""
    from examples_loader import load_module

    dest, prfile = demo_tree
    mod = load_module("bilby_example")
    out = mod.main(["--prfile", prfile, "--num", "0"], spark=spark)
    assert os.path.basename(out["result_path"]) == "dynesty_result.json"
    doc = json.load(open(out["result_path"]))
    assert doc["posterior"]["__dataframe__"] is True
    names = {r["par"] for r in out["levels"]}
    assert any("red_noise_log10_A" in n for n in names)
    for r in out["levels"]:
        assert r["p16"] <= r["p50"] <= r["p84"]
