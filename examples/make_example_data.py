"""Generate a SELF-CONTAINED example tree (the reference ships real PPTA
data in examples/data; this repo generates synthetic-but-structurally-real
pulsar data instead, so the examples run without any external files).

    python examples/make_example_data.py [--dest examples/workdir]

Writes the reference layout (enterprise_warp docs/index.rst):

    <dest>/data/<psr>.{par,tim}            two fake pulsars, two backends
    <dest>/example_params/demo_model.dat   paramfile for the run CLI
    <dest>/example_noisemodels/demo_noise_1.json

Then the documented commands run verbatim from <dest>:

    python .../examples/run_example_paramfile.py --prfile example_params/demo_model.dat --num 0
    python -m enterprise_warp_spark.results --result example_params/demo_model.dat --info 1 --corner 1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

PSRS = [
    # name, RAJ, DECJ, F0 (Hz), PEPOCH
    ("J0101+0101", "01:01:01.0", "01:01:01.0", 245.4261, 56000),
    ("J0202-0202", "02:02:02.0", "-02:02:02.0", 173.9170, 56000),
]
BACKENDS = ["DEMO_10CM", "DEMO_20CM"]


def write_par(path: str, name: str, raj: str, decj: str, f0: float,
              pepoch: float) -> None:
    lines = [
        f"PSRJ\t{name}",
        f"RAJ\t{raj}\t1",
        f"DECJ\t{decj}\t1",
        f"F0\t{f0}\t1",
        "F1\t-1.2e-15\t1",
        f"PEPOCH\t{pepoch}",
        "DM\t20.0\t1",
        "UNITS\tTCB",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def write_tim(path: str, name: str, seed: int, n: int = 90) -> None:
    rng = np.random.default_rng(seed)
    mjd0 = 55000.0
    rows = ["FORMAT 1"]
    for i in range(n):
        mjd = mjd0 + i * 14.0 + rng.uniform(-1.0, 1.0)
        freq = 1400.0 if i % 2 == 0 else 3100.0
        err_us = float(rng.uniform(0.8, 2.5))
        be = BACKENDS[i % 2]
        rows.append(
            f" {name}_obs_{i:04d} {freq:.8f} {mjd:.13f} {err_us:.5f} demo "
            f"-fe DEMO -be {be.split('_')[0]} -B {be.split('_')[1]} "
            f"-group {be}"
        )
    with open(path, "w") as fh:
        fh.write("\n".join(rows) + "\n")


def write_tree(dest: str) -> str:
    for sub in ("data", "example_params", "example_noisemodels"):
        os.makedirs(os.path.join(dest, sub), exist_ok=True)
    for seed, (name, raj, decj, f0, pepoch) in enumerate(PSRS):
        write_par(os.path.join(dest, "data", f"{name}.par"),
                  name, raj, decj, f0, pepoch)
        write_tim(os.path.join(dest, "data", f"{name}.tim"), name, seed)
    noise_model = {
        "model_name": "demo_1",
        "universal": {
            "white_noise": "by_backend",
            "spin_noise": "powerlaw",
        },
        "common_signals": {},
    }
    with open(os.path.join(dest, "example_noisemodels", "demo_noise_1.json"),
              "w") as fh:
        json.dump(noise_model, fh, indent=4)
    paramfile = os.path.join(dest, "example_params", "demo_model.dat")
    with open(paramfile, "w") as fh:
        fh.write(
            "paramfile_label: demo\n"
            "datadir: data/\n"
            "out: out/\n"
            "overwrite: True\n"
            "array_analysis: False\n"
            "sampler: dynesty\n"
            "nsamp: 400\n"
            "{0}\n"
            "noise_model_file: example_noisemodels/demo_noise_1.json\n"
        )
    return paramfile


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--dest",
        default=os.path.join(os.path.dirname(__file__) or ".", "workdir"),
    )
    opts = ap.parse_args(argv)
    prfile = write_tree(opts.dest)
    print(f"example tree written; paramfile: {prfile}")
    return prfile


if __name__ == "__main__":
    main()
