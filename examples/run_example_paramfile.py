#!/usr/bin/env python
"""Verbatim analogue of the reference's examples/run_example_paramfile.py:

    python examples/run_example_paramfile.py --prfile example_params/demo_model.dat --num 0

Imports the sibling custom_models module first (the reference script's
`include_custom_models = True` path) so its registered signals are
available to the paramfile compile, then hands off to the package CLI.
Generate a self-contained input tree with examples/make_example_data.py.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
# make both the sibling custom_models module AND the (not-pip-installed)
# package importable no matter where the script is launched from
sys.path.insert(0, _ROOT)
sys.path.insert(0, _HERE)
# Spark PYTHON WORKERS inherit PYTHONPATH from the environment, not the
# driver's sys.path — export it BEFORE the SparkSession exists or every
# pickled kernel referencing the package fails to unpickle on executors
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_ROOT] + [p for p in [os.environ.get("PYTHONPATH", "")] if p]
)

import custom_models  # noqa: F401 — registers the example plugin signals

from enterprise_warp_spark.run_paramfile import main

if __name__ == "__main__":
    main()
