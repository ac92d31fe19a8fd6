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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import custom_models  # noqa: F401 — registers the example plugin signals

from enterprise_warp_spark.run_paramfile import main

if __name__ == "__main__":
    main()
