"""Config front-end (SURVEY §1.4-1.5, §2.6): paramfile grammar, noise-model
normalization, and the signal registry that replaces the reference's
reflection dispatch (getattr at enterprise_warp.py:515-537) with an explicit
plugin API."""

from enterprise_warp_spark.plans.paramfile import Params, parse_paramfile  # noqa: F401
from enterprise_warp_spark.plans.noisemodel import (  # noqa: F401
    merge_noise_dicts,
    normalize_noise_model,
    read_noise_model_json,
)
from enterprise_warp_spark.plans.registry import SIGNAL_REGISTRY, SignalSpec, register_signal  # noqa: F401
