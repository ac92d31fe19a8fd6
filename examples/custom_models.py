"""Custom-signal plugin example — the Spark-native analogue of the
reference's examples/custom_models.py (a StandardModels subclass adding
`my_powerlaw`; enterprise_warp examples/custom_models.py:11-34). Here a
custom signal is a registered builder, no subclassing: importing this
module makes `my_powerlaw:` usable in any noise-model JSON or paramfile
compiled afterwards."""

from enterprise_warp_spark.likelihood.sampling import Prior
from enterprise_warp_spark.plans.registry import (
    SignalSpec,
    parse_option_nfreqs,
    register_signal,
)


@register_signal("my_powerlaw")
def my_powerlaw(option="default"):
    """Power-law red noise with custom prior names (my_amp / my_cc),
    mirroring the reference example's parameters."""
    rest, nfreqs, cadence = parse_option_nfreqs(option or "default")
    return SignalSpec(
        "my_powerlaw",
        "red",
        psd="powerlaw",
        nfreqs=nfreqs,
        cadence_days=cadence,
        priors=(
            Prior("my_amp", "uniform", -20.0, -6.0),
            Prior("my_cc", "uniform", 0.0, 10.0),
        ),
    )
