"""Sample-parallel GP inference (reference §3.1 step 5, re-architected).

The reference samples a sequential MCMC chain per pulsar/array; the only
parallelism it exploits is one OS process per pulsar (docs/index.rst:41-45).
Spark-native inference instead evaluates MANY parameter samples at once:
a `samples` DataFrame (from prior transforms, F15) is scored by a per-pulsar
GP-marginalized likelihood kernel (F10, applyInPandas with numpy inside) and
summed across pulsars (A13) — importance/grid estimation that parallelizes
over samples x pulsars instead of chain steps.
"""

from enterprise_warp_spark.likelihood.gp import gp_loglik_per_pulsar, total_loglik  # noqa: F401
from enterprise_warp_spark.likelihood.sampling import sample_priors  # noqa: F401
