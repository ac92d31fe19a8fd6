"""Chain analytics + optimal-statistic pipelines (reference results.py)."""

from enterprise_warp_spark.analytics.chains import (  # noqa: F401
    burn_in,
    credible_levels_by_par,
    log_bayes_factors_from_chain,
    model_posterior_counts,
    mode_positions_by_par,
    noise_summary,
)
from enterprise_warp_spark.analytics.covariance import assemble_block_diag  # noqa: F401
