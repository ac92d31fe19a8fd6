"""Chain analytics — the reference's results pipeline (results.py:359-700)
re-expressed over the long-form chains table (run_id, step, par, value).

Reference semantics reproduced:
  burn_in                  drop first 25% of samples (results.py:499-500)
  model_posterior_counts   A2 round(nmodel) counts (results.py:502-507)
  log_bayes_factors_from_chain  A3 ln(count_j/count_i) (results.py:605-616)
  credible_levels_by_par   A4 16/50/84 percentiles (results.py:201-213)
  mode_positions_by_par    A5 50-bin histogram argmax left edge
                           (results.py:154-170 dist_mode_position)
  noise_summary            A6 per-par estimator routing: 'efac'/'equad' ->
                           mode, otherwise median (results.py:172-234
                           suitable_estimator + make_noise_files input)

All grouped per (run_id, par): one shuffle each, map-side combinable; the
histogram mode does two passes (bounds, then counts) with the 1-row-per-par
bounds broadcast back — same shape the reference uses, distribution-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burn_in(chain_long: DataFrame, frac: float = 0.25) -> DataFrame:
    """P5 — drop the first `frac` of steps per run (step is 0-based)."""
    bounds = chain_long.groupBy("run_id").agg(
        F.floor((F.max("step") + 1) * frac).alias("_burn")
    )
    return (
        chain_long.join(F.broadcast(bounds), "run_id")
        .filter(F.col("step") >= F.col("_burn"))
        .drop("_burn")
    )


def model_posterior_counts(chain_long: DataFrame, nmodel_par: str = "nmodel") -> DataFrame:
    return (
        chain_long.filter(F.col("par") == nmodel_par)
        .select("run_id", F.round("value", 0).cast("bigint").alias("nmodel"))
        .groupBy("run_id", "nmodel")
        .agg(F.count(F.lit(1)).alias("n_samples"))
    )


def log_bayes_factors_from_chain(chain_long: DataFrame) -> DataFrame:
    counts = model_posterior_counts(chain_long)
    a = counts.select("run_id", F.col("nmodel").alias("model_a"), F.col("n_samples").alias("n_a"))
    b = counts.select("run_id", F.col("nmodel").alias("model_b"), F.col("n_samples").alias("n_b"))
    return (
        a.join(b, "run_id")
        .filter(F.col("model_a") < F.col("model_b"))
        .select(
            "run_id",
            "model_a",
            "model_b",
            F.log(F.col("n_b") / F.col("n_a")).alias("log_bf"),
        )
    )


def credible_levels_by_par(
    chain_long: DataFrame, probs: tuple[float, ...] = (0.16, 0.5, 0.84)
) -> DataFrame:
    aggs = [
        F.percentile("value", F.lit(p)).alias(f"p{int(p * 100)}") for p in probs
    ]
    return chain_long.groupBy("run_id", "par").agg(*aggs)


def mode_positions_by_par(chain_long: DataFrame, bins: int = 50) -> DataFrame:
    """A5 — numpy.histogram(50) argmax left edge, per (run_id, par)."""
    bounds = chain_long.groupBy("run_id", "par").agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / bins
    bucketed = (
        chain_long.join(F.broadcast(bounds), ["run_id", "par"])
        .select(
            "run_id",
            "par",
            "_lo",
            "_hi",
            # degenerate chains (all values equal — e.g. a constant-prior
            # column) have zero width: everything lands in bucket 0 and the
            # mode is the value itself, instead of an ANSI divide-by-zero
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("value") - F.col("_lo")) / width).cast(
                        "bigint"
                    ),
                    F.lit(bins - 1),
                )
            )
            .alias("bucket"),
        )
    )
    counted = bucketed.groupBy("run_id", "par", "_lo", "_hi", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("run_id", "par").orderBy(F.desc("cnt"), F.asc("bucket"))
    return (
        counted.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "run_id",
            "par",
            (
                F.col("_lo")
                + F.col("bucket") * (F.col("_hi") - F.col("_lo")) / bins
            ).alias("mode_position"),
        )
    )


def noise_summary(chain_long: DataFrame) -> DataFrame:
    """A6 — the dict make_noise_files(results.py:215-248) serializes:
    efac/equad-like params use the histogram mode, others the median
    (suitable_estimator, results.py:172-182)."""
    modes = mode_positions_by_par(chain_long)
    medians = chain_long.groupBy("run_id", "par").agg(
        F.percentile("value", F.lit(0.5)).alias("median")
    )
    return (
        modes.join(medians, ["run_id", "par"])
        .select(
            "run_id",
            "par",
            F.when(
                F.col("par").rlike("efac|equad"), F.col("mode_position")
            )
            .otherwise(F.col("median"))
            .alias("value"),
        )
    )


def noise_files_json(noise: DataFrame) -> DataFrame:
    """K2 — one sorted-key JSON document per run (PAL2 flat format)."""
    return (
        noise.groupBy("run_id")
        .agg(F.sort_array(F.collect_list(F.struct("par", "value"))).alias("kv"))
        .select(
            "run_id",
            F.to_json(F.map_from_entries("kv")).alias("noise_json"),
        )
    )


def split_chain(chain: DataFrame, frac: float = 0.5) -> tuple[DataFrame, DataFrame]:
    """K3 — the reference's chain-file split (head fraction to a timestamped
    segment, remainder rewritten; results.py:579-603) as two filters over the
    step key; callers write each to versioned parquet instead of file surgery."""
    bounds = chain.groupBy("run_id").agg(F.floor((F.max("step") + 1) * frac).alias("_k"))
    joined = chain.join(F.broadcast(bounds), "run_id")
    head = joined.filter(F.col("step") < F.col("_k")).drop("_k")
    tail = joined.filter(F.col("step") >= F.col("_k")).drop("_k")
    return head, tail
