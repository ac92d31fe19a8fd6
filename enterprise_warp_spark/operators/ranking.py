"""Scalable exact global ranking — the 100 TB replacement for
single-partition window sorts (Window.orderBy with no partition key moves
ALL data to one task; fine for chain-sized data, fatal at cluster scale).

Classic two-phase distributed ranking:
  1. repartitionByRange on the order key (range exchange, sampled bounds)
  2. per-partition local ranks (cheap sorted window within each range)
  3. driver-side prefix sum of partition counts -> broadcast offsets
  4. global_rank = local_rank + offset[partition]

Total order requires a tie-free key list (end with a unique column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    _total_out: list | None = None,
) -> DataFrame:
    """Exact 1-based global rank (bigint — survives >2.1B rows) over a
    tie-free order, no global sort. If ``_total_out`` is given, the total row
    count (already known from the per-partition offsets) is appended to it so
    callers don't pay a second scan for ``count()``."""
    cols = [F.col(c) for c in order_by]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins the range partitioning: repartitionByRange SAMPLES
    # its bounds per execution, so the offsets action and the ranking query
    # would otherwise see different partitionings
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if _total_out is not None:
        _total_out.append(acc)
    if not counts:
        # empty input: F.create_map() yields map<void,void> and the [_pid]
        # lookup fails analysis — return the empty frame with the rank
        # column in place (same fix pack_documents carries)
        return ranged.withColumn(rank_col, F.lit(0).cast("long")).drop("_pid")
    offset_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_local", F.row_number().over(w))
        .withColumn(
            rank_col,
            (F.col("_local").cast("long") + offset_expr[F.col("_pid")].cast("long")),
        )
        .drop("_pid", "_local")
    )


def ntile_bins_scalable(
    df: DataFrame,
    order_by: Sequence[str],
    n_bins: int = 8,
    aggs: Sequence[F.Column] = (),
) -> DataFrame:
    """A8 at scale: fixed-count bins from the distributed rank (matches
    Window ntile exactly: first `total % n` bins get the extra row).

    The total row count is reused from global_rank's per-partition offset
    collection — no second ``count()`` scan of the checkpointed data."""
    total_out: list[int] = []
    ranked = global_rank(df, order_by, "_rank", _total_out=total_out)
    total = total_out[0]
    base, extra = divmod(total, n_bins)
    # rank -> ntile bin, replicating SQL NTILE's distribution rule
    boundary = (base + 1) * extra
    bin_expr = (
        F.when(F.col("_rank") <= boundary, (F.col("_rank") - 1) / (base + 1))
        .otherwise(extra + (F.col("_rank") - boundary - 1) / base)
        .cast("int")
        + 1
    )
    tiled = ranked.withColumn("bin", bin_expr).drop("_rank")
    default_aggs = [F.count(F.lit(1)).alias("n")]
    return tiled.groupBy("bin").agg(*(list(aggs) or default_aggs))
