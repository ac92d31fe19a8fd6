"""Token-budget sequence packing: assign documents to fixed-budget packs.

The standard concat-then-chunk scheme for LLM training batches: lay the
corpus out in a deterministic order, draw pack boundaries every `budget`
tokens, and assign each document to the pack where it starts. Documents are
never split, so a pack's token sum can exceed the budget by at most
(longest doc - 1) tokens — the usual approximation; exact bin packing is
NP-hard and inherently sequential.

Scale shape: a naive cumulative sum is a single-partition window — the
classic 100 TB killer. This is the same two-phase prefix-sum as
operators/ranking.global_rank: range-partition by the order key, local
cumsum per partition, then add broadcast per-partition offsets (one tiny
collect of per-partition totals, bounded by the partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_partitions: int = 32,
) -> DataFrame:
    """-> df + (pack_id bigint, pack_offset bigint): pack assignment and the
    document's token offset within its pack. Deterministic in `order_col`."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ranged = df.repartitionByRange(n_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_cum", F.sum(F.col(tokens_col).cast("long")).over(w))
    local = local.localCheckpoint(eager=True)  # one pass computes cum + totals
    totals = {
        r["_pid"]: r["t"]
        for r in local.groupBy("_pid").agg(F.max("_cum").alias("t")).collect()
    }
    if not totals:  # empty input: typed empty result, no empty-map expression
        return (
            local.withColumn("pack_id", F.lit(None).cast("long"))
            .withColumn("pack_offset", F.lit(None).cast("long"))
            .drop("_pid", "_cum")
        )
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    start = (off[F.col("_pid")] + F.col("_cum") - F.col(tokens_col)).cast("long")
    return (
        local.withColumn("pack_id", F.floor(start / budget))
        .withColumn("pack_offset", start % budget)
        .drop("_pid", "_cum")
    )
