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
    document's token offset within its pack. Deterministic in `order_col` —
    which therefore must be UNIQUE per row (the same tie-free-key contract
    as ranking.global_rank): with duplicate keys the running sum could
    order tied rows differently across runs/retries."""
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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token windows with optional
    overlap — packing's counterpart for documents LONGER than the context
    budget (long docs are chunked first, then chunks are packed).

    -> (id_col, chunk_idx, n_chunk_tokens, chunk_text). Chunks cover every
    token: starts step by (chunk_tokens - overlap); the last chunk may be
    short; empty documents produce no chunks. Pure Catalyst (tokenize once,
    posexplode of slice()s) — map-only, no shuffle, no Python."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    from enterprise_warp_spark.functions.arrays import spread
    from enterprise_warp_spark.pipeline.text import TOKENS

    step = chunk_tokens - overlap
    toks = spread(
        df.select(id_col, F.expr(TOKENS.format(s=text_col)).alias("__toks")),
        id_col,
    )
    # 1-based start positions 1, 1+step, 1+2*step, ... covering every token;
    # a doc shorter than one chunk gets exactly one start
    starts = (
        f"CASE WHEN size(__toks) = 0 THEN cast(array() as array<int>) "
        f"WHEN size(__toks) <= {chunk_tokens} THEN array(1) "
        f"ELSE transform(sequence(0, int(ceil((size(__toks) - {chunk_tokens}) "
        f"/ cast({step} as double)))), i -> 1 + i * {step}) END"
    )
    exploded = toks.select(
        id_col,
        "__toks",
        F.posexplode(F.expr(starts)).alias("chunk_idx", "__start"),
    )
    piece = F.expr(f"slice(__toks, __start, {chunk_tokens})")
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
