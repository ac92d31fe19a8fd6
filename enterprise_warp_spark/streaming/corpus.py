"""Streaming corpus construction: continuous near-dup-free ingestion.

Each micro-batch of arriving documents is probed against the persisted
MinHash band index (pipeline.dedup.incremental_minhash_filter), survivors
are appended to the corpus parquet, and their bands join the index — so a
document that streamed in an hour ago already filters today's near-copies.

foreachBatch is the right tool: the dedup is a batch join against mutable
external state (the band index), which no built-in streaming operator
expresses. dropDuplicatesWithinWatermark handles EXACT ids inside the
watermark horizon; this handles NEAR duplicates across the corpus lifetime.

Delivery semantics: foreachBatch is at-least-once for external writes, but
the batch body is ordered so every replay converges to the exactly-once
outcome: (1) probe the index (not yet updated by this batch), (2) write the
corpus under an epoch-keyed partition with dynamic overwrite (idempotent —
a replay rewrites its own epoch in place), (3) append the survivors' bands
to the index. Crash between 2 and 3: the replay re-probes an index without
this batch's bands, recomputes the SAME survivors (the probe is
deterministic), and overwrites the same epoch — then completes step 3.
Crash after 3 (before the checkpoint commit): the replay finds all its
documents already indexed, survivors are empty, and both writes are no-ops
— the corpus rows written in step 2 stay, exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def dedup_corpus_stream(
    stream_docs: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_path: str,
    text_col: str = "text",
) -> StreamingQuery:
    """Start the streaming dedup-ingest: micro-batches of (doc_id, text, ...)
    are near-dup-filtered against everything already ingested, survivors
    written to `corpus_path` (epoch-partitioned, replay-idempotent — see the
    module docstring for the crash analysis). availableNow drains the source
    then stops — swap the trigger for continuous ingestion."""
    from enterprise_warp_spark.maintenance import upsert_partitions
    from enterprise_warp_spark.pipeline.dedup import (
        incremental_minhash_filter,
        minhash_bands,
    )

    def _one_batch(batch: DataFrame, epoch_id: int) -> None:
        # 1. probe (index not yet updated by this batch) — deterministic
        survivors = incremental_minhash_filter(
            batch, index_path, text_col=text_col, update_index=False
        )
        # 2. idempotent corpus write: replays overwrite their own epoch
        tagged = survivors.withColumn("__epoch", F.lit(int(epoch_id)))
        if tagged.take(1):  # empty overwrite would be a no-op anyway; skip IO
            upsert_partitions(tagged, corpus_path, ["__epoch"])
        # 3. index append LAST, so a replay after a crash re-derives the
        # same survivors instead of dropping them as self-duplicates
        bands = minhash_bands(survivors, text_col).localCheckpoint(eager=True)
        bands.write.mode("append").partitionBy("band_id").parquet(index_path)
        batch.sparkSession.catalog.refreshByPath(index_path)

    return (
        stream_docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def exactly_once_parquet_sink(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    partition_cols: tuple[str, ...] = (),
) -> StreamingQuery:
    """foreachBatch parquet sink with idempotent replays: each micro-batch
    writes under an epoch-keyed partition (`__epoch=<id>`) using dynamic
    partition overwrite, so a batch replayed after a crash OVERWRITES its own
    previous (possibly partial) output instead of appending duplicates.
    Combined with the checkpoint's exactly-once offset tracking this gives
    end-to-end exactly-once file output — the property a bare
    `.writeStream.format("parquet")` only approximates when readers ignore
    its _spark_metadata log (which plain `spark.read.parquet` does).

    Readers: `spark.read.parquet(out_path)` — `__epoch` appears as an extra
    partition column; drop it or prune on it for incremental consumption.
    """
    from enterprise_warp_spark.maintenance import upsert_partitions

    def _one_batch(batch: DataFrame, epoch_id: int) -> None:
        tagged = batch.withColumn("__epoch", F.lit(int(epoch_id)))
        upsert_partitions(tagged, out_path, ["__epoch", *partition_cols])

    return (
        stream.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
