"""Streaming corpus construction: continuous near-dup-free ingestion.

Each micro-batch of arriving documents is probed against the persisted
MinHash band index (pipeline.dedup.incremental_minhash_filter), survivors
are appended to the corpus parquet, and their bands join the index — so a
document that streamed in an hour ago already filters today's near-copies.

foreachBatch is the right tool: the dedup is a batch join against mutable
external state (the band index), which no built-in streaming operator
expresses. dropDuplicatesWithinWatermark handles EXACT ids inside the
watermark horizon; this handles NEAR duplicates across the corpus lifetime.

Delivery note (honest): foreachBatch gives at-least-once for external
writes. A replayed batch re-probes the updated index, so its documents are
seen as duplicates of themselves and dropped — the corpus stays
collision-free, but a replay interleaved exactly with a crash between the
corpus append and the index append could duplicate one batch's corpus rows.
Production hardening = write corpus + index under an epoch-id-keyed path
(idempotent overwrite per epoch), or a lakehouse table with txn support.
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
    appended to `corpus_path`. availableNow drains the source then stops —
    swap the trigger for continuous ingestion."""
    from enterprise_warp_spark.pipeline.dedup import incremental_minhash_filter

    def _one_batch(batch: DataFrame, epoch_id: int) -> None:
        survivors = incremental_minhash_filter(
            batch, index_path, text_col=text_col, update_index=True
        )
        # survivors is already materialized (localCheckpoint) by the filter,
        # so this append does not re-run the probe against the updated index
        survivors.write.mode("append").parquet(corpus_path)

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
