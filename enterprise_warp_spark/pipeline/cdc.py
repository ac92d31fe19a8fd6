"""Content-defined chunking (CDC) dedup for binary media columns.

Hash-granularity dedup (pipeline/dedup.py) catches byte-identical blobs;
perceptual fingerprints (pipeline/multimodal.py) catch visually/aurally
similar media. This module covers the storage-level middle ground: blobs
that share MOST of their bytes but not all — the same file re-saved with a
prepended header, truncated, or with metadata edited. The tool is the
deduplicating-storage standard: split every payload at content-defined
boundaries (a rolling gear hash, the FastCDC/LBFS family — Xia et al.
2016, Muthitacharoen et al. 2001), hash each chunk, and join on chunk
hashes. Because boundaries depend only on a 64-byte rolling window of
CONTENT (not offsets), inserting bytes at the front of a file re-syncs the
chunking within one chunk — the shared tail still produces identical
chunk hashes. Large payloads are hashed in bounded-memory segments (the
64-byte window means each segment needs only 63 bytes of left context),
so a multi-GB video blob never materializes a 16x-payload hash array on
an executor.

Spark shape (the 100 TB contract):

- ``cdc_chunks`` is MAP-ONLY (``mapInPandas`` over payload batches, no
  shuffle): each executor chunks its own payloads; the rolling hash is
  vectorized in numpy (the gear recurrence h_i = sum_{k<64} g[b_{i-k}]
  << k is a 64-tap convolution — 64 vectorized passes, no per-byte
  Python).
- ``chunk_dedup_pairs`` is an inverted-index equi-join on ``chunk_hash``
  (the n-gram-Jaccard shape): candidates only ever meet inside a chunk-
  hash bucket, never all-pairs, and ubiquitous chunks (zero blocks,
  shared headers) are dropped by a document-frequency cap first — the
  stop-chunk filter, exactly the hot-shingle treatment MinHash gets.
- ``chunk_savings`` is one aggregate: the dedup ratio a content-
  addressed store would achieve on the corpus.

No external chunker is involved; the gear table is derived from md5 so
chunk boundaries are portable and deterministic everywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gear_table():
    """256 deterministic uint64 gear values (md5-derived, no RNG)."""
    import numpy as np

    vals = [
        int.from_bytes(
            hashlib.md5(f"ews-cdc-gear-{b}".encode()).digest()[:8], "big"
        )
        for b in range(256)
    ]
    return np.array(vals, dtype=np.uint64)


_GEAR = None


def _gear():
    global _GEAR
    if _GEAR is None:
        _GEAR = _gear_table()
    return _GEAR


def gear_hashes(data) -> "object":
    """Rolling gear hash at every byte position, vectorized.

    The classic per-byte recurrence h = (h << 1) + gear[b] (mod 2^64)
    makes h_i = sum_{k=0}^{63} gear[b_{i-k}] << k — contributions older
    than 64 bytes shift out of the word. That windowed form is a 64-tap
    convolution, computed here as 64 vectorized adds instead of a
    per-byte Python loop."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8)
    g = _gear()[b]
    h = np.zeros(len(b), dtype=np.uint64)
    for k in range(64):
        if k == 0:
            h += g
        else:
            h[k:] += g[:-k] << np.uint64(k)
    return h


_SEGMENT = 1 << 23  # bytes of payload hashed per vectorized pass


def _hash_dtype(bits: int):
    import numpy as np

    return np.uint16 if bits <= 16 else np.uint32 if bits <= 32 else np.uint64


_NARROW = {}


def _narrow_gear(dtype):
    key = dtype().dtype.str
    if key not in _NARROW:
        _NARROW[key] = _gear().astype(dtype)
    return _NARROW[key]


def _low_hashes(data: bytes, bits: int):
    """Low `bits` bits of the rolling gear hash at every position.

    Exact shortcut: h_i = sum_k g[b_{i-k}] << k (mod 2^64), and an
    addend shifted by k has zero low-k bits while addition carries only
    propagate UPWARD — so (h_i mod 2^bits) depends only on the taps
    k < bits. Boundary detection (h & mask == 0, mask = 2^bits - 1)
    therefore needs a bits-tap convolution in the narrowest unsigned
    dtype holding `bits` bits, not the full 64 taps in uint64: ~6x less
    work and 4x narrower arithmetic at the default avg_size=1024."""
    import numpy as np

    taps = min(bits, 64)
    dtype = _hash_dtype(bits)
    b = np.frombuffer(data, dtype=np.uint8)
    g = _narrow_gear(dtype)[b]  # wraps mod 2^width, exact for low bits
    h = g.copy()
    # in-place shift-into-scratch keeps each pass at pure streaming reads/
    # writes (no fresh temporaries) — the loop is memory-bandwidth bound
    tmp = np.empty(len(b), dtype=dtype)
    for k in range(1, taps):
        rest = len(b) - k
        if rest <= 0:
            break
        np.left_shift(g[:rest], dtype(k), out=tmp[:rest])
        h[k:] += tmp[:rest]
    return h


def _boundary_candidates(payload: bytes, bits: int, segment_bytes: int):
    """Positions whose rolling hash has the low `bits` bits zero, in
    BOUNDED memory. A whole-payload hash array costs bytes-per-element x
    payload: fine for documents, a multi-GB spike for a large video
    blob. The low-bits hash at position i depends only on bytes
    (i - taps + 1 .. i), so each segment is hashed with taps-1 bytes of
    left context and only the candidate POSITIONS (about n/avg_size of
    them) are kept — peak memory is a few x segment_bytes regardless of
    payload size."""
    import numpy as np

    mask = _hash_dtype(bits)((1 << min(bits, 64)) - 1)
    n = len(payload)
    if n <= segment_bytes:
        h = _low_hashes(payload, bits)
        return np.nonzero((h & mask) == 0)[0]
    ctx_len = min(bits, 64) - 1
    out = []
    start = 0
    while start < n:
        end = min(start + segment_bytes, n)
        ctx = min(start, ctx_len)
        h = _low_hashes(payload[start - ctx : end], bits)
        idx = np.nonzero((h[ctx:] & mask) == 0)[0]
        if idx.size:
            out.append(idx + start)
        start = end
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    )


def cdc_chunk_bytes(
    payload: bytes,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
    segment_bytes: int = _SEGMENT,
) -> list[tuple[int, int, str]]:
    """One payload -> [(offset, length, chunk_hash)]. A boundary is a
    position whose rolling hash has log2(avg_size) low zero bits, subject
    to the min/max size clamps (min skips boundaries too close to the
    previous cut; max forces a cut — the LBFS rule)."""
    if not payload:
        return []
    if not min_size <= avg_size <= max_size:
        raise ValueError(
            f"need min_size <= avg_size <= max_size, got "
            f"({min_size}, {avg_size}, {max_size})"
        )
    if segment_bytes <= 63:
        raise ValueError(
            f"segment_bytes must exceed the 64-byte window, got {segment_bytes}"
        )
    bits = max(int(avg_size).bit_length() - 1, 1)
    candidates = _boundary_candidates(payload, bits, segment_bytes)
    chunks: list[tuple[int, int, str]] = []
    start = 0
    n = len(payload)
    ci = 0
    while start < n:
        cut = min(start + max_size, n)
        # first candidate boundary yielding a chunk of >= min_size bytes
        # (a candidate at start + min_size - 1 cuts AFTER itself, giving
        # exactly min_size — legal, so the skip threshold is min_size - 1)
        while ci < len(candidates) and candidates[ci] < start + min_size - 1:
            ci += 1
        if ci < len(candidates) and candidates[ci] < cut:
            cut = int(candidates[ci]) + 1  # cut AFTER the boundary byte
        piece = payload[start:cut]
        chunks.append(
            (start, len(piece), hashlib.blake2b(piece, digest_size=8).hexdigest())
        )
        start = cut
    return chunks


def cdc_chunks(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> DataFrame:
    """Binary column -> chunk table (id, chunk_idx, offset, length,
    chunk_hash). MAP-ONLY: upstream partitioning preserved, no shuffle;
    at 100 TB every executor chunks only its own payload bytes."""
    id_type = dict(media.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_idx int, offset long, length long, "
        "chunk_hash string"
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, lens, hs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for i, (off, ln, hx) in enumerate(
                    cdc_chunk_bytes(bytes(payload), min_size, avg_size,
                                    max_size)
                ):
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    hs.append(hx)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "offset": offs,
                    "length": lens,
                    "chunk_hash": hs,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def chunk_dedup_pairs(
    chunks: DataFrame,
    min_shared: int = 2,
    id_col: str = "media_id",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Media pairs sharing >= min_shared distinct chunk hashes ->
    (media_a, media_b, shared_chunks, shared_bytes), media_a < media_b.

    Inverted-index equi-join: per-(id, hash) dedup first, then hashes
    seen in more than max_doc_freq media are dropped before the join —
    a ubiquitous chunk (zero block, format header) would otherwise form
    a quadratic bucket, the exact hot-band hazard MinHash salting
    addresses; for dedup, a chunk shared by everyone identifies nobody."""
    per = (
        chunks.groupBy(id_col, "chunk_hash")
        .agg(F.max("length").alias("length"))
    )
    if max_doc_freq is not None:
        hot = (
            per.groupBy("chunk_hash")
            .count()
            .filter(F.col("count") > max_doc_freq)
            .select("chunk_hash")
        )
        per = per.join(hot, "chunk_hash", "left_anti")
    a = per.select(
        F.col("chunk_hash"),
        F.col(id_col).alias("media_a"),
        F.col("length").alias("len_a"),
    )
    b = per.select(
        F.col("chunk_hash"),
        F.col(id_col).alias("media_b"),
        F.col("length").alias("len_b"),
    )
    return (
        a.join(b, "chunk_hash")
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(
            F.count("*").alias("shared_chunks"),
            F.sum(F.least("len_a", "len_b")).alias("shared_bytes"),
        )
        .filter(F.col("shared_chunks") >= min_shared)
    )


def probe_novel_chunks(
    chunks: DataFrame,
    store_path: str,
    exclude_epoch: int | None = None,
    bloom_path: str | None = None,
) -> DataFrame:
    """Distinct chunks of a batch not yet in the persisted chunk store:
    (bucket, chunk_hash, length, instances, instance_bytes), where
    instances/instance_bytes count the batch's occurrences (novel or not
    — the caller derives batch totals from this one aggregate without
    re-chunking payloads).

    The store is parquet partitioned by (__epoch, bucket) with
    bucket = the hash's first byte: the anti-join is an equi-join on
    (bucket, chunk_hash) — O(batch + store-probe), never all-pairs —
    and per-bucket layout keeps compaction and bloom-driven pruning
    local to 256 independent directories. exclude_epoch ignores the
    batch's own (possibly partially written) epoch during a crash
    replay — same contract as incremental_minhash_filter.

    bloom_path (written by update_store_bloom) removes the O(store) scan
    from the steady state: see _probe_store."""
    return _probe_store(
        _per_hash(chunks), store_path, exclude_epoch, bloom_path
    )


def _per_hash(chunks: DataFrame) -> DataFrame:
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.max("length").alias("length"),
            F.count("*").alias("instances"),
            F.sum("length").alias("instance_bytes"),
        )
        .withColumn("bucket", F.substring("chunk_hash", 1, 2))
    )


def _anti_store(
    per: DataFrame, store_path: str, exclude_epoch: int | None
) -> DataFrame:
    from enterprise_warp_spark.pipeline.dedup import _readable_parquet

    store = _readable_parquet(per.sparkSession, store_path)
    if store is None:
        return per
    if exclude_epoch is not None and "__epoch" in store.columns:
        store = store.filter(F.col("__epoch") != int(exclude_epoch))
    return per.join(
        store.select("bucket", "chunk_hash"),
        ["bucket", "chunk_hash"],
        "left_anti",
    )


def update_store_bloom(
    spark,
    store_path: str,
    bloom_path: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> int:
    """(Re)build the store's membership bloom — the structure that lets
    the steady-state probe skip the store scan (see _probe_store). The
    filter covers every hash in the store AT BUILD TIME and records the
    covering watermark `max_epoch`; probes treat later epochs as
    uncovered and anti-join just that (partition-pruned, small) slice,
    so a STALE bloom costs speed, never correctness.

    MUST be re-run after compact_chunk_store (compaction folds
    post-watermark epochs into base epoch -1, which probes treat as
    covered) — compact_chunk_store(bloom_path=...) does both in order.
    Returns the number of hashes covered. The filter itself is the
    mergeable portable-md5 bloom of operators/sketches.py; at the
    default m_bits=2^20 it holds ~10^5 hashes at ~1% false-positive
    rate — size m_bits to the store (false positives only cost verify
    joins; production stores shard the filter per bucket and raise
    m_bits, the same scaling story as every sketch in the module)."""
    from enterprise_warp_spark.operators.sketches import bloom_build

    store = spark.read.parquet(store_path)
    wm_row = store.agg(
        F.max("__epoch").alias("wm"), F.count("*").alias("n")
    ).first()
    # empty-but-readable store: nothing to cover; watermark -1 makes every
    # future epoch "recent" (verified by its own anti-join)
    wm = -1 if wm_row["wm"] is None else int(wm_row["wm"])
    bloom = _pad_bloom(
        spark, bloom_build(store.select("chunk_hash"), "chunk_hash", m_bits, k)
    )
    (
        bloom.withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k))
        .withColumn("max_epoch", F.lit(wm))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bloom_path)
    )
    spark.catalog.refreshByPath(bloom_path)
    return int(wm_row["n"])


def _merge_bloom(
    spark,
    novel: DataFrame,
    store_path: str,
    bloom_path: str,
    epoch_id: int,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> None:
    """Fold a batch's novel hashes into the persisted bloom and advance
    the watermark. Idempotent under crash replay: bit_or re-merging the
    same hashes is a no-op, and the watermark takes the max. A crash
    mid-write leaves the path without readable data files, which probes
    treat as 'no bloom' and fall back to the full anti-join — stale or
    absent blooms cost speed, never correctness.

    When NO readable bloom exists (first epoch, bloom enabled on a
    pre-existing store, or recovery after a torn bloom write), the
    filter is rebuilt from the WHOLE store — stamping this epoch's
    watermark over a batch-only filter would un-cover every earlier
    epoch and let already-stored hashes re-enter as 'definite misses'."""
    from enterprise_warp_spark.operators.sketches import bloom_build
    from enterprise_warp_spark.pipeline.dedup import _readable_parquet

    existing = _readable_parquet(spark, bloom_path)
    if existing is None:
        update_store_bloom(spark, store_path, bloom_path, m_bits, k)
        return
    meta = existing.select("m_bits", "k", "max_epoch").first()
    m_bits, k = int(meta["m_bits"]), int(meta["k"])
    wm = max(int(meta["max_epoch"]), int(epoch_id))
    words = _pad_bloom(
        spark,
        existing.select("word_idx", "word").unionByName(
            bloom_build(novel.select("chunk_hash"), "chunk_hash", m_bits, k)
        ),
    )
    out = (
        words.withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k))
        .withColumn("max_epoch", F.lit(wm))
        .coalesce(1)
        .localCheckpoint(eager=True)  # materialize BEFORE overwriting the source
    )
    out.write.mode("overwrite").parquet(bloom_path)
    spark.catalog.refreshByPath(bloom_path)


def _pad_bloom(spark, words: DataFrame) -> DataFrame:
    """Re-aggregate a word table with a guaranteed (word_idx=0, word=0)
    row: an all-zero word is a no-op for every probe form, and it keeps
    the persisted table non-empty so the per-row meta columns
    (m_bits/k/max_epoch) always survive — a zero-hash store would
    otherwise write a rowless bloom whose metadata is unreadable."""
    zero = spark.createDataFrame([(0, 0)], "word_idx long, word long")
    return (
        words.unionByName(zero)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def _probe_store(
    per: DataFrame,
    store_path: str,
    exclude_epoch: int | None,
    bloom_path: str | None,
) -> DataFrame:
    """Split the batch's distinct hashes against the store without
    scanning it when a bloom is available:

    - bloom definite-miss -> novel with NO store lookup (bloom false
      negatives are impossible);
    - bloom maybe-hit (true dups + ~1% false positives) -> verified by
      an anti-join against ONLY the covered store slice in the
      suspects' own buckets (driver collects <= 256 bucket strings —
      metadata, not data — so partition pruning is literal);
    - epochs newer than the bloom's watermark are uncovered -> one
      anti-join against that partition-pruned (small) slice for ALL
      candidates.

    Steady-state per-batch store IO is therefore O(suspect buckets +
    post-watermark epochs), not O(store)."""
    from enterprise_warp_spark.operators.sketches import bloom_probe_join
    from enterprise_warp_spark.pipeline.dedup import _readable_parquet

    if bloom_path is None:
        return _anti_store(per, store_path, exclude_epoch)
    spark = per.sparkSession
    bloom = _readable_parquet(spark, bloom_path)
    if bloom is None:
        return _anti_store(per, store_path, exclude_epoch)
    store = _readable_parquet(spark, store_path)
    if store is None:
        return per
    if "__epoch" not in store.columns:
        # a store without epoch provenance can't support the watermark
        # split; degrade to the plain anti-join (speed, not correctness)
        return _anti_store(per, store_path, exclude_epoch)
    if exclude_epoch is not None:
        store = store.filter(F.col("__epoch") != int(exclude_epoch))
    meta = bloom.select("m_bits", "k", "max_epoch").first()
    # the JOIN form of the probe: the word table rides a broadcast, so
    # m_bits can be sized to the store without bloating the plan (the
    # inline-literal bloom_probe is quadratic-feeling past ~2^16 bits —
    # the literal array is materialized per ROW); per-hash rows are
    # distinct by construction, satisfying the join-back contract
    flagged = bloom_probe_join(
        per,
        "chunk_hash",
        bloom.select("word_idx", "word"),
        int(meta["m_bits"]),
        int(meta["k"]),
        out_col="__maybe",
    ).localCheckpoint(eager=True)
    # ^ the probe is consumed three times (bucket collect + both result
    # branches); without pinning it, each consumer would re-run the
    # upstream per-hash aggregate — and, in batch mode, the payload
    # chunking itself, the most expensive stage of the whole flow
    suspects = flagged.filter(F.col("__maybe")).drop("__maybe")
    definite = flagged.filter(~F.col("__maybe")).drop("__maybe")
    buckets = [
        r["bucket"] for r in suspects.select("bucket").distinct().collect()
    ]
    wm = int(meta["max_epoch"])
    covered = store.filter(
        (F.col("__epoch") <= wm) & F.col("bucket").isin(buckets)
    )
    verified = suspects.join(
        covered.select("bucket", "chunk_hash"),
        ["bucket", "chunk_hash"],
        "left_anti",
    )
    recent = store.filter(F.col("__epoch") > wm)
    return definite.unionByName(verified).join(
        recent.select("bucket", "chunk_hash"),
        ["bucket", "chunk_hash"],
        "left_anti",
    )


def chunk_payloads(
    media: DataFrame,
    chunks: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """One exemplar byte-slice per distinct chunk hash:
    (chunk_hash, length, payload). Entirely JVM-side: the exemplar
    location is a min-struct aggregate over the (metadata-only) chunk
    table, and the bytes come from `substring` on the media payload —
    chunk bytes are shuffled once per DISTINCT hash, never once per
    occurrence."""
    ex = (
        chunks.groupBy("chunk_hash")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("mid"),
                    F.col("offset").alias("off"),
                    F.col("length").alias("len"),
                )
            ).alias("ex")
        )
        .select(
            "chunk_hash",
            F.col("ex.mid").alias("__mid"),
            F.col("ex.off").alias("__off"),
            F.col("ex.len").alias("__len"),
        )
    )
    return (
        ex.join(
            media.select(F.col(id_col).alias("__mid"), payload_col), "__mid"
        )
        .select(
            "chunk_hash",
            F.col("__len").alias("length"),
            F.expr(
                f"substring({payload_col}, __off + 1, __len)"
            ).alias("payload"),
        )
    )


def reconstruct_media(
    manifests: DataFrame,
    store: DataFrame,
    id_col: str = "media_id",
) -> DataFrame:
    """Restore path of the content-addressed store: manifests
    (id, chunk_idx, chunk_hash) join the byte store (chunk_hash, payload)
    and each media's chunks concatenate back in order ->
    (id, payload), bit-identical to the original ingest. The join is a
    plain equi-join on chunk_hash; assembly is one applyInPandas group
    per media (a media's bytes must fit one task — the same contract as
    chunking it did). A manifest chunk with NO store row (manifests
    committed before a crashed store write, a lost bucket file) raises
    instead of silently returning a truncated payload — the join is
    LEFT so the gap is visible to the kernel."""
    import pandas as pd

    id_type = dict(manifests.dtypes)[id_col]
    j = manifests.select(id_col, "chunk_idx", "chunk_hash").join(
        store.select("chunk_hash", "payload").dropDuplicates(["chunk_hash"]),
        "chunk_hash",
        "left",
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("chunk_idx")
        missing = pdf["payload"].isna()
        if missing.any():
            raise ValueError(
                f"reconstruct_media: media {pdf[id_col].iloc[0]!r} has "
                f"{int(missing.sum())} manifest chunk(s) absent from the "
                "store (first hash "
                f"{pdf.loc[missing, 'chunk_hash'].iloc[0]}) — store and "
                "manifests are out of sync; refusing to emit a truncated "
                "payload"
            )
        return pd.DataFrame(
            {
                id_col: [pdf[id_col].iloc[0]],
                "payload": [b"".join(bytes(x) for x in pdf["payload"])],
            }
        )

    return j.groupBy(id_col).applyInPandas(
        kernel, f"{id_col} {id_type}, payload binary"
    )


def chunk_store_stream(
    media_stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    stats_path: str | None = None,
    manifest_path: str | None = None,
    store_payloads: bool = False,
    bloom_path: str | None = None,
    bloom_m_bits: int = 1 << 20,
    bloom_k: int = 5,
    payload_col: str = "payload",
    id_col: str = "media_id",
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
):
    """Streaming content-addressed chunk-store ingest: each micro-batch of
    media is CDC-chunked, probed against everything already stored, and
    only NOVEL chunk hashes land — so a blob that streamed in an hour ago
    already deduplicates today's re-uploads at chunk granularity. The
    binary-media analog of streaming/corpus.dedup_corpus_stream, with the
    same exactly-once contract: the probe EXCLUDES the batch's own epoch
    and both writes are epoch-keyed dynamic-partition OVERWRITES, so any
    crash replay converges to the identical store (see that module's
    docstring for the crash analysis).

    Per-batch work is O(batch chunks + store probe); nothing rescans
    payload bytes already ingested. stats_path (optional) accumulates one
    row per epoch — (ingested_bytes, stored_bytes, novel_chunks,
    total_chunks) — the dedup-ratio-over-time series a storage operator
    monitors.

    OWNERSHIP: one stream (one checkpoint) owns a store. Epoch ids come
    from the checkpoint, so a second stream — or a fresh checkpoint over
    NEW source content — re-issues epoch ids whose dynamic-partition
    overwrites REPLACE the prior owner's partitions and lose chunks. The
    replay contract covers re-processing the SAME input through a fresh
    checkpoint (identical epochs rewrite identical content), never
    sharing a store between different inputs; fan multiple sources into
    one stream with union, not into one store with two streams. An
    epoch-collision guard enforces this: a batch refuses (before any
    write) to overwrite an epoch holding chunks it did not produce.

    bloom_path keeps a persisted membership bloom fresh alongside the
    store (merged per epoch, watermarked): steady-state probes then skip
    the store scan for bloom-definite-miss chunks and verify only
    suspects against bucket-pruned slices — per-batch store IO stops
    growing with the corpus (see _probe_store / update_store_bloom).
    Size bloom_m_bits to the EXPECTED store (~10 bits per distinct chunk
    for ~1% false positives; it is fixed at first build): a saturating
    bloom costs speed, never correctness — measured at 2x-over-capacity,
    FPR ~13% turned ~13% of each batch into suspect verifies and
    per-batch wall crept 7.4 -> 12.9 s over 10 epochs (PERF.md r14).

    store_payloads=True turns the hash INDEX into a full content-
    addressed STORE: novel chunks land with their exemplar byte slice,
    and manifest_path (required then, epoch-partitioned
    (id, chunk_idx, chunk_hash, length)) records each media's chunk
    sequence — `reconstruct_media(manifests, store)` restores any
    ingested payload bit-identically while re-uploaded content occupies
    store space only once."""
    from enterprise_warp_spark.maintenance import upsert_partitions

    if store_payloads and manifest_path is None:
        raise ValueError(
            "store_payloads=True without manifest_path would store bytes "
            "nothing can reconstruct from — pass manifest_path"
        )

    def _one_batch(batch: DataFrame, epoch_id: int) -> None:
        eid = int(epoch_id)
        ch = cdc_chunks(
            batch, payload_col, id_col, min_size, avg_size, max_size
        )
        if manifest_path is not None:
            # manifests are metadata-scale (one row per chunk, no bytes);
            # checkpointing them also pins the chunking to run ONCE
            ch = ch.localCheckpoint(eager=True)
        # chunk the payloads EXACTLY ONCE: the per-hash aggregate is
        # checkpointed and reused for the probe, the store write, and
        # both stats rows (instances/instance_bytes carry batch totals)
        per = _per_hash(ch).localCheckpoint(eager=True)
        novel = _probe_store(
            per, store_path, eid, bloom_path
        ).localCheckpoint(eager=True)
        # epoch-collision guard, BEFORE any write: a legit crash replay's
        # novel set is a SUPERSET of its own (possibly partial) prior
        # epoch-N rows, so rows in epoch N that this batch cannot explain
        # mean a DIFFERENT input is re-using the epoch id (second stream
        # / fresh checkpoint over new content — see OWNERSHIP above). The
        # check is one partition-pruned anti-join against a single epoch:
        # empty (and free) on every normal first-write batch.
        from enterprise_warp_spark.pipeline.dedup import _readable_parquet

        existing = _readable_parquet(batch.sparkSession, store_path)
        if existing is not None and "__epoch" in existing.columns:
            foreign = (
                existing.filter(F.col("__epoch") == eid)
                .select("bucket", "chunk_hash")
                .join(
                    novel.select("bucket", "chunk_hash").unionByName(
                        # a replay's non-novel hashes (already stored in
                        # OTHER epochs via this same input) can't appear
                        # in epoch N, so novel alone is the right bound
                        per.select("bucket", "chunk_hash")
                    ),
                    ["bucket", "chunk_hash"],
                    "left_anti",
                )
            )
            if foreign.take(1):
                raise ValueError(
                    f"chunk_store_stream: store epoch {eid} already holds "
                    "chunks this batch did not produce — a different input "
                    "is re-using this epoch id (second stream on one "
                    "store, or a fresh checkpoint over new content). One "
                    "checkpoint owns a store; union sources upstream. "
                    "Refusing to overwrite the prior owner's partitions."
                )
        if manifest_path is not None:
            upsert_partitions(
                ch.withColumn("__epoch", F.lit(eid)),
                manifest_path,
                ["__epoch"],
            )
        if novel.take(1):
            write = novel.select("bucket", "chunk_hash", "length")
            if store_payloads:
                write = write.join(
                    chunk_payloads(
                        batch, ch, payload_col, id_col
                    ).select("chunk_hash", "payload"),
                    "chunk_hash",
                )
            upsert_partitions(
                write.withColumn("__epoch", F.lit(eid)),
                store_path,
                ["__epoch", "bucket"],
            )
            batch.sparkSession.catalog.refreshByPath(store_path)
            if bloom_path is not None:
                # AFTER the store write: a crash in between leaves the
                # bloom stale (watermark short), which probes handle
                _merge_bloom(
                    batch.sparkSession, novel, store_path, bloom_path, eid,
                    m_bits=bloom_m_bits, k=bloom_k,
                )
        if stats_path is not None:
            tot = per.agg(
                F.coalesce(F.sum("instance_bytes"), F.lit(0)).alias(
                    "ingested_bytes"
                ),
                F.coalesce(F.sum("instances"), F.lit(0)).alias(
                    "total_chunks"
                ),
            )
            nov = novel.agg(
                F.coalesce(F.sum("length"), F.lit(0)).alias("stored_bytes"),
                F.count("*").alias("novel_chunks"),
            )
            upsert_partitions(
                tot.crossJoin(nov).withColumn("__epoch", F.lit(eid)),
                stats_path,
                ["__epoch"],
            )

    return (
        media_stream.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_chunk_store(
    spark, store_path: str, bloom_path: str | None = None
) -> int:
    """Fold every epoch partition of a chunk store into the reserved base
    epoch -1, one file per bucket — the OPTIMIZE step for small-file
    buildup from long-running streaming ingest (each micro-batch writes
    up to 256 bucket files).

    REPLAY-SAFE by construction: a crash-replayed micro-batch probes the
    store excluding only ITS OWN epoch id; compacted rows live in epoch
    -1, so the replay still sees every previously stored hash, finds
    nothing novel, and writes nothing — compaction can run at any time,
    including between a crash and its replay. Returns the distinct chunk
    count.

    When the ingest uses a bloom, pass bloom_path here: compaction moves
    post-watermark rows into epoch -1 (which probes treat as covered),
    so the bloom MUST be rebuilt in the same maintenance step — this
    function does it after the fold."""
    df = spark.read.parquet(store_path)
    value_cols = [c for c in df.columns if c not in ("bucket", "chunk_hash", "__epoch")]
    per = (
        df.groupBy("bucket", "chunk_hash")
        # defensive max: rows for one hash are identical by the ingest
        # contract, so any deterministic pick works
        .agg(*[F.max(c).alias(c) for c in value_cols])
        .withColumn("__epoch", F.lit(-1))
        .repartition(F.col("bucket"))
        .localCheckpoint(eager=True)  # materialize BEFORE overwriting the source
    )
    n = per.count()
    per.write.mode("overwrite").partitionBy("__epoch", "bucket").parquet(
        store_path
    )
    spark.catalog.refreshByPath(store_path)
    if bloom_path is not None:
        from enterprise_warp_spark.pipeline.dedup import _readable_parquet

        old = _readable_parquet(spark, bloom_path)
        kw = {}
        if old is not None:  # keep the operator's chosen sizing
            meta = old.select("m_bits", "k").first()
            kw = {"m_bits": int(meta["m_bits"]), "k": int(meta["k"])}
        update_store_bloom(spark, store_path, bloom_path, **kw)
    return n


def chunk_savings(chunks: DataFrame) -> DataFrame:
    """Corpus dedup ratio for a content-addressed chunk store: one row
    (total_bytes, unique_bytes, dedup_ratio). unique_bytes counts each
    distinct chunk_hash once (its max length — identical hashes at
    different lengths would be a hash collision, kept conservative)."""
    uniq = chunks.groupBy("chunk_hash").agg(F.max("length").alias("length"))
    total = chunks.agg(F.sum("length").alias("total_bytes"))
    unique = uniq.agg(F.sum("length").alias("unique_bytes"))
    return total.crossJoin(unique).select(
        "total_bytes",
        "unique_bytes",
        (F.col("total_bytes") / F.col("unique_bytes")).alias("dedup_ratio"),
    )
