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
chunk hashes.

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


def cdc_chunk_bytes(
    payload: bytes,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
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
    import numpy as np

    bits = max(int(avg_size).bit_length() - 1, 1)
    mask = np.uint64((1 << bits) - 1)
    h = gear_hashes(payload)
    candidates = np.nonzero((h & mask) == 0)[0]
    chunks: list[tuple[int, int, str]] = []
    start = 0
    n = len(payload)
    ci = 0
    while start < n:
        cut = min(start + max_size, n)
        # first candidate boundary in [start + min_size, start + max_size)
        while ci < len(candidates) and candidates[ci] < start + min_size:
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
