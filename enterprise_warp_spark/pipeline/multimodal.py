"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition-preserving
mapInPandas kernels) is real and tested; the codec step itself is stubbed
behind DECODERS because no image/audio libraries exist in this container —
swap the stub for a real decoder (PIL/torchaudio/pyav) and nothing else
changes.

Design for 100 TB: binaries ride in parquet as BINARY columns; kernels are
mapInPandas so each Arrow batch is decoded vectorized with no per-row Python
dispatch, and the operation never reshuffles — it runs map-side wherever the
scan ran.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),  # image/video; null otherwise
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_frames", IntegerType()),  # video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feature_dim", IntegerType()),
        StructField("feature_l2", StringType()),  # stub marker / value as str
    ]
)


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: derives a pseudo-feature from the bytes.

    Real deployments replace this with PIL / torchaudio / pyav decoding;
    the function contract (bytes, kind) -> feature dict is the plugin point.
    """
    if payload is None:
        raise NotImplementedError("missing payload; real decoder required")
    acc = 0
    for b in payload[:256]:
        acc = (acc * 31 + b) % 1_000_000_007
    return {"feature_dim": 8, "feature_l2": str(acc)}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over opaque binaries.

    Arrow-batched: each pandas chunk is processed vectorized; the plan keeps
    the upstream partitioning (no shuffle).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [_decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature_dim": pd.Series([f["feature_dim"] for f in feats], dtype="int32"),
                    "feature_l2": [f["feature_l2"] for f in feats],
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def binary_meta(df: DataFrame, payload_expr: str = "cast(text as binary)") -> DataFrame:
    """Pure-SQL metadata over a binary column (no decode): byte length + md5.

    Used by the oracle-checked catalog query; works on any BINARY expression.
    """
    return df.select(
        "doc_id",
        F.expr(f"octet_length({payload_expr})").alias("n_bytes"),
        F.expr(f"md5({payload_expr})").alias("payload_md5"),
    )


def frame_sample(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes frame indices 0..n_frames-1
    with stride k, keeping the payload reference — the decode of individual
    frames is the stubbed step."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, greatest(coalesce(n_frames, 1) - 1, 0), {every_k})")
        ).alias("frame_idx"),
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing (mapInPandas, partition-preserving): emits the
    resized payload + updated dimensions. The pixel operation itself is the
    stubbed decode step (no image libraries in this container) — a real
    deployment swaps `_resize_stub` for PIL's Image.resize and nothing else
    changes."""

    def _resize_stub(payload: bytes) -> bytes:
        if payload is None:
            raise NotImplementedError("missing payload; real decoder required")
        return payload  # deterministic passthrough marker

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["kind"] == "image"].copy()
            out["payload"] = out["payload"].map(_resize_stub)
            out["width"] = width
            out["height"] = height
            yield out[["media_id", "kind", "payload", "mime", "width", "height"]]

    return media.mapInPandas(
        kernel,
        "media_id long, kind string, payload binary, mime string, width int, height int",
    )
