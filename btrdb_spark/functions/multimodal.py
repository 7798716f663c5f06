"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning,
Arrow-batched mapInPandas signatures, batch shaping. The actual codec
work (image decode, resampling, frame extraction) is STUBBED behind
``_decode_stub`` because no media libraries ship in this container; a
deployment swaps `_decode_stub` for PIL/ffmpeg calls without touching the
Spark plumbing.

Design notes for 100 TB of media:
- blobs live in a ``binary`` column next to typed metadata
  (media_type/width/height/duration), so metadata predicates prune scans
  without touching bytes (parquet column pruning does the rest);
- decode/feature kernels run in ``mapInPandas`` (Arrow batches, one
  Python worker per partition — no per-row ser/de);
- outputs are fixed-size feature vectors or resized blobs, so downstream
  joins shuffle compact columns, never raw media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("blob", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        # doubles, not float32: the fake-decode arithmetic (byte/255.0) must
        # stay bit-identical to the DuckDB oracle's
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("feat_dim", LongType(), True),
    ]
)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents` (the container has
    no real media): blob = utf-8 text bytes, type round-robins
    image/audio/video, plausible typed metadata. Lets the multimodal
    plumbing run under the driver's correctness gate."""
    return documents.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("blob"),
        (F.lit(64) + F.col("doc_id") % 512).cast("long").alias("width"),
        (F.lit(64) + F.col("doc_id") % 256).cast("long").alias("height"),
        (1000 * (F.col("doc_id") % 30 + 1)).cast("long").alias("duration_ms"),
    )


def _decode_stub(blob: bytes, media_type: str) -> list[float]:
    """Deterministic fake 'decode + embed': 8 floats from the blob digest.

    Replace with a real codec (PIL / torchaudio / ffmpeg) in deployment —
    the surrounding Arrow plumbing is unchanged.
    """
    if blob is None:
        raise NotImplementedError("real media decode not available in this environment")
    digest = hashlib.sha256(bytes(blob) + media_type.encode()).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(blob, mt) if blob is not None else None
                for blob, mt in zip(pdf["blob"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": [len(f) if f is not None else None for f in feats],
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", LongType(), True),
        StructField("out_height", LongType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def _resize_stub(blob: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic fake resize: a (out_w*out_h//256 + 16)-byte payload
    derived from the blob digest + target dims, standing in for the real
    decoded-and-rescaled pixel buffer. Swap for PIL's Image.resize in
    deployment; the Arrow plumbing and output schema stay fixed."""
    if blob is None:
        raise NotImplementedError("real media decode not available in this environment")
    seed = hashlib.sha256(bytes(blob) + f"{out_w}x{out_h}".encode()).digest()
    n = out_w * out_h // 256 + 16
    return (seed * (n // len(seed) + 1))[:n]


def resize(media: DataFrame, out_width: int = 224, out_height: int = 224) -> DataFrame:
    """Arrow-batched image resize over binary media columns (image rows
    only — metadata predicate prunes the scan before any bytes move)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _resize_stub(blob, out_width, out_height) if blob is not None else None
                for blob in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": [out_width if r is not None else None for r in resized],
                    "out_height": [out_height if r is not None else None for r in resized],
                    "resized": resized,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(kernel, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan the frame-sampling fan-out for video rows (pure DataFrame math:
    one output row per sampled frame timestamp). The decode of each frame
    is the stubbed kernel above; the *shape* of the explode is the part
    that matters for partition sizing at scale."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
