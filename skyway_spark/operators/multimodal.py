"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, exactly as a
100 TB training-data lake stores them. The Spark-side machinery —
schema, partitioning, Arrow batch shape, mapInPandas signatures — is
real and tested; the codec step itself is stubbed because this
container ships no image/audio libraries: ``decode_image`` raises
NotImplementedError unless a deterministic fake decoder is requested
(``fake=True``), which synthesizes a stable pseudo-pixel tensor from
the bytes so downstream feature logic is testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real codec: fold the bytes into a
    fixed-size float vector. Stable across runs and partitionings."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-arr.size) % dim
    folded = np.pad(arr, (0, pad)).reshape(-1, dim).sum(axis=0)
    return (folded % 256).astype(np.float32) / 255.0


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decoder unavailable in this container — STUB. ``fake=True``
    uses the deterministic fold so pipelines are testable."""
    if fake:
        return _fake_decode(payload)
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs Pillow/opencv; not in this environment — "
            "use fake=True for the deterministic test decoder"
        ) from e
    raise NotImplementedError("PIL present but decoder not wired")


def extract_media_features(
    media: DataFrame, dim: int = 8, batch_hint: int = 1024, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batch shape is the real contract: each batch is a
    pdf[media_id, payload]; the UDF is a generator over batches, so
    executors never hold more than one batch of decoded media — the
    pattern that keeps image decode memory bounded at scale.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (_fake_decode(p, dim) if fake else decode_image(p)).tolist()
                if p is not None
                else [0.0] * dim
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)


def pages_to_media(pages: DataFrame) -> DataFrame:
    """Adapter: treat page html bytes as an image-like payload table
    (exercises the binary plumbing on the pages fixture)."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("html").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
