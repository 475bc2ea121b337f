"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError — clearly marked), but the
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing. Swapping the stub for
Pillow/librosa/pyav on a real cluster changes one kernel function, not
the plan.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

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
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

USE_FAKE_DECODE = True  # flip to False on a cluster with real codecs


def _fake_feature(payload: bytes | None, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: expands
    the payload digest into ``dim`` floats in [-1, 1]."""
    if payload is None:
        return [0.0] * dim
    d = hashlib.sha256(bytes(payload)).digest()
    need = dim * 4
    buf = (d * (need // len(d) + 1))[:need]
    ints = struct.unpack(f"<{dim}i", buf)
    return [float(x) / 2**31 for x in ints]


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB — real impl: PIL.Image.open(io.BytesIO(payload)) → np array."""
    if not USE_FAKE_DECODE:
        raise NotImplementedError("image codec not available in this container")
    h = hashlib.sha256(bytes(payload)).digest()
    side = 4 + h[0] % 4
    return np.frombuffer((h * 16)[: side * side * 3], dtype=np.uint8).reshape(
        side, side, 3
    )


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + featurize each media row via mapInPandas (Arrow batches).

    Real part: the distributed plan — narrow per-partition batches, typed
    output schema, no driver involvement. Stubbed part: the decode kernel.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, target: int = 64) -> DataFrame:
    """Image 'resize' pass: same plumbing, stubbed kernel (deterministic
    payload transform so tests can assert shape/determinism)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf["payload"].map(
                lambda p: hashlib.sha256(bytes(p)).digest() if p is not None else b""
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": imgs,
                    "width": target,
                    "height": target,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(resize, out_schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (real explode), stubbed frame payload."""
    v = media.filter(F.col("kind") == "video").withColumn(
        "frame_ts",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
    return v.select(
        "media_id",
        "frame_ts",
        F.sha2(F.concat(F.col("payload"), F.col("frame_ts").cast("string").cast("binary")), 256).alias("frame_digest"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 64 if kind == "image" else None,
                64 + i % 32 if kind == "image" else None,
                1000 * (1 + i % 10) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
