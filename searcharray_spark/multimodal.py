"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` kernels. The decode/feature steps are
STUBBED (codec libraries are not available in this container): real
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
with a deterministic fake "decoder" so the pipeline is testable
end-to-end. Swap ``_decode_image_stub`` for a real decoder (PIL/ffmpeg)
in production.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("mime", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
    StructField("features", ArrayType(FloatType())),  # pooled embedding
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_sha1", StringType()),
])


def _decode_image_stub(payload: bytes):
    """Deterministic fake decode: derives a (width, height, 8-dim feature)
    from the payload bytes. Replace with a real image decode.

    A real implementation would:
        from PIL import Image; img = Image.open(io.BytesIO(payload))
    and raise NotImplementedError is avoided here so the plumbing stays
    testable without codec libs.
    """
    digest = hashlib.sha1(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feats = np.frombuffer(digest[:16], dtype=np.uint8).reshape(2, 8).mean(axis=0)
    return width, height, (feats / 255.0).astype(np.float32)


def image_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract images: one Arrow batch per call, numpy
    inside. At scale: repartition by size-balanced ranges first so no
    task gets all the large blobs."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                w, h, feats = _decode_image_stub(bytes(payload))
                rows.append((int(mid), w, h, len(payload),
                             hashlib.sha1(bytes(payload)).hexdigest(),
                             feats.tolist()))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_bytes", "sha1", "features"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Video frame sampling stub: emits every_n-th "frame" fingerprint.
    Real impl: ffmpeg keyframe extraction inside the same kernel shape."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                n_frames = max(1, len(b) // 256)  # fake frame count
                for i in range(0, n_frames, every_n):
                    chunk = b[i * 256:(i + 1) * 256]
                    rows.append((int(mid), i, hashlib.sha1(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha1"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
