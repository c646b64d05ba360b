"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The container ships no image/audio libraries, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError per
the round brief); everything Spark-side — schema, Arrow batch shape,
partition-parallel mapInPandas plumbing — is real and tested, so swapping a
real decoder in changes one function body.
"""

from __future__ import annotations

import hashlib

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
        StructField("docId", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("payload_size", IntegerType(), False),
        StructField("payload_sha256", StringType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("docId", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def attach_media(df: DataFrame, text: str = "content", id_col: str = "docId") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed metadata
    (stand-in for image/audio bytes; identical plumbing)."""
    payload = F.encode(F.col(text), "utf-8")
    return df.select(
        F.col(id_col).alias("docId"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("payload_size"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB decoder. A real pipeline would decode image/audio bytes here
    (PIL/librosa are not in this container). Deterministic fake derived by
    pure arithmetic from the sha256 hex digest — stable across runs AND
    mirrorable in ANSI SQL so the driver oracle can value-check the full
    mapInPandas plumbing: feature_i = float32(u16_i/65535*2-1) where u16_i
    is hex digits [4i, 4i+4) of the digest."""
    if dim > 16:
        raise NotImplementedError("stub decoder derives <=16 dims from one sha256")
    hx = hashlib.sha256(payload).hexdigest()
    u16 = np.array([int(hx[4 * i : 4 * i + 4], 16) for i in range(dim)], dtype=np.float64)
    return (u16 / 65535.0 * 2.0 - 1.0).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, frame_sample: int = 4) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    Real Arrow-batched ``mapInPandas`` plumbing; the per-payload decode is
    the stub above. ``n_frames`` mimics frame sampling for video payloads
    (ceil(size / 4096) capped at `frame_sample`).
    """

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [_fake_decode(p, dim).tolist() for p in pdf["payload"]]
            n_frames = (
                np.minimum((pdf["payload_size"] + 4095) // 4096, frame_sample)
                .astype("int32")
            )
            yield pd.DataFrame(
                {
                    "docId": pdf["docId"],
                    "mime": pdf["mime"],
                    "n_frames": n_frames,
                    "feature": feats,
                }
            )

    return media.select("docId", "mime", "payload", "payload_size").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def decode_image(payload: bytes):  # pragma: no cover - explicit stub
    """Real image decode — requires PIL, not shipped in this container."""
    raise NotImplementedError("image decoding requires PIL; not available in this environment")
