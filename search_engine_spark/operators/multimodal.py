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
    (PIL/librosa are not in this container). Deterministic fake: seed an RNG
    from the payload digest — stable across runs/partitions."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


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
