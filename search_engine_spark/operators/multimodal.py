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


try:  # real decoder activates only when the imaging library exists
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # this container ships no imaging libs — stub mode only
    _PILImage = None
    HAS_PIL = False


def decode_image(payload: bytes, dim: int = 16) -> np.ndarray:
    """Real image decode path (feature-flagged on PIL being installed):
    decode -> grayscale -> resize to a 4x(dim/4) thumbnail -> [-1, 1]
    floats. Raises NotImplementedError when PIL is absent, keeping the
    deterministic sha256 stub (:func:`_fake_decode`) the oracle-checked
    default in this environment."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this environment"
        )
    import io

    if dim % 4:
        raise ValueError("dim must be a multiple of 4 for the 4-wide thumbnail")
    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((4, dim // 4))
    arr = np.asarray(img, dtype=np.float64) / 255.0 * 2.0 - 1.0
    return arr.reshape(-1).astype(np.float32)


def decode_ppm(payload: bytes, dim: int = 16) -> np.ndarray:
    """Pure-numpy image decoder for binary PPM (P6, maxval <= 255) — an
    UNCOMPRESSED format, so the real (non-stub) decode path executes in
    this container with no imaging library at all: parse header -> BT.601
    luma grayscale -> area-average resize to a 4x(dim/4) thumbnail ->
    [-1, 1] float32, the same output contract as :func:`decode_image`
    (which stays PIL-flagged for compressed formats)."""
    if dim % 4:
        raise ValueError("dim must be a multiple of 4 for the 4-wide thumbnail")
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":  # comment runs to end of line
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    magic = token()
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (P6) payload: magic={magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    if not (0 < maxval <= 255):
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # exactly one whitespace byte after maxval, then the raster
    n = w * h * 3
    if len(payload) - pos < n:
        raise ValueError("truncated PPM raster")
    rgb = (
        np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        .reshape(h, w, 3)
        .astype(np.float64)
    )
    gray = rgb @ np.array([0.299, 0.587, 0.114])  # ITU-R BT.601 luma
    th, tw = dim // 4, 4
    if h < th:  # tiny images: repeat rows/cols so every band is non-empty
        gray = np.repeat(gray, -(-th // h), axis=0)
        h = gray.shape[0]
    if w < tw:
        gray = np.repeat(gray, -(-tw // w), axis=1)
        w = gray.shape[1]
    re = np.linspace(0, h, th + 1).astype(int)
    ce = np.linspace(0, w, tw + 1).astype(int)
    out = np.empty((th, tw))
    for i in range(th):
        band = gray[re[i] : re[i + 1]]
        for j in range(tw):
            out[i, j] = band[:, ce[j] : ce[j + 1]].mean()
    return (out.reshape(-1) / maxval * 2.0 - 1.0).astype(np.float32)


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


def extract_features(
    media: DataFrame, dim: int = 16, frame_sample: int = 4, decoder: str = "stub"
) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    Real Arrow-batched ``mapInPandas`` plumbing; ``decoder`` picks the
    per-payload decode: ``"stub"`` (default — deterministic sha256 features,
    oracle-mirrorable), ``"ppm"`` (:func:`decode_ppm`, a real pure-numpy
    image decode that runs in this container), or ``"image"``
    (:func:`decode_image`, requires PIL — raises up front when absent so
    jobs fail fast, not per-task).
    ``n_frames`` mimics frame sampling for video payloads
    (ceil(size / 4096) capped at `frame_sample`).
    """
    if decoder not in ("stub", "image", "ppm"):
        raise ValueError(f"unknown decoder {decoder!r}; 'stub', 'image' or 'ppm'")
    if decoder == "image" and not HAS_PIL:
        raise NotImplementedError(
            "decoder='image' requires PIL; not available in this environment"
        )
    decode = {"stub": _fake_decode, "image": decode_image, "ppm": decode_ppm}[decoder]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decode(p, dim).tolist() for p in pdf["payload"]]
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


