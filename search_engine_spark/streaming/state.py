"""Custom stateful streaming operator: first-seen dedup across micro-batches.

The standard unbounded-training-data shape the reference never needed (it is
strictly batch, ``InvertedIndexManager.java`` buffers + flush): a document
stream where only the FIRST occurrence of each content hash may pass.
Spark's built-in ``dropDuplicates`` on a stream keeps implicit state; this
operator makes the state explicit with ``applyInPandasWithState`` — the
template for any custom stateful operator (sessionization, incremental
rollups):

- state is keyed by a BOUNDED bucket column (hash of the content hash mod
  ``n_buckets``), not by the content hash itself, so the number of state
  keys — and therefore state-store files and shuffle partitions touched per
  micro-batch — is fixed regardless of corpus size;
- arrival order within a micro-batch decides the keeper (pandas preserves
  input order; cross-batch order is micro-batch order, the streaming
  analog of the reference's insertion-counter docIDs).

Two state representations, selected by ``state_mode``:

- ``"exact"`` — per-bucket set of seen hashes (array<string>). Exact, but
  the set grows with distinct keys and is re-serialized every micro-batch:
  O(seen) state per bucket — fine for bounded key spaces, wrong for an
  unbounded 100 TB stream.
- ``"bloom"`` — per-bucket FIXED-SIZE Bloom filter (binary,
  ``filter_bits/8`` bytes, ``n_hashes`` probes per key). Total state is
  O(n_buckets × filter_bits) FOREVER, independent of stream length. The
  trade is one-sided error: a false positive DROPS a genuinely-new doc
  (never duplicates one) with probability ≈ (1 - e^{-kn/m})^k for n keys
  per bucket — size ``filter_bits`` for the expected keys/bucket (e.g.
  2^23 bits/bucket ≈ 1 MiB holds ~600k keys/bucket at <1% FP; scale
  ``n_buckets`` first, the filters shard with it). For time-bounded
  exactness instead, swap ``GroupStateTimeout.ProcessingTimeTimeout`` in
  and age buckets out — same operator shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "docId long, content_md5 string"
EXACT_STATE_SCHEMA = "seen array<string>"
BLOOM_STATE_SCHEMA = "filter binary"


def _bloom_positions(key: str, filter_bits: int, n_hashes: int) -> np.ndarray:
    """``n_hashes`` bit positions from one md5 (split into 32-bit words,
    affine-mixed) — deterministic across executors and restarts."""
    h = int(hashlib.md5(key.encode()).hexdigest(), 16)
    w = [(h >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
    return np.array(
        [(w[i % 4] + i * w[(i + 1) % 4] + i * i) % filter_bits for i in range(n_hashes)],
        dtype=np.int64,
    )


def _bloom_test_and_add(
    bits: np.ndarray, keys: pd.Series, filter_bits: int, n_hashes: int
) -> np.ndarray:
    """Per-key membership test with immediate insert (so in-batch duplicates
    collapse too). Returns a bool mask of FRESH keys; mutates ``bits``."""
    fresh = np.zeros(len(keys), dtype=bool)
    for j, key in enumerate(keys):
        pos = _bloom_positions(key, filter_bits, n_hashes)
        byte, bit = pos >> 3, pos & 7
        if not np.all((bits[byte] >> bit) & 1):
            fresh[j] = True
            # ufunc.at: plain fancy |= silently drops duplicate byte indexes
            # (two probe bits in one byte), re-admitting the key later
            np.bitwise_or.at(bits, byte, (1 << bit).astype(np.uint8))
    return fresh


def first_seen_dedup(
    stream: DataFrame,
    id_col: str = "docId",
    hash_col: str = "content_md5",
    n_buckets: int = 64,
    state_mode: str = "exact",
    filter_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Streaming first-seen dedup: emit each content hash's first-arriving
    row, drop every later one — across micro-batches and restarts (state
    lives in the streaming checkpoint). See module docstring for the
    exact-vs-bloom state trade."""
    if state_mode not in ("exact", "bloom"):
        raise ValueError(f"unknown state_mode {state_mode!r}; 'exact' or 'bloom'")

    if state_mode == "exact":

        def kernel(key, pdfs, state: GroupState):
            seen = set(state.get[0]) if state.exists else set()
            outs = []
            for pdf in pdfs:
                fresh = pdf[~pdf[hash_col].isin(seen)]
                fresh = fresh.drop_duplicates(subset=[hash_col], keep="first")
                seen.update(fresh[hash_col])
                outs.append(fresh[[id_col, hash_col]])
            state.update((sorted(seen),))
            out = pd.concat(outs) if outs else pd.DataFrame({id_col: [], hash_col: []})
            yield out.rename(columns={id_col: "docId", hash_col: "content_md5"})

        state_schema = EXACT_STATE_SCHEMA
    else:

        def kernel(key, pdfs, state: GroupState):
            if state.exists:
                bits = np.frombuffer(bytes(state.get[0]), dtype=np.uint8).copy()
            else:
                bits = np.zeros(filter_bits // 8, dtype=np.uint8)
            outs = []
            for pdf in pdfs:
                mask = _bloom_test_and_add(bits, pdf[hash_col], filter_bits, n_hashes)
                outs.append(pdf.loc[mask, [id_col, hash_col]])
            # state size is len(bits) == filter_bits/8 bytes FOREVER
            state.update((bytearray(bits.tobytes()),))
            out = pd.concat(outs) if outs else pd.DataFrame({id_col: [], hash_col: []})
            yield out.rename(columns={id_col: "docId", hash_col: "content_md5"})

        state_schema = BLOOM_STATE_SCHEMA

    src = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(hash_col)), F.lit(n_buckets))
    )
    return src.groupBy("_bucket").applyInPandasWithState(
        kernel, OUT_SCHEMA, state_schema, "append", GroupStateTimeout.NoTimeout
    )
