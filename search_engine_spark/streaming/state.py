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
- each bucket's state is the set of seen hashes (array<string>), updated
  per micro-batch from the Arrow-batched pandas kernel;
- arrival order within a micro-batch decides the keeper (pandas preserves
  input order; cross-batch order is micro-batch order, the streaming
  analog of the reference's insertion-counter docIDs).

At 100 TB the per-bucket seen-set must not grow unbounded: swap the exact
set for a per-bucket Bloom/sketch once FP tolerance is acceptable, or age
entries with ``GroupStateTimeout.ProcessingTimeTimeout`` — both are local
changes inside the kernel; the operator shape stays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "docId long, content_md5 string"
STATE_SCHEMA = "seen array<string>"


def first_seen_dedup(
    stream: DataFrame,
    id_col: str = "docId",
    hash_col: str = "content_md5",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming exact dedup: emit each content hash's first-arriving row,
    drop every later one — across micro-batches and restarts (state lives in
    the streaming checkpoint)."""

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

    src = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(hash_col)), F.lit(n_buckets))
    )
    return src.groupBy("_bucket").applyInPandasWithState(
        kernel, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
