"""Bucketized serving cache: steady-state batch query serving without the
per-workload scan/split/shuffle.

The batched DAAT plan (``rank.score_queries_daat_batch``) re-keys packed
segment rows by docId bucket on EVERY workload — measured 8.3s of a 15s
16k-query job at 8 cores (55%), and the phase that scales worst on one box
(python splitter + shuffle machinery). But the bucketized form is
WORKLOAD-INDEPENDENT: it depends only on the index generation, the bucket
count, and the docId span. A serving process therefore prepares it ONCE —
:func:`prepare_serving_cache` bucketizes the whole index and persists one
Arrow IPC (feather) file per bucket — and every subsequent workload runs as
a job over bucket ids: each task memory-maps its bucket file, runs the
same accumulator kernel, and the packed top-k shards merge exactly as the
in-plan path (bit-identical results; tests compare all three paths).

This is the standard search-serving architecture re-expressed in Spark:
index shards resident on executor-local storage (a Lucene/ES node keeps
its shard open and mmapped; re-sharding per query batch would be absurd),
queries broadcast to all shards, per-shard top-k merged. On one box the
files sit in the OS page cache; on a multi-executor cluster the same
design wants shard-to-executor affinity (locality-preferred scheduling
over an executor-local cache dir, or a fast shared store) — the job shape
is unchanged.

Cache invalidation: the cache records the manifest ``generation`` at
prepare time; scoring revalidates against the live manifest and raises
:class:`ServingCacheStale` after any commit (new batch, compaction, purge,
delete) so a stale shard can never serve. Tombstones added AFTER prepare
bump the generation — re-prepare, or pass the tombstone array explicitly
via ``deleted`` (the kernel masks it like the in-plan path).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.segments import load_segments, read_manifest
from . import rank as R

META_FILE = "serving_cache.json"


class ServingCacheStale(RuntimeError):
    """The index manifest moved past the cache's generation."""


def prepare_serving_cache(
    spark: SparkSession,
    index_dir: str,
    cache_dir: str,
    n_buckets: int | None = None,
    docid_span: tuple[int, int] | None = None,
) -> dict:
    """Bucketize the whole index once and persist per-bucket Arrow IPC
    files under ``cache_dir``. Returns (and writes) the cache meta dict.

    One pass of the exact splitter the in-plan path runs per workload
    (``rank._bucketize_segments``), so cached and uncached scoring see
    byte-identical bucket contents. Files are written uncompressed for
    mmap-speed reads; each is one bucket's BUCKETED_SCHEMA rows.
    """
    import pyarrow as pa
    import pyarrow.feather as feather

    m = read_manifest(index_dir)
    gen = int(m.get("generation", 0))
    stats = m.get("stats") or {}
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if docid_span is None and "docid_lo" in stats:
        docid_span = (int(stats["docid_lo"]), int(stats["docid_hi"]))
    segs = load_segments(spark, index_dir)
    bucketed = R._bucketize_segments(spark, segs, n_buckets, docid_span)
    shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir)
    cdir = os.path.abspath(cache_dir)

    def writer(key, pdf):
        b = int(key[0])
        path = os.path.join(cdir, f"bucket={b}.feather")
        tmp = path + ".tmp"
        feather.write_feather(
            pa.Table.from_pandas(pdf, preserve_index=False),
            tmp,
            compression="uncompressed",
        )
        os.replace(tmp, path)
        return pd.DataFrame({"bucket": [b], "rows": [len(pdf)]})

    rows = (
        (bucketed.groupBy("bucket").applyInPandas(writer, "bucket int, rows long"))
        .collect()
        if bucketed is not None
        else []
    )
    meta = {
        "index_dir": os.path.abspath(index_dir),
        "cache_dir": cdir,
        "generation": gen,
        "n_buckets": int(n_buckets),
        "docid_span": list(docid_span) if docid_span else None,
        "n_docs": stats.get("n_docs"),
        # content scoring uses the content field's own avgdl on a fielded
        # index (the global stat mixes field tokens in — jobs/query.py rule)
        "avgdl": (stats.get("avgdl_by_field") or {}).get("", stats.get("avgdl")),
        "buckets": sorted(
            [{"bucket": int(r.bucket), "rows": int(r.rows)} for r in rows],
            key=lambda d: d["bucket"],
        ),
    }
    with open(os.path.join(cdir, META_FILE), "w") as f:
        json.dump(meta, f)
    return meta


def load_serving_cache(cache_dir: str) -> dict:
    with open(os.path.join(cache_dir, META_FILE)) as f:
        return json.load(f)


def score_queries_cached(
    spark: SparkSession,
    cache: dict,
    term_stats,
    queries: dict[int, list[str]],
    n_docs: int | None = None,
    avgdl: float | None = None,
    scorer: R.Scorer = R.Scorer(),
    k: int = 10,
    analyzer: str = "porter",
    ties: str = "desc",
    deleted: np.ndarray | None = None,
    check_generation: bool = True,
) -> DataFrame:
    """Batch BM25/TF-IDF top-k over a prepared serving cache — bit-identical
    to ``rank.score_queries_daat_batch`` on the same index, minus the
    per-workload scan/split/shuffle (the steady-state serving path).

    ``term_stats`` should be the driver-local pandas frame
    (``load_term_stats_pdf``) so the whole job is: parallelize bucket ids
    (exactly one per task) -> mmap bucket file -> accumulator kernel ->
    sharded packed merge. ``n_docs``/``avgdl`` default to the cache meta.
    """
    import pyarrow.feather as feather

    if check_generation:
        live_gen = int(read_manifest(cache["index_dir"]).get("generation", 0))
        if live_gen != int(cache["generation"]):
            raise ServingCacheStale(
                f"index at generation {live_gen}, cache prepared at "
                f"{cache['generation']} — re-run prepare_serving_cache"
            )
    n_docs = int(cache["n_docs"] if n_docs is None else n_docs)
    avgdl = float(cache["avgdl"] if avgdl is None else avgdl)
    if k is None:
        raise ValueError("serving path is top-k only; use the in-plan batch "
                         "path for exhaustive k=None scoring")
    qmetas, live_terms, _work = R._prep_workload(
        term_stats, queries, scorer, n_docs, analyzer
    )
    if not qmetas:
        return spark.createDataFrame([], R.BATCH_SCHEMA)
    buckets = [b["bucket"] for b in cache["buckets"] if b["rows"]]
    if not buckets:
        return spark.createDataFrame([], R.BATCH_SCHEMA)
    cdir = cache["cache_dir"]
    blob_ceiling = len(qmetas) * k * len(buckets)
    n_merge = R._n_merge_tasks(spark, blob_ceiling)
    qmetas_ref = (
        spark.sparkContext.broadcast(qmetas) if len(qmetas) >= 256 else None
    )
    qmetas_local = None if qmetas_ref is not None else qmetas
    live_ref = (
        spark.sparkContext.broadcast(live_terms)
        if len(live_terms) >= 256
        else None
    )
    live_local = None if live_ref is not None else live_terms

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        qm = qmetas_local if qmetas_ref is None else qmetas_ref.value
        lv = live_local if live_ref is None else live_ref.value
        live_arr = pa.array(lv, type=pa.string())
        for pdf in batches:
            for b in pdf["bucket"]:
                path = os.path.join(cdir, f"bucket={int(b)}.feather")
                tbl = feather.read_table(path, memory_map=True)
                # prune to the workload's terms BEFORE materializing python
                # bytes: a small workload then touches O(its candidates),
                # not O(index) — the mmap'd non-matching blobs never copy
                tbl = tbl.filter(pc.is_in(tbl["term"], value_set=live_arr))
                if not tbl.num_rows:
                    continue
                bpdf = tbl.to_pandas()
                qv, dv, sv = R._score_bucket_rows(
                    bpdf, qm, scorer, avgdl, k, ties, deleted
                )
                out = R._packed_shards(qv, dv, sv, n_merge)
                if len(out):
                    yield out

    def merge(batches):
        yield from R._merge_packed(batches, k, ties)

    # exactly one bucket id per partition: every kernel task reads one shard
    rdd = spark.sparkContext.parallelize(
        [(int(b),) for b in buckets], len(buckets)
    )
    ids = spark.createDataFrame(rdd, "bucket int")
    blobs = ids.mapInPandas(kernel, R.PACKED_TOPK_SCHEMA)
    return blobs.repartition(n_merge, "mkey").mapInPandas(merge, R.BATCH_SCHEMA)
