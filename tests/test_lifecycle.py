"""Full index lifecycle, one story: build -> serve cached -> grow (delta
refresh) -> delete (tombstone refresh + mask) -> purge (full re-prepare
fallback) -> compact -> serve again. Every transition the production
cadence makes, composed — each step's results are checked against the
in-plan batch path over the index AS IT IS at that step, so any stale or
mixed state between components shows up as a value mismatch."""

import numpy as np
from pyspark.sql import functions as F

from search_engine_spark.operators import rank as R
from search_engine_spark.operators.delete import (
    add_tombstones,
    deleted_array,
    purge_deletes,
)
from search_engine_spark.operators.serving import (
    prepare_serving_cache,
    refresh_serving_cache,
    score_queries_cached,
)
from search_engine_spark.sources import segments as S
from search_engine_spark.sources.segments import load_term_stats_pdf
from tests.conftest import corpus_from_texts

DOCS = [
    "spark scan table scan filter join",
    "table a b c d e scan",
    "scan table",
    "join filter spark spark",
    "table x scan y table z z scan",
    "apple rotten apple",
]
QUERIES = {0: ["scan", "table"], 1: ["apple"], 2: ["spark", "join"]}


def _cached(spark, idx, cache, deleted=None):
    return sorted(
        (r.qid, r.docId, round(r.score, 12))
        for r in score_queries_cached(
            spark, cache, load_term_stats_pdf(idx), QUERIES, k=10,
            analyzer="naive", deleted=deleted,
        ).collect()
    )


def _in_plan(spark, idx, m, deleted=None):
    return sorted(
        (r.qid, r.docId, round(r.score, 12))
        for r in R.score_queries_daat_batch(
            spark, S.load_segments(spark, idx), load_term_stats_pdf(idx),
            QUERIES, m["stats"]["n_docs"], m["stats"]["avgdl"], R.Scorer(),
            k=10, analyzer="naive", deleted=deleted,
            docid_span=(m["stats"]["docid_lo"], m["stats"]["docid_hi"]),
        ).collect()
    )


def test_full_lifecycle(spark, tmp_path):
    idx, cdir = str(tmp_path / "idx"), str(tmp_path / "cache")

    # 1) build + prepare: cached serving == in-plan
    m = S.build_index(spark, corpus_from_texts(spark, DOCS), idx,
                      analyzer="naive", n_batches=2)
    cache = prepare_serving_cache(spark, idx, cdir, n_buckets=4)
    assert _cached(spark, idx, cache) == _in_plan(spark, idx, m)

    # 2) grow: new batch -> delta refresh picks up the new docs
    extra = corpus_from_texts(
        spark, ["fresh apple crumble scan", "spark spark table"]
    ).withColumn("docId", F.col("docId") + F.lit(500))
    S.build_one_batch(spark, extra, idx, key="grow", analyzer="naive",
                      num_segments=4)
    m = S.finalize_index(spark, idx)
    cache = refresh_serving_cache(spark, idx, cdir)
    got = _cached(spark, idx, cache)
    assert got == _in_plan(spark, idx, m)
    assert any(d >= 500 for _, d, _ in got)

    # 3) delete: tombstone-only refresh (metadata) + live mask
    add_tombstones(spark, idx, spark.createDataFrame([(5,)], "docId long"))
    cache = refresh_serving_cache(spark, idx, cdir)
    dead = deleted_array(spark, idx)
    got = _cached(spark, idx, cache, deleted=dead)
    assert got == _in_plan(spark, idx, m, deleted=dead)
    assert all(d != 5 for _, d, _ in got)

    # 4) purge: segments rewritten -> refresh must full-re-prepare; the
    # purged doc is GONE from stats too (scores shift, mask no longer needed)
    m = purge_deletes(spark, idx)
    assert not S.read_manifest(idx).get("tombstones")
    cache = refresh_serving_cache(spark, idx, cdir)
    got = _cached(spark, idx, cache)
    assert got == _in_plan(spark, idx, m)
    assert all(d != 5 for _, d, _ in got)

    # 5) compact all batches -> full re-prepare again, same results (the
    # postings are the same bytes, just regrouped)
    before = got
    m = S.merge_all_batches(spark, idx)
    assert len([b for b in S.read_manifest(idx)["batches"].values()
                if b.get("committed")]) == 1
    cache = refresh_serving_cache(spark, idx, cdir)
    got = _cached(spark, idx, cache)
    assert got == _in_plan(spark, idx, m) == before

    # 6) the final cache is self-consistent on disk: every referenced shard
    # exists, nothing else does
    import os

    on_disk = {f for f in os.listdir(cdir) if f.endswith(".feather")}
    referenced = {f for fs in cache["shards"].values() for f in fs}
    assert on_disk == referenced
    assert isinstance(dead, np.ndarray)


def test_attached_cache_auto_refreshes_on_commits(spark, tmp_path):
    """VERDICT r4 item 4: attach once, then every commit path keeps the
    cache current — build more batches, delete, compact — and the very next
    query serves with zero manual refresh and zero ServingCacheStale."""
    from search_engine_spark.operators.serving import (
        attach_serving_cache,
        load_serving_cache,
    )
    from search_engine_spark.sources.segments import (
        build_one_batch,
        finalize_index,
        read_manifest,
    )

    idx, cdir = str(tmp_path / "idx"), str(tmp_path / "cache")
    m = S.build_index(spark, corpus_from_texts(spark, DOCS), idx,
                      analyzer="naive", n_batches=1)
    cache = attach_serving_cache(spark, idx, cdir, n_buckets=4)
    assert cache["generation"] == read_manifest(idx)["generation"]

    def serve():
        # reload from disk exactly like a serving node would; generation
        # gate stays ON — staleness would raise here
        c = load_serving_cache(cdir)
        return _cached(spark, idx, c), c

    got0, _ = serve()
    assert got0 == _in_plan(spark, idx, read_manifest(idx))

    # grow: a new committed batch (build_one_batch + finalize = the
    # incremental ingest commit path)
    extra = corpus_from_texts(spark, ["walrus scan table", "walrus apple"])
    extra = extra.withColumn("docId", F.col("docId") + 100)
    m = read_manifest(idx)
    build_one_batch(spark, extra, idx, "b1", m, analyzer="naive")
    m = finalize_index(spark, idx)
    got1, c1 = serve()  # no manual refresh anywhere
    assert c1["generation"] == m["generation"]
    assert got1 == _in_plan(spark, idx, m)
    assert {d for q, d, _ in got1 if q == 0} >= {100}  # new doc served

    # delete: tombstone commit catches the cache up metadata-only
    m_t = add_tombstones(spark, idx, spark.createDataFrame([(2,)], "docId long"))
    dead = deleted_array(spark, idx)
    got2, c2 = serve.__call__()
    c2_live = load_serving_cache(cdir)
    assert c2_live["generation"] == m_t["generation"]
    got2 = _cached(spark, idx, c2_live, deleted=dead)
    assert all(d != 2 for _, d, _ in got2)

    # purge + compact: heavier commits, still zero manual refresh
    m_p = purge_deletes(spark, idx)
    got3, c3 = serve()
    assert c3["generation"] == m_p["generation"]
    assert got3 == _in_plan(spark, idx, m_p)
    live_keys = sorted(
        k for k, b in read_manifest(idx)["batches"].items() if b.get("committed")
    )
    S.compact(spark, idx, live_keys[:2])
    m_c = read_manifest(idx)
    got4, c4 = serve()
    assert c4["generation"] == m_c["generation"]
    assert got4 == _in_plan(spark, idx, m_c)
