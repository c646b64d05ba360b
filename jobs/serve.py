"""spark-submit entry point: batch query serving over the bucketized
serving cache (operators/serving.py — the steady-state deployment path).

Usage::

    # one-time per index lifetime: prepare the resident shards
    spark-submit --py-files search_engine_spark.zip jobs/serve.py \
        --index <index dir> --cache <cache dir> --prepare

    # per-commit maintenance: delta-only refresh (prepare if missing)
    spark-submit ... jobs/serve.py --index IDX --cache CDIR --refresh

    # serve a workload (JSON {"qid": ["term", ...], ...} or one query
    # per line of plain terms); re-prepares automatically when the cache
    # is missing or stale unless --no-reprepare
    spark-submit ... jobs/serve.py --index IDX --cache CDIR \
        --queries workload.json --k 10 --out results.parquet

Without ``--out`` the top-k rows print as JSON lines. The cache refuses to
serve across a manifest generation bump (new batch / compaction / purge /
tombstone) — the job then REFRESHES incrementally
(``refresh_serving_cache``): tombstone-only bumps are metadata-only, new
batches bucketize just the delta into appended per-bucket shards, and only
a compaction/purge (which rewrites segments anyway) triggers a full
re-prepare. Intended cadence: one prepare per index lifetime, one cheap
refresh per commit, any number of workloads in between.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_queries(path: str) -> dict[int, list[str]]:
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
        return {int(k): list(v) for k, v in obj.items()}
    except (json.JSONDecodeError, AttributeError, TypeError, ValueError):
        # not a {qid: [terms]} JSON object -> treat as one query per line
        return {
            i: line.split()
            for i, line in enumerate(text.splitlines())
            if line.strip()
        }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cache", required=True, help="serving-cache directory")
    ap.add_argument("--queries", default=None,
                    help="workload file (JSON qid->terms, or lines of terms)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--scorer", default="bm25",
                    choices=["bm25", "tfidf_cosine"])
    ap.add_argument("--attach", action="store_true",
                    help="record this cache in the index manifest and run "
                         "the initial prepare: from then on every index "
                         "commit (build batch, compact, purge, tombstone) "
                         "auto-refreshes it — no per-commit --refresh "
                         "invocations needed")
    ap.add_argument("--prepare", action="store_true",
                    help="prepare the cache and exit")
    ap.add_argument("--refresh", action="store_true",
                    help="bring the cache to the live generation "
                         "incrementally (delta-only bucketize; prepare if "
                         "missing) — the per-commit maintenance entry "
                         "point. Exits after refreshing unless --queries "
                         "is also given (refresh-then-serve)")
    ap.add_argument("--no-reprepare", action="store_true",
                    help="fail on a stale/missing cache instead of rebuilding")
    ap.add_argument("--out", default=None, help="results parquet path")
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from search_engine_spark.operators.rank import Scorer
    from search_engine_spark.operators.serving import (
        ServingCacheStale,
        load_serving_cache,
        prepare_serving_cache,
        refresh_serving_cache,
        score_queries_cached,
    )
    from search_engine_spark.sources.segments import (
        load_term_stats_pdf,
        read_manifest,
    )

    owns_session = SparkSession.getActiveSession() is None
    if a.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(master=a.master)
    else:
        spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        meta_path = os.path.join(a.cache, "serving_cache.json")
        if a.attach:
            from search_engine_spark.operators.serving import (
                attach_serving_cache,
            )

            cache = attach_serving_cache(
                spark, a.index, a.cache, n_buckets=a.n_buckets
            )
            print(json.dumps({"attached": True,
                              "generation": cache["generation"],
                              "buckets": len(cache["buckets"])}))
            if not a.queries:
                return 0
        elif a.refresh:
            if os.path.exists(meta_path):
                if a.n_buckets is not None:
                    print(json.dumps({"warning": "--n-buckets is ignored "
                                      "on refresh; the cache keeps its "
                                      "bucket count (re-run --prepare to "
                                      "resize)"}), file=sys.stderr)
                cache = refresh_serving_cache(spark, a.index, a.cache)
                # mode tells monitoring whether this commit cost O(delta)
                # or fell back to the O(index) full prepare
                print(json.dumps({"refreshed": True,
                                  "mode": cache.get("refresh_mode", "delta"),
                                  "generation": cache["generation"],
                                  "buckets": len(cache["buckets"])}))
            else:
                cache = prepare_serving_cache(
                    spark, a.index, a.cache, n_buckets=a.n_buckets
                )
                print(json.dumps({"prepared": True,
                                  "generation": cache["generation"],
                                  "buckets": len(cache["buckets"])}))
            if not a.queries:  # refresh-then-serve when a workload is given
                return 0
        elif a.prepare or not os.path.exists(meta_path):
            if a.no_reprepare and not a.prepare:
                print(json.dumps({"error": "cache missing"}), file=sys.stderr)
                return 2
            cache = prepare_serving_cache(
                spark, a.index, a.cache, n_buckets=a.n_buckets
            )
            print(json.dumps({"prepared": True,
                              "generation": cache["generation"],
                              "buckets": len(cache["buckets"])}))
            if a.prepare:
                return 0
        else:
            cache = load_serving_cache(a.cache)

        if not a.queries:
            return 0
        queries = _load_queries(a.queries)
        m = read_manifest(a.index)
        avgdl = m["stats"].get("avgdl_by_field", {}).get(
            "", m["stats"]["avgdl"]
        )
        stats_pdf = load_term_stats_pdf(a.index)
        analyzer = m.get("analyzer", "porter")

        def run(c):
            # lazy-deletion mask, same default as jobs/query.py: tombstoned
            # docs never serve (the cache holds raw segments until purge)
            from search_engine_spark.operators.delete import deleted_array

            return score_queries_cached(
                spark, c, stats_pdf, queries, m["stats"]["n_docs"], avgdl,
                Scorer(a.scorer), a.k, analyzer=analyzer,
                deleted=deleted_array(spark, a.index),
            )

        try:
            out = run(cache)
            rows = out.collect() if not a.out else None
        except ServingCacheStale:
            if a.no_reprepare:
                print(json.dumps({"error": "cache stale"}), file=sys.stderr)
                return 2
            # incremental: bucketize only the newly committed batches
            # (tombstone-only bumps are metadata-only; compaction/purge
            # falls back to a full prepare inside refresh)
            cache = refresh_serving_cache(spark, a.index, a.cache)
            out = run(cache)
            rows = out.collect() if not a.out else None
        if a.out:
            out.write.mode("overwrite").parquet(a.out)
            print(json.dumps({"written": a.out, "queries": len(queries)}))
        else:
            for r in rows:
                print(json.dumps(
                    {"qid": int(r.qid), "docId": int(r.docId),
                     "score": round(float(r.score), 6)}
                ))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
