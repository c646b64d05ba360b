"""spark-submit entry point: delete documents from a built index (B7).

Usage::

    spark-submit --py-files search_engine_spark.zip jobs/delete.py \
        --index <index dir> --keyword spark            # tombstone by term
    spark-submit --py-files search_engine_spark.zip jobs/delete.py \
        --index <index dir> --ids 17,42,99             # tombstone by docId
    spark-submit --py-files search_engine_spark.zip jobs/delete.py \
        --index <index dir> --ids-parquet <path>       # docId column parquet
    spark-submit --py-files search_engine_spark.zip jobs/delete.py \
        --index <index dir> --purge                    # physical rewrite

Deletion is lazy (tombstone sets; queries exclude them immediately, corpus
stats shift only at --purge) — see operators/delete.py. The reference
declares this API but never implements it (IIM:1375-1377); this job is the
engine's real surface for it. Prints one JSON line of manifest stats.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--keyword", default=None)
    ap.add_argument("--ids", default=None, help="comma-separated docIds")
    ap.add_argument("--ids-parquet", default=None, help="parquet with a docId column")
    ap.add_argument("--purge", action="store_true")
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)
    if not (a.keyword or a.ids or a.ids_parquet or a.purge):
        ap.error("nothing to do: pass --keyword / --ids / --ids-parquet / --purge")

    from pyspark.sql import SparkSession

    from search_engine_spark.operators import delete as D
    from search_engine_spark.sources.segments import read_manifest

    owns_session = SparkSession.getActiveSession() is None
    if a.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(app="delete", master=a.master)
    else:
        spark = SparkSession.builder.appName("delete").getOrCreate()

    t0 = time.time()
    analyzer = read_manifest(a.index).get("analyzer", "porter")
    if a.keyword:
        D.delete_by_keyword(spark, a.index, a.keyword, analyzer=analyzer)
    if a.ids:
        ids = [(int(x),) for x in a.ids.split(",") if x.strip()]
        D.add_tombstones(spark, a.index, spark.createDataFrame(ids, "docId long"))
    if a.ids_parquet:
        D.add_tombstones(spark, a.index, spark.read.parquet(a.ids_parquet))
    if a.purge:
        D.purge_deletes(spark, a.index)

    m = read_manifest(a.index)
    print(json.dumps({
        "index": a.index,
        "sec": round(time.time() - t0, 3),
        "tombstone_sets": [
            {"id": s["id"], "ndocs": s["ndocs"]} for s in m.get("tombstones", [])
        ],
        "stats": m.get("stats"),
        "purged": bool(a.purge),
    }))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
