"""spark-submit entry point: index introspection (the ops-facing surface of
Q7/Q13 — corpus stats, segment layout, build lineage, dictionary shape).

Usage::

    spark-submit --py-files search_engine_spark.zip jobs/stats.py \
        --index <index dir> [--top-terms 10]

Prints one JSON line: manifest config + corpus stats, per-batch build
metrics (docs/sec, postings/sec, shuffle skew), tombstone count, dictionary
size, and the top-df dictionary terms. Everything except the dictionary
aggregation comes from the manifest — a driver-local file read, zero Spark
jobs; the dictionary summary is one small agg over the term-stats parquet.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--top-terms", type=int, default=10,
                    help="how many highest-df dictionary terms to show")
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_spark.sources.segments import (
        load_term_stats,
        read_manifest,
    )

    owns_session = SparkSession.getActiveSession() is None
    if a.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(app="index-stats", master=a.master)
    else:
        spark = SparkSession.builder.appName("index-stats").getOrCreate()

    m = read_manifest(a.index)
    batches = {
        k: {
            "ndocs": b.get("ndocs"),
            "npostings": b.get("npostings"),
            "build_sec": b.get("build_sec"),
            "metrics": b.get("metrics"),
        }
        for k, b in sorted(m.get("batches", {}).items())
        if b.get("committed")
    }
    ts = load_term_stats(spark, a.index)
    dict_row = ts.agg(
        F.count("*").alias("n_terms"), F.sum("df").alias("sum_df")
    ).collect()[0]
    top = [
        {"term": r.term, "df": int(r.df)}
        for r in ts.orderBy(F.desc("df"), F.asc("term")).limit(a.top_terms).collect()
    ]
    tombstones = 0
    try:
        from search_engine_spark.operators.delete import load_tombstones

        t = load_tombstones(spark, a.index)
        tombstones = 0 if t is None else t.count()
    except Exception:
        pass

    print(json.dumps({
        "config": {
            k: m.get(k)
            for k in ("analyzer", "codec", "n_batches", "num_segments",
                      "n_salts", "with_positions", "fields")
        },
        "stats": m.get("stats"),
        "finalized": bool(m.get("finalized")),
        "batches": batches,
        "dictionary": {
            "n_terms": int(dict_row["n_terms"]),
            "n_postings": int(dict_row["sum_df"] or 0),
            "top_df": top,
        },
        "tombstones": int(tombstones),
    }))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
