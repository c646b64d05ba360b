"""spark-submit entry point: compact index batches (B4/B5 at cluster scale).

Usage::

    spark-submit --py-files search_engine_spark.zip jobs/compact.py \
        --index <index dir> [--auto | --batches 0 1 2] \
        [--merge-threshold 8] [--tier-ratio 4.0] [--min-run 2]

``--auto`` applies the LSM-style policy (reference parity: merge ALL at the
threshold — InvertedIndexManager DEFAULT_MERGE_THRESHOLD, IIM:60,68 —
size-tiered below it) until it is satisfied; ``--batches`` merges an
explicit list once. Prints one JSON line with the surviving batches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--auto", action="store_true")
    ap.add_argument("--batches", nargs="*", default=None)
    ap.add_argument("--merge-threshold", type=int, default=8)
    ap.add_argument("--tier-ratio", type=float, default=4.0)
    ap.add_argument("--min-run", type=int, default=2)
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)
    if not a.auto and not a.batches:
        ap.error("one of --auto or --batches is required")

    from pyspark.sql import SparkSession

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.segments import auto_compact, compact, read_manifest

    spark = (
        get_spark(app="compact", master=a.master)
        if a.master
        else SparkSession.builder.getOrCreate()
    )
    t0 = time.time()
    if a.auto:
        m = auto_compact(
            spark, a.index, merge_threshold=a.merge_threshold,
            tier_ratio=a.tier_ratio, min_run=a.min_run,
        )
    else:
        compact(spark, a.index, [str(b) for b in a.batches])
        m = read_manifest(a.index)
    print(json.dumps({
        "sec": round(time.time() - t0, 2),
        "batches": sorted(m["batches"]),
        "npostings": sum(int(b.get("npostings", 0)) for b in m["batches"].values()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
