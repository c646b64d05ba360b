"""spark-submit entry point: index integrity audit (operators/fsck.py).

Usage::

    spark-submit --py-files search_engine_spark.zip jobs/fsck.py \
        --index <index dir> [--shallow]

Prints one JSON report line and exits non-zero when the audit finds
errors. ``--shallow`` skips the distributed posting-decode pass and runs
only the catalog / stats / cross-relation checks (O(batches) driver work
plus two tiny aggregates) — the cheap per-commit smoke; the deep pass is
the scheduled (e.g. post-compaction) full verification, one distributed
scan over the packed rows with violations as its only shuffle payload.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--shallow", action="store_true",
                    help="skip the distributed posting-decode pass")
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from search_engine_spark.operators.fsck import fsck_index

    owns_session = SparkSession.getActiveSession() is None
    if a.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(app="index-fsck", master=a.master)
    else:
        spark = SparkSession.builder.appName("index-fsck").getOrCreate()

    report = fsck_index(spark, a.index, deep=not a.shallow)
    print(json.dumps(report, sort_keys=True))
    if owns_session:
        spark.stop()
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
