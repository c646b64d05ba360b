"""Index storage breakdown: bytes per packed column (docids / tfs / dls /
positions / block metadata) and on-disk parquet size, for a given analyzer
and docId scheme.

Motivation: a trigram (substring) index stores tf=1 for every posting by
construction and its dl column repeats the per-doc distinct-trigram count —
candidate dead weight at 100 TB. This tool measures how much, so the
"membership index" format lever (empty tf/dl blobs) is sized by data, not
guesswork, before committing to a cross-cutting format change.

Usage: python tools/index_size.py [n_docs] [analyzer] [ids] [membership]
         ids: hashed | dense   (dense = the 10^12-file docId mode)
         membership: any 4th arg builds with membership=True (empty tf/dl)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    analyzer = sys.argv[2] if len(sys.argv) > 2 else "trigram"
    ids = sys.argv[3] if len(sys.argv) > 3 else "dense"
    membership = len(sys.argv) > 4

    from pyspark.sql import functions as F

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import synthetic_corpus
    from search_engine_spark.sources.segments import build_index, load_segments

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthetic_corpus(
        spark, n_docs=n_docs, vocab_size=20000, seed=42,
        dense_ids=(ids == "dense"),
    )
    with_pos = analyzer not in ("trigram", "trigram_fold")
    idx = tempfile.mkdtemp(prefix="idx_size_")
    shutil.rmtree(idx, ignore_errors=True)
    m = build_index(
        spark, corpus, idx, analyzer=analyzer, with_positions=with_pos,
        n_batches=1, num_segments=16,
        heavy_threshold=n_docs // (100 if not with_pos else 20),
        n_salts=16 if not with_pos else 8,
        membership=membership,
    )
    segs = load_segments(spark, idx)
    cols = ["docids", "tfs", "dls"] + (["positions", "poslens"] if with_pos else [])
    aggs = [F.sum(F.length(c)).alias(c) for c in cols] + [
        F.sum("ndocs").alias("postings"),
        F.count("*").alias("rows"),
        # block metadata lives as typed arrays (8B lasts + 4B max_tf/offsets)
        F.sum(
            F.size("block_last_docid") * 8 + F.size("block_max_tf") * 4
            + F.size("block_docid_off") * 4 + F.size("block_tf_off") * 4
            + F.size("block_dl_off") * 4
        ).alias("block_meta"),
    ]
    r = segs.agg(*aggs).first().asDict()
    disk = 0
    for root, _, files in os.walk(idx):
        disk += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    postings = r.pop("postings")
    rows = r.pop("rows")
    payload = sum(v for v in r.values() if v)
    report = {
        "analyzer": analyzer, "ids": ids, "membership": membership,
        "n_docs": n_docs,
        "postings": int(postings), "packed_rows": int(rows),
        "bytes": {k: int(v or 0) for k, v in r.items()},
        "bytes_per_posting": {
            k: round((v or 0) / postings, 3) for k, v in r.items()
        },
        "payload_bytes": int(payload),
        "tf_dl_share_of_payload": round(
            ((r["tfs"] or 0) + (r["dls"] or 0)) / payload, 3
        ),
        "disk_bytes": int(disk),
        "npostings_manifest": m["stats"]["npostings"],
    }
    print(json.dumps(report))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
