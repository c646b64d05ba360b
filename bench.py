"""Headline benchmark (driver contract).

Runs the engine's flagship operations at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-op sec...}, "sf": <sf>, "throughput": {...}}

Timed stages:
- ``index_build``      full resumable segment build over the sf documents table
  (tokenize -> salted range shuffle -> delta+varbyte packed segments + stats)
- ``bm25_topk_daat``   distributed block-max DAAT BM25 top-10
- ``bm25_topk_decl``   declarative decode->agg->TakeOrdered BM25 top-10
- ``tfidf_all``        reference-parity TF-IDF cosine, all matching docs
- ``boolean_and`` / ``phrase``  boolean + positional phrase retrieval
- ``minhash_pairs``    MinHash+LSH near-dup candidate pairs
- ``cosine_topk``      brute-force cosine ANN top-20 over embeddings
- ``synthetic_build_40k``  index build over a 40k-doc generated corpus
  (the docs/sec throughput figure that BENCH.md's scaling runs extend)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from search_engine_spark.operators.query import search_and, search_phrase
    from search_engine_spark.operators.rank import Scorer, score_query, score_query_daat
    from search_engine_spark.sources.corpus import load_documents, synthetic_corpus
    from search_engine_spark.sources.segments import (
        build_index,
        decode_postings,
        load_segments,
        load_term_stats,
    )
    from search_engine_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    q_ranked = ["spark", "query", "join"]
    q_and = ["spark", "join", "filter"]
    q_phrase = ["table", "scan"]

    times: dict[str, float] = {}
    thr: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    docs = load_documents(spark, sf_dir)
    n_docs_sf = docs.count()  # warm the JVM/reader outside timings

    idx = tempfile.mkdtemp(prefix="bench_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    m = timed(
        "index_build",
        lambda: build_index(
            spark, docs, idx, analyzer="naive", n_batches=1,
            heavy_threshold=max(64, n_docs_sf // 10), n_salts=8,
        ),
    )
    thr["index_docs_per_sec"] = round(n_docs_sf / times["index_build"], 1)
    segs = load_segments(spark, idx)
    stats = load_term_stats(spark, idx)
    n_docs, avgdl = m["stats"]["n_docs"], m["stats"]["avgdl"]

    timed(
        "bm25_topk_daat",
        lambda: score_query_daat(
            spark, segs, stats, q_ranked, n_docs, avgdl,
            Scorer("bm25"), k=10, analyzer="naive",
        ).collect(),
    )
    timed(
        "bm25_topk_decl",
        lambda: score_query(
            spark, decode_postings(segs, q_ranked), stats, q_ranked, n_docs,
            avgdl, Scorer("bm25"), k=10, analyzer="naive",
        ).collect(),
    )
    timed(
        "tfidf_all",
        lambda: score_query(
            spark, decode_postings(segs, q_ranked), stats, q_ranked, n_docs,
            avgdl, Scorer("tfidf_cosine"), k=None, analyzer="naive",
        ).count(),
    )

    dec = decode_postings(segs, list(set(q_and + q_phrase)), with_positions=True)
    timed("boolean_and", lambda: search_and(dec, q_and).count())
    timed("phrase", lambda: search_phrase(dec, q_phrase).count())

    from search_engine_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signatures,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed(
        "minhash_pairs",
        lambda: candidate_pairs(
            lsh_buckets(minhash_signatures(d, "text", "doc_id", 12, 3), "doc_id", 4, 3),
            "doc_id",
        ).count(),
    )

    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = list(e.where(F.col("vec_id") == 0).select("embedding").first()[0])
    timed("cosine_topk", lambda: cosine_topk(e.where(F.col("vec_id") != 0), qv, 20).collect())

    # larger synthetic corpus: the throughput figure the scaling runs extend
    n_syn = int(os.environ.get("SPARK_GRAFT_SYN_DOCS", "40000"))
    syn = synthetic_corpus(spark, n_docs=n_syn, vocab_size=20000, partitions=4 * int(cpus))
    idx2 = tempfile.mkdtemp(prefix="bench_syn_")
    shutil.rmtree(idx2, ignore_errors=True)
    timed(
        "synthetic_build_40k",
        lambda: build_index(
            spark, syn, idx2, analyzer="porter", n_batches=1,
            heavy_threshold=n_syn // 20, n_salts=8,
        ),
    )
    thr["synthetic_index_docs_per_sec"] = round(n_syn / times["synthetic_build_40k"], 1)

    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(idx2, ignore_errors=True)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "throughput": thr,
            }
        )
    )


if __name__ == "__main__":
    main()
