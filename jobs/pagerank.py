"""spark-submit entry point: PageRank over an edge-list TSV (Q9/Q10).

Usage::

    spark-submit --py-files search_engine_spark.zip jobs/pagerank.py \
        --edges <id-graph.tsv path> [--urls <url.tsv path>] \
        [--iterations 100] [--topk 20] [--output <parquet dir>]

Reference parity: ``IcsSearchEngine.computePageRank`` (ICS:74-146) — damping
0.85, no dangling redistribution, (PR-min)/max normalization — over the
``id-graph.tsv`` edge shape (ICS:92-98). Emits one JSON line with the top-k
(doc_id, pagerank[, url]) rows; optionally writes the full ranking parquet.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--urls", default=None)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--output", default=None)
    ap.add_argument("--master", default=None, help="local testing only")
    a = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from search_engine_spark.operators.pagerank import compute_pagerank, pagerank_scores
    from search_engine_spark.sources.graph import graph_nodes, load_edge_list, load_url_map

    owns_session = SparkSession.getActiveSession() is None
    if a.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(app="pagerank", master=a.master)
    else:
        spark = SparkSession.builder.appName("pagerank").getOrCreate()

    edges = load_edge_list(spark, a.edges)
    pr = compute_pagerank(graph_nodes(edges), edges, num_iterations=a.iterations)
    if a.urls:
        pr = pr.join(load_url_map(spark, a.urls).withColumnRenamed("doc_id", "docId"),
                     "docId", "left")
    ranked = pagerank_scores(pr)
    if a.output:
        ranked.write.mode("overwrite").parquet(a.output)
    top = [r.asDict() for r in ranked.limit(a.topk).collect()]
    print(json.dumps({"topk": top, "iterations": a.iterations}))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
