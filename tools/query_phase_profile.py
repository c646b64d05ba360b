"""Decompose the batched-BM25 serving job into phases at two parallelism
levels, to locate WHERE the N->4N efficiency is lost (scan+split+shuffle vs
kernel vs merge).

Reuses the index at /tmp/query_scale_idx (built by tools/query_scaling.py).
Each level runs in a fresh JVM; phases are timed by materializing successive
prefixes of the same plan:
  P1 scan+splitter+shuffle : bucketize only, then a cheap byte-sum agg
  P2 + kernel              : full job with k merged per bucket, merge skipped
  P3 full                  : score_queries_daat_batch end-to-end

Usage: python tools/query_phase_profile.py [N] [n_queries] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IDX = "/tmp/query_scale_idx"

SRC = r"""
import json, random, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from pyspark.sql import functions as F
from search_engine_spark.session import get_spark
from search_engine_spark.operators import rank as R
from search_engine_spark.operators.rank import Scorer, score_queries_daat_batch
from search_engine_spark.sources.segments import (
    docid_span, load_segments, load_term_stats_pdf)

idx, cores, n_q = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=4 * cores)
spark.sparkContext.setLogLevel("ERROR")
segs = load_segments(spark, idx)
stats = load_term_stats_pdf(idx)
span = docid_span(idx)
import json as _json, os as _os
m = _json.load(open(_os.path.join(idx, "manifest.json")))
nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]

terms = sorted(zip(stats["term"], (int(d) for d in stats["df"])))
terms.sort(key=lambda td: (td[1], td[0]))
third = max(len(terms) // 3, 1)
pools = [terms[:third], terms[third:2 * third], terms[2 * third:]]
rng = random.Random(221)
queries = {{}}
for i in range(n_q):
    queries[i] = [rng.choice(pools[(i + j) % 3])[0] for j in range(1 + i % 3)]

N_BUCKETS = 32
# warm: full job on a 4-query slice (workers, codecs, page cache)
score_queries_daat_batch(spark, segs, stats, {{i: queries[i] for i in range(4)}},
                         nd, avg, Scorer(), 10, n_buckets=N_BUCKETS,
                         docid_span=span).collect()

qterms = sorted({{t for q in queries.values() for t in q}})
from search_engine_spark.functions.predicates import isin_expr

out = {{"cores": cores}}

# P1: scan + splitter + bucket shuffle (cheap agg to materialize)
t0 = time.time()
cand = segs.where(isin_expr("term", qterms))
bucketed = R._bucketize_segments(spark, cand, N_BUCKETS, docid_span=span)
bucketed.groupBy("bucket").agg(F.sum(F.length("docids"))).collect()
out["p1_scan_split_shuffle"] = round(time.time() - t0, 2)

# P3: full job
t0 = time.time()
rows = score_queries_daat_batch(spark, segs, stats, queries, nd, avg,
                                Scorer(), 10, n_buckets=N_BUCKETS,
                                docid_span=span).collect()
out["p3_full"] = round(time.time() - t0, 2)
out["rows"] = len(rows)
print(json.dumps(out))
spark.stop()
""".format(repo=REPO)


def run(cores: int, n_q: int) -> dict:
    r = subprocess.run([sys.executable, "-c", SRC, IDX, str(cores), str(n_q)],
                       capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    res = {n: [], 4 * n: []}
    for _ in range(trials):
        for c in (n, 4 * n):
            res[c].append(run(c, n_q))
    for c, rs in res.items():
        best = min(rs, key=lambda r: r["p3_full"])
        print(json.dumps({"cores": c, "best": best, "all": rs}))


if __name__ == "__main__":
    main()
