"""Measure the batch-kernel crossover: per-query block-max pruning
(``vectorized=False``) vs the decode-once accumulator kernel
(``vectorized=True``), varying Q on ONE fixed large index.

Small Q over a big index favors pruning (most block decodes are skipped
and there is little decode to share); large Q favors decode sharing. The
measured crossover sets ``rank._AUTO_VECTORIZED_MIN_Q``, which
``score_queries_daat_batch(vectorized=None)`` uses to auto-select.

Usage: python tools/kernel_crossover.py [n_docs] [trials]
Defaults: 480000 2. Reuses the tools/query_scaling.py index when present.
Writes a marked BENCH.md section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IDX = "/tmp/query_scale_idx"

QS = [1, 2, 4, 8, 16, 32, 128]

RUN_SRC = r"""
import json, random, sys, time
sys.path.insert(0, __REPO__)
from search_engine_spark.session import get_spark
from search_engine_spark.operators.rank import Scorer, score_queries_daat_batch
from search_engine_spark.sources.segments import (
    load_segments, docid_span, load_term_stats_pdf,
)

idx = sys.argv[1]
qs = [int(x) for x in sys.argv[2].split(",")]
spark = get_spark(master="local[8]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
segs = load_segments(spark, idx)
stats = load_term_stats_pdf(idx)
span = docid_span(idx)
import os
m = json.load(open(os.path.join(idx, "manifest.json")))
nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]

# the query-scaling workload construction (df-stratified 1-3 terms)
terms = sorted(zip(stats["term"], (int(d) for d in stats["df"])))
terms.sort(key=lambda td: (td[1], td[0]))
third = max(len(terms) // 3, 1)
pools = [terms[:third], terms[third:2 * third], terms[2 * third:]]
rng = random.Random(221)
all_q = {i: [rng.choice(pools[(i + j) % 3])[0] for j in range(1 + i % 3)]
         for i in range(max(qs))}

# warm python workers + JIT on a disjoint slice
score_queries_daat_batch(spark, segs, stats,
                         {10**6 + i: all_q[i] for i in range(4)},
                         nd, avg, Scorer(), 10, n_buckets=32,
                         docid_span=span).collect()
out = []
for q in qs:
    w = {i: all_q[i] for i in range(q)}
    row = {"Q": q}
    # interleave the two kernels so host noise hits both
    for name, vec in (("pruned", False), ("vectorized", True)):
        t0 = time.time()
        score_queries_daat_batch(spark, segs, stats, w, nd, avg, Scorer(),
                                 10, n_buckets=32, docid_span=span,
                                 vectorized=vec).collect()
        row[name] = round(time.time() - t0, 2)
    out.append(row)
print(json.dumps(out))
spark.stop()
""".replace("__REPO__", repr(REPO))

MARK_A = "<!-- kernel_crossover:auto -->"
MARK_B = "<!-- /kernel_crossover:auto -->"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    if not os.path.exists(os.path.join(IDX, "manifest.json")):
        from query_scaling import BUILD_SRC  # same builder, same index

        subprocess.run([sys.executable, "-c", BUILD_SRC, IDX, str(n_docs)],
                       check=True, cwd=REPO)

    best: dict[int, dict[str, float]] = {}
    for _ in range(trials):
        r = subprocess.run(
            [sys.executable, "-c", RUN_SRC, IDX, ",".join(map(str, QS))],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        for row in json.loads(r.stdout.strip().splitlines()[-1]):
            b = best.setdefault(row["Q"], {"pruned": 1e9, "vectorized": 1e9})
            b["pruned"] = min(b["pruned"], row["pruned"])
            b["vectorized"] = min(b["vectorized"], row["vectorized"])

    crossover = next(
        (q for q in QS if best[q]["vectorized"] <= best[q]["pruned"]), QS[-1]
    )
    print(json.dumps({"best": best, "crossover_Q": crossover}))

    lines = "\n".join(
        f"| {q} | {best[q]['pruned']} | {best[q]['vectorized']} | "
        f"{'vectorized' if best[q]['vectorized'] <= best[q]['pruned'] else 'pruned'} |"
        for q in QS
    )
    block = f"""{MARK_A}
## Batch-kernel crossover (pruned per-query loop vs decode-once accumulator)

Same {n_docs:,}-doc porter index and df-stratified workload as the
query-scaling section; Q varies, both kernels timed back-to-back per Q
(best of {trials} interleaved trials, local[8], n_buckets=32, k=10).
`score_queries_daat_batch(vectorized=None)` auto-selects per
`rank._AUTO_VECTORIZED_MIN_Q`; measured crossover Q = **{crossover}**.

| Q | pruned (s) | vectorized (s) | winner |
|---|---|---|---|
{lines}

Reproduce: `python tools/kernel_crossover.py {n_docs} {trials}`
{MARK_B}"""
    p = os.path.join(REPO, "BENCH.md")
    text = open(p).read() if os.path.exists(p) else ""
    if MARK_A in text and MARK_B in text:
        text = text.split(MARK_A)[0] + block + text.split(MARK_B, 1)[1]
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(p, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
