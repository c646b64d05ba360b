"""Block-max WAND pruning-effectiveness audit.

Builds a synthetic index, collects the packed posting rows for each query's
terms, and runs the DAAT kernel twice over them single-node — pruned and
exhaustive — reporting how many 128-posting blocks the pruned run actually
byte-decoded, and asserting the two top-k results are identical (pruning is
a pure I/O optimization, never a semantics change; Ding & Suel, SIGIR'11).

Expected profile (classic MaxScore behavior): idf-SKEWED queries (rare +
common terms) skip 15-40% of blocks; flat all-heavy queries skip ~nothing
(every doc's score is near the bound, θ never clears the remaining-gain
sum). Two structural notes for 100 TB: (1) bounds are salt-aware — a doc
has at most ONE salted row per term, so remaining-gain sums per TERM, not
per row; (2) docIds here are uniform hashes, which is the worst case for
block skipping — candidate docs land in every block. Clustering docId
assignment (by repo/domain) concentrates strong candidates and is the
standard lever to make block-max skipping bite harder at scale.

Usage: python tools/wand_audit.py [n_docs] [k]    (defaults 40000, 10)
Prints one JSON line, e.g.::

    {"queries": {"q0": {"blocks_total": 313, "blocks_decoded": 64,
                        "decode_fraction": 0.204, "identical": true}}, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import pandas as pd

    from search_engine_spark.operators.rank import Scorer, _daat_segment, query_tfs
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import synthetic_corpus
    from search_engine_spark.sources.segments import build_index, load_segments

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="wand_src_")
    shutil.rmtree(src, ignore_errors=True)
    synthetic_corpus(spark, n_docs=n_docs, vocab_size=20000, partitions=32).write.parquet(src)
    corpus = spark.read.parquet(src)
    idx = tempfile.mkdtemp(prefix="wand_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    m = build_index(spark, corpus, idx, analyzer="naive", n_batches=1,
                    num_segments=8, heavy_threshold=n_docs // 20)
    segs = load_segments(spark, idx)
    nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]
    scorer = Scorer("bm25")

    # mixed-selectivity queries over the generator's vocabulary: heavy code
    # keywords (dense posting lists — the WAND win case) + mid/rare tokens
    queries = {
        "heavy3": ["def", "return", "import"],
        "heavy+mid": ["def", "tok17", "tok123"],
        "mid3": ["tok5", "tok29", "tok211"],
        "rare+heavy": ["tok4999", "public", "static"],
    }
    report = {}
    from search_engine_spark.operators.build import term_stats_from_segments

    tstats = term_stats_from_segments(segs)
    for name, q in queries.items():
        qtfs = query_tfs(q, "naive")
        rows = tstats.where(tstats.term.isin(list(qtfs))).collect()
        import numpy as np

        qmeta = {
            r.term: (float(scorer.idf(float(nd), np.array([r.df]))[0]), qtfs[r.term])
            for r in rows
        }
        pdf = (
            segs.where(segs.term.isin(list(qmeta)))
            .select("term", "max_tf", "docids", "tfs", "dls",
                    "block_last_docid", "block_max_tf",
                    "block_docid_off", "block_tf_off", "block_dl_off")
            .toPandas()
        )
        stats: dict = {}
        pruned = _daat_segment(pdf, qmeta, scorer, avg, k, prune=True,
                               ties="asc", stats=stats)
        exhaustive = _daat_segment(pdf, qmeta, scorer, avg, k, prune=False, ties="asc")
        same = pruned.reset_index(drop=True).equals(exhaustive.reset_index(drop=True))
        total = stats.get("blocks_total", 0)
        dec = stats.get("blocks_decoded", 0)
        report[name] = {
            "blocks_total": total,
            "blocks_decoded": dec,
            "decode_fraction": round(dec / total, 3) if total else None,
            "identical_topk": bool(same),
        }
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    print(json.dumps({"n_docs": n_docs, "k": k, "queries": report}))


if __name__ == "__main__":
    main()
