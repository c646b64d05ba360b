"""Block-max WAND pruning-effectiveness audit: uniform vs clustered docIds.

Builds TWO synthetic indexes over the same content — one with uniform-hash
docIds (worst case: strong candidates land in every 128-posting block) and
one with repo-clustered docIds (same-repo docs share contiguous id ranges,
and the generator's heavy vocabulary is language-per-repo biased, so
query-relevant docs concentrate in few ranges). For each query the DAAT
kernel runs pruned and exhaustive over the packed rows single-node,
reporting how many blocks the pruned run byte-decoded and asserting the two
top-k results are identical (pruning is a pure I/O optimization, never a
semantics change; Ding & Suel, SIGIR'11).

Expected profile (classic MaxScore behavior): idf-SKEWED queries (rare +
common terms) skip blocks under BOTH id schemes; clustered ids additionally
let candidate-range block elimination bite on heavy/mixed queries, because
non-essential rows only decode blocks whose docId range holds a live
candidate. Bounds are salt-aware — a doc has at most ONE salted row per
term, so remaining-gain sums per TERM, not per row.

Usage: python tools/wand_audit.py [n_docs] [k]    (defaults 40000, 10)
Prints one JSON line::

    {"n_docs": ..., "k": ..., "queries": {"<q>": {
        "uniform":   {"blocks_total": N, "blocks_decoded": n,
                      "decode_fraction": f, "identical_topk": true},
        "clustered": {...}}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# mixed-selectivity queries over the generator's vocabulary: heavy code
# keywords (dense posting lists — the WAND win case), mid/rare tail tokens,
# and lang-correlated combinations (py-only "def"/"self" + shared "return")
QUERIES = {
    "heavy3": ["def", "return", "import"],
    "heavy+mid": ["def", "tok17", "tok123"],
    "mid3": ["tok5", "tok29", "tok211"],
    "rare+heavy": ["tok4999", "public", "static"],
    "lang-corr": ["self", "lambda", "return"],
    # two project identifiers + a common keyword (repo 0 = java, repo 12 =
    # c; lang cycles repo % 5): θ locks onto the project docs, the common
    # term's rows have rest_other = 0, and ALL viable candidates sit in one
    # repo's docId range — the clustered-id win case ("parseConfig
    # loadSchema return"-style project search)
    "repo+common": ["rid0n0", "rid0n1", "return"],
    "repo+common2": ["rid12n0", "rid12n2", "include"],
}


def audit_index(spark, corpus, idx, n_docs, k):
    import numpy as np

    from search_engine_spark.operators.build import term_stats_from_segments
    from search_engine_spark.operators.rank import Scorer, _daat_segment, query_tfs
    from search_engine_spark.sources.segments import build_index, load_segments

    shutil.rmtree(idx, ignore_errors=True)
    m = build_index(spark, corpus, idx, analyzer="naive", n_batches=1,
                    num_segments=8, heavy_threshold=n_docs // 20)
    segs = load_segments(spark, idx)
    nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]
    scorer = Scorer("bm25")
    tstats = term_stats_from_segments(segs)
    report = {}
    for name, q in QUERIES.items():
        qtfs = query_tfs(q, "naive")
        rows = tstats.where(tstats.term.isin(list(qtfs))).collect()
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
    shutil.rmtree(idx, ignore_errors=True)
    return report


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import synthetic_corpus

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    per_scheme = {}
    # dense = exact 0..n-1 ids in (repo, path, commit) order (the stated
    # 10^12-file mode, corpus.dense_doc_ids) — repo runs stay contiguous,
    # so project-scoped queries should prune like clustered-hash ids do
    for scheme, clustered, dense in (
        ("uniform", False, False),
        ("clustered", True, False),
        ("dense", False, True),
    ):
        src = tempfile.mkdtemp(prefix=f"wand_src_{scheme}_")
        shutil.rmtree(src, ignore_errors=True)
        synthetic_corpus(
            spark, n_docs=n_docs, vocab_size=20000, partitions=32,
            clustered_ids=clustered, dense_ids=dense,
        ).write.parquet(src)
        idx = tempfile.mkdtemp(prefix=f"wand_idx_{scheme}_")
        per_scheme[scheme] = audit_index(
            spark, spark.read.parquet(src), idx, n_docs, k
        )
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()
    queries = {
        name: {scheme: per_scheme[scheme][name] for scheme in per_scheme}
        for name in QUERIES
    }
    print(json.dumps({"n_docs": n_docs, "k": k, "queries": queries}))


if __name__ == "__main__":
    main()
