"""PageRank parity vs a plain-python implementation of the reference update
(IcsSearchEngine.java:74-146) + combined-search tie-break (ICS:184-199)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.pagerank import (
    combined_search,
    compute_pagerank,
    pagerank_scores,
)

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 3), (4, 1), (1, 4),
]
N = 5


def reference_pagerank(n, edges, iters, d=0.85):
    """Literal transcription of the reference loop semantics: PR=1.0 init,
    PR_i = (1-d) + d*sum(PR_j/outdeg_j), dangling mass dropped, then
    (PR-min)/max normalization (ICS:88,114-130,143-145)."""
    out: dict[int, list[int]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    pr = {i: 1.0 for i in range(n)}
    for _ in range(iters):
        nxt = {i: 1.0 - d for i in range(n)}
        for s, ts in out.items():
            share = pr[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        pr = nxt
    lo, hi = min(pr.values()), max(pr.values())
    return {i: (v - lo) / hi for i, v in pr.items()}


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_pagerank_matches_reference_loop(spark, iters):
    nodes = spark.createDataFrame([(i,) for i in range(N)], "docId long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r.docId: r.pagerank
        for r in compute_pagerank(nodes, edges, num_iterations=iters, checkpoint_every=3).collect()
    }
    exp = reference_pagerank(N, EDGES, iters)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-12, (i, got[i], exp[i])


def test_pagerank_scores_order(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], "docId long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    pr = compute_pagerank(nodes, edges, num_iterations=10)
    rows = pagerank_scores(pr).collect()
    vals = [r.pagerank for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_combined_search_weight_and_ties(spark):
    # equal tfidf scores => ties broken by ascending docId (ICS:197, IIM:1103-1114)
    tfidf = spark.createDataFrame([(3, 1.0), (1, 1.0), (2, 2.0)], "docId long, score double")
    pr = spark.createDataFrame([(1, 0.5), (2, 0.0), (3, 0.5)], "docId long, pagerank double")
    rows = combined_search(tfidf, pr, k=3, weight=2.0).collect()
    # scores: doc1 = 1+1=2, doc2 = 2+0=2, doc3 = 1+1=2 -> all tied, asc docId
    assert [r.docId for r in rows] == [1, 2, 3]
    # missing PR entries coalesce to 0
    pr2 = spark.createDataFrame([(2, 1.0)], "docId long, pagerank double")
    rows2 = combined_search(tfidf, pr2, k=1, weight=10.0).collect()
    assert rows2[0].docId == 2


def test_combined_search_on_real_scores(spark, tmp_path):
    """tfidf matchesOnly=false + w*PR end-to-end (the ICS searchQuery shape)."""
    from tests.conftest import corpus_from_texts

    from search_engine_spark.operators.rank import Scorer, score_query
    from search_engine_spark.sources.segments import (
        build_index,
        decode_postings,
        load_segments,
        load_term_stats,
    )

    texts = [
        "apple banana cherry",
        "apple apple date",
        "banana cherry date egg",
        "fig grape apple banana",
    ]
    corpus = corpus_from_texts(spark, texts)
    idx = str(tmp_path / "idx")
    m = build_index(spark, corpus, idx, analyzer="naive", num_segments=4)
    dec = decode_postings(load_segments(spark, idx))
    scores = score_query(
        spark, dec, load_term_stats(spark, idx), ["apple", "banana"],
        m["stats"]["n_docs"], m["stats"]["avgdl"],
        Scorer("tfidf_cosine"), k=None, analyzer="naive", ties="asc",
    )
    nodes = corpus.select("docId")
    edge_list = [(0, 1), (2, 1), (3, 1), (1, 0)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    pr = compute_pagerank(nodes, edges, num_iterations=10)
    top = combined_search(scores, pr, k=2, weight=3.0).collect()
    # expected = tfidf + w*PR with PR from the reference loop semantics
    exp_pr = reference_pagerank(4, edge_list, 10)
    exp_tfidf = {r.docId: r.score for r in scores.collect()}
    exp = sorted(
        ((d, s + 3.0 * exp_pr.get(d, 0.0)) for d, s in exp_tfidf.items()),
        key=lambda it: (-it[1], it[0]),
    )[:2]
    assert [(r.docId, pytest.approx(r.score, abs=1e-9)) for r in top] == exp
