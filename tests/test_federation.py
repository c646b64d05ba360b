"""Federated sharded-index search: rank identity vs a single global index.

The invariant under test is the whole point of doc-partitioned sharding
(operators/federation.py): with GLOBAL statistics, per-shard scoring +
merge returns exactly the single-index result — same docIds, same scores —
in both the one-job union shape and the scatter/merge serving shape.
"""

from __future__ import annotations

import shutil

import pytest

from search_engine_spark.operators.federation import (
    build_sharded_index,
    federated_search,
    global_term_stats,
    load_federation,
)
from search_engine_spark.operators.rank import Scorer, score_query_daat
from search_engine_spark.sources.segments import (
    build_index,
    load_segments,
    load_term_stats,
)
from tests.conftest import corpus_from_texts

WORDS = ["merge", "spark", "index", "query", "shard", "delta", "block",
         "score", "posting", "byte"]


def _texts(n: int) -> list[str]:
    # deterministic, df-varied: word i appears in docs where doc % (i+2) == 0
    out = []
    for d in range(n):
        toks = [w for i, w in enumerate(WORDS) if d % (i + 2) == 0]
        out.append(" ".join(toks * (1 + d % 3)) or "filler")
    return out


@pytest.fixture(scope="module")
def fed_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fed")
    single, sharded = str(root / "single"), str(root / "sharded")
    corpus = corpus_from_texts(spark, _texts(120))
    m = build_index(spark, corpus, single, analyzer="naive", n_batches=1,
                    num_segments=4, n_salts=2)
    fed = build_sharded_index(spark, corpus, sharded, n_shards=3,
                              analyzer="naive", n_batches=1,
                              num_segments=4, n_salts=2)
    yield spark, single, sharded, m, fed
    shutil.rmtree(str(root), ignore_errors=True)


def test_global_stats_match_single_index(fed_setup):
    spark, single, sharded, m, fed = fed_setup
    assert fed["stats"]["n_docs"] == m["stats"]["n_docs"]
    assert fed["stats"]["avgdl"] == pytest.approx(m["stats"]["avgdl"])
    g = {r["term"]: (r["df"], r["cf"]) for r in
         global_term_stats(spark, sharded).collect()}
    s = {r["term"]: (r["df"], r["cf"]) for r in
         load_term_stats(spark, single).collect()}
    assert g == s


@pytest.mark.parametrize("mode", ["union", "scatter"])
def test_rank_identity_vs_single_index(fed_setup, mode):
    spark, single, sharded, m, fed = fed_setup
    kw = ["merge", "shard", "byte"]
    want = score_query_daat(
        spark, load_segments(spark, single), load_term_stats(spark, single),
        kw, m["stats"]["n_docs"], m["stats"]["avgdl"],
        Scorer("bm25"), k=20, analyzer="naive", ties="asc",
    ).collect()
    got = federated_search(spark, sharded, kw, k=20, scorer=Scorer("bm25"),
                           ties="asc", mode=mode).collect()
    assert [(r["docId"], r["score"]) for r in got] == \
           [(r["docId"], r["score"]) for r in want]
    assert len(want) == 20


@pytest.mark.parametrize("mode", ["union", "scatter"])
def test_unbounded_k_matches(fed_setup, mode):
    spark, single, sharded, m, fed = fed_setup
    kw = ["posting"]
    want = score_query_daat(
        spark, load_segments(spark, single), load_term_stats(spark, single),
        kw, m["stats"]["n_docs"], m["stats"]["avgdl"],
        Scorer("bm25"), k=None, analyzer="naive", ties="asc",
    ).collect()
    got = federated_search(spark, sharded, kw, k=None, scorer=Scorer("bm25"),
                           ties="asc", mode=mode).collect()
    assert [(r["docId"], r["score"]) for r in got] == \
           [(r["docId"], r["score"]) for r in want]


def test_missing_terms_empty(fed_setup):
    spark, single, sharded, m, fed = fed_setup
    assert federated_search(spark, sharded, ["zzznope"], k=5).count() == 0


def test_rebuild_is_idempotent(fed_setup):
    spark, single, sharded, m, fed = fed_setup
    corpus = corpus_from_texts(spark, _texts(120))
    fed2 = build_sharded_index(spark, corpus, sharded, n_shards=3,
                               analyzer="naive", n_batches=1,
                               num_segments=4, n_salts=2)
    assert fed2["stats"] == load_federation(sharded)["stats"]
    assert fed2["stats"]["n_docs"] == m["stats"]["n_docs"]
