"""Bucketized serving cache: cached scoring must be bit-identical to the
in-plan batch path, and a stale cache must refuse to serve."""

import pytest

from search_engine_spark.operators import rank as R
from search_engine_spark.operators.serving import (
    ServingCacheStale,
    load_serving_cache,
    prepare_serving_cache,
    score_queries_cached,
)
from search_engine_spark.sources import segments as S
from search_engine_spark.sources.segments import load_term_stats_pdf
from tests.conftest import corpus_from_texts

DOCS = [
    "spark scan table scan filter join",
    "table a b c d e scan",
    "scan table",
    "join filter spark spark",
    "table x scan y table z z scan",
    "apple rotten apple",
    "def import tok1 tok2",
    "import tok1",
]


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    idx, cdir = str(root / "idx"), str(root / "cache")
    corpus = corpus_from_texts(spark, DOCS)
    m = S.build_index(spark, corpus, idx, analyzer="naive", n_batches=2)
    cache = prepare_serving_cache(spark, idx, cdir, n_buckets=4)
    return idx, cache, m


def _rows(df):
    return sorted((r.qid, r.docId, round(r.score, 12)) for r in df.collect())


def test_cached_matches_in_plan(spark, served):
    idx, cache, m = served
    segs, stats = S.load_segments(spark, idx), load_term_stats_pdf(idx)
    nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]
    queries = {
        0: ["scan", "table"],
        1: ["apple"],
        2: ["import", "tok1"],
        3: ["zzz_absent"],
        4: ["spark", "spark", "join"],
    }
    for ties in ("desc", "asc"):
        for sc in (R.Scorer("bm25"), R.Scorer("tfidf_cosine")):
            a = _rows(score_queries_cached(
                spark, cache, stats, queries, scorer=sc, k=3,
                analyzer="naive", ties=ties))
            b = _rows(R.score_queries_daat_batch(
                spark, segs, stats, queries, nd, avg, sc, k=3,
                analyzer="naive", ties=ties,
                docid_span=(m["stats"]["docid_lo"], m["stats"]["docid_hi"])))
            assert a == b and a
    # meta round-trips through disk
    reloaded = load_serving_cache(cache["cache_dir"])
    assert reloaded["generation"] == cache["generation"]
    a2 = _rows(score_queries_cached(
        spark, reloaded, stats, {0: ["scan"]}, analyzer="naive"))
    assert a2


def test_cached_deleted_mask(spark, served):
    idx, cache, m = served
    import numpy as np

    stats = load_term_stats_pdf(idx)
    # tombstone docs 0 and 4 via the explicit array (no manifest commit)
    dead = np.array(sorted([0, 4]), dtype=np.int64)
    got = _rows(score_queries_cached(
        spark, cache, stats, {0: ["scan"]}, analyzer="naive", deleted=dead))
    assert got and all(d not in (0, 4) for _, d, _ in got)


def test_stale_cache_refuses(spark, served, tmp_path_factory):
    idx, cache, m = served
    from search_engine_spark.operators.delete import add_tombstones

    stats = load_term_stats_pdf(idx)
    ids = spark.createDataFrame([(2,)], "docId long")
    add_tombstones(spark, idx, ids)  # bumps the manifest generation
    with pytest.raises(ServingCacheStale):
        score_queries_cached(spark, cache, stats, {0: ["scan"]}, analyzer="naive")
    # explicit opt-out still serves (caller owns the consistency trade)
    got = _rows(score_queries_cached(
        spark, cache, stats, {0: ["scan"]}, analyzer="naive",
        check_generation=False))
    assert got
    # re-prepare picks up the new generation and serves again
    cache2 = prepare_serving_cache(
        spark, idx, str(tmp_path_factory.mktemp("serve2") / "cache"),
        n_buckets=4)
    got2 = _rows(score_queries_cached(
        spark, cache2, stats, {0: ["scan"]}, analyzer="naive"))
    assert got2


def test_fielded_cache_meta_uses_content_avgdl(spark, tmp_path_factory):
    """On a fielded index the cache meta's default avgdl must be the content
    field's own (manifest avgdl_by_field['']), not the global mix — and
    cached scoring with defaults must equal the in-plan path scored with the
    content avgdl."""
    root = tmp_path_factory.mktemp("fielded_cache")
    idx = str(root / "idx")
    corpus = corpus_from_texts(spark, DOCS)
    m = S.build_index(
        spark, corpus, idx, analyzer="naive", n_batches=1,
        fields={"lang": "naive"},
    )
    content_avgdl = m["stats"]["avgdl_by_field"][""]
    assert content_avgdl != m["stats"]["avgdl"]  # fields shift the global mix
    cache = prepare_serving_cache(spark, idx, str(root / "cache"), n_buckets=2)
    assert abs(cache["avgdl"] - content_avgdl) < 1e-12
    segs, stats = S.load_segments(spark, idx), load_term_stats_pdf(idx)
    queries = {0: ["scan", "table"]}
    a = _rows(score_queries_cached(spark, cache, stats, queries, k=5,
                                   analyzer="naive"))
    b = _rows(R.score_queries_daat_batch(
        spark, segs, stats, queries, m["stats"]["n_docs"], content_avgdl,
        R.Scorer(), k=5, analyzer="naive",
        docid_span=(m["stats"]["docid_lo"], m["stats"]["docid_hi"])))
    assert a == b and a
