"""Iceberg-shaped read gate (north-rule input: a CATALOG TABLE of
``(repo, path, commit, lang, content)``, BASELINE.json ``input_hint``).

Proves the whole build pipeline runs off ``spark.read.table`` unchanged:
register the corpus as a catalog table, build an index from the table
reader, and require byte-level equality of the resulting segments (and
rank-identical BM25 top-k) against the path-based build. With an Iceberg
catalog configured the same ``spark.read.table`` call reads a real Iceberg
table; this sandbox ships no iceberg-spark-runtime jar, so the session
catalog's parquet provider stands in — identical reader surface.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources.corpus import (
    load_corpus_table,
    register_corpus_table,
    synthetic_corpus,
)
from search_engine_spark.sources.segments import (
    build_index,
    load_segments,
    load_term_stats,
)


@pytest.fixture()
def catalog_corpus(spark, tmp_path):
    corpus = synthetic_corpus(spark, n_docs=250, vocab_size=600, seed=11)
    register_corpus_table(spark, corpus, table="code_corpus_gate")
    yield corpus
    spark.sql("DROP TABLE IF EXISTS code_corpus_gate")


def test_catalog_table_round_trip(spark, catalog_corpus):
    """Table reader returns the same rows, docIds, and content sha256 as the
    in-memory corpus (per-row invariant of the input_hint)."""
    back = load_corpus_table(spark, "code_corpus_gate")
    assert back.columns == list(catalog_corpus.columns)
    a = {r.docId: r.content_sha256 for r in catalog_corpus.collect()}
    b = {r.docId: r.content_sha256 for r in back.collect()}
    assert a == b


def test_catalog_table_missing_columns(spark):
    spark.createDataFrame([("x", "y")], "repo string, path string").write.mode(
        "overwrite"
    ).saveAsTable("bad_corpus_gate")
    try:
        with pytest.raises(ValueError, match="north-rule columns"):
            load_corpus_table(spark, "bad_corpus_gate")
    finally:
        spark.sql("DROP TABLE IF EXISTS bad_corpus_gate")


def test_build_from_catalog_table_equals_path_build(spark, catalog_corpus, tmp_path):
    """build_index(load_corpus_table(...)) == build_index(parquet path) —
    same manifest stats, byte-identical packed segment rows, identical BM25
    top-k through the DAAT path."""
    from search_engine_spark.operators.rank import Scorer, score_query_daat

    pq = str(tmp_path / "corpus_pq")
    catalog_corpus.write.parquet(pq)

    idx_a, idx_b = str(tmp_path / "idx_table"), str(tmp_path / "idx_path")
    kw = dict(analyzer="naive", n_batches=1, num_segments=4, heavy_threshold=None)
    m_a = build_index(spark, load_corpus_table(spark, "code_corpus_gate"), idx_a, **kw)
    m_b = build_index(spark, spark.read.parquet(pq), idx_b, **kw)
    assert m_a["stats"] == m_b["stats"]

    cols = ["term", "salt", "ndocs", "docids", "tfs", "dls"]
    rows_a = {
        (r.term, r.salt): (r.ndocs, bytes(r.docids), bytes(r.tfs), bytes(r.dls))
        for r in load_segments(spark, idx_a).select(cols).collect()
    }
    rows_b = {
        (r.term, r.salt): (r.ndocs, bytes(r.docids), bytes(r.tfs), bytes(r.dls))
        for r in load_segments(spark, idx_b).select(cols).collect()
    }
    assert rows_a == rows_b

    q = ["def", "apple", "tok7"]
    nd, avg = m_a["stats"]["n_docs"], m_a["stats"]["avgdl"]
    top_a = score_query_daat(
        spark, load_segments(spark, idx_a), load_term_stats(spark, idx_a),
        q, nd, avg, Scorer("bm25"), k=10, analyzer="naive",
    ).collect()
    top_b = score_query_daat(
        spark, load_segments(spark, idx_b), load_term_stats(spark, idx_b),
        q, nd, avg, Scorer("bm25"), k=10, analyzer="naive",
    ).collect()
    assert [(r.docId, r.score) for r in top_a] == [(r.docId, r.score) for r in top_b]
    for p in (idx_a, idx_b, pq):
        shutil.rmtree(p, ignore_errors=True)


def test_build_index_job_from_table(spark, tmp_path):
    """spark-submit entry point accepts --format table (catalog-table input)."""
    from jobs.build_index import main

    corpus = synthetic_corpus(spark, n_docs=120, vocab_size=300, seed=5)
    register_corpus_table(spark, corpus, table="code_corpus_job_gate")
    out = str(tmp_path / "idx_job")
    try:
        rc = main(
            [
                "--input", "code_corpus_job_gate", "--output", out,
                "--format", "table", "--analyzer", "naive", "--batches", "1",
            ]
        )
        assert rc == 0
        stats = load_term_stats(spark, out)
        assert stats.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS code_corpus_job_gate")
        shutil.rmtree(out, ignore_errors=True)
