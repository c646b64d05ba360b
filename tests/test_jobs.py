"""spark-submit entry points (jobs/) driven in-process: build, resume, query."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Corpus parquet + built index via the job main()."""
    from jobs.build_index import main as build_main

    from search_engine_spark.sources.corpus import synthetic_corpus

    root = tmp_path_factory.mktemp("jobs")
    src = str(root / "corpus")
    idx = str(root / "index")
    synthetic_corpus(spark, n_docs=120, vocab_size=500, seed=42).write.parquet(src)
    rc = build_main([
        "--input", src, "--output", idx, "--analyzer", "porter",
        "--batches", "2", "--segments", "4", "--master", "local[4]",
    ])
    assert rc == 0
    return src, idx


def test_build_job_manifest(built, spark):
    from search_engine_spark.sources.segments import read_manifest

    _, idx = built
    m = read_manifest(idx)
    assert m["finalized"] and m["stats"]["n_docs"] == 120
    assert len(m["batches"]) == 2


def test_build_job_resume_noop(built, capsys):
    """Re-running the job over a finished index rebuilds nothing."""
    from jobs.build_index import main as build_main

    from search_engine_spark.sources.segments import read_manifest

    src, idx = built
    before = read_manifest(idx)["batches"]
    rc = build_main([
        "--input", src, "--output", idx, "--analyzer", "porter",
        "--batches", "2", "--segments", "4", "--master", "local[4]",
    ])
    assert rc == 0
    after = read_manifest(idx)["batches"]
    assert {k: b["committed_at"] for k, b in before.items()} == {
        k: b["committed_at"] for k, b in after.items()
    }


@pytest.mark.parametrize("mode", ["bm25", "tfidf", "and", "phrase"])
def test_query_job(built, capsys, mode):
    from jobs.query import main as query_main

    _, idx = built
    rc = query_main([
        "--index", idx, "--mode", mode, "--k", "5", "--master", "local[4]",
        "appl", "rotten",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["mode"] == mode and len(out["results"]) <= 5
    if mode in ("bm25", "tfidf") and out["results"]:
        scores = [r["score"] for r in out["results"]]
        assert scores == sorted(scores, reverse=True)
