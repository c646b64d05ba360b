"""Index fsck: a healthy index audits clean; every tampered invariant is
detected. Tampering happens at the storage layer (rewriting batch parquet /
term_stats / manifest) — exactly the corruptions a crashed or buggy writer
would leave behind."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import add_tombstones
from search_engine_spark.operators.fsck import fsck_index, fsck_segments
from search_engine_spark.sources.segments import batch_path, build_index, load_segments
from tests.conftest import corpus_from_texts

TEXTS = [
    f"alpha beta {'gamma ' * (1 + i % 4)}delta epsilon doc{i}" for i in range(60)
]


@pytest.fixture()
def built(spark, tmp_index):
    m = build_index(spark, corpus_from_texts(spark, TEXTS), tmp_index,
                    analyzer="naive", n_batches=2, num_segments=4, n_salts=2)
    return spark, tmp_index, m


def _rewrite_batch(spark, idx, key, mutate):
    """Read batch=key, apply ``mutate(df) -> df``, atomically swap it in."""
    d = batch_path(idx, key)
    df = mutate(spark.read.parquet(d)).persist()
    df.count()
    tmp = d + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    df.unpersist()
    shutil.rmtree(d)
    os.replace(tmp, d)


def test_healthy_index_ok(built):
    spark, idx, m = built
    rep = fsck_index(spark, idx, deep=True)
    assert rep["ok"], rep
    assert rep["violations"] == {}
    assert rep["n_batches"] == 2
    assert rep["npostings"] == m["stats"]["npostings"]
    assert rep["term_stats_mismatches"] == 0


def test_healthy_with_tombstones(built):
    spark, idx, m = built
    add_tombstones(spark, idx,
                   spark.createDataFrame([(0,), (3,), (7,)], "docId long"))
    rep = fsck_index(spark, idx, deep=False)
    assert rep["ok"], rep
    assert rep["n_tombstones"] == 3


def test_detects_block_max_tf_tamper(built):
    spark, idx, m = built
    _rewrite_batch(spark, idx, "0", lambda df: df.withColumn(
        "block_max_tf",
        F.when(F.col("term") == "gamma",
               F.transform("block_max_tf", lambda x: (x + 1).cast("int")))
        .otherwise(F.col("block_max_tf"))))
    rep = fsck_index(spark, idx, deep=True)
    assert not rep["ok"]
    assert rep["violations"].get("block_max_tf", 0) >= 1
    assert any(s["term"] == "gamma" for s in rep["violation_sample"])


def test_detects_summary_tamper(built):
    spark, idx, m = built
    _rewrite_batch(spark, idx, "1", lambda df: df
                   .withColumn("sum_tf", (F.col("sum_tf") + 2).cast("long"))
                   .withColumn("min_docid", (F.col("min_docid") - 1).cast("long")))
    v = {r["kind"] for r in fsck_segments(load_segments(spark, idx)).collect()}
    assert "sum_tf" in v and "min_docid" in v


def test_detects_ndocs_tamper(built):
    spark, idx, m = built
    _rewrite_batch(spark, idx, "0", lambda df: df.withColumn(
        "ndocs", (F.col("ndocs") + 1).cast("int")))
    rep = fsck_index(spark, idx, deep=True)
    assert not rep["ok"]
    assert rep["violations"].get("ndocs_mismatch", 0) >= 1


def test_detects_stale_term_stats(built):
    spark, idx, m = built
    ts_dir = os.path.join(idx, "term_stats")
    df = spark.read.parquet(ts_dir)
    tampered = df.withColumn(
        "df", F.when(F.col("term") == "alpha", F.col("df") + 1)
        .otherwise(F.col("df")).cast("long")).persist()
    tampered.count()
    shutil.rmtree(ts_dir)
    tampered.write.parquet(ts_dir)
    tampered.unpersist()
    rep = fsck_index(spark, idx, deep=False)
    assert not rep["ok"]
    assert rep["term_stats_mismatches"] == 1


def test_detects_manifest_stats_tamper(built):
    spark, idx, m = built
    mp = os.path.join(idx, "manifest.json")
    with open(mp) as f:
        man = json.load(f)
    man["stats"]["n_docs"] += 5
    with open(mp, "w") as f:
        json.dump(man, f)
    rep = fsck_index(spark, idx, deep=False)
    assert not rep["ok"]
    assert any("manifest_stats" in e for e in rep["errors"])


def test_warns_on_orphan_batch(built):
    spark, idx, m = built
    os.makedirs(os.path.join(idx, "segments", "batch=zz"))
    rep = fsck_index(spark, idx, deep=False)
    assert rep["ok"]  # orphans are tolerated by design
    assert any("orphan_batch_dir" in w for w in rep["warnings"])


def test_missing_batch_dir_is_error(built):
    spark, idx, m = built
    shutil.rmtree(batch_path(idx, "1"))
    rep = fsck_index(spark, idx, deep=False)
    assert not rep["ok"]
    assert any("missing_batch_dir" in e for e in rep["errors"])


def test_cli_roundtrip(built, capsys):
    spark, idx, m = built
    from jobs.fsck import main

    assert main(["--index", idx]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["violations"] == {}


def test_membership_index_audits_and_detects_tamper(spark, tmp_index):
    """Membership (tf/dl-free) rows audit clean under the tf=1 reading, and
    fsck still catches metadata tampering on them: a rewritten block_max_tf
    contradicts the synthesized all-ones tf stream."""
    build_index(spark, corpus_from_texts(spark, TEXTS), tmp_index,
                analyzer="trigram", with_positions=False, membership=True,
                n_batches=2, num_segments=4, n_salts=2)
    rep = fsck_index(spark, tmp_index, deep=True)
    assert rep["ok"], rep
    _rewrite_batch(spark, tmp_index, "0", lambda df: df.withColumn(
        "block_max_tf",
        F.transform("block_max_tf", lambda x: (x + 1).cast("int"))))
    rep = fsck_index(spark, tmp_index, deep=True)
    assert not rep["ok"]
    assert rep["violations"].get("block_max_tf", 0) >= 1
    # sum_tf tamper: membership sum_tf must equal ndocs
    build2 = str(tmp_index) + "_2"
    build_index(spark, corpus_from_texts(spark, TEXTS), build2,
                analyzer="trigram", with_positions=False, membership=True,
                n_batches=1, num_segments=2, n_salts=2)
    _rewrite_batch(spark, build2, "0", lambda df: df.withColumn(
        "sum_tf", (F.col("sum_tf") + 1).cast("long")))
    rep2 = fsck_index(spark, build2, deep=True)
    assert not rep2["ok"] and rep2["violations"].get("sum_tf", 0) >= 1
    shutil.rmtree(build2, ignore_errors=True)
