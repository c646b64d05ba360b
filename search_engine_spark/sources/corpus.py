"""Corpus sources (reference operators S1-S7).

Two entry points:

- :func:`synthetic_corpus` — deterministic generator of the north-rule input
  shape ``(repo, path, commit, lang, content)`` (BASELINE.json
  ``input_hint``; FIXTURES.md F1). Seeded, Zipf-distributed vocabulary so
  heavy terms exist (skew handling is exercised), plus embedded English
  sentences from the reference ranking fixtures so analyzer goldens appear
  in real rows. Content derives purely from ``(repo, path, commit)`` — byte
  identical across re-generation, any partitioning, and resume.

- :func:`load_documents` — adapter for the driver-provided
  ``documents.parquet`` testdata table ``(doc_id, text, lang, ...)`` onto the
  corpus shape.

DocIDs (reference: per-segment dense ints, ``InvertedIndexManager.java:75-77``)
are global and deterministic here: a collision-checked 64-bit hash of
``repo:path:commit`` (SURVEY.md §1.1), *not* an insertion counter — Spark has
no insertion order, and resumable builds must not depend on partitioning.

Reference scan citations: directory scan ``IcsSearchEngine.java:50-68``; doc
store scans ``MapdbDocStore.java:103-120`` — all replaced by parquet reads +
Catalyst column pruning.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

_LANGS = ("java", "py", "c", "md", "txt")
_EXT = {"java": "java", "py": "py", "c": "c", "md": "md", "txt": "txt"}

# Reference ranking fixture sentences (Team8TfIdfTest.java:37-41,
# Team11PhraseSearchTest.java:25-33) — embedded so rank goldens appear in
# generated corpora too.
FIXTURE_SENTENCES = (
    "An apple a day keeps a doctor away",
    "One rotten apple spoils the whole barrel",
    "Fortune knocks once at everyone's rotten door",
)

# Zipf-ish vocabulary: a few extremely heavy code terms + a long tail.
_HEAVY = (
    "def import return class public static void int string self "
    "include printf null new for while else break"
).split()


def doc_id_expr(repo="repo", path="path", commit="commit"):
    """Deterministic 63-bit docId from (repo, path, commit).

    xxhash64 is a stable Spark built-in; masked to non-negative. Collision
    probability at 10^12 docs is ~2.7e-2 per birthday bound on 63 bits —
    :func:`check_docid_collisions` verifies per-corpus; on a collision the
    salt can be bumped. JVM-side, no Python.
    """
    return F.xxhash64(F.col(repo), F.col(path), F.col(commit)).bitwiseAND(
        F.lit(0x7FFFFFFFFFFFFFFF)
    )


def check_docid_collisions(corpus: DataFrame) -> int:
    """Returns number of colliding docIds (expect 0)."""
    return (
        corpus.groupBy("docId")
        .count()
        .where(F.col("count") > 1)
        .count()
    )


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Attach `docId` and `content_sha256` (per-row invariant vs the source,
    BASELINE.json input_hint)."""
    return corpus.withColumn("docId", doc_id_expr()).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )


def _gen_rows(start: int, end: int, vocab_size: int, seed: int) -> pd.DataFrame:
    """Generate rows [start, end) — pure function of the row index."""
    import numpy as np

    rows = []
    tail = [f"tok{v}" for v in range(vocab_size)]
    for i in range(start, end):
        repo = f"org{i // 50}/repo{i % 50}"
        lang = _LANGS[i % len(_LANGS)]
        path = f"src/m{i % 7}/file_{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        rng = np.random.default_rng(seed * 1_000_003 + i)
        n = int(rng.integers(30, 120))
        # Zipf over the tail vocab + guaranteed heavy terms
        zipf_idx = rng.zipf(1.3, size=n) % vocab_size
        words = [tail[z] for z in zipf_idx]
        heavy_n = int(rng.integers(3, 12))
        words += list(rng.choice(_HEAVY, size=heavy_n))
        if i % 17 == 0:
            words.append(FIXTURE_SENTENCES[i % len(FIXTURE_SENTENCES)])
        perm = rng.permutation(len(words))
        content = " ".join(words[p] for p in perm)
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synthetic_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    vocab_size: int = 5000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: each partition generates its own row
    range via ``mapInPandas`` — no driver-side materialization, scales to any
    n_docs."""
    partitions = partitions or max(1, min(n_docs // 500 + 1, 64))
    bounds = spark.createDataFrame(
        [
            (p, p * n_docs // partitions, (p + 1) * n_docs // partitions)
            for p in range(partitions)
        ],
        StructType(
            [
                StructField("p", IntegerType(), False),
                StructField("start", LongType(), False),
                StructField("end", LongType(), False),
            ]
        ),
    ).repartition(partitions, "p")

    def gen(batches):
        for b in batches:
            for _, r in b.iterrows():
                yield _gen_rows(int(r.start), int(r.end), vocab_size, seed)

    corpus = bounds.mapInPandas(gen, CORPUS_SCHEMA)
    return with_doc_ids(corpus)


NORTH_RULE_COLUMNS = ("repo", "path", "commit", "lang", "content")


def register_corpus_table(
    spark: SparkSession,
    corpus: DataFrame,
    table: str = "code_corpus",
    mode: str = "overwrite",
) -> None:
    """Register a corpus DataFrame as a CATALOG TABLE (``saveAsTable``) so
    downstream reads go through ``spark.read.table`` — the north-rule input
    shape ("Iceberg table of source-code repositories", BASELINE.json
    ``input_hint``). Only the five contract columns are persisted; docIds
    are re-derived on read so the table stays engine-agnostic."""
    corpus.select(*NORTH_RULE_COLUMNS).write.mode(mode).saveAsTable(table)


def load_corpus_table(spark: SparkSession, table: str) -> DataFrame:
    """S1 over a catalog table: the Iceberg-shaped read path.

    ``spark.read.table`` resolves through the session's catalog — with an
    Iceberg catalog configured (``spark.sql.catalog.<name>`` =
    ``org.apache.iceberg.spark.SparkCatalog`` + the iceberg-spark-runtime
    jar, neither shipped in this sandbox) the SAME call reads a real Iceberg
    table with snapshot isolation, partition pruning, and hidden-partition
    pushdown; here the session catalog's parquet provider exercises the
    identical reader surface (catalog resolution -> Catalyst -> columnar
    scan with pushdown/pruning). Columns are validated against the
    north-rule contract and docId/content_sha256 attached exactly as the
    path-based reader does, so ``build_index`` runs off a table unchanged.
    """
    t = spark.read.table(table)
    missing = [c for c in NORTH_RULE_COLUMNS if c not in t.columns]
    if missing:
        raise ValueError(
            f"catalog table {table!r} lacks north-rule columns {missing}; "
            f"expected {NORTH_RULE_COLUMNS}"
        )
    t = t.select(*NORTH_RULE_COLUMNS)
    return with_doc_ids(t)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: driver testdata ``documents.parquet`` -> corpus shape.

    ``doc_id`` is already a stable global id; keep it (rather than hashing)
    so results are directly comparable with the DuckDB oracle.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(F.lit("testdata/"), F.col("source")).alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws(":", "source", "doc_id"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("docId"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )
