"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its corpus is assumed clean) — these are the
standard web-scale companions of an index build (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding near-dup), all expressed with JVM-side built-ins
so they stay inside whole-stage codegen and can be mirrored 1:1 in ANSI SQL
for the DuckDB oracle.

Cross-engine hash primitive: ``h64(s) = int64(md5(s)[:15 hex])`` — identical
in Spark (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::int64``); 60 bits, never negative.

Scale notes: every operator is a hash-partitioned groupBy/join (no
cross-join anywhere); LSH band buckets bound candidate-pair fan-out; the
pair join is bucket-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def h64(col: Column) -> Column:
    """Deterministic 60-bit int hash, DuckDB-mirrorable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_expr(col: Column) -> Column:
    """Whitespace tokens (naive analyzer shape, oracle-mirrorable)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def ngrams_expr(toks: Column, n: int) -> Column:
    """ALL word n-grams of a token array, duplicates kept (multiset — what
    repetition measures need; :func:`shingles_expr` distincts for set
    semantics). Docs shorter than ``n`` tokens yield an empty array —
    Spark's ``sequence(1, 0)`` counts DOWN (yielding ``[1, 0]`` and an
    invalid ``slice(…, 0, n)``), so the short case is guarded explicitly."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def shingles_expr(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (sorted for
    deterministic downstream hashing) — the set view of
    :func:`ngrams_expr`."""
    return F.array_sort(F.array_distinct(ngrams_expr(toks, n)))


def exact_dedup(df: DataFrame, text: str = "content", id_col: str = "docId") -> DataFrame:
    """Exact dedup by content hash: one row per distinct content, keeper =
    min id, plus duplicate count. Hash-groupBy — one shuffle."""
    return (
        df.select(F.md5(F.col(text)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_dups"),
        )
    )


# Universal-hash mixing for MinHash: ONE md5 per shingle, then num_hashes
# cheap affine mixes mh_j = (a_j*h + b_j) mod P. P < 2^30 keeps a_j*h < 2^60
# — no int64 overflow in either Spark (wrapping) or DuckDB (erroring).
#
# Collision knee of the ~2^30 base hash space: a doc with s distinct shingles
# sees expected s^2/2P internal collisions, ~2^-15 * (s/2^7.5)^2 — negligible
# below ~2^15 (32k) shingles/doc, then a slowly growing upward bias on the
# estimated Jaccard (collisions merge shingles, inflating similarity and LSH
# candidate recall — a safe direction for dedup). If very large documents
# dominate a corpus, combine two independent mod-P mixes per hash (j and
# j+num_hashes) into a 60-bit value; the oracle-mirrorable form stays.
MINHASH_P = 1_073_741_789  # largest prime < 2^30 + 35 headroom (2^30 - 35)


def minhash_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) for the universal-hash family — shared
    verbatim by the Spark expressions and the DuckDB oracle SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MINHASH_P)), int(rng.integers(0, MINHASH_P)))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text: str = "content", id_col: str = "docId",
    num_hashes: int = 12, shingle_n: int = 3,
) -> DataFrame:
    """MinHash: sig_j(doc) = min over shingles of ((a_j*h64(sh) + b_j) mod P).

    One md5 per (doc, shingle) — NOT one per (doc, shingle, j) — then
    ``num_hashes`` affine mixes folded per row with ``array_min``/
    ``transform``. No explode, no shuffle, no UDF: the whole signature is a
    per-row JVM projection (docs with zero shingles drop out, matching the
    previous grouped semantics).
    """
    from ._parallel import ensure_parallelism

    sh = shingles_expr(tokens_expr(F.col(text)), shingle_n)
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col), sh.alias("_sh"))
        .where(F.size("_sh") > 0)
        .select(
            F.col(id_col),
            F.transform("_sh", lambda s: F.pmod(h64(s), F.lit(MINHASH_P))).alias("_hs"),
        )
    )
    mins = [
        F.array_min(
            F.transform("_hs", lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)))
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return base.select(F.col(id_col), *mins)


def lsh_buckets(
    sigs: DataFrame, id_col: str = "docId", bands: int = 4, rows_per_band: int = 3
) -> DataFrame:
    """Band the signature: bucket = h64(band || sig values). Docs sharing a
    bucket are near-dup candidates.

    Single pass: all bands are computed in one projection and exploded —
    a union of per-band branches would re-run the (md5-heavy) signature
    aggregation once per band.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                h64(
                    F.concat_ws(
                        "_",
                        F.lit(str(b)),
                        *[
                            F.col(f"mh{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(rows).alias("_bb")).select(
        F.col(id_col), F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    )


def candidate_pairs(
    buckets: DataFrame, id_col: str = "docId", spill_path: str | None = None
) -> DataFrame:
    """Distinct candidate pairs (a < b) from shared LSH buckets. The
    self-join is bucket-local (equi-join on band+bucket).

    The bucket relation is materialized first: it is tiny (id, band, bucket)
    but its lineage is the full shingle->minhash pipeline, which a self-join
    would otherwise execute twice. ``spill_path=None`` uses localCheckpoint
    (single-app, executor-resident — fine locally); at cluster scale pass a
    durable ``spill_path`` so the materialization is a restartable parquet
    table rather than executor block storage that dies with the app.
    """
    if spill_path is not None:
        buckets.write.mode("overwrite").parquet(spill_path)
        buckets = buckets.sparkSession.read.parquet(spill_path)
    else:
        buckets = buckets.localCheckpoint(eager=True)
    a = buckets.select("band", "bucket", F.col(id_col).alias("a"))
    b = buckets.select("band", "bucket", F.col(id_col).alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, text: str = "content", id_col: str = "docId",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingles_expr(tokens_expr(F.col(text)), shingle_n).alias("_sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("_id", "a").withColumnRenamed("_sh", "sha"), "a")
        .join(sh.withColumnRenamed("_id", "b").withColumnRenamed("_sh", "shb"), "b")
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size(F.array_union("sha", "shb"))
    return j.select(
        "a",
        "b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def simhash(
    df: DataFrame, text: str = "content", id_col: str = "docId", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint: bit b set iff Σ_tokens (±1 per token occurrence,
    + if bit b of h64(token) set) >= 0. Explode -> one groupBy with `bits`
    conditional sums — no UDF, oracle-mirrorable."""
    from ._parallel import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens_expr(F.col(text))).alias("t")
    ).withColumn("h", h64(F.col("t")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    g = ex.groupBy(id_col).agg(*aggs)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return g.select(F.col(id_col), sim.cast("long").alias("simhash"))


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 42,
    n_tables: int = 1, max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup candidates: random-hyperplane LSH bucket
    join, then exact cosine filter within buckets.

    Scale levers (all default to the single-table toy config so small runs
    and the cross-engine oracle are unchanged):

    - ``n_planes``: size via :func:`similarity.planes_for_corpus` — the
      bucket-local self-join is O(Σ bucket²), so the bucket count must grow
      with the corpus, not stay fixed.
    - ``n_tables`` > 1: banding. Each table hashes with independent planes
      (seed+t); a pair is a candidate if it collides in ANY table — the
      recall lever that makes many-plane (small-bucket) configs usable.
      Cross-table duplicate pairs are deduped BEFORE the cosine filter.
    - ``max_bucket``: drop buckets wider than this before the self-join
      (documented recall tradeoff: a monster bucket is O(width²) pairs and
      at web scale is almost always a degenerate cluster — cap it, count
      it, move on). At 10⁹ vectors this bounds the worst reducer.
    """
    from .similarity import hyperplane_bucket

    tabs = [
        emb.select(
            F.col(id_col), F.col(vec_col), F.lit(t).alias("tbl"),
            hyperplane_bucket(
                F.col(vec_col), n_planes=n_planes, seed=seed + t
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    e = tabs[0]
    for t in tabs[1:]:
        e = e.unionByName(t)
    if max_bucket is not None:
        wide = (
            e.groupBy("tbl", "bucket")
            .agg(F.count("*").alias("_w"))
            .where(F.col("_w") > max_bucket)
            .select("tbl", "bucket")
        )
        e = e.join(F.broadcast(wide), ["tbl", "bucket"], "left_anti")
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "tbl", "bucket")
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "tbl", "bucket")
    pairs = a.join(b, ["tbl", "bucket"]).where(F.col("a") < F.col("b"))
    if n_tables > 1:
        pairs = pairs.dropDuplicates(["a", "b"])
    return pairs.select("a", "b", _cos("va", "vb").alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def _cos(a: str, b: str):
    from .similarity import cosine_expr

    return cosine_expr(F.col(a), F.col(b))


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "docId",
    a: str = "a", b: str = "b", max_iter: int = 25,
) -> DataFrame:
    """Assign every document a duplicate-cluster id from candidate pairs
    (the output of :func:`candidate_pairs` / :func:`embedding_near_dups`),
    plus the keep/drop decision a training-data pipeline acts on.

    Connected components by iterative min-label propagation over the
    symmetric edge list: ``lbl(v) <- min(lbl(v), min_{(v,u) in E} lbl(u))``
    until a fixpoint; ``cluster_id`` = the component's minimum doc id and
    ``keep`` = (doc == cluster_id). Docs in no pair are singletons —
    ``cluster_id = doc_id, keep = true`` — closed with ONE left join at the
    end, so the iteration only ever touches docs that appear in a pair
    (at web scale the dup graph is a small fraction of the corpus; the
    100 TB cost is the pair generation, not this).

    Scale posture: each round is one equi-join + one min-groupBy on the
    edge partitioning (2 shuffles over |E|, with map-side partial min);
    lineage is cut every round with an eager localCheckpoint so the plan
    stays O(1) deep, and convergence is a cheap count on the checkpointed
    frame. Rounds needed = max component diameter — near-dup clusters are
    shallow (stars/cliques around a popular page), so this converges in a
    handful of rounds; for adversarial chain-shaped graphs swap in
    pointer-jumping (large-star/small-star, O(log D) rounds) — same
    per-round shuffle shape.
    """
    edges = (
        pairs.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .union(pairs.select(F.col(b).alias("s"), F.col(a).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.select(F.col("id").alias("d"), "lbl"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        nxt = (
            labels.join(nbr.withColumnRenamed("s", "id"), "id", "left")
            .select(
                "id",
                F.col("lbl").alias("_old"),
                F.least("lbl", F.coalesce("nbr_min", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where(F.col("lbl") != F.col("_old")).count()
        labels = nxt.select("id", "lbl")
        if changed == 0:
            break
    clustered = labels.select(
        F.col("id").alias(id_col), F.col("lbl").alias("cluster_id")
    )
    return (
        df.select(id_col)
        .join(clustered, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
    )


def canonical_pick(
    clusters: DataFrame, scores: DataFrame, id_col: str = "docId",
    score_col: str = "score",
) -> DataFrame:
    """Re-pick each cluster's keeper by a quality score instead of min id:
    keep the highest-``score_col`` doc per cluster (ties -> lowest id).

    One shuffle on ``cluster_id``; the per-cluster max is a plain agg (no
    window over the whole corpus), then a broadcast-friendly semi-join back.
    """
    j = clusters.join(scores.select(id_col, score_col), id_col, "left").withColumn(
        score_col, F.coalesce(score_col, F.lit(float("-inf")))
    )
    best = j.groupBy("cluster_id").agg(
        F.max(F.struct(F.col(score_col), (-F.col(id_col)).alias("_negid"))).alias("_b")
    ).select(
        "cluster_id", (-F.col("_b._negid")).alias("_keep_id")
    )
    return (
        j.join(best, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("_keep_id")).alias("keep"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text: str = "content",
    id_col: str = "docId",
    ngram_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share ANY word
    ``ngram_n``-gram with a held-out benchmark set — the standard
    train/test-overlap removal step of an LLM data pipeline (the GPT-3
    appendix-C / 13-gram-overlap family; ``ngram_n`` defaults lower because
    it is tuned per corpus).

    Returns one row per corpus doc: ``(id, n_hit_ngrams, contaminated)``
    where ``n_hit_ngrams`` counts the doc's DISTINCT n-grams that appear in
    the benchmark.

    Scale shape: the benchmark side is small by definition — its distinct
    n-gram hash set builds with one partial+final agg and BROADCASTS, so
    the 100 TB corpus side is scan → per-row shingle expression → explode →
    broadcast hash semi-join → one count agg keyed by doc id. No shuffle of
    corpus text, no corpus-×-benchmark join, no windows; corpus rows with
    zero hits are restored by a left join against the (tiny) hit counts.
    """
    sh = shingles_expr(tokens_expr(F.col(text)), ngram_n)
    bench_grams = (
        benchmark.select(F.explode(sh).alias("_g"))
        .select(h64(F.col("_g")).alias("_gh"))
        .distinct()
    )
    hits = (
        corpus.select(F.col(id_col), F.explode(sh).alias("_g"))
        .select(id_col, h64(F.col("_g")).alias("_gh"))
        .join(F.broadcast(bench_grams), "_gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hit_ngrams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_ngrams", F.lit(0).cast("long")).alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
