"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k (the correctness baseline):
  one scan, JVM-side ``aggregate``/``zip_with`` fold (deterministic
  sequential summation -> bit-stable vs the DuckDB oracle), then
  TakeOrderedAndProject. At 100 TB this is the "small query set × full scan"
  path — embarrassingly parallel, no shuffle except the final top-k.
- :func:`lsh_topk` — random-hyperplane LSH bucketing as the scale path:
  candidates = query's bucket only, exact cosine within. Planes derive
  deterministically from a seed so the DuckDB oracle can embed the same
  literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i*b_i as a sequential double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def plane_literals(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (seeded, reproducible in oracle SQL)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in p] for p in planes]


def planes_for_corpus(n_items: int, target_bucket: int = 4096, min_planes: int = 4) -> int:
    """Scale the plane count with corpus size: 2^planes buckets sized so the
    EXPECTED bucket holds ~``target_bucket`` vectors, keeping the
    bucket-local self-join O(n * target_bucket) instead of O(n²/2^planes)
    with a FIXED plane count (the toy default of 8 planes = 256 buckets is
    catastrophic at 10⁹ vectors: ~10¹⁵ candidate pairs)."""
    import math

    if n_items <= target_bucket:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_items / target_bucket)))


def hyperplane_bucket(vec: Column, dim: int = 64, n_planes: int = 8, seed: int = 42) -> Column:
    """LSH bucket id = sign bits of the vector against `n_planes` planes."""
    planes = plane_literals(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        d = dot_expr(vec, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


Centroids = list[tuple[int, list[float]]]


def lowid_centroids(
    emb: DataFrame, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> Centroids:
    """Deterministic stand-in codebook: the ``n_centroids`` lowest-id
    vectors. Not a quantizer — it is the oracle-mirrorable default (the
    DuckDB SQL selects the same rows); :func:`kmeans_centroids` is the
    production codebook. Collect is ``n_centroids`` rows — a codebook, not
    data."""
    rows = emb.orderBy(id_col).limit(n_centroids).select(id_col, vec_col).collect()
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_assign_expr(centroids: Centroids, vec_col: str = "embedding"):
    """Inline argmax cell assignment: array_max over
    ``array<struct<dot, -cid>>`` built from centroid LITERALS — a pure
    per-row projection (whole-stage codegen, NO join, NO window, NO
    shuffle). Struct ordering compares dot first, then -cid, so ties go to
    the LOWER centroid id — exactly the oracle's ``ORDER BY dot DESC, cid
    ASC``. This is the 10⁹-vector-safe form of the assignment: the r2
    row_number-window version shuffled n×n_centroids rows by vec_id."""
    entries = [
        F.struct(
            dot_expr(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec])).alias("d"),
            F.lit(-int(cid)).alias("nc"),
        )
        for cid, cvec in centroids
    ]
    # array() re-labels struct fields positionally; the cast restores names
    best = F.array_max(
        F.array(*entries).cast("array<struct<d: double, nc: bigint>>")
    )
    return (-best["nc"]).cast("long")


def ivf_assign(
    emb: DataFrame, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: Centroids | None = None,
) -> tuple[Centroids, DataFrame]:
    """IVF coarse quantizer: returns (centroids, assignment DataFrame).

    ``centroids`` defaults to :func:`lowid_centroids` (deterministic,
    oracle-mirrorable); pass :func:`kmeans_centroids` output for a real
    codebook — the assignment plumbing is identical. The assignment itself
    is :func:`ivf_assign_expr` — scan + project only."""
    if centroids is None:
        centroids = lowid_centroids(emb, n_centroids, id_col, vec_col)
    assign = emb.select(
        F.col(id_col), F.col(vec_col), ivf_assign_expr(centroids, vec_col).alias("cid")
    )
    return centroids, assign


def kmeans_centroids(
    emb: DataFrame, k: int = 8, n_iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_mod: int = 1,
) -> Centroids:
    """Fixed-iteration Lloyd's k-means as a DataFrame job — the production
    IVF codebook. Init = lowest-id vectors (deterministic); per iteration:
    inline-argmax assignment (no shuffle) -> per-cell mean via
    ``posexplode`` + partial/final avg (ONE shuffle of k×dim aggregate
    rows; the map side combines locally). Driver traffic is k×dim doubles
    per iteration — a codebook, never data. ``sample_mod`` > 1 trains on a
    deterministic 1/mod docId-hash slice (at 10⁹ vectors train on ~10⁶; the
    final assignment still covers everything). Empty cells keep their
    previous centroid (standard Lloyd's degeneracy guard). Returns cids
    relabeled 0..k-1 so the codebook is self-describing."""
    train = emb
    if sample_mod > 1:
        train = emb.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)
    # Every Lloyd's round re-scans the train slice; cache it so iterations
    # 2..n read deserialized vectors instead of re-running the upstream
    # scan/filter (the slice is 1/sample_mod of the corpus by construction).
    cached = train if n_iters <= 1 else train.select(id_col, vec_col).persist()
    try:
        cents = [(i, vec) for i, (_, vec) in enumerate(lowid_centroids(cached, k, id_col, vec_col))]
        for _ in range(n_iters):
            cid = ivf_assign_expr(cents, vec_col)
            means = (
                cached.select(cid.alias("cid"), F.posexplode(F.col(vec_col)).alias("pos", "v"))
                .groupBy("cid", "pos")
                .agg(F.avg("v").alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in means:
                by_cell.setdefault(int(r.cid), {})[int(r.pos)] = float(r.m)
            cents = [
                (
                    i,
                    [by_cell[i][p] for p in range(len(old))] if i in by_cell else old,
                )
                for i, old in cents
            ]
    finally:
        if cached is not train:
            cached.unpersist()
    return cents


def ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 8, nprobe: int = 2,
    codebook: str = "lowid", kmeans_iters: int = 3, kmeans_sample_mod: int = 1,
    centroids: list | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroid cells nearest the query
    (by dot product), exact cosine inside. The scale path of the brief's
    "IVF or LSH-bucketed variant" — cells shrink the candidate set to
    ~nprobe/n_centroids of the corpus, and n_centroids grows with corpus
    size exactly like :func:`planes_for_corpus` buckets.

    ``codebook='lowid'`` (default) keeps the oracle-mirrorable deterministic
    centroids; ``codebook='kmeans'`` trains :func:`kmeans_centroids` first.
    A codebook is a per-CORPUS artifact, not a per-query one — for a query
    workload, train once (``kmeans_centroids``/``lowid_centroids``) and pass
    it via ``centroids=[(cid, vec), ...]``; the per-query work is then just
    the driver-side nprobe pick + the probed-cell scan.
    """
    if centroids is not None:
        cents = [(int(c), list(v)) for c, v in centroids]
    elif codebook == "kmeans":
        cents = kmeans_centroids(
            emb, n_centroids, kmeans_iters, id_col, vec_col, kmeans_sample_mod
        )
    elif codebook == "lowid":
        cents = lowid_centroids(emb, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"unknown codebook {codebook!r}; 'lowid' or 'kmeans'")
    _, assign = ivf_assign(emb, n_centroids, id_col, vec_col, centroids=cents)

    def seqdot(a, b):  # sequential left fold — bit-identical to dot_expr
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    dots = {cid: seqdot(query_vec, cvec) for cid, cvec in cents}
    probe = [c for c, _ in sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assign.where(F.col("cid").isin([int(c) for c in probe]))
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_expr(F.col(vec_col), q)
    return (
        emb.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 42, n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict to the query's hyperplane bucket(s),
    exact cosine inside. Bucket filter prunes ~n_probes/2^n_planes of the
    corpus.

    ``n_probes`` > 1 is the multi-probe recall lever that keeps a LARGE
    ``n_planes`` (see :func:`planes_for_corpus`) usable: with many planes a
    single bucket's recall collapses, so also probe the buckets across the
    query's (n_probes - 1) nearest hyperplanes — flip the bits whose plane
    dot-products are smallest in magnitude (the standard multi-probe LSH
    order). n_probes=1 is exactly the single-bucket behavior."""
    dim = len(query_vec)
    planes = plane_literals(dim, n_planes, seed)
    qv = np.array(query_vec, dtype=np.float64)
    dots = np.array([float(np.dot(qv, p)) for p in planes])
    qbucket = sum((1 << i) for i in range(n_planes) if dots[i] >= 0)
    flip_order = np.argsort(np.abs(dots))
    probes = [qbucket] + [
        qbucket ^ (1 << int(i)) for i in flip_order[: max(0, n_probes - 1)]
    ]
    bucket = hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.where(bucket.isin(probes))
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
