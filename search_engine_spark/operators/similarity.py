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


def ivf_assign(
    emb: DataFrame, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: returns (centroids, assignment).

    Centroids are the ``n_centroids`` lowest-id vectors — a deterministic,
    data-derived codebook (a production system plugs k-means centroids into
    the same plumbing; only this selection line changes). Assignment =
    argmax dot-product, ties to the lower centroid id, via a cross join
    against the (broadcast-small) centroid set + one row_number window.
    At 10⁹ vectors the window shuffle is avoidable by inlining the argmax
    as literal-array expressions; the relational form is kept here because
    the DuckDB oracle mirrors it exactly.
    """
    from pyspark.sql.window import Window

    cent = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    d = dot_expr(F.col(vec_col), F.col("cvec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_dot"), F.asc("cid"))
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(F.col(id_col), F.col(vec_col), F.col("cid"), d.alias("_dot"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    return cent, assign


def ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 8, nprobe: int = 2,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroid cells nearest the query
    (by dot product), exact cosine inside. The scale path of the brief's
    "IVF or LSH-bucketed variant" — cells shrink the candidate set to
    ~nprobe/n_centroids of the corpus, and n_centroids grows with corpus
    size exactly like :func:`planes_for_corpus` buckets."""
    cent, assign = ivf_assign(emb, n_centroids, id_col, vec_col)

    def seqdot(a, b):  # sequential left fold — bit-identical to dot_expr
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    dots = {int(r.cid): seqdot(query_vec, r.cvec) for r in cent.collect()}
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
