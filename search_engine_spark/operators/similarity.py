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


def rescore_vector(
    scored: DataFrame,
    emb: DataFrame,
    query_vec: list[float],
    weight: float = 1.0,
    k: int | None = 10,
    id_col: str = "docId",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid semantic rescore — the ES knn-rescore / second-stage hybrid
    shape: add ``weight × cosine(query_vec, doc embedding)`` to each
    already-windowed lexical hit's score and re-cut top-``k``. Docs without
    an embedding keep their primary score (multiplicatively neutral miss,
    the ES ``missing`` rule). The counterpart of
    :func:`..operators.rank.rescore_phrase` with a dense signal, and of
    :func:`..operators.rank.rrf_fuse` with score- rather than rank-level
    fusion.

    Scale shape: the window's ids broadcast into a LEFT-SEMI prune of the
    embedding scan (window ≪ corpus; only id + vector in ReadSchema), the
    cosine is the deterministic JVM double fold of :func:`cosine_expr`
    computed ONLY for surviving rows, and the ≤window-row (id, cosine)
    relation broadcast-left-joins back onto the window — the embedding
    corpus is never shuffled. On an id-sorted/bucketed embedding store the
    semi-join becomes an ``In`` pushdown; either way nothing downstream
    scales with corpus size."""
    ids = scored.select(F.col(id_col).alias(vec_id_col))
    pruned = emb.join(F.broadcast(ids), vec_id_col, "left_semi")
    # zero-norm vectors (doc or query side) make the plain cosine 0/0 —
    # a DIVIDE_BY_ZERO error under ANSI mode, NaN (which sorts above every
    # double under desc) otherwise. Both sides are guarded: a zero query
    # vector short-circuits to 0 (no per-row work at all), a zero doc
    # vector takes the otherwise-branch — "no signal", the same neutrality
    # as a missing embedding.
    qn = float(np.sqrt(sum(float(x) * float(x) for x in query_vec)))
    if qn == 0.0:
        cos = F.lit(0.0)
    else:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        v = F.col(vec_col)
        cos = F.when(
            norm_expr(v) > 0, dot_expr(v, q) / (norm_expr(v) * F.lit(qn))
        ).otherwise(F.lit(0.0))
    hc = pruned.select(F.col(vec_id_col).alias(id_col), cos.alias("_cos"))
    out = scored.join(F.broadcast(hc), id_col, "left").select(
        id_col,
        (
            F.col("score")
            + F.lit(float(weight)) * F.coalesce(F.col("_cos"), F.lit(0.0))
        ).alias("score"),
    )
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


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


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-compressed ANN.
#
# At 100 TB of float32 embeddings the vectors themselves are the cost: a
# 768-dim corpus is ~3 KB/vector, so a 10^9-vector index is ~3 TB of vector
# bytes that every ANN probe must touch. PQ stores each vector as m one-byte
# codes (m=8 -> 8 bytes, ~384x smaller): split the dimension into m
# subspaces, k-means each subspace to k centroids, store per-subspace
# nearest-centroid ids. A query scores candidates with an ADC (asymmetric
# distance computation) lookup table: per subspace, the L2 distance from the
# query's subvector to each centroid -- scoring a candidate is m table
# lookups + adds over the CODES, never the original vector.
#
# Spark shape: training collects a bounded, deterministic sample (a codebook
# artifact, like kmeans_centroids); encoding is a pure per-row projection
# built from centroid LITERALS (inline argmin, whole-stage codegen -- the
# same no-join/no-window form as ivf_assign_expr); ADC scoring is
# element_at() lookups against literal arrays + TakeOrderedAndProject. No
# shuffle anywhere except the final top-k.

PQCodebooks = list[list[list[float]]]  # m subspaces x k centroids x subdim


def _sq_l2_expr(a: Column, cent: list[float]) -> Column:
    """Sequential-fold squared L2 distance between an array column and a
    centroid literal -- deterministic summation order so a driver-side
    Python mirror (pq_reference_scores) is bit-identical."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _seq_sq_l2(a, cent) -> float:
    """Python mirror of :func:`_sq_l2_expr` (same left-fold order)."""
    acc = 0.0
    for x, y in zip(a, cent):
        acc += (float(x) - float(y)) * (float(x) - float(y))
    return acc


def pq_train(
    emb: DataFrame, m: int = 4, k: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_cap: int = 4096, n_iters: int = 5,
) -> PQCodebooks:
    """Train m per-subspace codebooks of k centroids each.

    Deterministic end to end: the training sample is the ``sample_cap``
    LOWEST-id vectors (an orderBy+limit top-k job -- bounded driver traffic
    at any corpus size), init is the k lowest-id subvectors, Lloyd's
    assignment breaks ties toward the lower centroid id, and empty cells
    keep their previous centroid. Training is driver-local numpy over the
    sample (codebooks are per-CORPUS artifacts: train once, reuse across a
    query workload, exactly like ``kmeans_centroids``)."""
    rows = emb.orderBy(id_col).limit(sample_cap).select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("pq_train: empty embedding table")
    x = np.array([[float(v) for v in r[1]] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: PQCodebooks = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = xs[: min(k, len(xs))].copy()
        if len(cents) < k:  # tiny sample: pad with repeats (degenerate, legal)
            cents = np.vstack([cents] * ((k // len(cents)) + 1))[:k]
        for _ in range(n_iters):
            d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # ties -> lowest index
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_code_exprs(codebooks: PQCodebooks, vec_col: str = "embedding") -> list[Column]:
    """Per-subspace nearest-centroid code as an inline-argmin projection
    (array_max over struct<-dist, -cid> literals: max of -dist is min dist,
    ties to the LOWER centroid id). Same 10^9-row-safe shape as
    ``ivf_assign_expr`` -- no join, no window, no shuffle."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    out = []
    for j, book in enumerate(codebooks):
        subvec = F.slice(F.col(vec_col), j * sub + 1, sub)
        entries = [
            F.struct(
                (-_sq_l2_expr(subvec, cent)).alias("nd"),
                F.lit(-c).alias("nc"),
            )
            for c, cent in enumerate(book)
        ]
        best = F.array_max(
            F.array(*entries).cast("array<struct<nd: double, nc: bigint>>")
        )
        out.append((-best["nc"]).cast("int").alias(f"code_{j}"))
    assert m == len(out)
    return out


def pq_encode(
    emb: DataFrame, codebooks: PQCodebooks,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..code_{m-1}): the compressed representation. At scale
    this is the PERSISTED form (m small ints per vector); the original
    embedding column is only needed at encode/re-rank time."""
    return emb.select(F.col(id_col), *pq_code_exprs(codebooks, vec_col))


def pq_adc_lut(codebooks: PQCodebooks, query_vec: list[float]) -> list[list[float]]:
    """ADC lookup table: LUT[j][c] = squared L2 distance from the query's
    j-th subvector to centroid c, computed with the same sequential fold as
    the Spark-side encode so both sides share bit-identical arithmetic."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return [
        [_seq_sq_l2(query_vec[j * sub : (j + 1) * sub], cent) for cent in book]
        for j, book in enumerate(codebooks)
    ]


def pq_adc_expr(lut: list[list[float]], code_cols: list[str]) -> Column:
    """Approximate squared L2 = sum of per-subspace LUT lookups, added in
    subspace order (deterministic)."""
    acc = None
    for j, col in enumerate(code_cols):
        term = F.element_at(
            F.array(*[F.lit(float(v)) for v in lut[j]]), F.col(col) + 1
        )
        acc = term if acc is None else acc + term
    return acc


def pq_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    m: int = 4, n_centroids: int = 16,
    codebooks: PQCodebooks | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k: (id, adc) for the k candidates with the
    smallest asymmetric distance, ties to the lower id.

    Pass ``codebooks=`` (from :func:`pq_train`, per-corpus artifact) and
    optionally ``codes=`` (from :func:`pq_encode`, the persisted compressed
    table) for the production serving shape: the per-query plan is then a
    scan of the CODES table + m element_at lookups + TakeOrdered -- it never
    touches the float vectors."""
    if codebooks is None:
        codebooks = pq_train(emb, m=m, k=n_centroids, id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col, vec_col)
    code_cols = [c for c in codes.columns if c.startswith("code_")]
    lut = pq_adc_lut(codebooks, query_vec)
    return (
        codes.select(F.col(id_col), pq_adc_expr(lut, code_cols).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(k)
    )


def pq_reference_scores(
    rows: list, codebooks: PQCodebooks, query_vec: list[float]
) -> list[tuple[int, float]]:
    """Single-node Python mirror of encode+ADC for oracle side tables:
    same left-fold arithmetic, same argmin tie rule, same add order as the
    Spark expressions -- bit-identical doubles. ``rows`` = [(id, vector)]."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = pq_adc_lut(codebooks, query_vec)
    out = []
    for rid, vec in rows:
        adc = 0.0
        for j, book in enumerate(codebooks):
            sv = vec[j * sub : (j + 1) * sub]
            best_c, best_d = 0, None
            for c, cent in enumerate(book):
                d = _seq_sq_l2(sv, cent)
                if best_d is None or -d > -best_d:  # strict: ties keep lower c
                    best_c, best_d = c, d
            adc += lut[j][best_c]
        out.append((int(rid), adc))
    return out


# ---------------------------------------------------------------------------
# IVF-PQ: the two stages composed — IVF cells prune the candidate set,
# PQ codes make scoring it cheap. The classic billion-scale serving shape:
# the persisted index is (id, cell, m code bytes) per vector; a query reads
# ~nprobe/n_centroids of THAT (already ~100-400x smaller than the float
# vectors), so the per-query scan cost falls by both factors multiplied.
# This variant quantizes raw vectors (not cell residuals): the codebook
# stays cell-independent, which keeps encode a single pure projection and
# lets the exact same codes serve flat-PQ and IVF-PQ queries. Residual
# encoding (FAISS IVFPQ's default) buys accuracy at the cost of per-cell
# codebook lookups in encode; it drops into pq_code_exprs by subtracting
# the assigned centroid literal first if a deployment needs it.


def _probe_cells(centroids: Centroids, query_vec: list[float], nprobe: int) -> list[int]:
    """The nprobe cells nearest the query by dot product (sequential-fold
    arithmetic, ties to the lower cid — identical to the oracle mirror)."""
    def seqdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    dots = {cid: seqdot(query_vec, cvec) for cid, cvec in centroids}
    return [c for c, _ in sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:nprobe]]


def ivfpq_encode(
    emb: DataFrame, centroids: Centroids, codebooks: PQCodebooks,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, code_0..code_{m-1}) — the persisted IVF-PQ index rows.
    One pure projection (coarse inline-argmax + m inline-argmins over
    literals): no join, no window, no shuffle; at 10^9 vectors this is an
    embarrassingly parallel scan whose output is ~(4+m) bytes of payload
    per vector. Partition/sort the output by cid on write so a probe scan
    prunes at the parquet row-group level."""
    return emb.select(
        F.col(id_col),
        ivf_assign_expr(centroids, vec_col).alias("cid"),
        *pq_code_exprs(codebooks, vec_col),
    )


def ivfpq_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 8, nprobe: int = 2, m: int = 4, pq_k: int = 16,
    centroids: Centroids | None = None,
    codebooks: PQCodebooks | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: ADC-score only the probed cells' codes.

    ``centroids``/``codebooks``/``codes`` are per-CORPUS artifacts (train
    and encode once, reuse across the workload); per query the plan is a
    cid-filtered scan of the code table + m ``element_at`` lookups +
    TakeOrdered — no float vectors, no join, no shuffle."""
    if centroids is None:
        centroids = lowid_centroids(emb, n_centroids, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_train(emb, m=m, k=pq_k, id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = ivfpq_encode(emb, centroids, codebooks, id_col, vec_col)
    probe = _probe_cells(centroids, query_vec, nprobe)
    code_cols = [c for c in codes.columns if c.startswith("code_")]
    lut = pq_adc_lut(codebooks, query_vec)
    return (
        codes.where(F.col("cid").isin([int(c) for c in probe]))
        .select(F.col(id_col), pq_adc_expr(lut, code_cols).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(k)
    )


def ivf_reference_assign(
    rows: list, centroids: Centroids
) -> dict[int, int]:
    """Single-node mirror of :func:`ivf_assign_expr` for oracle side tables:
    same sequential-fold dots, same argmax tie rule (lower cid wins).
    ``rows`` = [(id, vector)] -> {id: cid}."""
    def seqdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    out = {}
    for rid, vec in rows:
        best_c, best_d = None, None
        for cid, cvec in centroids:
            d = seqdot(vec, cvec)
            if best_d is None or d > best_d:  # strict: ties keep lower cid
                best_c, best_d = int(cid), d
        out[int(rid)] = best_c
    return out


def pq_rerank_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    shortlist: int = 100,
    codebooks: PQCodebooks | None = None,
    codes: DataFrame | None = None,
    m: int = 4, n_centroids: int = 16,
    metric: str = "cosine",
) -> DataFrame:
    """ADC shortlist + exact re-rank — the standard PQ serving pattern.

    Flat ADC cannot rank WITHIN a tight neighborhood: near-duplicate
    vectors quantize to identical codes, their ADC distances tie exactly,
    and the tie-break (not geometry) picks the top-k (measured: recall@10
    collapses to ~k/cluster_size on a clustered corpus, tools/ann_recall.py).
    The fix every production system uses: take the ADC top-``shortlist``
    (codes only — cheap at any corpus size), then score just those
    ``shortlist`` vectors exactly. Plan shape: TakeOrdered(shortlist) over
    the code table -> broadcast semi-join back to the vector table (the
    shortlist is tiny by construction) -> exact fold + TakeOrdered(k). The
    full-precision vector column is touched for ``shortlist`` rows per
    query, never the corpus."""
    if codebooks is None:
        codebooks = pq_train(emb, m=m, k=n_centroids, id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col, vec_col)
    code_cols = [c for c in codes.columns if c.startswith("code_")]
    lut = pq_adc_lut(codebooks, query_vec)
    short = (
        codes.select(F.col(id_col), pq_adc_expr(lut, code_cols).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    cand = emb.join(F.broadcast(short), id_col, "left_semi")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if metric == "cosine":
        score = cosine_expr(F.col(vec_col), q)
        return (
            cand.select(F.col(id_col), score.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    # exact squared L2 (the metric ADC approximates)
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select(F.col(id_col), d2.alias("dist2"))
        .orderBy(F.asc("dist2"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (FAISS IVFPQ semantics): quantize x - centroid[cell], not
# x. On clustered data raw-vector PQ collapses — cells ~ clusters, so every
# member of a cell shares codes and ADC ties (measured recall@10 ~
# k/cluster_size, tools/ann_recall.py). The residual carries exactly the
# within-cell offsets the raw codes lose, so members become distinguishable
# at the same m and k. Cost: the query-side LUT is per PROBED CELL
# ((q - centroid) changes per cell) — nprobe small LUTs, driver-side; the
# encode stays one pure projection (centroid lookup via element_at over k
# literal arrays, subtract, then the same inline-argmin).


def _residual_expr(centroids: Centroids, cid_col: Column, vec_col: str) -> Column:
    """vec - centroid[cid] as a JVM expression: the k centroid literals form
    one array<array<double>>, element_at picks the row's cell, zip_with
    subtracts. Pure projection — no join, no shuffle. Cell ids need not be
    contiguous (lowid centroids use vector ids): the row's cid is translated
    to its array slot via array_position over the sorted cid literals."""
    ordered = sorted(centroids, key=lambda cv: int(cv[0]))
    cids = F.array(*[F.lit(int(c)) for c, _ in ordered])
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in cvec]) for _, cvec in ordered
    ])
    cent = F.element_at(cents, F.array_position(cids, cid_col.cast("long")).cast("int"))
    return F.zip_with(F.col(vec_col), cent, lambda x, y: x.cast("double") - y)


def ivfpq_train_residual(
    emb: DataFrame, centroids: Centroids, m: int = 4, k: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_cap: int = 4096, n_iters: int = 5,
) -> PQCodebooks:
    """Train PQ codebooks on CELL RESIDUALS: assign the (bounded, lowest-id)
    sample to cells with the exact mirror arithmetic, subtract, then the
    same deterministic numpy Lloyd's as :func:`pq_train`."""
    rows = emb.orderBy(id_col).limit(sample_cap).select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("ivfpq_train_residual: empty embedding table")
    pairs = [(int(r[0]), [float(x) for x in r[1]]) for r in rows]
    cid_of = ivf_reference_assign(pairs, centroids)
    cvec = {int(c): list(v) for c, v in centroids}
    res_rows = [
        (rid, [x - y for x, y in zip(vec, cvec[cid_of[rid]])])
        for rid, vec in pairs
    ]
    # same deterministic Lloyd's as pq_train, over the residual matrix
    x = np.array([v for _, v in res_rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"ivfpq_train_residual: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: PQCodebooks = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = xs[: min(k, len(xs))].copy()
        if len(cents) < k:
            cents = np.vstack([cents] * ((k // len(cents)) + 1))[:k]
        for _ in range(n_iters):
            d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def ivfpq_encode_residual(
    emb: DataFrame, centroids: Centroids, codebooks: PQCodebooks,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, code_0..code_{m-1}) with codes over the CELL RESIDUAL.
    Still one pure projection: coarse argmax -> centroid lookup ->
    subtract -> per-subspace inline argmin."""
    cid = ivf_assign_expr(centroids, vec_col)
    res = _residual_expr(centroids, cid, vec_col)
    tmp = emb.select(F.col(id_col), cid.alias("cid"), res.alias("_res"))
    return tmp.select(
        F.col(id_col), "cid", *pq_code_exprs(codebooks, "_res")
    )


def ivfpq_topk_residual(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 8, nprobe: int = 2, m: int = 4, pq_k: int = 16,
    centroids: Centroids | None = None,
    codebooks: PQCodebooks | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Residual IVF-PQ top-k: per probed cell, ADC against THAT cell's
    query residual (q - centroid[cell]); one union-of-filters plan over the
    code table, still no joins/windows/shuffles beyond the final top-k."""
    if centroids is None:
        centroids = lowid_centroids(emb, n_centroids, id_col, vec_col)
    if codebooks is None:
        codebooks = ivfpq_train_residual(
            emb, centroids, m=m, k=pq_k, id_col=id_col, vec_col=vec_col
        )
    if codes is None:
        codes = ivfpq_encode_residual(emb, centroids, codebooks, id_col, vec_col)
    probe = _probe_cells(centroids, query_vec, nprobe)
    code_cols = [c for c in codes.columns if c.startswith("code_")]
    cvec = {int(c): list(v) for c, v in centroids}
    out = None
    for c in probe:
        qres = [float(x) - y for x, y in zip(query_vec, cvec[int(c)])]
        lut = pq_adc_lut(codebooks, qres)
        part = codes.where(F.col("cid") == int(c)).select(
            F.col(id_col), pq_adc_expr(lut, code_cols).alias("adc")
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy(F.asc("adc"), F.asc(id_col)).limit(k)


def ivfpq_residual_reference_scores(
    rows: list, centroids: Centroids, codebooks: PQCodebooks,
    query_vec: list[float], nprobe: int,
) -> list[tuple[int, float]]:
    """Single-node mirror of the residual path for oracle side tables:
    same assignment, residual, argmin, and per-cell LUT arithmetic."""
    probe = _probe_cells(centroids, query_vec, nprobe)
    cid_of = ivf_reference_assign(rows, centroids)
    cvec = {int(c): list(v) for c, v in centroids}
    out = []
    for c in probe:
        qres = [float(x) - y for x, y in zip(query_vec, cvec[int(c)])]
        cell_rows = [
            (rid, [x - y for x, y in zip(vec, cvec[int(c)])])
            for rid, vec in rows
            if cid_of[rid] == int(c)
        ]
        out.extend(pq_reference_scores(cell_rows, codebooks, qres))
    return out
