"""Product quantization: distributed encode/ADC vs the single-node mirror.

The contract's e4 oracle rests on ``pq_reference_scores`` being bit-identical
to the Spark expressions (same left-fold arithmetic, same argmin tie rule,
same add order); these tests pin that identity plus training determinism and
basic quantizer quality.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    pq_adc_lut,
    pq_code_exprs,
    pq_encode,
    pq_reference_scores,
    pq_topk,
    pq_train,
)

DIM, M, K, N = 16, 4, 8, 160


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # clustered corpus: quantization should separate the clusters
    centers = rng.standard_normal((K, DIM)) * 3.0
    rows = []
    for i in range(N):
        v = centers[i % K] + rng.standard_normal(DIM) * 0.3
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_pq_train_deterministic(emb):
    df, _ = emb
    b1 = pq_train(df, m=M, k=K)
    b2 = pq_train(df, m=M, k=K)
    assert b1 == b2
    assert len(b1) == M and all(len(bk) == K for bk in b1)
    assert all(len(c) == DIM // M for bk in b1 for c in bk)


def test_pq_dim_mismatch(emb):
    df, _ = emb
    with pytest.raises(ValueError):
        pq_train(df, m=5, k=K)  # 16 % 5 != 0


def test_pq_encode_matches_reference_mirror(emb):
    """Spark inline-argmin codes == the Python mirror's argmin, bit for bit."""
    df, rows = emb
    books = pq_train(df, m=M, k=K)
    codes = {
        r.vec_id: [r[f"code_{j}"] for j in range(M)]
        for r in pq_encode(df, books).collect()
    }
    sub = DIM // M
    for rid, vec in rows:
        for j, book in enumerate(books):
            sv = vec[j * sub : (j + 1) * sub]
            dists = []
            for cent in book:
                acc = 0.0
                for x, y in zip(sv, cent):
                    acc += (float(x) - float(y)) * (float(x) - float(y))
                dists.append(acc)
            want = min(range(K), key=lambda c: (dists[c], c))
            assert codes[rid][j] == want, (rid, j)


def test_pq_topk_matches_reference_scores(emb):
    """End-to-end ADC top-k == the oracle mirror, scores bit-identical."""
    df, rows = emb
    books = pq_train(df, m=M, k=K)
    qv = rows[0][1]
    corpus = df.where(F.col("vec_id") != 0)
    got = pq_topk(corpus, qv, 10, codebooks=books).collect()
    ref = pq_reference_scores([r for r in rows if r[0] != 0], books, qv)
    ref.sort(key=lambda t: (t[1], t[0]))
    assert [(r.vec_id, r.adc) for r in got] == ref[:10]


def test_pq_quality_on_clustered_corpus(emb):
    """ADC top-k should recover mostly same-cluster neighbors: recall@10 vs
    exact L2 ≥ 0.5 on a well-separated clustered corpus (PQ with m=4
    subspaces is lossy; this is a sanity floor, not a benchmark)."""
    df, rows = emb
    books = pq_train(df, m=M, k=K)
    qv = np.array(rows[0][1])
    corpus = df.where(F.col("vec_id") != 0)
    got = {r.vec_id for r in pq_topk(corpus, list(qv), 10, codebooks=books).collect()}
    exact = sorted(
        ((np.linalg.norm(np.array(v) - qv) ** 2, i) for i, v in rows if i != 0),
    )[:10]
    want = {i for _, i in exact}
    assert len(got & want) >= 5


def test_pq_adc_lut_shape(emb):
    df, rows = emb
    books = pq_train(df, m=M, k=K)
    lut = pq_adc_lut(books, rows[0][1])
    assert len(lut) == M and all(len(r) == K for r in lut)
    assert all(v >= 0.0 for r in lut for v in r)


def test_ivfpq_matches_mirror_and_subset(emb, spark):
    """IVF-PQ == the oracle mirror (probe selection, assignment, ADC all
    bit-identical), and every result comes from a probed cell."""
    from search_engine_spark.operators.similarity import (
        _probe_cells,
        ivf_reference_assign,
        ivfpq_encode,
        ivfpq_topk,
        lowid_centroids,
    )

    df, rows = emb
    qv = rows[0][1]
    corpus = df.where(F.col("vec_id") != 0)
    crows = [r for r in rows if r[0] != 0]
    cents = lowid_centroids(corpus, 4)
    books = pq_train(corpus, m=M, k=K)

    got = ivfpq_topk(corpus, qv, 10, n_centroids=4, nprobe=2,
                     centroids=cents, codebooks=books).collect()
    probe = set(_probe_cells(cents, qv, 2))
    cid_of = ivf_reference_assign(crows, cents)
    probed = [(i, v) for i, v in crows if cid_of[i] in probe]
    ref = pq_reference_scores(probed, books, qv)
    ref.sort(key=lambda t: (t[1], t[0]))
    assert [(r.vec_id, r.adc) for r in got] == ref[:10]
    # subset property: all results live in probed cells (per Spark's own
    # assignment, checked through the persisted code-table shape)
    codes = {r.vec_id: r.cid for r in ivfpq_encode(corpus, cents, books).collect()}
    assert all(codes[r.vec_id] in probe for r in got)
    # Spark assignment == mirror assignment everywhere
    assert codes == cid_of


def test_ivfpq_nprobe_full_equals_flat_pq(emb):
    """Probing every cell degenerates to flat PQ (same ADC, same top-k)."""
    from search_engine_spark.operators.similarity import ivfpq_topk, lowid_centroids

    df, rows = emb
    qv = rows[0][1]
    corpus = df.where(F.col("vec_id") != 0)
    cents = lowid_centroids(corpus, 4)
    books = pq_train(corpus, m=M, k=K)
    flat = pq_topk(corpus, qv, 10, codebooks=books).collect()
    full = ivfpq_topk(corpus, qv, 10, n_centroids=4, nprobe=4,
                      centroids=cents, codebooks=books).collect()
    assert [(r.vec_id, r.adc) for r in flat] == [(r.vec_id, r.adc) for r in full]


def test_pq_rerank_full_shortlist_equals_exact(emb):
    """shortlist >= corpus => the re-rank IS the exact scorer (same rows,
    same fold arithmetic as cosine_topk)."""
    from search_engine_spark.operators.similarity import cosine_topk, pq_rerank_topk

    df, rows = emb
    qv = rows[0][1]
    corpus = df.where(F.col("vec_id") != 0)
    books = pq_train(corpus, m=M, k=K)
    got = pq_rerank_topk(corpus, qv, 10, shortlist=N, codebooks=books).collect()
    want = cosine_topk(corpus, qv, 10).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [(r.vec_id, r.cosine) for r in want]


def test_pq_rerank_beats_flat_adc(emb):
    """On a clustered corpus the exact re-rank must recover neighbors the
    tied ADC ordering loses."""
    import numpy as np

    from search_engine_spark.operators.similarity import pq_rerank_topk

    df, rows = emb
    qv = np.array(rows[0][1])
    corpus = df.where(F.col("vec_id") != 0)
    books = pq_train(corpus, m=M, k=K)
    exact = {
        i for _, i in sorted(
            ((float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv))), i)
             for i, v in rows if i != 0),
            reverse=True,
        )[:10]
    }
    flat = {r.vec_id for r in pq_topk(corpus, list(qv), 10, codebooks=books).collect()}
    rr = {r.vec_id for r in pq_rerank_topk(
        corpus, list(qv), 10, shortlist=60, codebooks=books).collect()}
    assert len(rr & exact) >= len(flat & exact)
    assert len(rr & exact) >= 7


def test_ivfpq_residual_matches_mirror(emb):
    """Residual IVF-PQ == its single-node mirror bit for bit, and on the
    clustered fixture residual codes must beat raw codes at equal m,k
    (the raw path ties inside cells; residuals separate cell members)."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        ivfpq_residual_reference_scores,
        ivfpq_topk,
        ivfpq_topk_residual,
        ivfpq_train_residual,
        lowid_centroids,
    )

    df, rows = emb
    qv = rows[0][1]
    corpus = df.where(F.col("vec_id") != 0)
    crows = [r for r in rows if r[0] != 0]
    cents = lowid_centroids(corpus, 4)
    books_res = ivfpq_train_residual(corpus, cents, m=M, k=K)

    got = ivfpq_topk_residual(
        corpus, qv, 10, nprobe=2, centroids=cents, codebooks=books_res
    ).collect()
    ref = ivfpq_residual_reference_scores(crows, cents, books_res, qv, 2)
    ref.sort(key=lambda t: (t[1], t[0]))
    assert [(r.vec_id, r.adc) for r in got] == ref[:10]

    # quality: recall@10 vs exact L2, residual >= raw at the same budget
    qarr = np.array(qv)
    exact = {
        i for _, i in sorted(
            ((float(np.sum((np.array(v) - qarr) ** 2)), i) for i, v in crows)
        )[:10]
    }
    books_raw = pq_train(corpus, m=M, k=K)
    raw = {r.vec_id for r in ivfpq_topk(
        corpus, qv, 10, nprobe=2, centroids=cents, codebooks=books_raw).collect()}
    res = {r.vec_id for r in got}
    assert len(res & exact) >= len(raw & exact)
    assert len(res & exact) >= 5
