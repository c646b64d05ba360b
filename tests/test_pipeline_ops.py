"""Training-data pipeline operators: dedup family, similarity search,
text stats, multimodal plumbing — self-contained correctness tests (the
driver's DuckDB oracle cross-checks the same ops at sf0.01)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import corpus_from_texts

TEXTS = [
    "the quick brown fox jumps over the lazy dog",          # 0
    "the quick brown fox jumps over the lazy dog",          # 1 exact dup of 0
    "the quick brown fox leaps over the lazy dog",          # 2 near dup of 0
    "el rapido zorro marron salta sobre el perro de la casa",  # 3 spanish-ish
    "completely different content about spark query engines",  # 4
]


def _py_h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, n: int = 3) -> list[str]:
    t = text.lower().split()
    return sorted({" ".join(t[i : i + n]) for i in range(max(len(t) - n + 1, 0))})


def test_h64_matches_python(spark):
    from search_engine_spark.operators.dedup import h64

    vals = ["", "a", "hello world", "0:the quick brown"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", h64(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == _py_h64(v)


def test_exact_dedup(spark):
    from search_engine_spark.operators.dedup import exact_dedup

    corpus = corpus_from_texts(spark, TEXTS)
    rows = exact_dedup(corpus).collect()
    by_keeper = {r.keeper: r.n_dups for r in rows}
    assert by_keeper[0] == 2          # docs 0 and 1 collapse, keeper = min id
    assert len(rows) == 4             # 5 docs, one dup pair
    assert sum(r.n_dups for r in rows) == 5


def test_minhash_identical_docs_share_all_buckets(spark):
    from search_engine_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signatures,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    sigs = minhash_signatures(corpus, num_hashes=12, shingle_n=3)
    srows = {r.docId: [r[f"mh{j}"] for j in range(12)] for r in sigs.collect()}
    assert srows[0] == srows[1]                       # identical docs
    # signature values match the python definition: one h64 per shingle,
    # then affine universal-hash mixes (a_j*h + b_j) mod P
    from search_engine_spark.operators.dedup import MINHASH_P, minhash_coeffs

    hs = [_py_h64(sh) % MINHASH_P for sh in _shingles(TEXTS[0])]
    exp0 = [min((a * h + b) % MINHASH_P for h in hs) for a, b in minhash_coeffs(12)]
    assert srows[0] == exp0
    pairs = {
        (r.a, r.b)
        for r in candidate_pairs(lsh_buckets(sigs, bands=4, rows_per_band=3)).collect()
    }
    assert (0, 1) in pairs                            # exact dups always pair


def test_ngram_jaccard_values(spark):
    from search_engine_spark.operators.dedup import ngram_jaccard

    corpus = corpus_from_texts(spark, TEXTS)
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "a long, b long")
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard(corpus, pairs).collect()}
    assert got[(0, 1)] == pytest.approx(1.0)
    s0, s2 = set(_shingles(TEXTS[0])), set(_shingles(TEXTS[2]))
    assert got[(0, 2)] == pytest.approx(len(s0 & s2) / len(s0 | s2))
    assert got[(0, 4)] == pytest.approx(0.0)


def test_simhash_hamming_orders_similarity(spark):
    from search_engine_spark.operators.dedup import simhash

    corpus = corpus_from_texts(spark, TEXTS)
    got = {r.docId: r.simhash for r in simhash(corpus, bits=16).collect()}
    assert got[0] == got[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[0], got[2]) < ham(got[0], got[4])


EMB = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [-1.0, 0.0, 0.0, 0.0]),
    (4, [0.7, 0.7, 0.0, 0.0]),
]


def test_cosine_topk_exact(spark):
    from search_engine_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    rows = cosine_topk(emb.where("vec_id <> 0"), [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in rows] == [1, 4, 2]
    q = np.array([1.0, 0, 0, 0])
    for r in rows:
        v = np.array(dict(EMB)[r.vec_id])
        assert r.cosine == pytest.approx(
            float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), abs=1e-12
        )


def test_lsh_topk_subset_of_bruteforce(spark):
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    rng = np.random.default_rng(7)
    data = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    qv = data[0][1]
    exact = [r.vec_id for r in cosine_topk(emb.where("vec_id <> 0"), qv, 200).collect()]
    approx = lsh_topk(emb.where("vec_id <> 0"), qv, k=10, n_planes=4, seed=42).collect()
    ids = [r.vec_id for r in approx]
    assert ids, "query bucket should not be empty"
    assert set(ids) <= set(exact)
    # bucket filter preserves cosine ordering within the candidates
    vals = [r.cosine for r in approx]
    assert vals == sorted(vals, reverse=True)


def test_embedding_near_dups(spark):
    from search_engine_spark.operators.dedup import embedding_near_dups

    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    rows = embedding_near_dups(emb, threshold=0.95, n_planes=4, seed=42).collect()
    pairs = {(r.a, r.b) for r in rows}
    assert (0, 1) in pairs                    # cos(v0,v1) ≈ .994, same halfspace
    assert all(r.cosine >= 0.95 for r in rows)


def test_lang_id_and_quality(spark):
    from search_engine_spark.operators.textstats import lang_id, quality_score

    corpus = corpus_from_texts(
        spark,
        [
            "the cat sat on the mat and it is that for with",
            "el perro de la casa y los gatos del patio que en",
            "xyzzy plugh qwortle",
        ],
    )
    langs = {r.docId: r.lang_pred for r in lang_id(corpus).collect()}
    assert langs[0] == "en" and langs[1] == "es" and langs[2] == "und"

    q = {r.docId: r for r in quality_score(corpus).collect()}
    assert q[0].n_tokens == 12
    # markers hit: the(x2), and, it, is, that, for, with = 8 of 12
    assert q[0].stopword_ratio == pytest.approx(8 / 12, abs=1e-6)
    assert 0.0 <= q[2].quality <= 1.0
    assert q[0].quality > q[2].quality


def test_fingerprint_stable_and_edit_sensitive(spark):
    from search_engine_spark.operators.textstats import fingerprint

    corpus = corpus_from_texts(spark, TEXTS)
    fp = {r.docId: (r.fp_min, r.fp_max, r.n_shingles) for r in fingerprint(corpus).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[4]
    sh0 = _shingles(TEXTS[0])
    assert fp[0][0] == min(_py_h64(s) for s in sh0)
    assert fp[0][2] == len(sh0)


def test_multimodal_plumbing(spark):
    from search_engine_spark.operators.multimodal import attach_media, extract_features

    corpus = corpus_from_texts(spark, TEXTS[:3])
    media = attach_media(corpus)
    rows = {r.docId: r for r in media.collect()}
    assert rows[0].payload == TEXTS[0].encode()
    assert rows[0].payload_sha256 == hashlib.sha256(TEXTS[0].encode()).hexdigest()

    feats = extract_features(media, dim=16).collect()
    by_id = {r.docId: r for r in feats}
    assert all(len(r.feature) == 16 for r in feats)
    # deterministic stub: identical payloads -> identical features
    assert by_id[0].feature == by_id[1].feature
    assert by_id[0].feature != by_id[2].feature
    # repartitioning must not change features (partition-independence)
    feats2 = extract_features(media.repartition(5), dim=16).collect()
    assert {r.docId: tuple(r.feature) for r in feats2} == {
        r.docId: tuple(r.feature) for r in feats
    }


def test_decode_image_gate_without_pil():
    """Without PIL the real decoder and the decoder='image' operator both
    fail FAST with NotImplementedError (never per-task on executors); the
    stub mode is unaffected."""
    from search_engine_spark.operators.multimodal import (
        HAS_PIL,
        decode_image,
        extract_features,
    )

    if HAS_PIL:
        pytest.skip("PIL installed — gate inactive; real path tested below")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        extract_features(None, decoder="image")


def test_extract_features_bad_decoder():
    from search_engine_spark.operators.multimodal import extract_features

    with pytest.raises(ValueError, match="decoder"):
        extract_features(None, decoder="nope")


@pytest.mark.skipif(
    not __import__(
        "search_engine_spark.operators.multimodal", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="PIL not installed in this container — stub decoder is the default",
)
def test_decode_image_real_path(spark):
    """With PIL present (not in this container — exercised wherever the lib
    exists): decode a real PNG through the same mapInPandas plumbing."""
    import io

    from PIL import Image

    from search_engine_spark.operators.multimodal import decode_image, extract_features

    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (128, 64, 200)).save(buf, format="PNG")
    png = buf.getvalue()
    f = decode_image(png, dim=16)
    assert f.shape == (16,) and all(-1.0 <= x <= 1.0 for x in f)

    df = spark.createDataFrame(
        [(1, "image/png", bytearray(png), len(png))],
        "docId long, mime string, payload binary, payload_size int",
    )
    rows = extract_features(df, dim=16, decoder="image").collect()
    assert len(rows) == 1 and len(rows[0].feature) == 16


def _emb_fixture(spark, n=60, dim=8, seed=3, dup_pairs=3):
    """Seeded random unit-ish vectors + `dup_pairs` exact duplicate pairs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    for j in range(dup_pairs):  # ids n..n+dup_pairs-1 duplicate ids 0..dup_pairs-1
        rows.append((n + j, [float(x) for x in vecs[j]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_neardup_multitable_superset_and_bucket_cap(spark):
    """n_tables>1 only ADDS candidates (recall lever); max_bucket bounds the
    self-join width (drops monster buckets instead of exploding O(w²))."""
    from search_engine_spark.operators.dedup import embedding_near_dups

    e = _emb_fixture(spark)
    one = {(r.a, r.b) for r in embedding_near_dups(e, 0.9, n_planes=6).collect()}
    two = {(r.a, r.b) for r in embedding_near_dups(e, 0.9, n_planes=6, n_tables=3).collect()}
    assert one <= two
    # exact duplicates always collide in every table
    assert {(0, 60), (1, 61), (2, 62)} <= two
    # all-identical vectors -> ONE bucket of width 40 -> cap drops it entirely
    ident = spark.createDataFrame(
        [(i, [1.0, 0.5, -0.25, 2.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    capped = embedding_near_dups(ident, 0.5, n_planes=4, max_bucket=10).count()
    assert capped == 0
    uncapped = embedding_near_dups(ident, 0.5, n_planes=4).count()
    assert uncapped == 40 * 39 // 2


def test_planes_for_corpus_scaling():
    from search_engine_spark.operators.similarity import planes_for_corpus

    assert planes_for_corpus(1_000) == 4                     # floor
    assert planes_for_corpus(10**9, target_bucket=1024) == 20  # 2^20 buckets
    assert planes_for_corpus(10**12, target_bucket=4096) >= 27
    assert planes_for_corpus(10**9) > planes_for_corpus(10**6) > 0


def test_lsh_topk_multiprobe_recall(spark):
    """Multi-probe recall >= single-bucket recall vs the exact top-k, and
    n_probes=1 reproduces the single-bucket result exactly."""
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    e = _emb_fixture(spark, n=120)
    q = [float(x) for x in e.where("vec_id = 5").first().embedding]
    rest = e.where("vec_id <> 5")
    exact = [r.vec_id for r in cosine_topk(rest, q, 10).collect()]
    got1 = [r.vec_id for r in lsh_topk(rest, q, 10, n_planes=6, n_probes=1).collect()]
    got4 = [r.vec_id for r in lsh_topk(rest, q, 10, n_planes=6, n_probes=4).collect()]
    r1 = len(set(got1) & set(exact))
    r4 = len(set(got4) & set(exact))
    assert r4 >= r1
    assert set(got1) <= set(got4) | set(got1)  # probe set only grows


def test_candidate_pairs_spill_path_equivalent(spark, tmp_path):
    """Durable-table materialization (cluster mode) produces the same pairs
    as the localCheckpoint default."""
    from search_engine_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signatures,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    b = lsh_buckets(minhash_signatures(corpus), bands=4, rows_per_band=3)
    local = {(r.a, r.b) for r in candidate_pairs(b).collect()}
    spilled = {
        (r.a, r.b)
        for r in candidate_pairs(b, spill_path=str(tmp_path / "bk")).collect()
    }
    assert local == spilled and (0, 1) in local


def test_ivf_topk_subset_and_recall(spark):
    """IVF cells partition the corpus; results are a subset of brute force,
    cosine-ordered; probing more cells only improves recall."""
    from search_engine_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk

    e = _emb_fixture(spark, n=120)
    q = [float(x) for x in e.where("vec_id = 5").first().embedding]
    rest = e.where("vec_id <> 5")
    cent, assign = ivf_assign(rest, n_centroids=8)
    assert assign.count() == rest.count()            # every vector assigned
    assert assign.select("cid").distinct().count() <= 8
    exact = [r.vec_id for r in cosine_topk(rest, q, 10).collect()]
    got2 = [r.vec_id for r in ivf_topk(rest, q, 10, n_centroids=8, nprobe=2).collect()]
    got8 = [r.vec_id for r in ivf_topk(rest, q, 10, n_centroids=8, nprobe=8).collect()]
    assert set(got2) <= set(exact) | set(got2)       # cosine values real
    assert got8 == exact                             # all cells = brute force
    assert len(set(got8) & set(exact)) >= len(set(got2) & set(exact))


def test_ivf_assign_no_shuffle_plan(spark):
    """The inline-argmax assignment must be a pure projection: no Window, no
    shuffle Exchange, no join in the physical plan (the r2 row_number form
    shuffled n x n_centroids rows — the 10^9-vector killer)."""
    import io
    from contextlib import redirect_stdout

    from search_engine_spark.operators.similarity import ivf_assign

    e = _emb_fixture(spark, n=80)
    _, assign = ivf_assign(e, n_centroids=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assign.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Join" not in plan


def test_ivf_assign_argmax_matches_relational(spark):
    """Inline argmax == the relational argmax (crossJoin + row_number) it
    replaced, including lower-cid tie-breaking on duplicate vectors."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from search_engine_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        lowid_centroids,
    )

    e = _emb_fixture(spark, n=100)
    cents, assign = ivf_assign(e, n_centroids=6)
    got = {r.vec_id: r.cid for r in assign.collect()}

    cent_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cid long, cvec array<double>"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_dot"), F.asc("cid"))
    rel = (
        e.crossJoin(F.broadcast(cent_df))
        .select("vec_id", "cid", dot_expr(F.col("embedding"), F.col("cvec")).alias("_dot"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    exp = {r.vec_id: r.cid for r in rel.collect()}
    assert got == exp


def test_kmeans_centroids_recovers_clusters(spark):
    """3-iteration Lloyd's over DataFrame ops separates well-separated
    synthetic clusters: every k-means cell is pure w.r.t. ground truth, and
    within-cell distortion beats the lowid stand-in codebook."""
    import numpy as np

    from search_engine_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        lowid_centroids,
    )

    rng = np.random.default_rng(9)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    rows = []
    for i in range(150):
        c = i % 3
        v = centers[c] + rng.standard_normal(4) * 0.2
        rows.append((i, [float(x) for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    km = kmeans_centroids(e, k=3, n_iters=3)
    assert [c for c, _ in km] == [0, 1, 2]
    _, assign = ivf_assign(e, centroids=km)
    cells = {}
    for r in assign.collect():
        cells.setdefault(r.cid, set()).add(r.vec_id % 3)
    assert all(len(truth) == 1 for truth in cells.values())  # pure cells
    assert len(cells) == 3

    def distortion(cents):
        lut = {c: np.array(v) for c, v in cents}
        _, a = ivf_assign(e, centroids=cents)
        return sum(
            float(np.sum((np.array(r.embedding) - lut[r.cid]) ** 2))
            for r in a.collect()
        )

    assert distortion(km) < distortion(lowid_centroids(e, 3))


def test_kmeans_sample_mod_and_empty_cells(spark):
    """sample_mod trains on a slice but still returns k centroids; k larger
    than distinct points keeps previous centroids for empty cells (no NaNs,
    no crashes)."""
    from search_engine_spark.operators.similarity import kmeans_centroids

    e = _emb_fixture(spark, n=40)
    km = kmeans_centroids(e, k=4, n_iters=2, sample_mod=4)
    assert len(km) == 4 and all(len(v) == 8 for _, v in km)
    assert all(all(x == x for x in v) for _, v in km)  # no NaN

    tiny = _emb_fixture(spark, n=3, dup_pairs=0)
    km2 = kmeans_centroids(tiny, k=3, n_iters=2)
    assert len(km2) == 3


def test_ivf_topk_kmeans_codebook(spark):
    """codebook='kmeans' flows through ivf_topk; probing all cells is
    exhaustive (== brute force) regardless of codebook."""
    from search_engine_spark.operators.similarity import cosine_topk, ivf_topk

    e = _emb_fixture(spark, n=120)
    q = [float(x) for x in e.where("vec_id = 5").first().embedding]
    rest = e.where("vec_id <> 5")
    exact = [r.vec_id for r in cosine_topk(rest, q, 10).collect()]
    got = [
        r.vec_id
        for r in ivf_topk(
            rest, q, 10, n_centroids=6, nprobe=6, codebook="kmeans", kmeans_iters=2
        ).collect()
    ]
    assert got == exact


def test_ivf_topk_precomputed_codebook(spark):
    """centroids= (the per-corpus codebook reuse path for query workloads)
    must give exactly the in-function-trained result, for both codebooks."""
    from search_engine_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
        lowid_centroids,
    )

    e = _emb_fixture(spark, n=120)
    q = [float(x) for x in e.where("vec_id = 5").first().embedding]
    rest = e.where("vec_id <> 5")
    for cb_name, train in (("lowid", lowid_centroids), ("kmeans", kmeans_centroids)):
        kw = {"kmeans_iters": 2} if cb_name == "kmeans" else {}
        inline = [
            (r.vec_id, r.cosine)
            for r in ivf_topk(
                rest, q, 10, n_centroids=6, nprobe=2, codebook=cb_name, **kw
            ).collect()
        ]
        cb = train(rest, 6) if cb_name == "lowid" else train(rest, 6, 2)
        pre = [
            (r.vec_id, r.cosine)
            for r in ivf_topk(rest, q, 10, nprobe=2, centroids=cb).collect()
        ]
        assert pre == inline, cb_name


def _py_components(n_ids, pairs):
    """Brute-force union-find reference for cluster assignment."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_dedup_clusters_matches_union_find(spark):
    """Chain, clique, singleton components: min-label propagation reproduces
    union-find; keep = (doc == component min); singletons keep themselves."""
    from search_engine_spark.operators.dedup import dedup_clusters

    ids = list(range(12))
    # chain 0-1-2-3 (diameter 3), clique {5,6,7}, pair {9,11}; 4,8,10 singles
    pairs = [(0, 1), (1, 2), (2, 3), (5, 6), (5, 7), (6, 7), (9, 11)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pdf = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup_clusters(docs, pdf, id_col="doc_id").collect()
    }
    ref = _py_components(ids, pairs)
    assert got == {i: (ref[i], ref[i] == i) for i in ids}


def test_dedup_clusters_reversed_chain_converges(spark):
    """Worst-case label flow (min id at the chain's far end) still converges
    within max_iter and matches union-find."""
    from search_engine_spark.operators.dedup import dedup_clusters

    n = 9
    pairs = [(i, i + 1) for i in range(n - 1)]  # 0-1-...-8 chain
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pdf = spark.createDataFrame(pairs, "a long, b long")
    out = dedup_clusters(docs, pdf, id_col="doc_id", max_iter=n).collect()
    assert all(r.cluster_id == 0 for r in out)
    assert sorted(r.doc_id for r in out if r.keep) == [0]


def test_canonical_pick_by_score(spark):
    """Quality-based keeper: highest score per cluster wins, ties -> lowest
    id, missing scores never win over scored members."""
    from search_engine_spark.operators.dedup import canonical_pick, dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pdf = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "a long, b long")
    clusters = dedup_clusters(docs, pdf, id_col="doc_id")
    scores = spark.createDataFrame(
        [(0, 0.1), (1, 0.9), (2, 0.9), (4, 0.5)], "doc_id long, score double"
    )  # doc 3 unscored; cluster {0,1,2} tie between 1 and 2
    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in canonical_pick(clusters, scores, id_col="doc_id").collect()
    }
    assert got[1] == (0, True) and got[0] == (0, False) and got[2] == (0, False)
    assert got[4] == (3, True) and got[3] == (3, False)  # 3 unscored loses
    assert got[5] == (5, True)  # singleton keeps itself


def _docs_fixture(spark, n=400):
    rows = [(i, ["en", "zh", "es", "de"][i % 4], 10 + (i * 7) % 90) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_stratified_sample_rates_and_no_shuffle(spark):
    """Kept fraction tracks the per-stratum rate; default applies to
    unlisted strata; the plan is a pure scan+filter (no Exchange)."""
    from search_engine_spark.operators.sampling import stratified_sample

    d = _docs_fixture(spark, 2000)
    out = stratified_sample(d, {"en": 0.6, "zh": 0.2}, default_rate=0.05)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 500 - 0.6) < 0.1
    assert abs(got["zh"] / 500 - 0.2) < 0.1
    assert got.get("es", 0) / 500 < 0.12 and got.get("de", 0) / 500 < 0.12
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # determinism: same salt -> identical rows; new salt -> independent draw
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in stratified_sample(d, {"en": 0.6, "zh": 0.2}, default_rate=0.05).collect()}
    c = {r.doc_id for r in stratified_sample(d, {"en": 0.6, "zh": 0.2}, salt="v2", default_rate=0.05).collect()}
    assert a == b and a != c


def test_token_budget_sample_budget_and_bucket_invariance(spark):
    """Running token total per stratum stays <= budget; the bucketed
    two-phase prefix sum equals the naive B=1 single-window form; raising
    a budget only adds docs."""
    from search_engine_spark.operators.sampling import token_budget_sample

    d = _docs_fixture(spark, 400)
    budgets = {"en": 900, "zh": 400, "es": 150}
    out = token_budget_sample(d, budgets, n_buckets=16)
    sums = {r.lang: r.s for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()}
    for lang, cap in budgets.items():
        assert sums.get(lang, 0) <= cap, (lang, sums)
    assert "de" not in sums  # default budget 0 drops unlisted strata
    naive = token_budget_sample(d, budgets, n_buckets=1)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in naive.collect()}
    bigger = token_budget_sample(d, {**budgets, "zh": 800}, n_buckets=16)
    kept, kept_big = {r.doc_id for r in out.collect()}, {r.doc_id for r in bigger.collect()}
    assert kept < kept_big  # strictly more docs, none removed


def test_token_budget_auto_bucket_sizing(spark):
    """n_buckets=None derives B from the data (max over strata of
    ceil(stratum_tokens/budget), window-row cap, _B_CAP clamp) and the
    selected set is IDENTICAL to any explicit B — a mis-sized caller B can
    skew reducers but never change results, and auto-B removes the guess."""
    from search_engine_spark.operators import sampling as SA

    d = _docs_fixture(spark, 400)
    budgets = {"en": 900, "zh": 400, "es": 150}
    auto = SA.token_budget_sample(d, budgets)  # n_buckets=None
    explicit = SA.token_budget_sample(d, budgets, n_buckets=16)
    assert {r.doc_id for r in auto.collect()} == {r.doc_id for r in explicit.collect()}
    # the rule itself: B >= stratum_tokens/budget for the tightest stratum
    per = d.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    toks = {r.lang: int(r.t) for r in per}
    import math
    want = max(math.ceil(toks[s] / b) for s, b in budgets.items())
    # replicate the sizing (unit-level, no Spark internals)
    got = 1
    for s, b in budgets.items():
        got = max(got, math.ceil(toks[s] / b))
    assert got == want and want >= 2  # fixture actually exercises B > 1
    assert SA._B_CAP >= want


def _ppm(w: int, h: int, seed: int) -> bytes:
    """Deterministic binary-PPM fixture payload (pure numpy)."""
    rng = np.random.RandomState(seed)
    raster = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# fixture seed=%d\n%d %d\n255\n" % (seed, w, h) + raster.tobytes()


def test_ppm_decoder_runs_real_decode_in_spark(spark):
    """The REAL (non-stub) decode path must execute in this container:
    decode_ppm is pure numpy over an uncompressed format, so the full
    mapInPandas feature extraction runs it end-to-end — header parse
    (with comments), BT.601 grayscale, area-average thumbnail, [-1,1]
    range — and matches the single-node decode exactly."""
    from search_engine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_ppm,
        extract_features,
    )

    payloads = [_ppm(24, 16, 1), _ppm(7, 5, 2), _ppm(2, 2, 3), _ppm(64, 48, 4)]
    rows = [
        (i, "image/x-portable-pixmap", p, len(p),
         __import__("hashlib").sha256(p).hexdigest())
        for i, p in enumerate(payloads)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.docId: r.feature for r in extract_features(media, decoder="ppm").collect()}
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        exp = decode_ppm(p, 16)
        assert np.allclose(got[i], exp, atol=0), i  # exact: same code path
        assert len(got[i]) == 16 and max(abs(x) for x in got[i]) <= 1.0
    # malformed payloads fail loudly, not silently
    with pytest.raises(ValueError):
        decode_ppm(b"P5 2 2 255 " + bytes(12))
    with pytest.raises(ValueError):
        decode_ppm(b"P6 4 4 255 " + bytes(5))  # truncated raster


def test_langid_nb_model(spark):
    """Char-trigram NB lang-ID (functions/langid.py): held-out accuracy on
    the committed fixture, bit-identical distributed vs single-node
    predictions, und for unscoreable rows, deterministic across calls."""
    from search_engine_spark.functions import langid as L

    acc, n = L.heldout_accuracy()
    assert n >= 20 and acc >= 0.9, (acc, n)
    m = L.default_model()
    texts = [
        "the weather is lovely today and the birds are singing",
        "la vida es un viaje largo lleno de sorpresas y alegría",
        "das leben ist eine reise voller überraschungen und freude",
        "la vie est un long voyage plein de surprises et de joie",
        "",
        "12",
    ]
    import pandas as pd
    single = list(m.predict_pdf(pd.Series(texts)))
    assert single[:4] == ["en", "es", "de", "fr"] and single[4:] == ["und", "und"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(4)
    got = {r.doc_id: r.lang_nb for r in L.lang_id_nb(df, "text", "doc_id").collect()}
    assert [got[i] for i in range(len(texts))] == single


def test_grouped_topk(spark):
    """Bucketed two-stage grouped top-k == the row_number() oracle, at
    several (k, n_buckets) shapes including ties and k > group size."""
    import random

    from search_engine_spark.operators.sampling import grouped_topk

    rng = random.Random(7)
    rows = [
        (i, ["en", "de", "fr"][i % 3], rng.randrange(0, 40))  # dup values => ties
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v long")

    def oracle(k):
        out = []
        for g in ("en", "de", "fr"):
            grp = sorted(
                ((v, -i) for i, l, v in rows if l == g), reverse=True
            )[:k]
            out.extend((g, -ni, v) for v, ni in grp)
        return sorted(out)

    for k, b in ((1, 4), (3, 8), (5, 1), (7, 64), (500, 8)):
        got = sorted(
            (r.lang, r.doc_id, r.v)
            for r in grouped_topk(df, ["lang"], "v", "doc_id", k, n_buckets=b).collect()
        )
        assert got == oracle(k), (k, b)

    with pytest.raises(ValueError):
        grouped_topk(df, ["lang"], "v", "doc_id", 0)


def test_repetition_stats(spark):
    from search_engine_spark.operators.textstats import repetition_stats

    texts = [
        "a b a b a b a b",              # 0: top bigram "a b" covers 4/8*2=... 4 occurrences * 2 / 8 = 1.0
        "w x y z p q r s t u v m n o k j i h g f",  # 1: all bigrams unique
        "one two three one two three one two three",  # 2: dup trigrams
        "solo",                          # 3: 1 token — no bigrams/trigrams
        "",                              # 4: empty
    ]
    df = corpus_from_texts(spark, texts)
    got = {
        r.docId: r
        for r in repetition_stats(df, "content", "docId").collect()
    }
    # doc 0: bigrams = [a b, b a, a b, b a, a b, b a, a b] -> top "a b" x4 -> 8/8
    assert got[0].top_bigram_frac == 1.0 and got[0].repetitious
    # doc 1: every bigram distinct -> 2/20
    assert got[1].top_bigram_frac == 0.1 and not got[1].repetitious
    # doc 2: 9 tokens, trigrams total 7, distinct 3 -> dup frac 1-3/7
    assert abs(got[2].dup_trigram_frac - (1 - 3 / 7)) < 1e-6
    assert got[2].repetitious
    # degenerate docs: all zeros, not flagged
    for d in (3, 4):
        assert got[d].top_bigram_frac == 0.0
        assert got[d].dup_trigram_frac == 0.0
        assert not got[d].repetitious


def test_decontaminate(spark):
    from search_engine_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        bench_text,                                        # 0: the benchmark doc
        "prefix alpha beta gamma delta epsilon zeta eta theta suffix",  # 1: shares an 8-gram
        "alpha beta gamma delta epsilon zeta eta misses the rest",      # 2: longest shared run is 7
        "totally unrelated content with no overlap at all here now",    # 3: clean
    ]
    df = corpus_from_texts(spark, texts)
    bench = df.where(F.col("docId") == 0)
    corpus = df.where(F.col("docId") != 0)
    got = {
        r.docId: r
        for r in decontaminate(corpus, bench, "content", "docId", ngram_n=8).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1].contaminated and got[1].n_hit_ngrams == 1
    assert not got[2].contaminated and got[2].n_hit_ngrams == 0
    assert not got[3].contaminated


def test_pii_scrub(spark):
    from search_engine_spark.operators.textstats import pii_scrub

    texts = [
        "contact me at john.doe+spam@mail.example.org or 415-555-0199 thanks",
        "no pii here just words",
        "two mails a@b.io c.d@e-f.co and dotted phone 212.867.5309 end",
    ]
    df = corpus_from_texts(spark, texts)
    got = {r.docId: r for r in pii_scrub(df, "content", "docId").collect()}
    assert (got[0].n_email, got[0].n_phone) == (1, 1)
    assert got[0].scrubbed == "contact me at [EMAIL] or [PHONE] thanks"
    assert (got[1].n_email, got[1].n_phone) == (0, 0)
    assert got[1].scrubbed == texts[1]
    assert (got[2].n_email, got[2].n_phone) == (2, 1)
    assert got[2].scrubbed == "two mails [EMAIL] [EMAIL] and dotted phone [PHONE] end"


def test_pii_scrub_case_and_sequential_counts(spark):
    from search_engine_spark.operators.textstats import pii_scrub

    texts = [
        "Reach John.Doe@Example.COM or Keep This CASE",
        # phone-shaped digits inside the email are consumed by the email
        # redaction and must NOT be double-counted as a phone
        "ping a.555-123-4567@x.io now",
    ]
    df = corpus_from_texts(spark, texts)
    got = {r.docId: r for r in pii_scrub(df, "content", "docId").collect()}
    assert got[0].scrubbed == "Reach [EMAIL] or Keep This CASE"
    assert (got[0].n_email, got[0].n_phone) == (1, 0)
    assert got[1].scrubbed == "ping [EMAIL] now"
    assert (got[1].n_email, got[1].n_phone) == (1, 0)


def test_sequence_pack(spark):
    from search_engine_spark.operators.sampling import sequence_pack

    rows = [(i, t) for i, t in enumerate([5, 3, 4, 10, 2, 6, 1])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.bin, r.bin_offset)
        for r in sequence_pack(df, capacity=8).collect()
    }
    # exclusive cumsums: 0,5,8,12,22,24,30 -> bins 0,0,1,1,2,3,3
    exp_pre = [0, 5, 8, 12, 22, 24, 30]
    for i, p in enumerate(exp_pre):
        assert got[i] == (p // 8, p % 8), (i, got[i])
    # bins independent of bucketing knob
    got_b = {
        r.doc_id: (r.bin, r.bin_offset)
        for r in sequence_pack(df, capacity=8, n_buckets=3).collect()
    }
    assert got_b == got
    # sparse/non-contiguous ids still pack in id order
    sparse = spark.createDataFrame(
        [(100, 4), (7, 4), (5000, 4)], "doc_id long, n_tokens long"
    )
    sp = {r.doc_id: r.bin for r in sequence_pack(sparse, capacity=8).collect()}
    assert sp == {7: 0, 100: 0, 5000: 1}
    with pytest.raises(ValueError):
        sequence_pack(df, capacity=0)


def test_grouped_topk_ignores_null_metrics(spark):
    from search_engine_spark.operators.sampling import grouped_topk

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, None), ("a", 3, 7.0), ("b", 4, None)],
        "g string, id long, v double",
    )
    got = {
        (r.g, r.id): r.v for r in grouped_topk(df, ["g"], "v", "id", k=2).collect()
    }
    # null metrics never occupy top-k slots; all-null groups vanish
    assert got == {("a", 3): 7.0, ("a", 1): 5.0}


def test_mix_to_target(spark):
    from search_engine_spark.operators.sampling import mix_to_target

    rows = (
        [(i, "a") for i in range(600)]
        + [(i + 1000, "b") for i in range(300)]
        + [(i + 2000, "c") for i in range(100)]
        + [(i + 3000, "drop_me") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mix_to_target(
        df, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, strata_col="source"
    )
    by = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    # 'c' (under target) keeps everything; a and b down-sample toward it
    assert by.get("c") == 100
    assert "drop_me" not in by  # absent from targets -> dropped
    assert by["a"] < 600 and by["b"] < 300
    # realized mix is as equal as deletion-only allows: each within noise
    # of the binding stratum's count (Bernoulli at ~1/6 and ~1/3 of a/b)
    for s in ("a", "b"):
        assert abs(by[s] - 100) <= 40
    # deterministic: second run keeps the identical set
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in mix_to_target(
            df, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, strata_col="source"
        ).collect()
    }
    assert ids1 == ids2
