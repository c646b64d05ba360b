"""Structured-Streaming ingest: micro-batch index append must equal the batch
build (same manifest machinery => byte-identical query results), and the
watermarked windowed aggregation must match a batch groupBy."""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from search_engine_spark.sources.segments import (
    build_index,
    load_segments,
    read_manifest,
    segment_dict,
)
from search_engine_spark.streaming.ingest import (
    index_sink,
    stream_corpus_from_files,
    windowed_term_counts,
)
from tests.conftest import corpus_from_texts

TEXTS = [
    "apple banana cherry apple",
    "banana date egg",
    "cherry egg fig apple",
    "date fig grape",
]

STREAM_SCHEMA = StructType(
    [
        StructField("docId", LongType(), False),
        StructField("content", StringType(), False),
    ]
)


def test_stream_ingest_equals_batch_build(spark, tmp_path):
    corpus = corpus_from_texts(spark, TEXTS)

    # batch reference index
    batch_idx = str(tmp_path / "batch_idx")
    build_index(spark, corpus, batch_idx, analyzer="naive", num_segments=4)

    # stream: drop the same rows as two parquet files into a watched dir
    src = tmp_path / "incoming"
    src.mkdir()
    pdf = corpus.select("docId", "content").toPandas()
    pdf.iloc[:2].to_parquet(src / "part1.parquet", index=False)
    pdf.iloc[2:].to_parquet(src / "part2.parquet", index=False)

    stream_idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_corpus_from_files(spark, str(src), STREAM_SCHEMA)
    q = index_sink(
        spark, stream, stream_idx, analyzer="naive", num_segments=4,
        checkpoint_dir=ckpt, trigger_available_now=True,
    )
    q.awaitTermination(120)

    m = read_manifest(stream_idx)
    assert m["finalized"] and m["stats"]["n_docs"] == len(TEXTS)
    assert any(k.startswith("stream-") for k in m["batches"])
    # identical decoded index content
    assert segment_dict(spark, stream_idx) == segment_dict(spark, batch_idx)
    assert segment_dict(spark, stream_idx, positional=True) == segment_dict(
        spark, batch_idx, positional=True
    )
    shutil.rmtree(stream_idx, ignore_errors=True)


def test_stream_ingest_membership_trigram(spark, tmp_path):
    """Streaming substring-index ingest: micro-batches commit membership
    (tf/dl-free) trigram batches; substring search over the streamed index
    equals the full-scan truth."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.codesearch import search_substring
    from search_engine_spark.sources.segments import (
        load_segments,
        load_term_stats,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    src = tmp_path / "in3"
    src.mkdir()
    pdf = corpus.select("docId", "content").toPandas()
    pdf.iloc[:2].to_parquet(src / "p1.parquet", index=False)
    pdf.iloc[2:].to_parquet(src / "p2.parquet", index=False)
    idx = str(tmp_path / "tri_stream_idx")
    stream = stream_corpus_from_files(spark, str(src), STREAM_SCHEMA)
    q = index_sink(
        spark, stream, idx, analyzer="trigram", num_segments=4,
        checkpoint_dir=str(tmp_path / "ckpt3"), trigger_available_now=True,
        with_positions=False, membership=True,
    )
    q.awaitTermination(120)
    segs, ts = load_segments(spark, idx), load_term_stats(spark, idx)
    assert segs.agg(F.sum(F.octet_length("tfs"))).first()[0] == 0
    needle = TEXTS[0][3:12]  # mid-text slice, crosses word boundaries
    want = sorted(
        r.docId
        for r in corpus.where(F.col("content").contains(needle)).collect()
    )
    got = sorted(
        r.docId for r in search_substring(segs, corpus, needle, ts).collect()
    )
    assert got == want and got


def test_stream_ingest_restart_is_idempotent(spark, tmp_path):
    """Re-running the stream over the same checkpoint must not duplicate
    batches (exactly-once input tracking + manifest idempotence)."""
    corpus = corpus_from_texts(spark, TEXTS)
    src = tmp_path / "in2"
    src.mkdir()
    corpus.select("docId", "content").toPandas().to_parquet(
        src / "all.parquet", index=False
    )
    idx = str(tmp_path / "idx2")
    ckpt = str(tmp_path / "ckpt2")
    for _ in range(2):  # second run: no new input, no new batches
        q = index_sink(
            spark,
            stream_corpus_from_files(spark, str(src), STREAM_SCHEMA),
            idx, analyzer="naive", num_segments=4,
            checkpoint_dir=ckpt, trigger_available_now=True,
        )
        q.awaitTermination(120)
    m = read_manifest(idx)
    assert m["stats"]["n_docs"] == len(TEXTS)
    assert len([k for k in m["batches"] if k.startswith("stream-")]) == 1


def test_windowed_term_counts_match_batch(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(seconds=10), "apple banana"),
        (t0 + timedelta(seconds=50), "apple"),
        (t0 + timedelta(seconds=70), "banana banana"),
        (t0 + timedelta(seconds=200), "apple cherry"),
    ]
    schema = StructType(
        [StructField("ts", TimestampType(), False), StructField("content", StringType(), False)]
    )
    src = tmp_path / "ev"
    # write with Spark (pandas would emit ns-INT64 ts that Spark can't read)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = windowed_term_counts(stream, "ts", "content", "1 minute", "2 minutes")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.term): r.tf for r in spark.read.parquet(out).collect()
    }
    batch = spark.createDataFrame(rows, schema)
    exp_df = (
        batch.select(F.col("ts"), F.explode(F.split(F.lower("content"), r"\s+")).alias("term"))
        .groupBy(F.window("ts", "1 minute").alias("w"), "term")
        .agg(F.count("*").alias("tf"))
        .select(F.col("w.start").alias("window_start"), "term", "tf")
    )
    exp_all = {(r.window_start, r.term): r.tf for r in exp_df.collect()}
    # append mode emits only windows CLOSED by the final watermark
    # (max event ts - 2 min); later windows stay in state — that is the
    # late-data semantics under test.
    wm = max(ts for ts, _ in rows) - timedelta(minutes=2)
    exp_closed = {
        (ws, t): tf
        for (ws, t), tf in exp_all.items()
        if ws + timedelta(minutes=1) <= wm
    }
    assert got == exp_closed
    assert got  # at least one window actually closed


def test_stateful_first_seen_dedup_across_restarts(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: only the first
    occurrence of each content hash passes — within a micro-batch, across
    micro-batches, AND across a query restart (state restored from the
    streaming checkpoint)."""
    import pandas as pd

    from search_engine_spark.streaming.state import first_seen_dedup

    schema = StructType(
        [
            StructField("docId", LongType(), False),
            StructField("content_md5", StringType(), False),
        ]
    )
    src = tmp_path / "dedup_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            first_seen_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: h1 twice (in-batch dup), h2 once
    pd.DataFrame(
        {"docId": [1, 2, 3], "content_md5": ["h1", "h1", "h2"]}
    ).to_parquet(src / "a.parquet", index=False)
    run_once()
    got1 = {(r.docId, r.content_md5) for r in spark.read.parquet(out_dir).collect()}
    assert {m for _, m in got1} == {"h1", "h2"} and len(got1) == 2
    keeper_h1 = next(d for d, m in got1 if m == "h1")
    assert keeper_h1 in (1, 2)  # arrival order within the batch decides

    # batch 2 after RESTART: h1/h2 again (must be dropped via restored
    # state), h3 new (must pass)
    pd.DataFrame(
        {"docId": [4, 5, 6], "content_md5": ["h1", "h2", "h3"]}
    ).to_parquet(src / "b.parquet", index=False)
    run_once()
    got2 = {(r.docId, r.content_md5) for r in spark.read.parquet(out_dir).collect()}
    assert got2 - got1 == {(6, "h3")}


def test_stateful_first_seen_dedup_bloom_bounded(spark, tmp_path):
    """Bloom state mode: same first-seen semantics end-to-end (FP negligible
    at this fill factor), state restored across a restart, and the state
    payload is a FIXED filter_bits/8 bytes regardless of how many keys have
    been absorbed."""
    import pandas as pd

    from search_engine_spark.streaming.state import first_seen_dedup

    schema = StructType(
        [
            StructField("docId", LongType(), False),
            StructField("content_md5", StringType(), False),
        ]
    )
    src = tmp_path / "bloom_in"
    src.mkdir()
    ckpt = str(tmp_path / "bloom_ckpt")
    out_dir = str(tmp_path / "bloom_out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            first_seen_dedup(stream, state_mode="bloom", filter_bits=1 << 16)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pd.DataFrame(
        {"docId": [1, 2, 3], "content_md5": ["h1", "h1", "h2"]}
    ).to_parquet(src / "a.parquet", index=False)
    run_once()
    got1 = {(r.docId, r.content_md5) for r in spark.read.parquet(out_dir).collect()}
    assert {m for _, m in got1} == {"h1", "h2"} and len(got1) == 2

    pd.DataFrame(
        {"docId": [4, 5, 6], "content_md5": ["h1", "h2", "h3"]}
    ).to_parquet(src / "b.parquet", index=False)
    run_once()
    got2 = {(r.docId, r.content_md5) for r in spark.read.parquet(out_dir).collect()}
    assert got2 - got1 == {(6, "h3")}


def test_bloom_kernel_state_size_invariant():
    """The bloom filter bytes stay O(filter_bits) as keys accumulate (the
    exact-set state grows linearly — the 100 TB divergence), duplicates
    NEVER pass (one-sided error), and FPs only ever drop new keys."""
    import pandas as pd
    import numpy as np

    from search_engine_spark.streaming.state import _bloom_test_and_add

    filter_bits, n_hashes = 1 << 16, 4
    bits = np.zeros(filter_bits // 8, dtype=np.uint8)
    seen_exact: set[str] = set()
    passed: list[str] = []
    for batch in range(20):
        keys = pd.Series(
            [f"k{(batch * 37 + j) % 900}" for j in range(100)]  # heavy re-use
        )
        mask = _bloom_test_and_add(bits, keys, filter_bits, n_hashes)
        for k, fresh in zip(keys, mask):
            if fresh:
                assert k not in {p for p in passed}, "duplicate passed"
                passed.append(k)
            seen_exact.add(k)
        assert len(bits) == filter_bits // 8  # state size NEVER grows
    # one-sided: everything passed exactly once; FPs can only reduce passes
    assert len(passed) == len(set(passed))
    assert set(passed) <= seen_exact
    # at 900 keys / 65536 bits the FP rate is ~0 — everything new passed
    assert len(passed) == len(seen_exact)


def test_first_seen_dedup_bad_mode():
    import pytest as _pytest

    from search_engine_spark.streaming.state import first_seen_dedup

    with _pytest.raises(ValueError, match="state_mode"):
        first_seen_dedup(None, state_mode="nope")


def test_stream_serving_equals_batch_scoring(spark, tmp_path):
    """Streaming query serving (foreachBatch -> batched DAAT) must produce
    exactly the batch path's results, micro-batch replay must overwrite
    itself, and every micro-batch is one job over the shared index state."""
    import pandas as pd

    from search_engine_spark.operators.rank import Scorer, score_queries_daat_batch
    from search_engine_spark.sources.segments import (
        docid_span,
        load_term_stats_pdf,
    )
    from search_engine_spark.streaming.serve import (
        serving_sink,
        stream_queries_from_files,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    idx = str(tmp_path / "serve_idx")
    m = build_index(spark, corpus, idx, analyzer="naive", n_batches=1)

    qdir = str(tmp_path / "qstream")
    out = str(tmp_path / "results")
    import os

    os.makedirs(qdir, exist_ok=True)
    queries = {0: ["apple"], 1: ["banana", "egg"], 2: ["fig", "grape"]}
    pd.DataFrame(
        {"qid": list(queries), "terms": [queries[q] for q in queries]}
    ).to_parquet(f"{qdir}/q0.parquet")

    q = serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out, k=5
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(f"{out}/batch=0")
        .orderBy("qid", F.desc("score"), "docId")
        .collect()
    )
    want = (
        score_queries_daat_batch(
            spark,
            load_segments(spark, idx),
            load_term_stats_pdf(idx),
            queries,
            m["stats"]["n_docs"],
            m["stats"]["avgdl"],
            Scorer("bm25"),
            5,
            analyzer="naive",
            docid_span=docid_span(idx),
        )
        .orderBy("qid", F.desc("score"), "docId")
        .collect()
    )
    assert [(r.qid, r.docId, r.score) for r in got] == [
        (r.qid, r.docId, r.score) for r in want
    ]

    # late micro-batch: drop more queries, restart the availableNow stream
    # from the same checkpoint — batch 0 is not re-emitted, batch 1 lands
    pd.DataFrame({"qid": [7], "terms": [["cherry"]]}).to_parquet(
        f"{qdir}/q1.parquet"
    )
    q2 = serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out, k=5
    )
    q2.awaitTermination(120)
    batches = {
        int(r.batch_id) for r in spark.read.parquet(f"{out}/batch=*").select("batch_id").distinct().collect()
    }
    assert batches == {0, 1}
    got7 = spark.read.parquet(f"{out}/batch=1").collect()
    assert {int(r.qid) for r in got7} == {7} and len(got7) >= 1


def test_stream_serving_cached_equals_uncached(spark, tmp_path):
    """serving_sink(cache_dir=...) — micro-batches over the prepared
    bucketized shards — must produce exactly the uncached stream results."""
    import os

    import pandas as pd

    from search_engine_spark.streaming.serve import (
        serving_sink,
        stream_queries_from_files,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    idx = str(tmp_path / "cserve_idx")
    build_index(spark, corpus, idx, analyzer="naive", n_batches=1)
    qdir = str(tmp_path / "qstream")
    os.makedirs(qdir, exist_ok=True)
    queries = {0: ["apple"], 1: ["banana", "egg"], 2: ["fig", "grape"]}
    pd.DataFrame(
        {"qid": list(queries), "terms": [queries[q] for q in queries]}
    ).to_parquet(f"{qdir}/q0.parquet")

    out_a, out_b = str(tmp_path / "res_plain"), str(tmp_path / "res_cached")
    serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out_a, k=5
    ).awaitTermination(120)
    serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out_b, k=5,
        cache_dir=str(tmp_path / "scache"),
    ).awaitTermination(120)

    def rows(out):
        return sorted(
            (r.qid, r.docId, round(r.score, 12))
            for r in spark.read.parquet(f"{out}/batch=0").collect()
        )

    assert rows(out_a) == rows(out_b) and rows(out_a)


def test_stream_serving_refresh_on_growth(spark, tmp_path):
    """serving_sink(refresh_on_growth=True) reuses a pre-existing cache and
    brings it current with DELTA shards (not a rebuild): docs committed
    after the cache was prepared serve without a stream restart, and the
    results match an uncached stream over the grown index."""
    import os

    import pandas as pd

    from search_engine_spark.operators.serving import prepare_serving_cache
    from search_engine_spark.sources.segments import (
        build_one_batch,
        finalize_index,
    )
    from search_engine_spark.streaming.serve import (
        serving_sink,
        stream_queries_from_files,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    idx = str(tmp_path / "gserve_idx")
    build_index(spark, corpus, idx, analyzer="naive", n_batches=1)
    scache = str(tmp_path / "gcache")
    prepare_serving_cache(spark, idx, scache, n_buckets=4)
    # index grows AFTER the cache was prepared
    extra = corpus_from_texts(
        spark, ["apple kumquat", "kumquat kumquat fig"]
    ).withColumn("docId", F.col("docId") + F.lit(100))
    build_one_batch(spark, extra, idx, key="grow", analyzer="naive",
                    num_segments=4)
    finalize_index(spark, idx)
    # and a delete: doc 0 ("apple banana cherry apple") must stop serving
    from search_engine_spark.operators.delete import add_tombstones

    add_tombstones(spark, idx, spark.createDataFrame([(0,)], "docId long"))

    qdir = str(tmp_path / "qstream")
    os.makedirs(qdir, exist_ok=True)
    queries = {0: ["apple"], 1: ["kumquat"]}
    pd.DataFrame(
        {"qid": list(queries), "terms": [queries[q] for q in queries]}
    ).to_parquet(f"{qdir}/q0.parquet")

    out_a, out_b = str(tmp_path / "res_plain"), str(tmp_path / "res_grown")
    serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out_b, k=5,
        cache_dir=scache, refresh_on_growth=True,
    ).awaitTermination(120)
    assert any(".d" in f for f in os.listdir(scache)), \
        "growth must arrive as delta shards, not a cache rebuild"
    serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx, out_a, k=5
    ).awaitTermination(120)

    def rows(out):
        return sorted(
            (r.qid, r.docId, round(r.score, 12))
            for r in spark.read.parquet(f"{out}/batch=0").collect()
        )

    got = rows(out_b)
    assert got == rows(out_a)
    assert {d for q, d, _ in got if q == 1} >= {100, 101}  # new docs serve
    assert all(d != 0 for _, d, _ in got)  # tombstoned doc stopped serving


def test_user_sessions_batch_boundaries(spark):
    from search_engine_spark.streaming.ingest import user_sessions

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: three events chained within the gap, then a clean break
        (1, t0, 1.0),
        (1, t0 + timedelta(minutes=29, seconds=59), 2.0),
        (1, t0 + timedelta(minutes=59, seconds=58), 4.0),
        (1, t0 + timedelta(minutes=90, seconds=30), 8.0),
        # user 2: an event EXACTLY gap after its predecessor merges
        (2, t0, 1.0),
        (2, t0 + timedelta(minutes=30), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in user_sessions(df, gap="30 minutes").collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == ("2024-01-01 01:29:58", 3, 7.0)
    assert got[(1, "2024-01-01 01:30:30")] == ("2024-01-01 02:00:30", 1, 8.0)
    # exact-gap event merged: one session of 2 events ending last_ts + gap
    assert got[(2, "2024-01-01 00:00:00")] == ("2024-01-01 01:00:00", 2, 3.0)
    assert len(got) == 3


def test_user_sessions_streaming_matches_batch(spark, tmp_path):
    from search_engine_spark.streaming.ingest import user_sessions

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0 + timedelta(minutes=m), float(m)) for m in (0, 10, 50, 120, 125)
    ] + [(2, t0 + timedelta(minutes=m), float(m)) for m in (5, 90, 95, 200)]
    schema = StructType([
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), False),
    ])
    src = tmp_path / "sess_ev"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = user_sessions(stream, gap="30 minutes", watermark="1 minute")
    out = str(tmp_path / "sess_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    batch = user_sessions(spark.createDataFrame(rows, schema), gap="30 minutes")
    # append mode emits sessions closed by the final watermark (max ts - 1m):
    # every session ending before it must appear with identical aggregates
    wm = max(ts for _, ts, _ in rows) - timedelta(minutes=1)
    exp = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in batch.collect()
        if datetime.strptime(r.session_end, "%Y-%m-%d %H:%M:%S") <= wm
    }
    assert exp and all(got.get(k) == v for k, v in exp.items())


def test_trending_terms_batch(spark):
    from search_engine_spark.streaming.ingest import trending_terms

    t0 = datetime(2024, 1, 1)
    rows = (
        [(t0 + timedelta(minutes=5), "a", 1.0)] * 3
        + [(t0 + timedelta(minutes=10), "b", 1.0)] * 2
        + [(t0 + timedelta(minutes=40), "c", 1.0)] * 4
        + [(t0 + timedelta(minutes=40), "d", 1.0)]
    )
    df = spark.createDataFrame(
        [(ts, term, v) for ts, term, v in rows],
        "ts timestamp, event_type string, value double",
    )
    got = {
        (r.window_start, r.event_type): r.n
        for r in trending_terms(
            df, window="1 hour", slide="30 minutes", top_k=2
        ).collect()
    }
    # window starting 00:00 sees a(3), b(2), c(4), d(1) -> top2 = c, a
    assert got[("2024-01-01 00:00:00", "c")] == 4
    assert got[("2024-01-01 00:00:00", "a")] == 3
    assert ("2024-01-01 00:00:00", "b") not in got
    # sliding: events at :40 also land in the 00:30 window
    assert got[("2024-01-01 00:30:00", "c")] == 4
    assert got[("2024-01-01 00:30:00", "d")] == 1
    # events at :05/:10 also land in the 23:30 window of the previous day
    assert got[("2023-12-31 23:30:00", "a")] == 3


def test_stream_restart_with_conflicting_flags_fails_loudly(spark, tmp_path):
    """ADVICE r4: a stream restarted with different format flags than the
    manifest records must raise at the sink, never silently write mixed
    membership/positional batches that only explode at compaction."""
    import pyspark.sql.utils  # noqa: F401

    corpus = corpus_from_texts(spark, TEXTS)
    src = tmp_path / "in_conflict"
    src.mkdir()
    corpus.select("docId", "content").toPandas().to_parquet(
        src / "all.parquet", index=False
    )
    idx = str(tmp_path / "idx_conflict")
    stream = stream_corpus_from_files(spark, str(src), STREAM_SCHEMA)
    q = index_sink(
        spark, stream, idx, analyzer="trigram", num_segments=2,
        checkpoint_dir=str(tmp_path / "ck_a"), trigger_available_now=True,
        with_positions=False, membership=True,
    )
    q.awaitTermination(120)
    # second file arrives; restart the stream WITHOUT membership
    corpus.select("docId", "content").toPandas().to_parquet(
        src / "more.parquet", index=False
    )
    stream2 = stream_corpus_from_files(spark, str(src), STREAM_SCHEMA)
    q2 = index_sink(
        spark, stream2, idx, analyzer="trigram", num_segments=2,
        checkpoint_dir=str(tmp_path / "ck_a"), trigger_available_now=True,
        with_positions=False, membership=False,
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="conflict with the manifest"):
        q2.awaitTermination(120)


def test_stream_serving_micro_batch_row_cap(spark, tmp_path):
    """A malformed giant query micro-batch must fail loudly at the cap, not
    collect() unboundedly onto the driver; a batch at the cap still serves."""
    import os

    import pandas as pd

    from search_engine_spark.streaming.serve import (
        serving_sink,
        stream_queries_from_files,
    )

    corpus = corpus_from_texts(spark, TEXTS)
    idx = str(tmp_path / "cap_idx")
    build_index(spark, corpus, idx, analyzer="naive", n_batches=1)

    qdir = str(tmp_path / "cap_q")
    os.makedirs(qdir, exist_ok=True)
    pd.DataFrame({"qid": [0, 1, 2], "terms": [["apple"]] * 3}).to_parquet(
        f"{qdir}/q0.parquet"
    )

    # over the cap -> loud planner-style error naming the knob
    q = serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx,
        str(tmp_path / "cap_out_fail"), k=5,
        checkpoint_dir=str(tmp_path / "cap_ck_fail"),
        max_queries_per_batch=2,
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_queries_per_batch"):
        q.awaitTermination(120)

    # exactly at the cap -> serves normally
    q2 = serving_sink(
        spark, stream_queries_from_files(spark, qdir), idx,
        str(tmp_path / "cap_out_ok"), k=5,
        checkpoint_dir=str(tmp_path / "cap_ck_ok"),
        max_queries_per_batch=3,
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "cap_out_ok") + "/batch=0")
    assert {int(r.qid) for r in got.collect()} == {0, 1, 2}


def test_stream_percolate_equals_batch(spark, tmp_path):
    """Streaming reverse search: percolate_sink over a doc stream must
    produce exactly the batch percolate matches, unioned across batches."""
    from search_engine_spark.operators.query import percolate, percolate_queries
    from search_engine_spark.streaming.serve import percolate_sink

    corpus = corpus_from_texts(spark, TEXTS)
    src = tmp_path / "perc_incoming"
    src.mkdir()
    pdf = corpus.select("docId", "content").toPandas()
    pdf.iloc[:2].to_parquet(src / "p1.parquet", index=False)
    pdf.iloc[2:].to_parquet(src / "p2.parquet", index=False)

    queries = {1: ["apple", "banana"], 2: ["fig"], 3: ["egg", "date"],
               4: ["nosuchterm"]}
    out = str(tmp_path / "perc_out")
    stream = stream_corpus_from_files(spark, str(src), STREAM_SCHEMA)
    q = percolate_sink(spark, stream, queries, out, analyzer="naive")
    q.awaitTermination(120)

    got = {
        (r.docId, r.qid)
        for r in spark.read.parquet(f"{out}/batch=*").collect()
    }
    qt = percolate_queries(spark, queries, analyzer="naive")
    want = {(r.docId, r.qid) for r in percolate(corpus, qt).collect()}
    assert got == want and want  # non-trivial match set
    # alert 4 (absent term) never fires
    assert not any(qid == 4 for _, qid in got)
