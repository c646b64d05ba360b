"""Structured-Streaming query serving: micro-batch BM25 over a live index.

The serving twin of :mod:`ingest`: queries arrive as a stream (a file
source here — at deployment a Kafka topic with the same schema), each
micro-batch is scored as ONE ``score_queries_daat_batch`` job (shared scan,
one bucket shuffle, decode-once kernel — the engine's throughput path), and
results land in an append sink keyed by ``(batch_id, qid)``.

Scale shape: the per-corpus serving state (driver-local term stats + the
manifest docId span) loads ONCE at stream start, so a micro-batch launches
no auxiliary jobs; index growth is picked up by restarting the stream (or
re-resolving state in ``foreachBatch`` when a manifest generation bump is
observed — the manifest read is one small JSON). Exactly-once: Spark's
checkpoint tracks the input; the sink writes each micro-batch to its own
``batch=<id>`` directory, so a replayed batch overwrites itself.

Query schema: ``qid long, terms array<string>`` — terms are RAW keywords;
the index's analyzer (from the manifest) runs inside the scoring call,
matching the batch path exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

QUERY_STREAM_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("terms", ArrayType(StringType())),
    ]
)


def stream_queries_from_files(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of query rows (parquet dropped into ``path``)."""
    return spark.readStream.schema(QUERY_STREAM_SCHEMA).parquet(path)


def serving_sink(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    k: int = 10,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    scorer=None,
    cache_dir: str | None = None,
    refresh_on_growth: bool = False,
    max_queries_per_batch: int = 10_000,
):
    """``writeStream.foreachBatch`` -> one batched job per micro-batch.

    ``cache_dir``: serve from a bucketized serving cache
    (``operators/serving.py``) prepared here at stream start — micro-batches
    then run kernel + merge only (no per-batch scan/split/shuffle), the
    steady-state shape a query stream is by definition. By default the
    cache is tied to the index generation at start (restart-to-pick-up-
    growth semantics); results are bit-identical to the uncached path.

    ``refresh_on_growth``: follow the live index instead of the start-time
    snapshot. An existing cache under ``cache_dir`` is REUSED and brought
    current with ``refresh_serving_cache`` (delta-only bucketize) rather
    than rebuilt, and each micro-batch re-syncs the same way when the
    manifest generation moved — the concurrent ingest-stream + serve-stream
    deployment, no restarts. Term stats, n_docs/avgdl, and the tombstone
    mask reload on every sync, so grown docs serve and deleted docs stop
    serving without a restart.

    Results parquet schema: ``batch_id, qid, docId, score`` under
    ``out_dir/batch=<id>/`` (self-overwriting on replay). Returns the
    started ``StreamingQuery``; callers ``awaitTermination()``."""
    from ..operators.rank import Scorer, score_queries_daat_batch
    from ..operators.serving import (
        prepare_serving_cache,
        refresh_serving_cache,
        score_queries_cached,
    )
    from ..sources.segments import docid_span, load_segments, load_term_stats_pdf, read_manifest

    m = read_manifest(index_dir)
    analyzer = m.get("analyzer", "porter")
    n_docs = m["stats"]["n_docs"]
    # fielded indexes: content scoring uses the content field's avgdl, not
    # the global content+field token mix (same rule as jobs/query.py)
    avgdl = m["stats"].get("avgdl_by_field", {}).get("", m["stats"]["avgdl"])
    span = docid_span(index_dir)
    stats_pdf = load_term_stats_pdf(index_dir)
    segs = load_segments(spark, index_dir)
    sc = scorer if scorer is not None else Scorer("bm25")
    # lazy-deletion mask, same default as jobs/serve.py: tombstoned docs
    # never serve. Snapshot mode pins the start-time tombstones (consistent
    # with the start-time segments); refresh_on_growth reloads on each sync
    # so a delete commit takes effect without a restart.
    from ..operators.delete import deleted_array

    deleted = deleted_array(spark, index_dir)
    cache = None
    if cache_dir is not None:
        has_meta = os.path.exists(os.path.join(cache_dir, "serving_cache.json"))
        cache = (
            refresh_serving_cache(spark, index_dir, cache_dir)
            if refresh_on_growth and has_meta
            else prepare_serving_cache(spark, index_dir, cache_dir)
        )

    def handle(batch_df: DataFrame, batch_id: int):
        nonlocal cache, stats_pdf, n_docs, avgdl, deleted
        # Queries are tiny (qid + a few terms), but the collect is driver-
        # side, so a malformed giant micro-batch must fail loudly instead of
        # OOMing the driver. limit(cap+1) bounds the fetch itself — the
        # overflow check costs one extra row, never an unbounded pull.
        rows = batch_df.limit(max_queries_per_batch + 1).collect()
        if len(rows) > max_queries_per_batch:
            raise ValueError(
                f"query micro-batch {batch_id} exceeds max_queries_per_batch="
                f"{max_queries_per_batch}; raise the cap or shrink the "
                "trigger interval (maxFilesPerTrigger / Kafka maxOffsetsPerTrigger)"
            )
        if not rows:
            return
        queries = {int(r.qid): list(r.terms) for r in rows}
        if cache is not None:
            if refresh_on_growth:
                live_gen = int(read_manifest(index_dir).get("generation", 0))
                if live_gen != int(cache["generation"]):
                    cache = refresh_serving_cache(spark, index_dir, cache_dir)
                    stats_pdf = load_term_stats_pdf(index_dir)
                    n_docs, avgdl = cache["n_docs"], cache["avgdl"]
                    deleted = deleted_array(spark, index_dir)
            # without refresh_on_growth the prepared cache IS the stream's
            # start-time snapshot, so a mid-stream index commit must not
            # kill the query (the uncached path serves its start-time
            # segments the same way); growth arrives on restart. With it,
            # the sync above already matched the live generation (a commit
            # racing this exact micro-batch serves next batch — same
            # semantics as a shard swap in any search cluster).
            out = score_queries_cached(
                spark, cache, stats_pdf, queries, n_docs, avgdl, sc, k,
                analyzer=analyzer, check_generation=False, deleted=deleted,
            )
        else:
            out = score_queries_daat_batch(
                spark, segs, stats_pdf, queries, n_docs, avgdl, sc, k,
                analyzer=analyzer, docid_span=span, deleted=deleted,
            )
        out = out.withColumn("batch_id", F.lit(int(batch_id)))
        out.select("batch_id", "qid", "docId", "score").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def percolate_sink(
    spark: SparkSession,
    stream: DataFrame,
    queries: dict,
    out_dir: str,
    analyzer: str = "naive",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    text: str = "content",
    id_col: str = "docId",
):
    """Streaming reverse search (the Percolator deployment): DOCUMENTS
    stream in, registered queries stand still, every micro-batch is ONE
    :func:`~..operators.query.percolate` job — tokenize the batch once,
    broadcast the standing-query table, one count-matching aggregation
    answers every registered alert at once. Matches land as parquet
    ``(batch_id, docId, qid)`` under ``out_dir/batch=<id>/``
    (self-overwriting on replay = exactly-once downstream, same sink
    contract as :func:`serving_sink`).

    Scale shape: the standing-query table is built ONCE at stream start
    and captured by the closure (tiny — it broadcasts inside percolate);
    nothing per-document ever touches the driver. ``queries``:
    ``{qid: [keywords]}`` boolean-AND alerts."""
    from ..operators.query import percolate, percolate_queries

    qt = percolate_queries(spark, queries, analyzer)

    def handle(batch_df: DataFrame, batch_id: int):
        hits = percolate(batch_df, qt, analyzer=analyzer, text=text, id_col=id_col)
        (
            hits.withColumn("batch_id", F.lit(int(batch_id)))
            .select("batch_id", id_col, "qid")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
