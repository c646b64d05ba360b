"""Structured-Streaming ingestion: micro-batch index append.

The reference has no streams — its nearest analog is the `addDocument`
buffer flushing every DEFAULT_FLUSH_THRESHOLD docs
(``InvertedIndexManager.java:196-199``). Here that micro-batch pattern maps
1:1 onto Structured Streaming ``foreachBatch``: each micro-batch becomes one
committed index batch (same manifest, same resumability), so a streaming
ingest and a batch build produce byte-identical segments.

Also provides a windowed term-frequency stream (watermark + tumbling window)
as the standard late-data-tolerant aggregation shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_corpus_from_files(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream of corpus rows (parquet dropped into `path`)."""
    return spark.readStream.schema(schema).parquet(path)


def index_sink(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    analyzer: str = "porter",
    num_segments: int = 8,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    with_positions: bool = True,
    membership: bool = False,
):
    """writeStream.foreachBatch -> one committed index batch per micro-batch.

    Spark's streaming checkpoint handles exactly-once input tracking; the
    manifest handles idempotent segment commits — a replayed micro-batch id
    overwrites its own batch directory, never duplicates another's.
    """
    from ..sources.segments import (
        build_one_batch,
        finalize_index,
        read_manifest,
        update_manifest,
    )

    def handle(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        m = read_manifest(index_dir)
        key = f"stream-{batch_id}"
        if m["batches"].get(key, {}).get("committed"):
            return  # replayed micro-batch — already durable

        def _defaults(fresh: dict) -> None:
            fresh.setdefault("analyzer", analyzer)
            fresh.setdefault("codec", "delta_varbyte")
            fresh.setdefault("num_segments", num_segments)
            fresh.setdefault("n_salts", 8)
            fresh.setdefault("with_positions", with_positions)
            fresh.setdefault("membership", membership)

        m = update_manifest(index_dir, _defaults)
        # one index = one format: a stream restarted with different flags
        # than the manifest records must fail HERE, not write mixed
        # membership/positional batches that blow up at compaction
        # (_merge_encoder_impl raises on mixed rows much later).
        eff = {k: m.get(k) for k in ("analyzer", "with_positions", "membership")}
        want = {"analyzer": analyzer, "with_positions": with_positions,
                "membership": membership}
        if eff != want:
            raise ValueError(
                f"index_sink flags {want} conflict with the manifest's "
                f"recorded format {eff} for index {index_dir}; restart the "
                "stream with the manifest's flags or build a new index"
            )
        build_one_batch(
            spark, batch_df, index_dir, key, m,
            analyzer=analyzer, num_segments=num_segments,
            with_positions=with_positions, membership=membership,
        )
        finalize_index(spark, index_dir)

    w = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_term_counts(
    stream: DataFrame,
    time_col: str = "ts",
    text_col: str = "content",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window term frequencies over a text stream —
    late rows beyond the watermark are dropped, state is bounded."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    return (
        stream.withWatermark(time_col, watermark)
        .select(F.col(time_col), F.explode(toks).alias("term"))
        .groupBy(F.window(time_col, window).alias("w"), "term")
        .agg(F.count("*").alias("tf"))
        .select(F.col("w.start").alias("window_start"), "term", "tf")
    )


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: group each user's events into sessions
    separated by more than ``gap`` of inactivity — Structured Streaming's
    ``session_window`` (the EventsByStreamer analog of the brief's streaming
    surface; the reference has no temporal operators at all).

    Boundary semantics (verified empirically): an event exactly ``gap``
    after its predecessor MERGES into the same session (windows touching at
    a point overlap); the session ends at ``last_ts + gap``. The DuckDB
    oracle mirrors this with a strict ``ts - lag(ts) > gap`` break in a
    gaps-and-islands rewrite.

    Works identically over a batch frame or a stream; pass ``watermark``
    when streaming so state for closed sessions is evicted. Scale shape:
    ONE shuffle keyed by (key, merged window) — Spark merges overlapping
    session windows inside the aggregation (partial merge map-side), no
    per-user global sort, no Python."""
    src = events.withWatermark(time_col, watermark) if watermark else events
    return (
        src.groupBy(F.col(key_col), F.session_window(time_col, gap).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def trending_terms(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    top_k: int = 3,
    time_col: str = "ts",
    term_col: str = "event_type",
    watermark: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Trending terms per SLIDING window: the ``top_k`` most frequent values
    of ``term_col`` in each (overlapping) window — the dashboard query of a
    streaming analytics surface. Ties break on term ascending.

    Composition: sliding-window count (each event lands in window/slide
    windows — Spark expands this without a self-join) followed by the
    engine's windowless ``grouped_topk`` (bucketed two-stage sort-trim), so
    no per-window global sort and no row_number window function anywhere.

    Batch mode runs the whole expression as-is (the contract/oracle path).
    In STREAMING mode only the windowed count can run inside the query
    (grouped_topk's buckets are not a time-window aggregation, which is
    what Spark's chained-stateful-operator support requires) — run the
    watermarked count as the stream and apply ``grouped_topk`` per
    micro-batch in ``foreachBatch``, the same split as the serving sink."""
    from ..operators.sampling import grouped_topk

    src = events.withWatermark(time_col, watermark) if watermark else events
    counts = (
        src.groupBy(F.window(time_col, window, slide).alias("w"), term_col)
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            term_col,
            "n",
        )
    )
    # grouped_topk orders by (value desc, id asc); id here is the term
    return grouped_topk(
        counts, ["window_start"], "n", term_col, top_k, n_buckets=n_buckets
    ).select("window_start", term_col, "n")
