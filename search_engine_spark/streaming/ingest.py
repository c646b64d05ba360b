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
            fresh.setdefault("with_positions", True)

        m = update_manifest(index_dir, _defaults)
        build_one_batch(
            spark, batch_df, index_dir, key, m,
            analyzer=analyzer, num_segments=num_segments,
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
