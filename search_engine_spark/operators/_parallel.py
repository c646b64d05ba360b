"""Partition-count guard for CPU-heavy per-row stages.

Small inputs (one parquet file => one partition) would otherwise run an
entire tokenize / hash / feature kernel on a single task while every other
core idles. At cluster scale inputs already carry >= defaultParallelism
partitions and this is a no-op — the repartition only fires for
partition-starved inputs, where the extra shuffle is trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
