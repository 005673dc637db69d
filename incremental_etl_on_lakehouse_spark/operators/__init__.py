"""Reusable DataFrame operators: CDC/merge, dedup families, similarity, text."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input is under-parallelized.

    Single-file (or single-row-group) parquet scans arrive as one partition,
    which serializes every CPU-heavy narrow operator behind one core. At
    cluster scale inputs come pre-split, so this is a no-op there — the
    repartition (and its shuffle) only happens when the plan would otherwise
    underuse the executors.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
