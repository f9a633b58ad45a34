"""Shared utilities for the extension ops."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions for expression-heavy
    per-row work (hashing, shingling, vector math).

    A small table often arrives as ONE parquet split, serializing all the
    per-row compute on a single core. At real scale the scan already has
    >= cores splits and this is a no-op — the guard means we never add a
    shuffle to a big input. (Cheap: inspects the plan's partitioning, runs
    no job.)
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
