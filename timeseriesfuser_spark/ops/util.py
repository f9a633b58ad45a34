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


#: Below this estimated input size the per-row (projection) signature
#: strategies win — execution is stage-count-bound, not CPU-bound.
SMALL_INPUT_BYTES = 64 << 20


def estimated_input_bytes(df: DataFrame):
    """Best-effort input size: driver-side ``os.stat`` of the scan's file
    list (no data IO; capped at 10k files). Returns ``None`` when the
    input is not file-backed (synthetic ranges, in-memory frames,
    post-shuffle intermediates) — callers should treat unknown as LARGE,
    the conservative choice for the vectorized path."""
    import os

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > 10_000:
        return None
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total
