"""Pin the rung-0 CMS hot-bucket probe (`ops.dedup._cms_max_key_bound`).

The serialized layout of Spark's ``count_min_sketch`` aggregate is
header(version, totalCount, depth, width) + depth hashA seed longs +
depth×width counters. Misparsing the seeds as counters reads ~1e9
pseudo-random values — the bound then never short-circuits (fail-safe
but slow; the exact r10 bug). These tests pin the parse against known
data and the fail-safe on corrupt buffers.
"""

import struct

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.dedup import _cms_max_key_bound

_EXPR = (
    "count_min_sketch(xxhash64(`k`), "
    "CAST(0.000244140625 AS DOUBLE), CAST(0.5 AS DOUBLE), 42)"
)


def _sketch(df):
    return bytes(df.agg(F.expr(_EXPR).alias("c")).collect()[0]["c"])


def test_bound_tight_on_known_skew(spark):
    df = spark.range(20000).select(
        F.when(F.col("id") < 5000, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    b = _cms_max_key_bound(_sketch(df))
    # one-sided: never below the true max; tight enough to be useful
    assert 5000 <= b < 5100


def test_bound_small_on_uniform_keys(spark):
    df = spark.range(20000).select(F.col("id").alias("k"))
    b = _cms_max_key_bound(_sketch(df))
    assert 1 <= b < 100


def test_bound_zero_on_empty_input(spark):
    df = spark.range(10).filter("id < 0").select(F.col("id").alias("k"))
    assert _cms_max_key_bound(_sketch(df)) == 0


@pytest.mark.parametrize(
    "mutate",
    [
        lambda raw: raw[:19],  # truncated header
        lambda raw: b"\x00\x00\x00\x02" + raw[4:],  # unknown version
        lambda raw: raw[:-8],  # truncated table
        lambda raw: raw + b"\x00" * 8,  # trailing garbage
        # counters corrupted -> row sum != totalCount
        lambda raw: raw[:28] + struct.pack(">q", 1 << 40) + raw[36:],
    ],
)
def test_fail_safe_on_corrupt_buffers(spark, mutate):
    raw = _sketch(spark.range(100).select(F.col("id").alias("k")))
    assert _cms_max_key_bound(mutate(raw)) == 1 << 62


def test_seed_misparse_would_be_caught(spark):
    """The exact r10 bug: reading the table at offset 20 (ignoring the
    seed block) must NOT return a plausible bound — the row-sum check
    rejects it in the real parser; this asserts the layout premise."""
    raw = _sketch(spark.range(20000).select(F.col("id").alias("k")))
    version, total, depth, width = struct.unpack(">iqii", raw[:20])
    assert (version, depth, width) == (1, 1, 8192)
    assert len(raw) == 20 + 8 * depth + 8 * depth * width
    seeds = struct.unpack(f">{depth}q", raw[20 : 20 + 8 * depth])
    table = struct.unpack(f">{depth * width}q", raw[20 + 8 * depth :])
    assert sum(table) == total  # counters, not seeds
    assert any(abs(s) > total for s in seeds)  # seeds are NOT counters
