"""parquet_footer_cuts: metadata-only range-bucket bounds (r15 opt).

Pins (a) the interpolated cuts are monotone, inside the data range, and
scale with the requested bucket count; (b) forward_fill produces IDENTICAL
rows with footer-derived bounds as with the quantile-sketch default (bounds
are balance-only by contract); (c) the helper degrades to None (sketch
fallback) on stat-less input instead of guessing.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.sources.readers import parquet_footer_cuts


@pytest.fixture(scope="module")
def ts_parquet(tmp_path_factory):
    """Three row groups of timestamp[us] data with known ranges."""
    d = tmp_path_factory.mktemp("footer_cuts")
    path = os.path.join(d, "ev.parquet")
    us = [int(1_700_000_000_000_000 + i * 1_000_000) for i in range(3000)]
    tbl = pa.table(
        {
            "ts": pa.array(us, type=pa.timestamp("us")),
            "v": pa.array([float(i % 7) for i in range(3000)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=1000)
    return path


def test_cuts_monotone_and_in_range(ts_parquet):
    cuts = parquet_footer_cuts(ts_parquet, "ts", 8, to_ms=True)
    assert cuts is not None and 1 <= len(cuts) <= 7
    assert cuts == sorted(cuts)
    lo_ms, hi_ms = 1_700_000_000_000.0, 1_700_000_000_000.0 + 2999 * 1000
    assert all(lo_ms <= c <= hi_ms for c in cuts)
    # more buckets -> at least as many cuts
    cuts2 = parquet_footer_cuts(ts_parquet, "ts", 32, to_ms=True)
    assert len(cuts2) >= len(cuts)


def test_numeric_column_cuts(ts_parquet):
    cuts = parquet_footer_cuts(ts_parquet, "v", 4)
    assert cuts is not None
    assert all(0.0 <= c <= 6.0 for c in cuts)


def test_missing_inputs_return_none(ts_parquet, tmp_path):
    assert parquet_footer_cuts(str(tmp_path / "nope.parquet"), "ts", 8) is None
    assert parquet_footer_cuts(ts_parquet, "no_such_col", 8) is None
    assert parquet_footer_cuts(ts_parquet, "ts", 1) is None


def test_forward_fill_identical_under_footer_bounds(spark, ts_parquet):
    df = (
        spark.read.parquet(ts_parquet)
        .select(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("__timestamp"),
            F.when(F.col("v") < 3, None).otherwise(F.col("v")).alias("v"),
        )
        .withColumn("rid", F.monotonically_increasing_id())
    )
    cuts = parquet_footer_cuts(ts_parquet, "ts", 8, to_ms=True)
    a = forward_fill(df, ["__timestamp", "rid"], ["v"], bounds=cuts)
    b = forward_fill(df, ["__timestamp", "rid"], ["v"])  # quantile sketch
    rows_a = sorted(a.collect(), key=lambda r: (r["__timestamp"], r["rid"]))
    rows_b = sorted(b.collect(), key=lambda r: (r["__timestamp"], r["rid"]))
    assert rows_a == rows_b
