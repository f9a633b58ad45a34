"""Forward-fill (LOCF) — semantics from reference _forward_fill_dataframe
(core.py:1034-1072) incl. the cross-chunk carry: values must flow across
range-partition boundaries (tests/unit/test_core_forward_fill.py:33-80)."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.operators.fill import forward_fill


def collect_col(df, order, col):
    return [r[col] for r in df.orderBy(*order).collect()]


def test_basic_locf(spark):
    rows = [(1, 10.0), (2, None), (3, None), (4, 40.0), (5, None)]
    df = spark.createDataFrame(rows, "ts long, v double")
    out = forward_fill(df, ["ts"], ["v"])
    assert collect_col(out, ["ts"], "v") == [10.0, 10.0, 10.0, 40.0, 40.0]


def test_leading_nulls_stay_null(spark):
    rows = [(1, None), (2, None), (3, 3.0), (4, None)]
    df = spark.createDataFrame(rows, "ts long, v double")
    out = forward_fill(df, ["ts"], ["v"])
    assert collect_col(out, ["ts"], "v") == [None, None, 3.0, 3.0]


def test_carry_across_many_partitions(spark):
    # Non-null only in the very first row; with 8 range partitions the value
    # must cross every partition boundary (the reference's last_row_vals
    # carry, core.py:1043-1071, generalized to a distributed prefix scan).
    rows = [(0, 6.829, 6.804)] + [(i, None, None) for i in range(1, 5000)]
    df = spark.createDataFrame(rows, "ts long, bid double, ask double")
    out = forward_fill(df, ["ts"], ["bid", "ask"], num_partitions=8)
    last = out.orderBy(F.desc("ts")).limit(1).collect()[0]
    assert last["bid"] == 6.829 and last["ask"] == 6.804
    assert out.filter(F.col("bid").isNull()).count() == 0


def test_multiple_cols_independent(spark):
    rows = [(1, 1.0, None), (2, None, "a"), (3, None, None), (4, 4.0, "b")]
    df = spark.createDataFrame(rows, "ts long, v double, s string")
    out = forward_fill(df, ["ts"], ["v", "s"], num_partitions=3)
    assert collect_col(out, ["ts"], "v") == [1.0, 1.0, 1.0, 4.0]
    assert collect_col(out, ["ts"], "s") == [None, "a", "a", "b"]


def test_tiebreaker_order_respected(spark):
    # equal ts: fill order follows (ts, seq)
    rows = [(1, 0, 1.0), (1, 1, 2.0), (2, 0, None)]
    df = spark.createDataFrame(rows, "ts long, seq long, v double")
    out = forward_fill(df, ["ts", "seq"], ["v"], num_partitions=2)
    assert collect_col(out, ["ts", "seq"], "v") == [1.0, 2.0, 2.0]


def test_noop_when_col_missing(spark):
    df = spark.createDataFrame([(1, 1.0)], "ts long, v double")
    out = forward_fill(df, ["ts"], ["nope"])
    assert out.columns == ["ts", "v"]
