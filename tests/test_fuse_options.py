"""Fuse option coverage: P5 late-duplicate drop, merge_cols, rename off."""

import pytest
from pyspark.sql import Row

from timeseriesfuser_spark.config import FuserConfig, SourceConfig
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser


def mk_source(spark, name, rows):
    df = spark.createDataFrame(rows)
    return SourceConfig(name=name, df=df, ts_col="ts")


def test_drop_late_duplicates(spark):
    # overlapping "files" of one source re-deliver Syn_id 2 and 3
    rows = [
        Row(ts=100, Syn_id=1, v=1.0),
        Row(ts=200, Syn_id=2, v=2.0),
        Row(ts=300, Syn_id=3, v=3.0),
        Row(ts=200, Syn_id=2, v=2.0),  # duplicate from next file
        Row(ts=300, Syn_id=3, v=3.0),
    ]
    src = mk_source(spark, "a", rows)
    fuser = TimeSeriesFuser(
        [src],
        FuserConfig(secondary_sort_col="Syn_id", drop_late_duplicates=True),
    )
    out = fuser.fused(spark)
    assert out.count() == 3
    assert sorted(r["Syn_id"] for r in out.collect()) == [1, 2, 3]


def test_drop_late_duplicates_requires_secondary(spark):
    src = mk_source(spark, "a", [Row(ts=1, Syn_id=1, v=1.0)])
    fuser = TimeSeriesFuser([src], FuserConfig(drop_late_duplicates=True))
    with pytest.raises(ValueError, match="secondary_sort_col"):
        fuser.fused(spark)


def test_rename_identical_off(spark):
    a = mk_source(spark, "a", [Row(ts=1, price=1.0)])
    b = mk_source(spark, "b", [Row(ts=2, price=2.0)])
    fuser = TimeSeriesFuser([a, b], FuserConfig(rename_identical=False))
    out = fuser.fused(spark)
    assert "price" in out.columns and "price||a" not in out.columns
    assert out.count() == 2


def test_merge_cols_share_column(spark):
    a = mk_source(spark, "a", [Row(ts=1, price=1.0, size=5.0)])
    b = mk_source(spark, "b", [Row(ts=2, price=2.0, size=6.0)])
    fuser = TimeSeriesFuser([a, b], FuserConfig(merge_cols=("price",)))
    out = fuser.fused(spark)
    assert "price" in out.columns            # exempt from renaming
    assert "size||a" in out.columns and "size||b" in out.columns
