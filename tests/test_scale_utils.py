"""Salting + bucketed-write scale utilities."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.scale import salted, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # 1000 rows, 90% on one hot key
    big = spark.createDataFrame(
        [Row(k="hot" if i % 10 else f"k{i}", v=i) for i in range(1000)]
    )
    small = spark.createDataFrame(
        [Row(k="hot", w=1.0)] + [Row(k=f"k{i}", w=float(i)) for i in range(0, 1000, 10)]
    )
    plain = big.join(small, "k").select("k", "v", "w")
    sj = salted_join(big, small, ["k"], salts=4, deterministic_by="v").select(
        "k", "v", "w"
    )
    assert sj.count() == plain.count()
    assert sj.exceptAll(plain).count() == 0 and plain.exceptAll(sj).count() == 0


def test_salted_deterministic_spread(spark):
    df = spark.createDataFrame([Row(k="hot", v=i) for i in range(100)])
    out = salted(df, 8, deterministic_by="v")
    n_salts = out.select("__salt").distinct().count()
    assert 2 <= n_salts <= 8
    # deterministic: same result twice
    a = sorted(r["__salt"] for r in out.collect())
    b = sorted(r["__salt"] for r in salted(df, 8, deterministic_by="v").collect())
    assert a == b


def test_write_bucketed_roundtrip(spark, tmp_path):
    # warehouse dir is a static conf; the session default (cwd, gitignored)
    # is fine for this roundtrip.
    df = spark.createDataFrame([Row(k=i % 7, v=float(i)) for i in range(100)])
    try:
        write_bucketed(df, "tsf_test_bucketed", ["k"], 4, sort_cols=["v"])
        back = spark.table("tsf_test_bucketed")
        assert back.count() == 100
        assert back.groupBy("k").count().count() == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS tsf_test_bucketed")
