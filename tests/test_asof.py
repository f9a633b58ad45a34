"""Unit tests for the as-of join operator (union + windowed carry)."""

import pytest
from pyspark.sql import Row

from timeseriesfuser_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(__timestamp=100, k="a", lv=1.0),
            Row(__timestamp=200, k="a", lv=2.0),
            Row(__timestamp=50, k="b", lv=3.0),
            Row(__timestamp=500, k="b", lv=4.0),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(__timestamp=90, k="a", rv=10.0),
            Row(__timestamp=100, k="a", rv=11.0),  # tie with left@100 → wins
            Row(__timestamp=150, k="a", rv=12.0),
            Row(__timestamp=400, k="b", rv=13.0),
        ]
    )
    return left, right


def collect_map(df):
    return {(r["k"], r["__timestamp"]): r for r in df.collect()}


def test_asof_basic_and_tie(spark, frames):
    left, right = frames
    out = collect_map(asof_join(left, right, keys=["k"]))
    assert out[("a", 100)]["rv"] == 11.0  # at-or-before: tie matches
    assert out[("a", 100)]["__timestamp_right"] == 100
    assert out[("a", 200)]["rv"] == 12.0
    assert out[("b", 50)]["rv"] is None  # nothing before
    assert out[("b", 500)]["rv"] == 13.0


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = collect_map(asof_join(left, right, keys=["k"], tolerance_ms=60))
    assert out[("a", 200)]["rv"] == 12.0  # 200-150=50 <= 60
    assert out[("b", 500)]["rv"] is None  # 500-400=100 > 60


def test_asof_keyless_global(spark, frames):
    left, right = frames
    out = {
        r["__timestamp"]: r
        for r in asof_join(left.drop("k"), right.drop("k")).collect()
    }
    assert out[50]["rv"] is None
    assert out[200]["rv"] == 12.0
    assert out[500]["rv"] == 13.0


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([Row(__timestamp=10, v=1.0)])
    right = spark.createDataFrame([Row(__timestamp=5, v=2.0)])
    row = asof_join(left, right).collect()[0]
    assert row["v"] == 1.0 and row["v_right"] == 2.0
