"""r15 optimization pins: the binary-search CASE-tree bucket id and the
SQL-literal LUT rendering in operators.fill must be bit-equivalent to the
formulations they replaced (HOF aggregate / per-element F.lit)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timeseriesfuser_spark.operators.fill import (
    _bucket_sql,
    _lit_of,
    _sql_lit,
    forward_fill,
)


def _old_bucket_col(first_order_col, bounds):
    # the pre-r15 HOF formulation, kept here as the equivalence reference
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    x = F.col(first_order_col).cast("double")
    return F.aggregate(
        arr, F.lit(0), lambda acc, b: acc + F.when(x >= b, 1).otherwise(0)
    )


def test_bucket_tree_matches_hof_aggregate(spark):
    import random

    rng = random.Random(7)
    bounds = sorted({round(rng.uniform(-100, 100), 3) for _ in range(37)})
    vals = (
        [None, float("nan"), float("inf"), float("-inf")]
        + [rng.uniform(-150, 150) for _ in range(200)]
        + list(bounds)  # exactly-on-boundary values
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    )
    out = df.select(
        "i",
        _old_bucket_col("x", bounds).alias("old"),
        F.expr(_bucket_sql("x", bounds)).alias("new"),
    ).collect()
    for r in out:
        assert r["old"] == r["new"], (r["i"], r["old"], r["new"])


def test_bucket_tree_single_bound(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (None,)], "x double")
    rows = df.select(F.expr(_bucket_sql("x", [1.0])).alias("b")).collect()
    assert [r["b"] for r in rows] == [0, 1, 0]


def test_sql_lit_roundtrip(spark):
    cases = [
        (None, T.DoubleType()),
        (1.0 / 3.0, T.DoubleType()),
        (-0.0, T.DoubleType()),
        (float("nan"), T.DoubleType()),
        (float("inf"), T.DoubleType()),
        (12345678901234567, T.LongType()),
        (True, T.BooleanType()),
        ("plain ascii", T.StringType()),
        ({"value": 2.5}, T.StructType([T.StructField("value", T.DoubleType())])),
        ([1, 2, 3], T.ArrayType(T.LongType())),
    ]
    exprs, refs = [], []
    for i, (v, dt) in enumerate(cases):
        s = _sql_lit(v, dt)
        assert s is not None, (v, dt)
        exprs.append(F.expr(s).alias(f"n{i}"))
        refs.append(_lit_of(v, dt).alias(f"o{i}"))
    row = spark.range(1).select(*exprs, *refs).first()
    for i, (v, dt) in enumerate(cases):
        a, b = row[f"n{i}"], row[f"o{i}"]
        if isinstance(a, float) and math.isnan(a):
            assert math.isnan(b)
        else:
            assert a == b, (i, a, b)


def test_sql_lit_refuses_unsafe():
    assert _sql_lit("has ' quote", T.StringType()) is None
    assert _sql_lit("tab\there", T.StringType()) is None
    assert _sql_lit(1, T.DecimalType(10, 2)) is None


def test_forward_fill_unchanged_semantics(spark):
    rows = [
        (1, None, None),
        (2, 10.0, "a"),
        (3, None, None),
        (4, None, "b"),
        (5, 20.0, None),
        (6, None, None),
    ]
    df = spark.createDataFrame(rows, "ts long, v double, s string")
    out = forward_fill(df, ["ts"], ["v", "s"], num_partitions=3)
    got = {r["ts"]: (r["v"], r["s"]) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (10.0, "a"),
        3: (10.0, "a"),
        4: (10.0, "b"),
        5: (20.0, "b"),
        6: (20.0, "b"),
    }


def test_bucket_plan_has_no_hof(spark):
    """The bucket id must be a codegen CASE tree, not an interpreted
    higher-order aggregate over a literal bounds array."""
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    plan = df.select(
        F.expr(_bucket_sql("x", [2.0, 4.0, 6.0])).alias("b")
    )._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan
