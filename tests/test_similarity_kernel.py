"""Equivalence pins for the Arrow/numpy similarity scoring kernels.

``cosine_topk`` and ``_srp_signatures_from`` moved their O(rows·planes·dim)
arithmetic from interpreted JVM higher-order functions into one numpy matmul
per Arrow batch (optimization r15). These tests pin the kernel against the
FORMER JVM formulations (inlined here as the reference) on adversarial
inputs: nulls, null elements, ragged dimensions, zero norms, duplicate ids,
string ids, empty query sets, 64-plane signatures, and ANSI overflow
behavior (both implementations must raise, not wrap).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.ops import similarity as S
from timeseriesfuser_spark.ops.util import spread_small_input


def _old_cosine_topk(corpus, queries, k=5, id_col="vec_id", vec_col="embedding",
                     scale=1000, round_to=6):
    """The pre-kernel formulation: per-pair zip_with/aggregate dot under a
    broadcast join (the reference semantics the kernel must reproduce)."""
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), S.quantized(F.col(vec_col), scale).alias("__cv")
    ).withColumn("__cn", S._sq_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), S.quantized(F.col(vec_col), scale).alias("__qv")
    ).withColumn("__qn", S._sq_norm(F.col("__qv")))
    dot = S._dot(F.col("__qv"), F.col("__cv"))
    cos = F.when(
        (F.col("__qn") > 0) & (F.col("__cn") > 0),
        dot.cast("double") / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__cn"))),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        cos = F.round(cos, round_to)
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _old_srp_from(v, planes, dim):
    """The pre-kernel SRP formulation: broadcast plane join + HOF dot."""
    spark = v.sparkSession
    plane_df = spark.range(planes).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: S.srp_plane_component(F.col("id"), i),
        ).alias("parr"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("parr"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        v.join(F.broadcast(plane_df))
        .select(
            "id",
            F.when(dot >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bit"),
        )
        .groupBy("id")
        .agg(F.sum("bit").alias("sh"))
    )


def _assert_same(new, old, sort_cols):
    got = [tuple(r) for r in new.orderBy(*sort_cols).collect()]
    want = [tuple(r) for r in old.orderBy(*sort_cols).collect()]
    assert got == want


@pytest.fixture()
def adversarial(spark):
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, None),
        (3, [1.0, None, 3.0]),
        (4, [0.0, 0.0, 0.0]),
        (5, [1e6, -1e6, 1e6]),          # quantized 1e9: norms near 3e18, exact
        (6, [5.0, -2.0]),               # ragged (dim 2)
        (7, [-1.0, -2.0, -3.0]),
        (1, [9.0, 9.0, 9.0]),           # duplicate id
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_kernel_matches_hof(spark, adversarial):
    qrows = [
        (100, [1.0, 1.0, 1.0]),
        (101, None),
        (102, [2.0, None, 1.0]),
        (103, [0.0, 0.0, 0.0]),
        (104, [1e6, -1e6, 1e6]),
        (1, [1.0, 0.0, 0.0]),           # id collides with a corpus id
    ]
    q = spark.createDataFrame(qrows, "vec_id long, embedding array<double>")
    _assert_same(
        S.cosine_topk(adversarial, q, k=3),
        _old_cosine_topk(adversarial, q, k=3),
        ["query_id", "rank"],
    )


def test_cosine_topk_kernel_dim_mismatch_null_cosine(spark):
    """Query dim ≠ corpus dim made the HOF dot NULL while both norms were
    positive — a NULL cosine the kernel fallback must reproduce."""
    q = spark.createDataFrame([(200, [1.0, 2.0])], "vec_id long, embedding array<double>")
    c = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    _assert_same(S.cosine_topk(c, q, k=3), _old_cosine_topk(c, q, k=3), ["query_id", "rank"])


def test_cosine_topk_kernel_string_ids_and_empty_queries(spark, adversarial):
    c = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [3.0, 4.0]), ("c", None)],
        "vec_id string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("z", [0.5, 0.5])], "vec_id string, embedding array<double>"
    )
    _assert_same(S.cosine_topk(c, q, k=2), _old_cosine_topk(c, q, k=2), ["query_id", "rank"])
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.cosine_topk(adversarial, empty, k=3).count() == 0


def test_srp_kernel_matches_hof(spark, adversarial):
    v = adversarial.select(
        F.col("vec_id").alias("id"), S.quantized(F.col("embedding"), 1000).alias("v")
    )
    _assert_same(S._srp_signatures_from(v, 16, 3), _old_srp_from(v, 16, 3), ["id"])
    # 64 planes: bit 63 is shiftleft(1L, 63) = Long.MIN_VALUE
    _assert_same(S._srp_signatures_from(v, 64, 3), _old_srp_from(v, 64, 3), ["id"])


def test_srp_kernel_string_ids(spark):
    c = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [-3.0, 4.0]), ("c", None)],
        "vec_id string, embedding array<double>",
    )
    v = c.select(F.col("vec_id").alias("id"), S.quantized(F.col("embedding"), 1000).alias("v"))
    _assert_same(S._srp_signatures_from(v, 16, 2), _old_srp_from(v, 16, 2), ["id"])


def test_kernel_overflow_raises_like_ansi(spark):
    """The JVM runs ANSI arithmetic (Spark 4 default): long overflow throws.
    The kernel must throw too — never silently wrap."""
    ov = spark.createDataFrame(
        [(1, [1e15, 1e15, 1e15]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(9, [1.0, 1.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|long overflow"):
        S.cosine_topk(ov, q, k=2).collect()
    vov = ov.select(
        F.col("vec_id").alias("id"), S.quantized(F.col("embedding"), 1000).alias("v")
    )
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|long overflow"):
        S._srp_signatures_from(vov, 16, 3).collect()
