"""Round-16 registry additions: TPC-DS Q88-shape plan quality and the
shared-edges graph profile."""

from pyspark.sql import Row, functions as F


def test_q88_single_scan(spark):
    """The Q88 collapse's whole point: eight band counts must read the
    input ONCE (the real TPC-DS query runs eight self-joined scalar
    subqueries = eight scans)."""
    from timeseriesfuser_spark.contract.tpcds import q_tpcds_q88_hour_bands

    plan = q_tpcds_q88_hour_bands(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_q88_band_values(spark):
    from timeseriesfuser_spark.contract.tpcds import q_tpcds_q88_hour_bands

    row = q_tpcds_q88_hour_bands(spark, "/root/testdata/sf0.001").collect()[0]
    # all 8 bands present, integer, non-negative; corpus spans years so
    # every hour band is populated
    vals = [row[f"h{h}"] for h in range(8, 16)]
    assert all(isinstance(v, int) and v > 0 for v in vals)


def test_graph_profile_small_graph(spark):
    """Hand-checkable graph: orders {1:(a,b,c), 2:(b,c,d)} → edges
    {ab,ac,bc,bd,cd}, degrees a2 b3 c3 d2, ONE triangle (abc — bcd
    needs bd∧cd∧bc: present! → 2 triangles: abc, bcd)."""
    from timeseriesfuser_spark.ops.graph import build_edges, triangle_counts

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (2, "d")],
        "g bigint, i string",
    )
    edges = build_edges(df, group_col="g", item_col="i", cache=False)
    got = sorted(map(tuple, edges.collect()))
    assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    tri_sum = (
        triangle_counts(edges, cache=False)
        .agg(F.sum("n_triangles")).collect()[0][0]
    )
    assert tri_sum == 6  # 2 triangles × 3 nodes


def test_graph_profile_contract_consistency(spark):
    """The profile row agrees with the standalone family queries on the
    same sf0.001 corpus."""
    from timeseriesfuser_spark.contract.graph import (
        q_copurchase_graph_profile,
        q_copurchase_triangles,
    )
    from timeseriesfuser_spark.ops.util import cache_scope

    sf = "/root/testdata/sf0.001"
    with cache_scope():
        prof = q_copurchase_graph_profile(spark, sf).collect()[0]
        tri_sum = (
            q_copurchase_triangles(spark, sf)
            .agg(F.sum("n_triangles")).collect()[0][0]
        )
    assert prof["total_triangles"] == tri_sum // 3
    assert prof["n_nodes"] > 0 and prof["n_edges"] > 0
    assert prof["max_degree"] >= 1
