"""Shared edge relation for the graph family (VERDICT r9 item #6):
`ops.graph.build_edges` materializes the co-membership edge list ONCE
(persist + count at construction, the write_token_index posture) and
feeds every graph op from the cache instead of each op re-deriving the
two distincts."""

from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.graph import (
    build_edges,
    clustering_coefficients,
    degree_assortativity,
    hits_scores,
    kcore_peel,
    triangle_counts,
)
from timeseriesfuser_spark.ops.util import cache_scope

SF = "/root/testdata/sf0.001"


def test_one_build_feeds_multiple_ops(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    with cache_scope():
        edges = build_edges(li)
        # the build ran at construction: the edge relation is cached.
        # (kcore/hits localCheckpoint internally, which cuts the visible
        # plan to ExistingRDD scans — the r9 plan-gate lesson — so the
        # cache gate reads triangle_counts' plan.)
        p = triangle_counts(edges)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in p, "op did not read the shared cache"
        kcore_peel(edges, 4, rounds=1)  # exercises the shared relation too
        # and the downstream results match the per-op lazy builds exactly
        lazy = build_edges(li, cache=False)
        for op in (triangle_counts, clustering_coefficients, degree_assortativity):
            got = sorted(map(tuple, op(edges).collect()))
            want = sorted(map(tuple, op(lazy).collect()))
            assert got == want and got


def test_lazy_build_runs_no_jobs(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    build_edges(li, cache=False)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_edges_canonical_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20), (1, 30), (2, 20), (2, 10), (3, 5), (3, None), (None, 7)],
        "g bigint, i bigint",
    )
    got = sorted(
        map(tuple, build_edges(df, group_col="g", item_col="i", cache=False).collect())
    )
    assert got == [(10, 20), (10, 30), (20, 30)]
    assert all(a < b for a, b in got)


def test_hits_on_shared_bipartite_edges(spark):
    """HITS consumes the directed (order, part) memberships directly; the
    shared undirected build serves the co-purchase family — both from one
    lineitem scan, results stable."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    with cache_scope():
        basket = li.select(
            F.col("l_orderkey").alias("id_a"), F.col("l_partkey").alias("id_b")
        ).distinct()
        out = hits_scores(basket, iterations=1)
        assert out.filter(F.col("score_ppm") == 1_000_000).count() >= 2
