"""Guards for the r15 connected_components scale work (tools/cc_cell.py):

the 57M-edge / 16 g cell showed the unguarded loop dies with a heap OOM
in round ~3 (deserialized checkpoint rows accumulating across rounds)
and re-shuffles the edge relation every iteration. These tests pin the
three fixes: (1) the per-round neighbor join reuses the edge cache's
partitioning AND sort order (no Exchange / Sort on the cached side),
(2) each round's checkpoint blocks are freed as soon as they are dead,
(3) results stay exact (analytic truth on planted chains).
"""
import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.dedup import connected_components


def _chain_edges(spark, n, size):
    """n nodes in consecutive-id chains of `size` (multi-round: pointer
    doubling needs ~log2(size) rounds)."""
    return (
        spark.range(0, n - 1)
        .filter((F.col("id") % size) != (size - 1))
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def test_cc_round_join_reuses_edge_cache_layout(spark):
    """With labels too big to broadcast, the round-1 propagation plan's
    edge side must be a bare InMemoryTableScan feeding the join — no
    Exchange (partitioning reused) and no Sort (sort order reused) —
    so the loop never re-shuffles its largest relation."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = _chain_edges(spark, 40_000, 100)
        stats = {"round1_plan": None}
        out = connected_components(edges, max_iterations=20, _stats=stats)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cluster_id").alias("k"),
            F.sum("cluster_id").alias("s"),
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert stats["converged"]
    # analytic truth: 400 chains, cluster_id = chain base
    assert (agg["n"], agg["k"]) == (40_000, 400)
    assert int(agg["s"]) == sum(b * 100 for b in range(0, 40_000, 100))
    plan = stats["round1_plan"]
    # inner neighbor join: cached edge relation is a DIRECT join child
    lines = plan.splitlines()
    scan_idx = [
        i for i, ln in enumerate(lines) if "InMemoryTableScan" in ln
    ]
    assert scan_idx, plan
    # the node directly above the cached scan is the join itself, not an
    # Exchange or a per-round Sort over the scan
    parent_op = lines[scan_idx[0] - 1].split("+- ")[-1].lstrip(" :")
    assert parent_op.startswith(
        ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan


def test_cc_frees_stale_round_checkpoints(spark):
    """A k-round run must not leave k rounds of checkpoint blocks
    persisted: dead rounds are unpersisted eagerly (the 16 g cell OOMed
    on exactly this accumulation). After the run at most the final
    label checkpoint (plus nothing else from the loop) may remain."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    edges = _chain_edges(spark, 5_000, 250)  # ~9 doubling rounds
    stats = {}
    out = connected_components(edges, max_iterations=20, _stats=stats)
    after = jsc.getPersistentRDDs().size()
    assert stats["iterations"] >= 4  # genuinely multi-round
    # final labels checkpoint may stay (the output reads it); every
    # joined_R, every stale labels_R, and the sym cache must be gone
    assert after - before <= 1, (before, after, stats)
    # and the surviving relation still answers exactly
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: (i // 250) * 250 for i in range(5_000)}


def test_cc_converged_round_skips_doubling_join(spark):
    """Star components converge in round 2 (changed == 0): the returned
    plan must then read the final label checkpoint directly — no
    pointer-doubling self-join is planned for the output."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 50)] + [(100, 100 + i) for i in range(1, 50)],
        "id_a long, id_b long",
    )
    stats = {}
    out = connected_components(edges, _stats=stats)
    assert stats["converged"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: 0 for i in range(50)} | {100 + i: 100 for i in range(50)}
