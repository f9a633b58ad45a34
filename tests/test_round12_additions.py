"""Round-12 additions: IVF-PQ asymmetric-distance search + recall audit."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark import contract
from timeseriesfuser_spark.ops import similarity as S

SF = "/root/testdata/sf0.001"


def formatted_plan(df):
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _brute_force_adc(vecs, queries, k, n_centroids, nprobe, m, pq_k):
    """Independent Python reimplementation of IVF-ADC on quantized ints."""
    import math

    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    dim = len(next(iter(q.values())))
    dsub = dim // m
    ids = sorted(q)
    cents = {c: q[c] for c in ids[:n_centroids]}
    seeds = ids[:pq_k]

    def cos(a, b):
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(na) * math.sqrt(nb)
        )

    def route(v, keep):
        ranked = sorted(cents, key=lambda c: (-cos(v, cents[c]), c))
        return ranked[:keep]

    def sub(v, j):
        return v[j * dsub : (j + 1) * dsub]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    codes = {}
    lists = {}
    for i in ids:
        lists[i] = route(q[i], 1)[0]
        codes[i] = [
            min(
                range(len(seeds)),
                key=lambda c: (d2(sub(q[i], j), sub(q[seeds[c]], j)), c),
            )
            for j in range(m)
        ]
    out = {}
    for qi in queries:
        probed = set(route(q[qi], nprobe))
        cand = []
        for i in ids:
            if i == qi or lists[i] not in probed:
                continue
            adc = sum(
                d2(sub(q[qi], j), sub(q[seeds[codes[i][j]]], j))
                for j in range(m)
            )
            cand.append((adc, i))
        cand.sort()
        out[qi] = [(i, adc, r + 1) for r, (adc, i) in enumerate(cand[:k])]
    return out


def test_ivf_pq_matches_python_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_d2"], r["rank"])
        for r in S.ivf_pq_topk(
            emb, queries, k=4, n_centroids=8, nprobe=3, m=4, pq_k=8
        ).collect()
    }
    want = _brute_force_adc(
        vecs, [0, 1, 2], k=4, n_centroids=8, nprobe=3, m=4, pq_k=8
    )
    expect = {
        (qi, i): (adc, r) for qi, rows in want.items() for i, adc, r in rows
    }
    assert got == expect


def test_ivf_pq_validates_args(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="positive"):
        S.ivf_pq_topk(emb, emb.limit(1), k=0)
    with pytest.raises(ValueError, match="not divisible"):
        S.ivf_pq_topk(emb, emb.limit(1), m=7)


def test_ivf_pq_empty_inputs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    none = emb.filter(F.lit(False))
    assert S.ivf_pq_topk(none, none).count() == 0
    # empty query set over a non-empty corpus: schema intact, zero rows
    out = S.ivf_pq_topk(emb, none)
    assert out.columns == ["query_id", "neighbor_id", "adc_d2", "rank"]
    assert out.count() == 0


def test_ivf_pq_plan_gate(spark):
    """The 100 TB posture: every join on the corpus path is broadcast
    (codebook, probe map, ADC tables), never a data-keyed shuffle join;
    no CartesianProduct; the final top-k is rank-limit pushed
    (WindowGroupLimit)."""
    plan = formatted_plan(contract.QUERIES["ivf_pq_search"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_recall_bounds(spark):
    rows = contract.QUERIES["pq_recall"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_exact"] == 5
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // 5


# --------------------------------------------------------------------------- #
# attribution
# --------------------------------------------------------------------------- #

from timeseriesfuser_spark.ops.behavior import attribute_conversions


def _attr_frames(spark):
    tch = spark.createDataFrame(
        [
            # user 1: two touches inside the window, one outside
            (10, 1_000, 1, "click"),
            (11, 5_000, 1, "view"),
            (12, 100_000, 1, "click"),   # after the conversion
            # user 2: tie on ts — highest touch_id wins last_touch
            (20, 7_000, 2, "click"),
            (21, 7_000, 2, "view"),
            # user 3: touch exactly at conv_ts (inclusive)
            (30, 9_000, 3, "click"),
            # null user: must be excluded
            (40, 1_000, None, "click"),
        ],
        "touch_id long, touch_ts long, user_id long, channel string",
    )
    cnv = spark.createDataFrame(
        [
            (100, 9_000, 1, 500),
            (200, 7_500, 2, 300),
            (300, 9_000, 3, 700),
            (400, 50_000, 4, 900),   # no touches at all
            (500, 9_000, None, 100), # null user: excluded entirely
        ],
        "conv_id long, conv_ts long, user_id long, cents long",
    )
    return tch, cnv


def test_attribution_last_touch(spark):
    tch, cnv = _attr_frames(spark)
    out = attribute_conversions(
        tch, cnv, lookback_ms=8_000, model="last_touch", chunk_ms=1_000
    )
    rows = {r["conv_id"]: r for r in out.collect()}
    assert set(rows) == {100, 200, 300, 400}
    assert rows[100]["touch_id"] == 11 and rows[100]["n_touches"] == 2
    assert rows[200]["touch_id"] == 21  # ts tie -> highest touch_id
    assert rows[300]["touch_id"] == 30  # inclusive upper bound
    assert rows[400]["touch_id"] is None and rows[400]["credit_ppm"] == 0
    assert all(
        r["credit_ppm"] == 1_000_000 for c, r in rows.items() if c != 400
    )


def test_attribution_first_touch_and_linear(spark):
    tch, cnv = _attr_frames(spark)
    first = attribute_conversions(
        tch, cnv, lookback_ms=8_000, model="first_touch", chunk_ms=1_000
    )
    rows = {r["conv_id"]: r for r in first.collect()}
    assert rows[100]["touch_id"] == 10
    assert rows[200]["touch_id"] == 20  # ts tie -> lowest touch_id
    lin = attribute_conversions(
        tch, cnv, lookback_ms=8_000, model="linear",
        include_unattributed=False, cache=False, chunk_ms=1_000,
    )
    lrows = [r for r in lin.collect() if r["conv_id"] == 100]
    assert len(lrows) == 2
    assert all(r["credit_ppm"] == 500_000 and r["n_touches"] == 2 for r in lrows)
    # unattributed conversions are absent in this form
    assert lin.filter(F.col("conv_id") == 400).count() == 0


def test_attribution_rejects_unknown_model(spark):
    tch, cnv = _attr_frames(spark)
    with pytest.raises(ValueError, match="model"):
        attribute_conversions(tch, cnv, lookback_ms=1, model="u_shaped")


def test_attribution_plan_gate(spark):
    """The window match must be the chunked equi-join — no nested-loop /
    cartesian join anywhere in the plan."""
    plan = formatted_plan(
        contract.QUERIES["attribution_last_click"](spark, SF)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------- #
# rolling active users
# --------------------------------------------------------------------------- #

from timeseriesfuser_spark.ops.behavior import rolling_active_users

DAY = 86_400_000


def test_rolling_active_users_hand_case(spark):
    ev = spark.createDataFrame(
        [
            # day 0: users 1,2 ; day 1: user 1 ; day 4: user 3
            (1, 0), (2, 10), (1, DAY + 5), (3, 4 * DAY),
            # dupes within a day collapse
            (1, 20), (1, DAY + 6),
            # null user / null ts excluded
            (None, 0), (9, None),
        ],
        "user_id long, ts long",
    )
    out = {
        r["day_start"] // DAY: r
        for r in rolling_active_users(ev, window_days=3).collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert (out[0]["dau"], out[0]["window_active"]) == (2, 2)
    assert (out[1]["dau"], out[1]["window_active"]) == (1, 2)
    assert (out[2]["dau"], out[2]["window_active"]) == (0, 2)
    # day 3: window = days 1..3 -> user 1 only
    assert (out[3]["dau"], out[3]["window_active"]) == (0, 1)
    # day 4: window = days 2..4 -> user 3 only
    assert (out[4]["dau"], out[4]["window_active"]) == (1, 1)
    assert out[1]["stickiness_ppm"] == 500_000
    assert out[2]["stickiness_ppm"] == 0


def test_rolling_active_users_dead_zone_null_stickiness(spark):
    ev = spark.createDataFrame(
        [(1, 0), (2, 10 * DAY)], "user_id long, ts long"
    )
    rows = {
        r["day_start"] // DAY: r
        for r in rolling_active_users(ev, window_days=2).collect()
    }
    # days 2..9 have an empty trailing window -> NULL stickiness
    assert rows[5]["window_active"] == 0
    assert rows[5]["stickiness_ppm"] is None
    with pytest.raises(ValueError, match="positive"):
        rolling_active_users(ev, window_days=0)


def test_rolling_active_users_plan_gate(spark):
    """The corpus collapses to the (user, day) grain first; the trailing
    distinct is the exploded-grain agg — no per-day corpus rescan, no
    cartesian, exactly one events scan."""
    import re

    plan = formatted_plan(contract.QUERIES["dau_stickiness_7d"](spark, SF))
    assert "CartesianProduct" not in plan
    # the persisted (user, day) grain serves all three consumers: ONE
    # parquet scan + InMemoryTableScans, never three corpus scans
    scan_ids = set(re.findall(r"\(\d+\) Scan parquet", plan))
    assert len(scan_ids) == 1
    assert "InMemoryTableScan" in plan


# --------------------------------------------------------------------------- #
# shortest hops (multi-source BFS)
# --------------------------------------------------------------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timeseriesfuser_spark.ops.graph import shortest_hops

_BFS_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _hops_dict(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges or [(None, None)], "id_a long, id_b long")
    s = spark.createDataFrame([(x,) for x in seeds] or [(None,)], "seed long")
    return {
        r["id"]: r["hops"] for r in shortest_hops(e, s, **kw).collect()
    }


def test_shortest_hops_path_and_cycle(spark):
    # path 1-2-3-4 plus cycle 4-5-6-4; disconnected node via edge (8, 9)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4), (8, 9)]
    out = _hops_dict(spark, edges, [1], max_hops=3)
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}
    out = _hops_dict(spark, edges, [1], max_hops=10)
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4}  # early exit, no 8/9
    # directed: 4->5->6->4 cycle unreachable backwards from 6
    out = _hops_dict(spark, edges, [6], max_hops=5, directed=True)
    assert out == {6: 0, 4: 1, 5: 2}


def test_shortest_hops_multi_seed_null_and_bounds(spark):
    edges = [(1, 2), (2, 3), (None, 1), (3, None)]
    out = _hops_dict(spark, edges, [1, 3], max_hops=1)
    assert out == {1: 0, 3: 0, 2: 1}
    out = _hops_dict(spark, edges, [7], max_hops=2)  # isolated seed
    assert out == {7: 0}
    assert _hops_dict(spark, edges, [1], max_hops=0) == {1: 0}
    with pytest.raises(ValueError, match=">= 0"):
        _hops_dict(spark, edges, [1], max_hops=-1)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=40
    ),
    seeds=st.sets(st.integers(0, 14), min_size=1, max_size=3),
    max_hops=st.integers(0, 4),
)
@_BFS_SETTINGS
def test_shortest_hops_vs_python_bfs(spark, edges, seeds, max_hops):
    got = _hops_dict(spark, edges, sorted(seeds), max_hops=max_hops)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, frontier = {s: 0 for s in seeds}, set(seeds)
    for h in range(1, max_hops + 1):
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in want
        }
        want.update({v: h for v in frontier})
    assert got == want


def test_shortest_hops_cache_hygiene_and_plan(spark):
    spark.catalog.clearCache()
    e = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    s = spark.createDataFrame([(1,)], "seed long")
    out = shortest_hops(e, s, max_hops=2)
    out.collect()
    # the edge relation persist is released before return
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()
    plan = formatted_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------- #
# TPC-DS Q97: channel overlap
# --------------------------------------------------------------------------- #


def test_q97_overlap_plan_gate(spark):
    """The canonical FULL OUTER of the oracle must NOT appear: the Spark
    rewrite collapses both channel CTEs into one grain aggregation —
    exactly one lineitem scan, one orders scan, no outer join."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q97_channel_overlap"](spark, SF)
    )
    assert "FullOuter" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"lineitem\.parquet", plan)) == 1
    assert len(re.findall(r"orders\.parquet", plan)) == 1


def test_q97_overlap_hand_case(spark):
    li = spark.createDataFrame(
        [
            # order 1 (cust 10): part 1 remote only, part 2 both
            (1, 1, "O"), (1, 2, "O"), (1, 2, "F"),
            # order 2 (cust 20): part 1 local only
            (2, 1, "F"),
            # order 3 (cust 10): part 2 again remote (dup pair collapses)
            (3, 2, "O"),
        ],
        "l_orderkey long, l_partkey long, l_linestatus string",
    )
    o = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10)], "o_orderkey long, o_custkey long"
    )
    remote = F.col("l_linestatus") == "O"
    grain = (
        li.select("l_orderkey", "l_partkey", remote.alias("rem"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.max(F.col("rem").cast("int")).alias("has_rem"),
            F.max((~F.col("rem")).cast("int")).alias("has_loc"),
        )
    )
    rows = {
        (r["o_custkey"], r["l_partkey"]): (r["has_rem"], r["has_loc"])
        for r in grain.collect()
    }
    assert rows == {
        (10, 1): (1, 0),   # remote only
        (10, 2): (1, 1),   # both (dup remote collapses)
        (20, 1): (0, 1),   # local only
    }


# --------------------------------------------------------------------------- #
# 2-D Pareto frontier (skyline)
# --------------------------------------------------------------------------- #

from timeseriesfuser_spark.ops.scale import pareto_frontier_2d


def _frontier_ids(spark, pts, **kw):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    return sorted(r["id"] for r in pareto_frontier_2d(df, "x", "y", **kw).collect())


def test_pareto_frontier_hand_cases(spark):
    # (1,5) and (3,2) survive; (3,5) dominated by both; (4,2) by (3,2)
    assert _frontier_ids(spark, [(1, 5), (3, 2), (3, 5), (4, 2)]) == [0, 1]
    # duplicates of a frontier point all survive
    assert _frontier_ids(spark, [(1, 1), (1, 1), (2, 2)]) == [0, 1]
    # same x, smaller y dominates
    assert _frontier_ids(spark, [(1, 2), (1, 3)]) == [0]
    # maximize both flips dominance
    assert _frontier_ids(
        spark, [(1, 5), (3, 2), (3, 5), (4, 2)], maximize=(True, True)
    ) == [2, 3]


def test_pareto_frontier_nulls_and_single_bucket(spark):
    df = spark.createDataFrame(
        [(0, None, 1), (1, 1, None), (2, 2, 2)], "id long, x long, y long"
    )
    out = pareto_frontier_2d(df, "x", "y")
    assert [r["id"] for r in out.collect()] == [2]
    # num_buckets=1 (no range partitioning) must agree
    assert _frontier_ids(
        spark, [(1, 5), (3, 2), (3, 5), (4, 2)], num_buckets=1
    ) == [0, 1]


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=30,
    ),
    nb=st.sampled_from([1, 3, 16]),
)
@_BFS_SETTINGS
def test_pareto_frontier_vs_brute_force(spark, pts, nb):
    got = _frontier_ids(spark, pts, num_buckets=nb)
    want = sorted(
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (bx <= x and by <= y and (bx < x or by < y)) for bx, by in pts
        )
    )
    assert got == want


def test_part_value_frontier_plan_gate(spark):
    plan = formatted_plan(contract.QUERIES["part_value_frontier"](spark, SF))
    # the O(n^2) dominance self-join must NOT appear
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no global single-task window (the point of the bucketed scheme)
    assert "SinglePartition" not in plan


# --------------------------------------------------------------------------- #
# conversion-lag percentiles (cents=False path)
# --------------------------------------------------------------------------- #

from timeseriesfuser_spark.ops.timeseries import exact_percentiles


def test_exact_percentiles_cents_flag(spark):
    # integer inputs: cents=False must use raw values (median of 1,2,10
    # is 2 -> p50 x2 = 4); cents=True would scale by 100
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 10)], "g string, v long"
    )
    raw = exact_percentiles(
        df, ((1, 2),), group_col="g", value_col="v", cents=False
    ).collect()[0]
    assert (raw["n"], raw["p1_2_x2"]) == (3, 4)
    money = exact_percentiles(
        df, ((1, 2),), group_col="g", value_col="v"
    ).collect()[0]
    assert money["p1_2_x2"] == 400


def test_conversion_lag_hand_case(spark):
    rows = contract.QUERIES["conversion_lag_percentiles"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cohort"] == "all" and r["n"] > 0
    # scaled percentiles are monotone: 2*p50 <= ... after de-scaling
    assert r["p1_2_x2"] * 5 <= r["p9_10_x10"]          # p50 <= p90
    assert r["p9_10_x10"] * 10 <= r["p99_100_x100"]    # p90 <= p99
