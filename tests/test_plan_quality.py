"""Physical-plan quality gates: these lock in the properties that make the
engine scale — filter pushdown to the parquet scan, column pruning,
broadcast joins for small dimensions, partial aggregation. A regression
here is a performance bug even when results stay correct."""

import pytest

from timeseriesfuser_spark import contract

SF = "/root/testdata/sf0.001"


def formatted_plan(df):
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = formatted_plan(contract.QUERIES["tpch_q1_pricing"](spark, SF))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # pruned read schema: the unused key columns must NOT be scanned
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_extendedprice" in read_schema
    # partial aggregation (map-side combine) around one exchange
    assert plan.count("HashAggregate") >= 2


def test_revenue_per_nation_broadcasts_dimensions(spark):
    plan = formatted_plan(contract.QUERIES["revenue_per_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_fuse_window_filter_pushes_down(spark):
    plan = formatted_plan(contract.QUERIES["fuse_window_filter"](spark, SF))
    # the epoch-ms window must reach the scans as a timestamp predicate
    # (events reads as nanos-long: pushed as a long-range filter on ts)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan


def test_similarity_topk_scores_in_arrow_kernel(spark):
    """Brute-force scoring runs as ONE numpy matmul per Arrow batch: the
    corpus crosses the Python boundary once (O(C·d) transfer for the
    O(Q·C·d) compute); the former per-pair broadcast join evaluated an
    interpreted zip_with/aggregate dot per (query, corpus) pair."""
    plan = formatted_plan(contract.QUERIES["similarity_topk"](spark, SF))
    assert "MapInArrow" in plan
    # no join remains — the collected query side rides inside the kernel
    assert "Join" not in plan
    # only the quantized vector + id are shipped to Python (pruned select)
    assert "BatchEvalPython" not in plan


def test_resample_no_global_single_partition_window(spark):
    """The resample plan must not contain a Window over an empty
    partitionBy on the raw event stream (the non-scalable formulation).
    Window nodes may appear only over the bucketed/spine relations."""
    plan = formatted_plan(contract.QUERIES["resample_1m_global"](spark, SF))
    # the only Sort allowed without partition keys is inside the tiny
    # carry/window over spine rows; events themselves are aggregated via
    # hash, never globally sorted here
    assert "max_by" in plan or "HashAggregate" in plan


def test_contamination_broadcasts_benchmark(spark):
    plan = formatted_plan(contract.QUERIES["contamination_check"](spark, SF))
    # the benchmark n-gram set must broadcast; the corpus never shuffles
    # for the probe join
    assert "BroadcastHashJoin" in plan


def test_simhash_no_distinct_shuffle(spark):
    """Candidate pairs are emitted at their first agreeing chunk via a
    bitwise filter — a global distinct over the pair relation (second
    shuffle of the full candidate set) must NOT reappear."""
    plan = formatted_plan(contract.QUERIES["dedup_simhash"](spark, SF))
    import re

    # distinct over (id_a, id_b, hamming) would plan as HashAggregate with
    # the pair columns as grouping keys and no aggregate functions
    assert not re.search(r"HashAggregate.*[Kk]eys.*id_a.*id_b", plan)


def test_srp_signature_single_aggregate(spark):
    plan = formatted_plan(contract.QUERIES["srp_signatures"](spark, SF))
    # one Arrow matmul kernel + one two-phase aggregate, nothing else
    # (the former plane-relation broadcast join is gone)
    assert "MapInArrow" in plan
    assert "Join" not in plan
    # small-input spread repartition + the one aggregate exchange; a
    # second data shuffle (join re-partitioning etc.) must not appear
    assert plan.count("+- Exchange") <= 2


def test_quality_filter_stays_in_codegen(spark):
    plan = formatted_plan(contract.QUERIES["quality_filter"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # pure per-row pass: no aggregate, no join, and the only exchange is
    # the small-input spread repartition
    assert "HashAggregate" not in plan and "Join" not in plan
    assert plan.count("+- Exchange") <= 1


def test_minhash_signature_is_projection_not_aggregate(spark):
    """The LSH band keys must be a per-row projection (bound lambda over
    the shingle md5 array) — no explode + groupBy signature stage, and no
    global distinct of the candidate pairs (first-shared-band predicate
    dedups inside the join)."""
    from timeseriesfuser_spark.ops import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # max_bucket=None isolates the signature path: the default "auto"
    # cap on an UNCACHED input adds its lazy bucket-count aggregate to
    # the plan (cached inputs collect hot keys eagerly and stay
    # aggregate-free when no flood exists — r14 cap design).
    cand = D.minhash_lsh_pairs(
        docs, verify=False, cache=False, max_bucket=None
    )
    plan = formatted_plan(cand)
    assert "HashAggregate" not in plan  # neither signature agg nor distinct
    assert "Generate" in plan  # the single posexplode into band rows


def test_tfidf_broadcasts_vocabulary(spark):
    from timeseriesfuser_spark.ops.text import tfidf_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(tfidf_top_terms(docs, k=5))
    assert "BroadcastHashJoin" in plan  # df relation onto tf, not a shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_connected_components_never_shuffles_corpus(spark):
    """Only edge-subgraph relations enter the iteration; the corpus joins
    once at the end. With zero edges the loop exits after one round."""
    from timeseriesfuser_spark.ops.dedup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    ids = spark.range(100).withColumnRenamed("id", "doc_id")
    out = connected_components(edges, all_ids=ids)
    assert out.count() == 100
    assert out.filter("id != cluster_id").count() == 0


def test_tpch_q6_pushdown_and_pruning(spark):
    """Q6 is the canonical pushdown/pruning benchmark: 4 columns read,
    quantity predicate pushed to the scan, one partial+final aggregate."""
    plan = formatted_plan(contract.QUERIES["tpch_q6_forecast"](spark, SF))
    assert "PushedFilters" in plan
    assert "LessThan(l_quantity,24" in plan.replace(" ", "").replace(".0", "") or \
        "LessThan(l_quantity" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_shipdate", "l_discount", "l_extendedprice", "l_quantity"):
        assert col in read_schema
    for col in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert col not in read_schema
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_tpch_q18_preaggregates_before_join(spark):
    """The per-order quantity rollup must run BEFORE the orders join (the
    aggregate shrinks the join input), and customer must broadcast."""
    plan = formatted_plan(contract.QUERIES["tpch_q18_large_orders"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # aggregate appears below the first join in the tree: the HashAggregate
    # on l_orderkey exists and there is no aggregate ABOVE both joins
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_interval_join_no_nested_loop_at_sf(spark):
    plan = formatted_plan(contract.QUERIES["interval_join_2h"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q17_preaggregates_before_join(spark):
    """Q17's correlated subquery must be decorrelated: the per-part
    average pre-aggregates lineitem BEFORE the join (partial+final
    HashAggregate pair upstream of the join), never a per-row subquery."""
    plan = formatted_plan(contract.QUERIES["tpch_q17_small_quantity"](spark, SF))
    assert plan.count("HashAggregate") >= 3  # pre-agg pair + final rollup
    assert "CartesianProduct" not in plan


def test_incremental_rollup_partial_aggregation(spark):
    """The state+delta merge re-aggregates two partial relations: every
    aggregate must keep map-side combine (partial_ prefix in the plan)."""
    plan = formatted_plan(contract.QUERIES["incremental_rollup"](spark, SF))
    assert "partial_sum" in plan or "partial_count" in plan


def test_hourly_active_users_two_level_distinct(spark):
    """Per-window count(DISTINCT) plans as the two-level aggregation:
    a partial (window, user) de-dup aggregate BEFORE the final count —
    never a per-group collect_set or a window. (With a single distinct
    aggregate Catalyst skips Expand and nests the aggregates.)"""
    plan = formatted_plan(contract.QUERIES["hourly_active_users"](spark, SF))
    assert "partial_count(distinct" in plan
    assert plan.count("HashAggregate") >= 3  # (key,user) pair + final pair
    assert "collect_set" not in plan


def test_equal_depth_bins_no_single_partition(spark):
    plan = formatted_plan(contract.QUERIES["value_equal_depth_bins"](spark, SF))
    assert "SinglePartition" not in plan


def test_leakage_split_single_id_join(spark):
    """The split itself adds one equi-join on the id + a projection; no
    extra shuffle of the corpus beyond the clustering input."""
    plan = formatted_plan(contract.QUERIES["leakage_split"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_search_routes_through_ivf(spark):
    """semantic_search must plan the IVF path: the only nested-loop join
    allowed is the k-bounded centroid assignment (corpus x n_centroids),
    never a corpus x query brute-force product. The IVF shape shows up as
    the probe equi-join on centroid_id."""
    plan = formatted_plan(contract.QUERIES["semantic_search"](spark, SF))
    assert "centroid_id" in plan


def test_day_tz_spine_is_executor_side(spark):
    """The day-tz resample spine must come from sequence+explode over the
    per-key bounds relation (Generate node), not a driver-built local
    list (LocalTableScan / parallelized RDD of spine rows)."""
    from pyspark.sql import Row, functions as F  # noqa: F401

    from timeseriesfuser_spark.operators.resample import resample_last_interval

    rows = [
        Row(__timestamp=1700000000000 + i * 43_200_000, k="x", v=float(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    plan = formatted_plan(
        resample_last_interval(
            df, "1d", tz="UTC", keys=["k"], value_cols=["v"], tiebreak_cols=[]
        )
    )
    assert "Generate" in plan and "explode" in plan


def test_tpch_q2_decorrelated_min_join(spark):
    """Q2's correlated scalar MIN subquery must run as a groupBy-min +
    equi-join over the eligible relation built once — no correlated
    re-probe (cartesian/nested-loop) and broadcast dims."""
    plan = formatted_plan(contract.QUERIES["tpch_q2_min_cost_supplier"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan          # supplier/nation/region dims
    assert plan.count("HashAggregate") >= 2     # per-part min pre-agg pair


def test_tpch_q9_broadcasts_dims_one_fact_shuffle(spark):
    """Q9: part/supplier/nation broadcast; the only shuffle joins are on
    the fact keys (lineitem⋈orders)."""
    plan = formatted_plan(contract.QUERIES["tpch_q9_product_profit"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters" in plan              # p_name LIKE pushed to scan


def test_tpch_q11_scalar_total_broadcast(spark):
    """Q11's global-total HAVING threshold must ride a 1-row broadcast,
    and the per-part value aggregate must have a map-side partial."""
    plan = formatted_plan(contract.QUERIES["tpch_q11_important_stock"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_tpch_q12_single_pass_case_sums(spark):
    """Q12: both priority counters come from ONE aggregate over the
    joined rows (a single partial+final pair), with the shipdate range
    pushed to the lineitem scan."""
    plan = formatted_plan(contract.QUERIES["tpch_q12_late_priority"](spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q20_semi_join_no_reprobe(spark):
    """Q20's nested IN subqueries must decorrelate to one two-key
    pre-aggregate + semi join — never a per-supplier re-probe."""
    plan = formatted_plan(
        contract.QUERIES["tpch_q20_promotion_suppliers"](spark, SF)
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2     # (suppkey, partkey) pre-agg


def test_tpch_q21_one_per_order_aggregate(spark):
    """Q21's EXISTS + NOT EXISTS pair must collapse into one per-order
    aggregate (distinct-supplier counts) joined back — no correlated
    nested-loop re-probes of lineitem."""
    plan = formatted_plan(
        contract.QUERIES["tpch_q21_waiting_suppliers"](spark, SF)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 3     # distinct pair + final rollup


def test_similarity_topk_partial_window_group_limit(spark):
    """Exact top-k must keep the partial WindowGroupLimit BEFORE the
    exchange (Spark's rank-limit pushdown): each task ships at most k
    rows per query — the shuffle is k-bounded even though the compute is
    the labeled O(Q·C) exactness baseline."""
    plan = formatted_plan(contract.QUERIES["similarity_topk"](spark, SF))
    assert plan.count("WindowGroupLimit") >= 2   # partial + final


def test_cube_single_expand_pass(spark):
    """CUBE must plan as ONE Expand + hash-agg pass — not a self-union
    of four scans."""
    import re

    plan = formatted_plan(contract.QUERIES["cube_revenue"](spark, SF))
    assert plan.count("Expand") >= 1
    # distinct scan operators (the formatted output lists each twice:
    # tree reference + detail header)
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2                       # orders + customer, once each
    assert "BroadcastHashJoin" in plan           # customer dim broadcast


def test_user_set_ops_no_cartesian_on_data(spark):
    """INTERSECT/EXCEPT must plan as hash semi/anti joins over distinct
    key sets; the only cross joins are the three 1-row count scalars."""
    plan = formatted_plan(contract.QUERIES["user_set_ops"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan or "LeftAnti" in plan


def test_grouped_sketches_partial_aggregation(spark):
    """Grouped sketch builds keep map-side partial aggregation (a
    partial+final HashAggregate pair) — the bounded-shuffle property."""
    for name in ("hll_distinct_by_type", "cms_counts_by_type",
                 "quantiles_by_type"):
        plan = formatted_plan(contract.QUERIES[name](spark, SF))
        assert plan.count("HashAggregate") >= 2, name
        assert "CartesianProduct" not in plan, name


def test_expectations_single_scan_for_row_rules(spark):
    """All row-level rules must fold into ONE aggregation over one scan
    of lineitem (plus the uniqueness rule's own scan + key shuffle)."""
    import re

    plan = formatted_plan(
        contract.QUERIES["lineitem_expectations"](spark, SF)
    )
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2                       # row rules + uniqueness


def test_tpcds_q88_single_scan(spark):
    """Eight band counts must fold into ONE conditional aggregation over
    ONE lineitem scan (real Q88 writes eight self-joined subqueries —
    that plan re-scans the fact table eight times)."""
    import re

    plan = formatted_plan(contract.QUERIES["tpcds_q88_band_counts"](spark, SF))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1
    assert plan.count("HashAggregate") >= 2     # partial + final
    # the shared discount predicate reaches the scan
    assert "PushedFilters" in plan and "l_discount" in plan


def test_tpcds_q5_rollup_single_expand(spark):
    """The channel ROLLUP grid must come from ONE scan + ONE Expand —
    never a per-channel re-scan union."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q5_channel_rollup"](spark, SF)
    )
    assert plan.count("Expand") >= 1
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2                      # lineitem + orders, once each
    assert "CartesianProduct" not in plan


def test_tpcds_q57_q47_window_on_aggregated_grain(spark):
    """Deviation/YoY run on the (brand, month) AGGREGATED grain: the
    plan must aggregate (partial+final) BEFORE any Window/self-join, and
    the part dimension must broadcast."""
    for name in ("tpcds_q57_outlier_months", "tpcds_q47_yoy_ratio"):
        plan = formatted_plan(contract.QUERIES[name](spark, SF))
        assert "BroadcastHashJoin" in plan, name
        assert plan.count("HashAggregate") >= 2, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_tpcds_q67_rollup_rank_group_limit(spark):
    """Ranking the rollup grid with rank<=3 must push a WindowGroupLimit
    (rank-limit pushdown) and build the grid from one Expand."""
    plan = formatted_plan(contract.QUERIES["tpcds_q67_topn_rollup"](spark, SF))
    assert plan.count("Expand") >= 1
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan          # part dim broadcast


def test_tpcds_q34_broadcast_survivor_set(spark):
    """The having-band survivor keys (small by construction) must be the
    BROADCAST side of the dimension join; the orders agg keeps map-side
    partial aggregation."""
    plan = formatted_plan(
        contract.QUERIES["tpcds_q34_frequent_buyers"](spark, SF)
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_tpcds_q36_dims_broadcast(spark):
    """The region->nation->supplier->part snowflake must broadcast every
    dimension (one fact-side shuffle for the rollup only)."""
    plan = formatted_plan(
        contract.QUERIES["tpcds_q36_margin_hierarchy"](spark, SF)
    )
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("Expand") >= 1
    assert "CartesianProduct" not in plan


def test_tpcds_q51_single_scan_window_on_grain(spark):
    """The canonical full-outer + running-max Q51 must be rewritten to
    ONE fact scan (conditional channel sums) with the running windows on
    the aggregated (brand, month) grain — no self-join of the
    aggregate, no second lineitem scan."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q51_cumulative_channels"](spark, SF)
    )
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2                      # lineitem + part, once each
    assert "BroadcastHashJoin" in plan          # part dim broadcast
    assert plan.count("HashAggregate") >= 2     # partial + final BEFORE window
    assert "SortMergeJoin FullOuter" not in plan


def test_tpcds_q14_intersect_single_scan(spark):
    """The 6-way channel INTERSECT must fold into ONE fact scan +
    ONE aggregation; the all-channels filter runs as a window on the
    aggregated (item, channel) grain, never as per-channel re-scans."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q14_channel_intersect"](spark, SF)
    )
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 2                      # lineitem + part, once each
    assert "BroadcastHashJoin" in plan


def test_tpcds_q23_semi_joins_before_fact_join(spark):
    """Both survivor sets feed SEMI joins (never inner-join blowup), the
    frequent-part key set broadcasts, and no cartesian appears around
    the scalar spend-threshold relation."""
    plan = formatted_plan(
        contract.QUERIES["tpcds_q23_frequent_carts"](spark, SF)
    )
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_tpcds_q35_one_orders_aggregate_anti_join(spark):
    """Both orders EXISTS/NOT-EXISTS predicates must decorrelate into a
    single custkey aggregate (one orders-flag aggregation pair, not one
    per predicate) and the lineitem NOT EXISTS into an anti join."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q35_exists_profile"](spark, SF)
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # quantity/returnflag predicate pushed into the lineitem scan
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_lttb_no_full_data_window(spark):
    """LTTB's windows (lag/lead/row_number) must run on the aggregated
    slot grain (#keys x n_buckets), never the input: the plan's Window
    operators sit above HashAggregates, the final per-slot pick is a
    max_by aggregate (map-side combinable), and the bounds/slot-info
    relations broadcast."""
    import re

    plan = formatted_plan(contract.QUERIES["lttb_downsample_16"](spark, SF))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 4                     # documented 4-scan design
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4    # bounds, slots, final pick
    assert "CartesianProduct" not in plan


def test_weighted_sample_zero_shuffle(spark):
    """Weighted Bernoulli sampling is a pure projection + filter: the
    plan must contain NO Exchange of any kind and stay in codegen."""
    plan = formatted_plan(contract.QUERIES["weighted_sample"](spark, SF))
    assert "Exchange" not in plan
    assert "codegen id" in plan               # whole-stage codegen span
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crosscorr_lag_fanout_on_aggregated_grain(spark):
    """The lag fan-out and the pair join must run on the AGGREGATED bar
    grain: one events aggregation (partial+final), the lag relation
    broadcast, no Generate/explode over raw events, no cartesian on
    data."""
    plan = formatted_plan(
        contract.QUERIES["crosscorr_click_purchase"](spark, SF)
    )
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    # events predicate pushed to the scan
    assert "PushedFilters" in plan and "event_type" in plan


def test_tpcds_q31_single_scan_grain_self_join(spark):
    """The four-way canonical CTE join must collapse to ONE conditional
    channel aggregation per grain computation, nation broadcast, and no
    cartesian; aggregation (partial+final) runs BEFORE the self-join."""
    plan = formatted_plan(contract.QUERIES["tpcds_q31_qoq_growth"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_tpcds_q93_preagg_and_group_limit(spark):
    """Both netting sides pre-aggregate to the (order, item) grain
    before the fact-fact left join, and the global top-10 rank pushes a
    WindowGroupLimit so the shuffle is k-bounded."""
    plan = formatted_plan(contract.QUERIES["tpcds_q93_net_sales"](spark, SF))
    assert plan.count("HashAggregate") >= 4
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_rolling_corr_window_on_bar_grain(spark):
    """The rolling frame must run on the aligned BAR grain: events
    aggregate (partial+final) BEFORE the pair join and window; no
    cartesian; events predicate pushed to the scan."""
    plan = formatted_plan(contract.QUERIES["rolling_corr_7d"](spark, SF))
    # the bar max_by plans as SortAggregate (struct ordering key)
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "event_type" in plan


def test_psi_drift_single_scan(spark):
    """PSI bins must fold into ONE conditional-agg scan of events; the
    totals window runs on the #keys x 12 grain only."""
    import re

    plan = formatted_plan(contract.QUERIES["value_drift_bins"](spark, SF))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_cusum_per_key_window_only(spark):
    """CUSUM's prefix sum is a PER-KEY window (never a global order) and
    the totals relation broadcasts back onto the stream."""
    plan = formatted_plan(contract.QUERIES["cusum_value_shift"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2
    assert "BroadcastHashJoin" in plan


def test_lateness_stats_no_per_group_serial_window(spark):
    """The lateness running high-water mark must use the two-pass
    range-bucketed scheme: every Window ordered by the arrival seq must
    partition by (group, range-bucket), never by group alone — a
    group-only window serializes each group's whole history through one
    task. The only group-partitioned window allowed is the prefix-max
    over the tiny per-bucket seeds relation (ordered by __pid)."""
    plan = formatted_plan(
        contract.QUERIES["event_lateness_stats"](spark, SF)
    )
    assert "__pid" in plan  # bucketed formulation present
    spec_lines = [
        l for l in plan.splitlines() if "windowspecdefinition" in l
    ]
    assert spec_lines, "no Window nodes found — plan shape changed"
    for line in spec_lines:
        if "__seq#" in line:  # the pass over the full relation
            assert "__pid#" in line, f"serial per-group window: {line}"


def test_peak_concurrency_no_per_day_serial_sweep(spark):
    """The daily peak-concurrency sweep must be the two-level bucketed
    scheme: every Window over the BOUNDARY grain (ordered by (t, delta))
    must partition by (day, range-bucket), never by day alone — a
    day-only window walks the hottest day's whole boundary list in one
    task. The only day-partitioned window allowed is the offset merge
    over the tiny per-bucket totals (ordered by __bucket)."""
    plan = formatted_plan(
        contract.QUERIES["peak_concurrency_daily"](spark, SF)
    )
    assert "__bucket" in plan  # bucketed formulation present
    spec_lines = [
        l for l in plan.splitlines() if "windowspecdefinition" in l
    ]
    assert spec_lines, "no Window nodes found — plan shape changed"
    for line in spec_lines:
        if "delta#" in line:  # the pass over the boundary relation
            assert "__bucket#" in line, f"serial per-day sweep: {line}"


def test_bm25_takeordered_and_broadcasts(spark):
    """BM25's top-k must be a TakeOrdered (never a global sort), the
    per-term df and (D, T) totals must broadcast onto the tf relation,
    and nothing may plan a cartesian on data (the stats cross-join is a
    1-row broadcast)."""
    plan = formatted_plan(contract.QUERIES["bm25_search"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2  # dft equi-join + 1-row stats join
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_set_similarity_prefix_join_shape(spark):
    """The prefix-filter join must be an equi-join on the prefix token
    (SortMergeJoin or shuffled hash — never cartesian / nested-loop on
    data), with the verify sides joined back by id."""
    plan = formatted_plan(contract.QUERIES["dedup_prefix_filter"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # df-annotation aggregate + per-set sort aggregate both present
    assert plan.count("HashAggregate") >= 2


def test_hits_per_round_shape(spark):
    """Each HITS half-iteration is one edge equi-join + one hash-agg;
    the 1-row max joins via broadcast; no cartesian on data. The
    registered query localCheckpoints per round (plan cut), so the gate
    inspects the checkpoint=False build of the same graph."""
    from timeseriesfuser_spark.ops.graph import hits_scores

    edges = spark.range(200).selectExpr(
        "id % 20 AS id_a", "id % 37 AS id_b"
    )
    df = hits_scores(edges, iterations=2, checkpoint=False)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # 2 iterations x 2 half-updates: edge equi-joins + hash-aggs
    assert plan.count("HashAggregate") >= 4
    # the 1-row max normalizations join via broadcast nested loop (no key)
    assert plan.count("BroadcastNestedLoopJoin") >= 2
    df.sparkSession.catalog.clearCache()


def test_theil_sen_pairs_on_bar_grain(spark):
    """The pairwise slope self-join must run on the AGGREGATED bar grain
    (HashAggregate below the join), never raw events; the median rank
    window partitions by key (no single-partition window)."""
    plan = formatted_plan(contract.QUERIES["theil_sen_daily"](spark, SF))
    assert "CartesianProduct" not in plan
    agg = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert agg >= 2  # bar max_by + median pick
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__k" in line  # every window is per-key


def test_script_and_readability_zero_shuffle(spark):
    """Both text-quality profiles are pure projections: no Exchange, no
    Python eval, whole-stage codegen."""
    for name in ("script_profile_docs", "readability_docs"):
        plan = formatted_plan(contract.QUERIES[name](spark, SF))
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "codegen id" in plan


def test_tpcds_q90_q62_single_pass(spark):
    """Q90's am/pm counts and Q62's five latency bands must each be ONE
    conditional-aggregation pass — never per-band self-joined scans."""
    import re

    plan = formatted_plan(contract.QUERIES["tpcds_q90_ampm_ratio"](spark, SF))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    plan = formatted_plan(contract.QUERIES["tpcds_q62_ship_latency"](spark, SF))
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 2  # lineitem + orders, once each
    assert "CartesianProduct" not in plan


def test_collocations_single_pass_shapes(spark):
    """Collocations: bigram + unigram aggregations with the unigram
    relation broadcast back; top-k via TakeOrdered, never a global
    sort; no Python eval."""
    plan = formatted_plan(contract.QUERIES["collocations_docs"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hilbert_and_checksum_shapes(spark):
    """Hilbert key is a pure projection (no Exchange beyond the
    small-input spread, no Python); the checksum is one projection +
    one partial+final aggregate."""
    plan = formatted_plan(contract.QUERIES["hilbert_lineitem"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan = formatted_plan(contract.QUERIES["lineitem_checksum"](spark, SF))
    assert plan.count("HashAggregate") >= 2  # map-side partial sums
    assert "BatchEvalPython" not in plan


def test_spearman_windows_on_bar_grain(spark):
    """The rank windows must sit ABOVE the bar aggregation (paired-bar
    grain), never over raw events: a HashAggregate/SortAggregate exists
    below every Window in the plan tree."""
    plan = formatted_plan(
        contract.QUERIES["spearman_click_purchase"](spark, SF)
    )
    first_agg = min(
        i for i in (plan.find("HashAggregate"), plan.find("SortAggregate"))
        if i != -1
    )
    first_window = plan.find("Window")
    assert first_window == -1 or first_agg < first_window
    assert "CartesianProduct" not in plan


def test_region_share_window_over_aggregated_grain(spark):
    """The share window must run over the 25-row nation aggregate, and
    the dims broadcast — one lineitem scan only."""
    import re

    plan = formatted_plan(
        contract.QUERIES["region_revenue_share"](spark, SF)
    )
    scans = re.findall(r"Location.*?(\w+)\.parquet", plan)
    assert scans.count("lineitem") == 1
    assert plan.count("BroadcastHashJoin") >= 2
    # the share window partitions by the AGGREGATED grain's region key —
    # its windowspec must reference n_regionkey, never raw fact columns
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert specs and all("n_regionkey" in l for l in specs)


def test_top_parts_with_ties_group_limit(spark):
    """rank() <= k must plan a WindowGroupLimit (rank-limit pushdown)."""
    plan = formatted_plan(contract.QUERIES["top_parts_with_ties"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_prefix_filter_join_reads_persisted_prefixes(spark):
    """set_similarity_pairs (r10): the prefix relation feeds BOTH
    self-join sides from the persist — uncached, each side re-ran the
    ordered-set build (31M-bigram df join + per-doc sort, the dominant
    1M-doc cost). Gate: ≥2 InMemoryTableScans in the executed plan and
    at most the docs-cache's scans of the raw parquet."""
    from timeseriesfuser_spark.ops.util import cache_scope

    with cache_scope():
        df = contract.QUERIES["dedup_prefix_filter"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan


def test_asof_nearest_carry_scan_not_range_join(spark):
    """direction='nearest' must stay in the union+carry cost class: the
    left/right pairing happens via two Window scans over ONE keyed
    Exchange — never a join operator (a nearest range join would be
    quadratic), never a SinglePartition window."""
    plan = formatted_plan(contract.QUERIES["asof_nearest_quote"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    # both carry directions present: >= 2 full-frame Windows beyond the
    # right-side dedup's WindowGroupLimit
    assert plan.count("Window") >= 2


def test_tpcds_q44_topk_not_global_sort(spark):
    """Q44's two opposite-order rankings must run as TakeOrderedAndProject
    (per-partition heap + k-row driver merge), not as global-sort rank
    windows over the whole parts relation; the 10-row pairing join must
    broadcast."""
    plan = formatted_plan(
        contract.QUERIES["tpcds_q44_best_worst"](spark, SF)
    )
    # two top-k nodes (each appears twice in formatted mode: tree + detail)
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no full-relation sort: every Sort in this plan would be a global
    # rank window's — TakeOrdered subsumes ordering
    assert "+- Sort" not in plan


def test_set_similarity_bound_filter_stays_in_codegen(spark):
    """The bitmap overlap bound must stay a flat bit_count predicate
    over plain long columns: the measured failure modes were HOF
    lambdas (zip_with/aggregate — interpreted per pair, 1.9× slower
    than no filter at 135M candidates) and a 64-term CASE chain (4.3×
    slower inlined into the SMJ condition). Gate: the verify-input plan
    contains bit_count and NO higher-order array expressions in the
    pair-side (post-explode) region."""
    from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")],
        "doc_id long, text string",
    )
    df = set_similarity_pairs(
        docs, n=1, threshold=(2, 5), cache=False, _cand_only=True
    )
    plan = formatted_plan(df)
    assert "bit_count" in plan
    # the per-PAIR predicate must not be a lambda expression; the only
    # lambdas allowed are the per-DOC sketch builders (aggregate over
    # the shingle array), which appear with the `shingle`/`lambda b`
    # shape — so specifically forbid zip_with, the pair-side marker
    assert "zip_with" not in plan


def test_tpcds_q64_preaggregates_before_fact_fact_join(spark):
    """Q64-shape gate (VERDICT r13 #6a): the canonical three-fact-
    instance chain must collapse to ONE conditional-aggregation pass per
    self-join side — so exactly TWO lineitem scans (not three fact
    slices), exactly ONE row-grain-free SortMergeJoin (the (customer,
    year) self-join of aggregated outputs), and the aggregates sitting
    below it. The only joins touching raw lineitem rows are the
    fact-dimension orderkey joins."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q64_repeat_purchases"](spark, SF)
    )
    assert plan.count("lineitem.parquet") == 2
    assert plan.count("orders.parquet") == 2
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1


def test_sessionize_native_parity_and_plan(spark):
    """session_window twin gate (VERDICT r13 #6c): the native form must
    (a) agree row-for-row with the lag+cumsum formulation, and (b) plan
    as ONE keyed Exchange feeding a MergingSessions pass — one
    full-relation pass emitting session rows, vs the lag+cumsum form's
    two per-event Window passes + aggregation on the same Exchange. The
    idx window touches only the session-grain rows."""
    import re

    native = contract.QUERIES["sessionize_30m_native"](spark, SF)
    legacy = contract.QUERIES["sessionize_30m"](spark, SF)
    # plans BEFORE execution: post-collect explain adds AQE's final-plan
    # section and every node would count twice
    plan = formatted_plan(native)
    legacy_plan = formatted_plan(legacy)
    assert "MergingSessions" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", legacy_plan)) >= 2  # the cost it saves
    a = {tuple(r) for r in native.collect()}
    b = {tuple(r) for r in legacy.collect()}
    assert a == b and len(a) > 0


def test_tpcds_q95_shares_the_cte_exchange(spark):
    """Q95-shape gate (VERDICT r14 #7b): the multi-supplier CTE feeds
    BOTH semi-join consumers from ONE materialized shuffle — the plan
    must carry a ReusedExchange (Catalyst exchange reuse), exactly one
    count-distinct aggregation tower for the CTE itself, and pushed
    filters on both fact scans. Without the reuse the CTE's
    (orderkey, suppkey) aggregation would run twice — the difference
    between 2 and 3 fact-scan-equivalents at 100 TB."""
    df = contract.QUERIES["tpcds_q95_two_supplier"](spark, SF)
    df.collect()  # materialize so AQE finalizes the reuse decision
    plan = formatted_plan(df)
    assert "ReusedExchange" in plan
    # pushed predicate on the returned-lineitem scan + date range on orders
    assert "l_returnflag" in plan and "o_orderdate" in plan
    # the CTE aggregates (orderkey, suppkey) — partial+final towers exist
    assert plan.count("HashAggregate") >= 2


def test_streaming_attribution_join_state_is_horizon_bounded(spark):
    """Stream-stream interval join gate (VERDICT r14 #7a): the batch
    ANALOG of streaming_attribution_join (same predicate built by
    join_streams' condition shape) must push the event_type filters to
    the scan and keep the join keyed on user_id (a real equi-join with
    a range residual — never a cartesian with post-filter)."""
    from pyspark.sql import functions as F

    from timeseriesfuser_spark.timeutils import ts_epoch_ms_col

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts_ms = ts_epoch_ms_col(ev, "ts").cast("long")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        ts_ms.alias("purchase_ts"),
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        ts_ms.alias("click_ts"),
    )
    joined = left.join(
        right,
        (left["user_id"] == right["user_id"])
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + 86_400_000),
        "inner",
    )
    plan = formatted_plan(joined)
    assert "event_type" in plan  # pushed to the scan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
