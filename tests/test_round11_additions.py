"""Round-11 additions (driver round 7, continued):

- TPC-DS fourth wave (Q1 / Q65 cohort-deviation filters, Q39
  variance-threshold + consecutive-month self-join),
- ops.timeseries.acf_bars (global-mean ACF on bar closes),
- ops.timeseries.robust_outlier_summary (exact integer median/MAD),
- ops.timeseries.seasonal_naive_error (seasonal-naive baseline error).

Property tests compare against brute-force numpy/python on synthetic
frames; plan gates assert the aggregate-before-window / broadcast-dim
shapes the 100 TB design requires.
"""

import math
import statistics

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark import contract
from timeseriesfuser_spark.ops import timeseries as TS

SF = "/root/testdata/sf0.001"


def formatted_plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------------------
# plan gates
# ---------------------------------------------------------------------------


def test_tpcds_q1_q65_window_on_aggregated_grain(spark):
    """The cohort windows (nation avg / supplier avg) must run on the
    AGGREGATED per-entity grain — partial+final aggregation before the
    window — and every dimension must broadcast."""
    for name in ("tpcds_q1_return_outliers", "tpcds_q65_low_velocity_parts"):
        plan = formatted_plan(contract.QUERIES[name](spark, SF))
        assert "BroadcastHashJoin" in plan, name
        assert plan.count("HashAggregate") >= 2, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_tpcds_q39_variance_on_aggregated_grain(spark):
    """Q39's variance screen aggregates to the (part, month) grain
    (partial+final) BEFORE the consecutive-month self-join; the join is
    an equi-join on (part, month), never a cartesian."""
    plan = formatted_plan(
        contract.QUERIES["tpcds_q39_volatile_parts"](spark, SF)
    )
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_acf_joins_on_bar_grain(spark):
    """ACF's lag fan-out and self-join run on the aggregated bar grain:
    the only non-equi joins are the two single-row broadcasts (stats,
    denominator); the events relation aggregates map-side first."""
    plan = formatted_plan(contract.QUERIES["acf_value_1d"](spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    # single-row stats/den crossJoins are broadcast, never shuffled
    assert "BroadcastExchange" in plan


def test_seasonal_error_no_window(spark):
    """Seasonal-naive error needs no window at all: bar compaction agg +
    one equi self-join + final agg."""
    plan = formatted_plan(contract.QUERIES["seasonal_error_7d"](spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


# ---------------------------------------------------------------------------
# property / brute-force differential
# ---------------------------------------------------------------------------


def _mk_series(spark, vals, key="k", start=0, step=1000):
    rows = [
        (start + i * step, i + 1, key, float(v))
        for i, v in enumerate(vals)
        if v is not None
    ]
    return spark.createDataFrame(
        rows, "ts long, event_id long, event_type string, value double"
    )


def test_acf_matches_numpy_dense(spark):
    """Dense regular series: acf_bars == the textbook global-mean ACF."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    df = _mk_series(spark, vals, step=1000)
    out = {
        r["lag"]: r
        for r in TS.acf_bars(
            df, "k", 3, "1s", ts_col="ts", key_col="event_type",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    x = [round(v * 100) for v in vals]
    n = len(x)
    mu = sum(x) / n
    den = sum((v - mu) ** 2 for v in x)
    for lag in (1, 2, 3):
        num = sum((x[i] - mu) * (x[i + lag] - mu) for i in range(n - lag))
        assert out[lag]["n_pairs"] == n - lag
        assert out[lag]["n_bars"] == n
        assert math.isclose(out[lag]["acf"], num / den, rel_tol=1e-12)


def test_acf_gap_convention_pairs_only_where_both_exist(spark):
    """A missing bar drops exactly the pairs that touch it; the
    denominator still spans all present bars."""
    vals = [1.0, 2.0, None, 4.0, 5.0, 6.0]
    df = _mk_series(spark, vals, step=1000)
    out = {
        r["lag"]: r
        for r in TS.acf_bars(
            df, "k", 1, "1s", ts_col="ts", key_col="event_type",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    # pairs at lag 1: (0,1), (3,4), (4,5) — (1,2) and (2,3) touch the gap
    assert out[1]["n_pairs"] == 3
    assert out[1]["n_bars"] == 5


def test_acf_constant_series_null(spark):
    df = _mk_series(spark, [5.0] * 8, step=1000)
    rows = TS.acf_bars(
        df, "k", 2, "1s", ts_col="ts", key_col="event_type",
        value_col="value", seq_col="event_id",
    ).collect()
    assert len(rows) == 2
    assert all(r["acf"] is None for r in rows)


def test_acf_last_value_per_bucket(spark):
    """Two events in one bucket: the LATER one (ts, then seq) is the bar."""
    rows = [
        (0, 1, "k", 1.0), (500, 2, "k", 7.0),      # bucket 0 -> 7.0
        (1000, 3, "k", 2.0),                        # bucket 1 -> 2.0
        (2000, 4, "k", 7.0),                        # bucket 2 -> 7.0
    ]
    df = spark.createDataFrame(
        rows, "ts long, event_id long, event_type string, value double"
    )
    out = {
        r["lag"]: r["acf"]
        for r in TS.acf_bars(
            df, "k", 1, "1s", ts_col="ts", key_col="event_type",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    x = [700, 200, 700]
    mu = sum(x) / 3
    num = sum((x[i] - mu) * (x[i + 1] - mu) for i in range(2))
    den = sum((v - mu) ** 2 for v in x)
    assert math.isclose(out[1], num / den, rel_tol=1e-12)


@pytest.mark.parametrize("vals", [
    [1.0, 2.0, 3.0, 4.0, 5.0],                      # odd n
    [1.0, 2.0, 3.0, 4.0, 5.0, 100.0],               # even n, one outlier
    [7.0] * 9,                                       # constant (MAD = 0)
    [-5.0, -1.0, 0.0, 1.0, 5.0, 2.5, -2.5, 0.01],   # signed, even
])
def test_robust_outliers_match_bruteforce(spark, vals):
    df = _mk_series(spark, vals)
    row = TS.robust_outlier_summary(
        df, group_col="event_type", value_col="value", k=3
    ).collect()[0]
    cents = sorted(round(v * 100) for v in vals)
    med = statistics.median(cents)
    devs = [abs(c - med) for c in cents]
    mad = statistics.median(devs)
    assert row["n"] == len(cents)
    assert row["med_x2"] == int(2 * med)
    assert row["mad_x4"] == int(4 * mad)
    expected_out = sum(1 for d in devs if d > 3 * mad)
    assert row["n_outliers"] == expected_out


def test_robust_outliers_groups_isolated(spark):
    a = [(i * 10, i + 1, "a", float(i)) for i in range(9)]
    b = [(i * 10, 100 + i, "b", 50.0) for i in range(4)]
    df = spark.createDataFrame(
        a + b, "ts long, event_id long, event_type string, value double"
    )
    out = {
        r["event_type"]: r
        for r in TS.robust_outlier_summary(
            df, group_col="event_type", value_col="value", k=3
        ).collect()
    }
    assert out["a"]["n"] == 9 and out["b"]["n"] == 4
    assert out["a"]["med_x2"] == 2 * 400       # median of 0..800 cents
    assert out["b"]["med_x2"] == 2 * 5000
    assert out["b"]["mad_x4"] == 0
    # constant group: every dev == 0, none exceed 3*MAD=0 strictly
    assert out["b"]["n_outliers"] == 0


def test_seasonal_error_bruteforce(spark):
    vals = [float(v) for v in [10, 20, 30, 40, 11, 22, 33, 44]]
    df = _mk_series(spark, vals, step=1000)
    row = TS.seasonal_naive_error(
        df, 4, "1s", ts_col="ts", key_col="event_type",
        value_col="value", seq_col="event_id",
    ).collect()[0]
    cents = [round(v * 100) for v in vals]
    errs = [cents[i] - cents[i - 4] for i in range(4, 8)]
    assert row["n_pairs"] == 4
    assert row["sum_abs_err"] == sum(abs(e) for e in errs)
    assert row["sum_err"] == sum(errs)
    assert math.isclose(row["mae_cents"], sum(abs(e) for e in errs) / 4)


def test_seasonal_error_gap_drops_pair(spark):
    vals = [1.0, None, 3.0, 4.0, 5.0, 6.0]
    df = _mk_series(spark, vals, step=1000)
    row = TS.seasonal_naive_error(
        df, 3, "1s", ts_col="ts", key_col="event_type",
        value_col="value", seq_col="event_id",
    ).collect()[0]
    # predecessors: bar3<-bar0 (ok), bar4<-bar1 (missing), bar5<-bar2 (ok)
    assert row["n_pairs"] == 2


def test_validation_errors(spark):
    df = _mk_series(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        TS.acf_bars(df, "k", 0)
    with pytest.raises(ValueError):
        TS.robust_outlier_summary(df, k=0)
    with pytest.raises(ValueError):
        TS.seasonal_naive_error(df, 0)


# ---------------------------------------------------------------------------
# triangle counting / market basket
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def test_triangles_k4(spark):
    from timeseriesfuser_spark.ops.graph import triangle_counts
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = {r["id"]: r["n_triangles"]
           for r in triangle_counts(_edges(spark, k4)).collect()}
    # K4 has 4 triangles; every node sits in C(3,2) = 3 of them
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_square_none(spark):
    from timeseriesfuser_spark.ops.graph import triangle_counts
    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert triangle_counts(_edges(spark, sq)).count() == 0


def test_triangles_canonicalization(spark):
    from timeseriesfuser_spark.ops.graph import triangle_counts
    # duplicates, reversed duplicates, and a self-loop must not change
    # the count of the single (0,1,2) triangle
    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 2), (0, 1)]
    out = {r["id"]: r["n_triangles"]
           for r in triangle_counts(_edges(spark, messy)).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangles_hub_star_plus_one(spark):
    from timeseriesfuser_spark.ops.graph import triangle_counts
    # star around 0 (no triangles) plus one closing edge (1,2)
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    out = {r["id"]: r["n_triangles"]
           for r in triangle_counts(_edges(spark, star)).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangles_bruteforce_random(spark):
    import itertools
    import random
    from timeseriesfuser_spark.ops.graph import triangle_counts
    rng = random.Random(42)
    nodes = list(range(12))
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
             if rng.random() < 0.4]
    es = set(edges)
    expect = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    out = {r["id"]: r["n_triangles"]
           for r in triangle_counts(_edges(spark, edges)).collect()}
    assert out == expect


def test_copurchase_lift_bruteforce(spark):
    from timeseriesfuser_spark.ops.behavior import copurchase_lift
    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 20, 40],
        4: [30, 40],
        5: [10],
    }
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r["item_a"], r["item_b"]): r
           for r in copurchase_lift(df, min_pair_baskets=2).collect()}
    assert set(out) == {(10, 20)}
    r = out[(10, 20)]
    assert r["n_both"] == 3 and r["n_a"] == 4 and r["n_b"] == 3
    assert r["n_baskets"] == 5
    assert math.isclose(r["confidence_ab"], 3 / 4)
    assert math.isclose(r["lift"], (3 * 5) / (4 * 3))


def test_copurchase_duplicate_lines_one_vote(spark):
    from timeseriesfuser_spark.ops.behavior import copurchase_lift
    # the same (order, part) line twice counts once (distinct baskets)
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    r = copurchase_lift(df, min_pair_baskets=2).collect()[0]
    assert r["n_both"] == 2 and r["n_a"] == 2 and r["n_b"] == 2


def test_triangle_copurchase_plans(spark):
    """Triangle counting: equi-joins only (the orientation makes every
    join an equi-join — a cartesian would mean the wedge pivot broke).
    Lift: single-row totals broadcast; pair agg is partial+final."""
    plan = formatted_plan(
        contract.QUERIES["copurchase_triangles"](spark, SF)
    )
    assert "CartesianProduct" not in plan
    plan2 = formatted_plan(contract.QUERIES["copurchase_lift"](spark, SF))
    assert "CartesianProduct" not in plan2
    assert plan2.count("HashAggregate") >= 2


# ---------------------------------------------------------------------------
# concentration (Gini / HHI)
# ---------------------------------------------------------------------------


def _conc(spark, rows):
    from timeseriesfuser_spark.ops.behavior import concentration_stats
    df = spark.createDataFrame(rows, "g string, v long")
    return {
        r["g"]: r
        for r in concentration_stats(
            df, group_col="g", value_col="v"
        ).collect()
    }


def test_concentration_uniform_vs_monopoly(spark):
    rows = [("u", 100)] * 4 + [("m", 400), ("m", 0), ("m", 0), ("m", 0)]
    out = _conc(spark, rows)
    # uniform: gini 0, HHI = 1/n
    assert out["u"]["gini_ppm"] == 0
    assert out["u"]["hhi_ppm"] == 250_000
    # monopoly of 4: gini = (n-1)/n = 0.75, HHI = 1.0
    assert out["m"]["gini_ppm"] == 750_000
    assert out["m"]["hhi_ppm"] == 1_000_000


def test_concentration_bruteforce(spark):
    vals = [5, 10, 20, 20, 45]
    out = _conc(spark, [("g", v) for v in vals])["g"]
    n, s = len(vals), sum(vals)
    xs = sorted(vals)
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    gini_ppm = (2 * ix - (n + 1) * s) * 1_000_000 // (n * s)
    hhi_ppm = sum(x * x for x in vals) * 1_000_000 // (s * s)
    assert out["n"] == n and out["total"] == s
    assert out["gini_ppm"] == gini_ppm
    assert out["hhi_ppm"] == hhi_ppm


def test_concentration_zero_total_null(spark):
    out = _conc(spark, [("z", 0), ("z", 0)])
    assert out["z"]["gini_ppm"] is None
    assert out["z"]["hhi_ppm"] is None
    assert out["z"]["total"] == 0


def test_concentration_tie_invariance(spark):
    # equal values in any insertion order produce the same gini
    a = _conc(spark, [("g", v) for v in [7, 7, 7, 1]])["g"]
    b = _conc(spark, [("g", v) for v in [1, 7, 7, 7]])["g"]
    assert a["gini_ppm"] == b["gini_ppm"] == a["gini_ppm"]


def test_concentration_plan(spark):
    """Gini's rank window runs on the aggregated member grain; the
    nation dim broadcasts; one fact-side aggregation (partial+final)."""
    plan = formatted_plan(
        contract.QUERIES["revenue_concentration"](spark, SF)
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_round11_cache_false_leaves_no_entries(spark):
    """Every round-11 multi-consumer op honors cache=False (no registered
    cache entry after consumption) and returns identical results."""
    from timeseriesfuser_spark.ops.behavior import copurchase_lift
    from timeseriesfuser_spark.ops.graph import triangle_counts
    from timeseriesfuser_spark.ops.timeseries import (
        acf_bars,
        robust_outlier_summary,
        seasonal_naive_error,
    )

    spark.catalog.clearCache()
    cm = _cache_manager(spark)
    assert cm.isEmpty()
    ev = _mk_series(spark, [float(v) for v in range(1, 15)])
    edges = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    basket = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20)],
        "l_orderkey long, l_partkey long",
    )
    runs = [
        lambda c: acf_bars(ev, "k", 2, "1s", cache=c),
        lambda c: robust_outlier_summary(ev, cache=c),
        lambda c: seasonal_naive_error(ev, 3, "1s", cache=c),
        lambda c: triangle_counts(edges, cache=c),
        lambda c: copurchase_lift(basket, min_pair_baskets=2, cache=c),
    ]
    for run in runs:
        cold = sorted(map(tuple, run(False).collect()))
        assert cm.isEmpty(), "cache=False must register nothing"
        hot = sorted(map(tuple, run(True).collect()))
        assert not cm.isEmpty(), "default persists the shared subplan"
        assert cold == hot
        spark.catalog.clearCache()


def test_round11_single_fact_scan_with_cache(spark):
    """With the default cache, every round-11 contract query reads its
    fact table ONCE (Catalyst re-executes shared subplans per consumer;
    uncached, copurchase_triangles exploded to ~90 parquet scans)."""
    import re

    for name, max_scans in [
        ("acf_value_1d", 1),
        ("seasonal_error_7d", 1),
        ("robust_outlier_summary", 1),
        ("copurchase_lift", 1),
        ("copurchase_triangles", 2),
    ]:
        plan = formatted_plan(contract.QUERIES[name](spark, SF))
        scans = re.findall(r"\(\d+\) Scan parquet", plan)
        assert len(scans) <= max_scans, (name, len(scans))
    spark.catalog.clearCache()


def test_tpcds_q11_q54_single_scan(spark):
    """Q11's period×channel fan-out folds into ONE conditional-sum scan
    (the canonical form re-scans the fact four times); Q54's histogram
    is two stacked aggregations over one scan. Dims broadcast."""
    import re

    plan = formatted_plan(
        contract.QUERIES["tpcds_q11_growth_accounts"](spark, SF)
    )
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) <= 4          # lineitem + orders + customer + nation
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan

    plan2 = formatted_plan(
        contract.QUERIES["tpcds_q54_spend_bands"](spark, SF)
    )
    scans2 = set(re.findall(r"\((\d+)\) Scan parquet", plan2))
    assert len(scans2) <= 2         # lineitem + orders, once each
    assert plan2.count("HashAggregate") >= 4   # two partial+final levels
    assert "CartesianProduct" not in plan2


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------


def test_exact_percentiles_bruteforce(spark):
    from fractions import Fraction

    from timeseriesfuser_spark.ops.timeseries import exact_percentiles

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.5, 5.0]
    df = _mk_series(spark, vals)
    row = exact_percentiles(
        df, ((1, 2), (9, 10), (99, 100)),
        group_col="event_type", value_col="value",
    ).collect()[0]
    xs = sorted(round(v * 100) for v in vals)
    n = len(xs)
    for num, den, col in [(1, 2, "p1_2_x2"), (9, 10, "p9_10_x10"),
                          (99, 100, "p99_100_x100")]:
        idx = Fraction(num * (n - 1), den)
        lo, frac = int(idx), idx - int(idx)
        expect = xs[lo] * (1 - frac) + (xs[lo + 1] * frac if frac else 0)
        assert row[col] == int(expect * den), (col, row[col], expect)


def test_exact_percentiles_edges(spark):
    from timeseriesfuser_spark.ops.timeseries import exact_percentiles

    # single value: every percentile is that value
    df = _mk_series(spark, [7.0])
    row = exact_percentiles(
        df, ((0, 1), (1, 2), (1, 1)),
        group_col="event_type", value_col="value",
    ).collect()[0]
    assert row["p0_1_x1"] == 700
    assert row["p1_2_x2"] == 1400
    assert row["p1_1_x1"] == 700
    # p0 / p100 are min / max
    df2 = _mk_series(spark, [5.0, 1.0, 9.0])
    row2 = exact_percentiles(
        df2, ((0, 1), (1, 1)),
        group_col="event_type", value_col="value",
    ).collect()[0]
    assert row2["p0_1_x1"] == 100 and row2["p1_1_x1"] == 900
    with pytest.raises(ValueError):
        exact_percentiles(df, ((3, 2),))
