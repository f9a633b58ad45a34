"""TPC-DS-style window/grouping compositions over the TPC-H-ish tables.

TPC-H (complete, 22/22 shapes in ``relational.py``) exercises joins and
aggregation; the next reference-class workload a warehouse user runs is
TPC-DS's window-heavy tier. These seven queries re-create its signature
COMPOSITIONS — deviation-from-mean over an aggregated grain (Q57/Q89),
single-scan multi-band counts (Q88), year-over-year ratio (Q47),
channel ROLLUP (Q5), frequent-buyer having-band (Q34), top-N over a
rollup grid (Q67), and hierarchy-level ranking with grouping_id (Q36) —
on the synthetic star schema (single fact table: the tri-fact unions of
real TPC-DS collapse to a derived channel dimension, documented per
query).

Second wave (cross-channel/temporal set logic): cumulative cross-channel
comparison (Q51), cross-channel INTERSECT (Q14), frequent-item carts
feeding semi-joins (Q23), and EXISTS + multi-way NOT EXISTS customer
profiling (Q35). Oracles state the CANONICAL TPC-DS forms (full-outer +
running max, INTERSECT chains, correlated EXISTS); the Spark side
implements the scale-correct single-scan rewrites, with the equivalence
argued per query.

Determinism: money accumulates in exact integer cents (1e-4 dollar units
for discounted amounts), ratios are ONE double division at the end, and
threshold comparisons run in decimal(38,0) cross-multiplied integers —
the house conventions that make DuckDB hash parity possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.contract._base import (
    _events,  # noqa: F401
    ORACLES,
    QUERIES,
    _t,
    register,
)

# discounted revenue in 1e-4 dollar units, exactly (tpch_q1 convention)
_REV4 = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev4_col() -> "F.Column":
    epc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return epc * (F.lit(100) - dc)


@register(
    "tpcds_q57_outlier_months",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand, year(l.l_shipdate) * 100 + month(l.l_shipdate)
                   AS ym,
               sum({_REV4}) AS rev4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    w AS (
        SELECT p_brand, ym, rev4,
               sum(rev4) OVER (PARTITION BY p_brand) AS tot4,
               count(*) OVER (PARTITION BY p_brand) AS n_months
        FROM m
    )
    SELECT p_brand,
           CAST(ym AS BIGINT) AS ym,
           CAST(rev4 AS DOUBLE) / 10000 AS revenue,
           CAST(tot4 AS DOUBLE) / 10000 / n_months AS avg_revenue,
           CAST(abs(rev4::HUGEINT * n_months - tot4::HUGEINT) * 1000000
                // (tot4::HUGEINT * n_months) AS BIGINT) AS dev_ppm
    FROM w
    WHERE abs(rev4::HUGEINT * n_months - tot4::HUGEINT) * 200
          > tot4::HUGEINT * n_months
    """,
)
def q_tpcds_q57_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q57-shape: per-category (brand) monthly revenue that
    deviates >0.5% from the brand's all-months mean (the synthetic
    corpus is near-uniform across months — real Q57 uses 10%; the
    threshold is chosen so the query exercises non-empty output at the
    checked scale factors). The window runs on
    the AGGREGATED (brand, month) grain — #brands × #months rows, never
    the fact table — and the deviation test is exact cross-multiplied
    integers in decimal(38,0) (|rev·n − tot|·200 > tot·n), so no
    float threshold can disagree across engines."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    ym = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")
    m = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", ym.alias("ym"))
        .agg(F.sum(_rev4_col()).alias("rev4"))
    )
    w = Window.partitionBy("p_brand")
    d = (
        m.withColumn("tot4", F.sum("rev4").over(w))
        .withColumn("n_months", F.count(F.lit(1)).over(w))
    )
    rev_d = F.expr("CAST(rev4 AS DECIMAL(38,0))")
    tot_d = F.expr("CAST(tot4 AS DECIMAL(38,0))")
    n = F.col("n_months")
    diff = F.abs(rev_d * n - tot_d)
    return d.filter(diff * 200 > tot_d * n).select(
        "p_brand",
        F.col("ym").cast("long").alias("ym"),
        (F.col("rev4").cast("double") / 10000).alias("revenue"),
        (F.col("tot4").cast("double") / 10000 / n).alias("avg_revenue"),
        F.expr(
            "CAST(abs(CAST(rev4 AS DECIMAL(38,0)) * n_months"
            " - CAST(tot4 AS DECIMAL(38,0))) * 1000000"
            " DIV (CAST(tot4 AS DECIMAL(38,0)) * n_months) AS BIGINT)"
        ).alias("dev_ppm"),
    )


_Q88_BANDS = [(1 + 7 * i, 8 + 7 * i) for i in range(8)]  # qty [1,8),[8,15)..


@register(
    "tpcds_q88_band_counts",
    oracle="""
    SELECT
    """ + ",\n    ".join(
        f"CAST(count(CASE WHEN l_quantity >= {lo} AND l_quantity < {hi}"
        f" THEN 1 END) AS BIGINT) AS band_{i + 1}"
        for i, (lo, hi) in enumerate(_Q88_BANDS)
    ) + """
    FROM lineitem
    WHERE l_discount <= 0.05
    """,
)
def q_tpcds_q88_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88-shape: eight disjoint band counts (quantity ranges
    under a shared discount predicate) in ONE scan — the real Q88 writes
    eight self-joined subqueries; the scale-correct plan is a single
    conditional aggregation pass (plan-gated: exactly one lineitem
    scan). Output is a single row of eight counters."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") <= 0.05)
    q = F.col("l_quantity")
    return li.agg(
        *[
            F.count(F.when((q >= lo) & (q < hi), F.lit(1)))
            .cast("long")
            .alias(f"band_{i + 1}")
            for i, (lo, hi) in enumerate(_Q88_BANDS)
        ]
    )


@register(
    "tpcds_q47_yoy_ratio",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand, year(l.l_shipdate) AS yr, month(l.l_shipdate) AS mo,
               sum({_REV4}) AS rev4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2, 3
    )
    SELECT c.p_brand,
           CAST(c.yr * 100 + c.mo AS BIGINT) AS ym,
           CAST(c.rev4 AS DOUBLE) / 10000 AS revenue,
           CAST(p.rev4 AS DOUBLE) / 10000 AS prev_year_revenue,
           CAST(c.rev4 AS DOUBLE) / CAST(p.rev4 AS DOUBLE) AS yoy_ratio
    FROM m c JOIN m p
      ON c.p_brand = p.p_brand AND c.mo = p.mo AND c.yr = p.yr + 1
    """,
)
def q_tpcds_q47_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47-shape: year-over-year monthly revenue ratio per brand —
    the aggregated (brand, year, month) grain self-joined on (brand,
    month, year−1). A lag(12) window would silently pair WRONG months
    when any month is missing from a brand; the equi-join is
    gap-correct and stays on the #brands × #months relation. The ratio
    is one double division of two exact integer sums."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    m = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            "p_brand",
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum(_rev4_col()).alias("rev4"))
    )
    c = m.alias("c")
    p = m.alias("p")
    return c.join(
        p,
        (F.col("c.p_brand") == F.col("p.p_brand"))
        & (F.col("c.mo") == F.col("p.mo"))
        & (F.col("c.yr") == F.col("p.yr") + 1),
    ).select(
        F.col("c.p_brand").alias("p_brand"),
        (F.col("c.yr") * 100 + F.col("c.mo")).cast("long").alias("ym"),
        (F.col("c.rev4").cast("double") / 10000).alias("revenue"),
        (F.col("p.rev4").cast("double") / 10000).alias("prev_year_revenue"),
        (F.col("c.rev4").cast("double") / F.col("p.rev4").cast("double"))
        .alias("yoy_ratio"),
    )


# channel: a derived dimension over the single fact table (real TPC-DS
# unions three fact tables; with one, the union collapses to a CASE)
_CHANNEL_SQL = """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 'express' WHEN o_orderpriority = '3-MEDIUM'
          THEN 'standard' ELSE 'economy' END"""


@register(
    "tpcds_q5_channel_rollup",
    oracle=f"""
    WITH f AS (
        SELECT {_CHANNEL_SQL} AS channel,
               year(o.o_orderdate) AS yr,
               CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE {_REV4} END
                   AS sales4,
               CASE WHEN l.l_returnflag = 'R' THEN {_REV4} ELSE 0 END
                   AS returns4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT channel,
           CAST(yr AS BIGINT) AS yr,
           CAST(GROUPING(channel, yr) AS BIGINT) AS gid,
           CAST(sum(sales4) AS DOUBLE) / 10000 AS sales,
           CAST(sum(returns4) AS DOUBLE) / 10000 AS returns,
           CAST(sum(sales4) - sum(returns4) AS DOUBLE) / 10000 AS net
    FROM f
    GROUP BY ROLLUP (channel, yr)
    """,
)
def q_tpcds_q5_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q5-shape: sales / returns / net per channel and year with
    ROLLUP subtotals. Real Q5 unions three fact tables into channel
    rows; with one fact table the channel is a derived dimension
    (priority bands), so the whole grid is ONE scan + ONE Expand +
    one aggregation (plan-gated) — never a per-channel re-scan.
    Returns split on l_returnflag inside conditional sums."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    rev4 = _rev4_col()
    isret = F.col("l_returnflag") == "R"
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr(_CHANNEL_SQL).alias("channel"),
        F.year("o_orderdate").alias("yr"),
        F.when(isret, F.lit(0).cast("long")).otherwise(rev4).alias("sales4"),
        F.when(isret, rev4).otherwise(F.lit(0).cast("long")).alias("returns4"),
    )
    return (
        f.rollup("channel", "yr")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("sales4").alias("s4"),
            F.sum("returns4").alias("r4"),
        )
        .select(
            "channel",
            F.col("yr").cast("long").alias("yr"),
            "gid",
            (F.col("s4").cast("double") / 10000).alias("sales"),
            (F.col("r4").cast("double") / 10000).alias("returns"),
            ((F.col("s4") - F.col("r4")).cast("double") / 10000).alias("net"),
        )
    )


@register(
    "tpcds_q34_frequent_buyers",
    oracle="""
    WITH f AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) BETWEEN 15 AND 20
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           CAST(f.n_orders AS BIGINT) AS n_orders
    FROM customer c JOIN f ON c.c_custkey = f.o_custkey
    """,
)
def q_tpcds_q34_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34-shape: customers with an order count inside a band
    (15–20), hydrated with their dimension attributes. The having-band
    filter runs map-side-combinable on the fact table FIRST; the
    surviving key set is small by construction, so IT is broadcast into
    the customer dimension join — at 100 TB the dimension never
    shuffles."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    f = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders").between(15, 20))
    )
    return c.join(F.broadcast(f), c.c_custkey == f.o_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_orders"
    )


@register(
    "tpcds_q67_topn_rollup",
    oracle=f"""
    WITH g AS (
        SELECT p.p_brand, p.p_type,
               CAST(GROUPING(p.p_brand, p.p_type) AS BIGINT) AS gid,
               sum({_REV4}) AS rev4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY ROLLUP (p.p_brand, p.p_type)
    ),
    r AS (
        SELECT p_brand, p_type, gid,
               CAST(rev4 AS DOUBLE) / 10000 AS revenue,
               rank() OVER (PARTITION BY p_brand
                            ORDER BY rev4 DESC, p_type ASC NULLS FIRST)
                   AS rnk
        FROM g
    )
    SELECT p_brand, p_type, gid, revenue, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def q_tpcds_q67_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67-shape: rank the whole ROLLUP grid within each brand
    partition and keep the top 3 — subtotal rows compete with detail
    rows, exactly like Q67's category ranking. One Expand builds the
    grid; the rank window runs on the #brands × #types grid, never the
    fact table, and the rank<=3 filter lets Spark push a
    WindowGroupLimit. Tie-break pinned (rev DESC, p_type ASC NULLS
    FIRST — Spark's ASC default, spelled out for DuckDB)."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    g = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .rollup("p_brand", "p_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(_rev4_col()).alias("rev4"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("rev4").desc(), F.col("p_type").asc_nulls_first()
    )
    return (
        g.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_type",
            "gid",
            (F.col("rev4").cast("double") / 10000).alias("revenue"),
            "rnk",
        )
    )


@register(
    "tpcds_q36_margin_hierarchy",
    oracle=f"""
    WITH f AS (
        SELECT r.r_name, n.n_name,
               {_REV4} AS rev4,
               CAST(round(p.p_retailprice * 100) AS BIGINT)
                   * CAST(round(l.l_quantity) AS BIGINT) * 100 AS cost4
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    g AS (
        SELECT r_name, n_name,
               CAST(GROUPING(r_name, n_name) AS BIGINT) AS lochierarchy,
               sum(rev4) AS rev4, sum(cost4) AS cost4
        FROM f GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT r_name, n_name, lochierarchy,
           CAST(rev4 AS DOUBLE) / 10000 AS revenue,
           CAST(rev4 - cost4 AS DOUBLE) / CAST(rev4 AS DOUBLE) AS margin,
           CAST(rank() OVER (
               PARTITION BY lochierarchy,
                            CASE WHEN lochierarchy = 0 THEN r_name END
               ORDER BY CAST(rev4 - cost4 AS DOUBLE) / CAST(rev4 AS DOUBLE)
                        ASC,
                        n_name ASC NULLS FIRST) AS BIGINT)
               AS rank_within_parent
    FROM g
    """,
)
def q_tpcds_q36_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36-shape: gross-margin ROLLUP over the region→nation
    hierarchy, ranked WITHIN PARENT — partition by (grouping level, and
    for nation rows their region), exactly Q36's
    lochierarchy/rank_within_parent idiom. Cost proxies retailprice ×
    quantity (no supplycost column). Margin = one double division of
    two exact integer sums; rank ties pinned by n_name ASC NULLS
    FIRST. All dims broadcast; the window runs on the rolled-up grid."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    cost4 = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(100)
    )
    f = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select(
            "r_name",
            "n_name",
            _rev4_col().alias("rev4"),
            cost4.alias("cost4"),
        )
    )
    g = f.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("long").alias("lochierarchy"),
        F.sum("rev4").alias("rev4"),
        F.sum("cost4").alias("cost4"),
    )
    margin = (F.col("rev4") - F.col("cost4")).cast("double") / F.col(
        "rev4"
    ).cast("double")
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("r_name")),
    ).orderBy(margin.asc(), F.col("n_name").asc_nulls_first())
    return g.select(
        "r_name",
        "n_name",
        "lochierarchy",
        (F.col("rev4").cast("double") / 10000).alias("revenue"),
        margin.alias("margin"),
        F.rank().over(w).cast("long").alias("rank_within_parent"),
    )


_YM_SQL = "year(l_shipdate) * 100 + month(l_shipdate)"


def _ym_col() -> "F.Column":
    return (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long")


@register(
    "tpcds_q51_cumulative_channels",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand, CAST({_YM_SQL} AS BIGINT) AS ym, l.l_returnflag AS f,
               sum({_REV4}) AS rev4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_returnflag IN ('A', 'N')
        GROUP BY 1, 2, 3
    ),
    a AS (SELECT p_brand, ym,
                 sum(rev4) OVER (PARTITION BY p_brand ORDER BY ym) AS c
          FROM m WHERE f = 'A'),
    b AS (SELECT p_brand, ym,
                 sum(rev4) OVER (PARTITION BY p_brand ORDER BY ym) AS c
          FROM m WHERE f = 'N'),
    j AS (
        SELECT coalesce(a.p_brand, b.p_brand) AS p_brand,
               coalesce(a.ym, b.ym) AS ym, a.c AS ac, b.c AS bc
        FROM a FULL OUTER JOIN b ON a.p_brand = b.p_brand AND a.ym = b.ym
    ),
    y AS (
        SELECT p_brand, ym, ac, bc,
               max(ac) OVER (PARTITION BY p_brand ORDER BY ym) AS wc4,
               max(bc) OVER (PARTITION BY p_brand ORDER BY ym) AS sc4
        FROM j
    )
    SELECT p_brand, ym,
           CAST(ac AS DOUBLE) / 10000 AS web_sales,
           CAST(bc AS DOUBLE) / 10000 AS store_sales,
           CAST(wc4 AS DOUBLE) / 10000 AS web_cumulative,
           CAST(sc4 AS DOUBLE) / 10000 AS store_cumulative
    FROM y WHERE wc4 > sc4
    """,
)
def q_tpcds_q51_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51-shape: per-brand monthly cumulative sales of two
    channels (returnflag 'A' = web analog, 'N' = store analog), emit the
    months where the web cumulative has overtaken the store cumulative.
    The oracle states the CANONICAL Q51 plan: per-channel running sums,
    FULL OUTER join on (brand, month), running-max forward fill. The
    Spark side is the single-scan rewrite: ONE aggregation to the
    (brand, month) grain with conditional per-channel sums, then running
    conditional sums — equivalent because revenue is strictly positive,
    so each channel's cumulative is strictly increasing and the running
    max of prior cumulatives IS the running sum of that channel's
    monthly sums (null months skipped by sum's null handling); the
    joined grain (months where either channel sold) equals the groupBy
    grain. One fact scan, one shuffle, windows on the aggregated grain
    only; the exact comparison runs on integer 1e-4 units."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
    )
    pt = _t(spark, sf_dir, "part")
    isa = F.col("l_returnflag") == "A"
    m = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", _ym_col().alias("ym"))
        .agg(
            F.sum(F.when(isa, _rev4_col())).alias("a4"),
            F.sum(F.when(~isa, _rev4_col())).alias("n4"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("ym")
    y = m.withColumn("wc4", F.sum("a4").over(w)).withColumn(
        "sc4", F.sum("n4").over(w)
    )
    return y.filter(F.col("wc4") > F.col("sc4")).select(
        "p_brand",
        "ym",
        # canonical web_sales/store_sales are the channel's CUMULATIVE at
        # months where it sold, null elsewhere
        F.when(F.col("a4").isNotNull(), F.col("wc4").cast("double") / 10000)
        .alias("web_sales"),
        F.when(F.col("n4").isNotNull(), F.col("sc4").cast("double") / 10000)
        .alias("store_sales"),
        (F.col("wc4").cast("double") / 10000).alias("web_cumulative"),
        (F.col("sc4").cast("double") / 10000).alias("store_cumulative"),
    )


# six derived channels: returnflag x linestatus (the tri-channel fact
# union of real TPC-DS collapses to a derived dim on the single fact)
_CH6_SQL = "l_returnflag || '/' || l_linestatus"
_CH6_VALUES = [f"{rf}/{ls}" for rf in "ANR" for ls in "FO"]


@register(
    "tpcds_q14_channel_intersect",
    oracle=f"""
    WITH surv AS (
        {" INTERSECT ".join(
            "SELECT l_partkey FROM lineitem "
            f"WHERE {_CH6_SQL} = '{ch}'" for ch in _CH6_VALUES
        )}
    )
    SELECT p.p_brand, {_CH6_SQL} AS channel,
           CAST(sum({_REV4}) AS DOUBLE) / 10000 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_partkey IN (SELECT l_partkey FROM surv)
    GROUP BY 1, 2
    """,
)
def q_tpcds_q14_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14-shape: revenue per (brand, channel) restricted to the
    items sold in EVERY channel — the cross-channel INTERSECT. The
    oracle states the canonical 6-way INTERSECT chain; the Spark side is
    the single-scan rewrite: aggregate once to the (item, brand,
    channel) grain, count distinct channels per item with a window on
    that TINY grain (#parts x 6 rows), keep items with all 6, and
    re-aggregate — one fact scan instead of seven, no fact re-join
    (the survivor filter runs on the already-aggregated grain)."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    ch = F.concat_ws("/", "l_returnflag", "l_linestatus")
    g = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_partkey", "p_brand", ch.alias("channel"))
        .agg(
            F.sum(_rev4_col()).alias("rev4"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    nch = F.size(
        F.collect_set("channel").over(Window.partitionBy("l_partkey"))
    )
    return (
        g.withColumn("nch", nch)
        .filter(F.col("nch") == len(_CH6_VALUES))
        .groupBy("p_brand", "channel")
        .agg(
            (F.sum("rev4").cast("double") / 10000).alias("revenue"),
            F.sum("n").cast("long").alias("n_items"),
        )
    )


@register(
    "tpcds_q23_frequent_carts",
    oracle=f"""
    WITH fp AS (
        SELECT l_partkey FROM lineitem
        GROUP BY 1 HAVING count(DISTINCT {_YM_SQL}) >= 25
    ),
    s AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sp
        FROM orders GROUP BY 1
    ),
    t AS (SELECT sum(sp) AS tot, count(*) AS n FROM s),
    bc AS (
        SELECT o_custkey FROM s, t
        WHERE sp::HUGEINT * n * 10 > tot::HUGEINT * 12
    )
    SELECT CAST({_YM_SQL} AS BIGINT) AS ym,
           CAST(sum({_REV4}) AS DOUBLE) / 10000 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_partkey IN (SELECT l_partkey FROM fp)
      AND o.o_custkey IN (SELECT o_custkey FROM bc)
    GROUP BY 1
    """,
)
def q_tpcds_q23_carts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23-shape: monthly revenue from FREQUENT items (sold in
    >= 25 distinct ship months) bought by BEST customers (total spend
    > 1.2x the all-customer mean, tested as exact cross-multiplied
    integers: spend*n*10 > total*12 in decimal(38,0) — no float
    threshold). Both survivor sets are computed map-side-combinable
    aggregates; each feeds a SEMI join applied BEFORE the fact-fact
    orderkey join (lineitem semi-filtered by frequent parts — a
    broadcastable part-key set; orders semi-filtered by best customers
    on the custkey grain), so the big join shuffles only surviving
    rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    fp = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct(_ym_col()).alias("nm"))
        .filter(F.col("nm") >= 25)
        .select("l_partkey")
    )
    s = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sp")
    )
    t = s.agg(F.sum("sp").alias("tot"), F.count(F.lit(1)).alias("n"))
    bc = (
        s.crossJoin(F.broadcast(t))
        .filter(
            F.expr(
                "CAST(sp AS DECIMAL(38,0)) * n * 10"
                " > CAST(tot AS DECIMAL(38,0)) * 12"
            )
        )
        .select("o_custkey")
    )
    li_f = li.join(F.broadcast(fp), on="l_partkey", how="left_semi")
    o_f = o.join(bc, on="o_custkey", how="left_semi")
    return (
        li_f.join(o_f, li_f.l_orderkey == o_f.o_orderkey)
        .groupBy(_ym_col().alias("ym"))
        .agg(
            (F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "tpcds_q35_exists_profile",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100 / count(*) AS avg_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '5-LOW')
      AND NOT EXISTS (
        SELECT 1 FROM orders o JOIN lineitem l
            ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = c.c_custkey
          AND l.l_returnflag = 'R' AND l.l_quantity >= 48)
    GROUP BY 1
    """,
)
def q_tpcds_q35_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q35-shape: segment profile of customers who EXISTS-match
    one behavior (placed an urgent/high order) and NOT-EXISTS-match two
    others (never placed a 5-LOW order; never had a large returned item,
    qty >= 48 with returnflag 'R'). The oracle states the canonical
    correlated EXISTS / NOT EXISTS / NOT EXISTS; the Spark side
    decorrelates BOTH orders predicates into ONE custkey aggregate
    (conditional max flags — one orders scan, not two), the lineitem
    NOT EXISTS into a rare-event distinct-custkey set consumed by an
    anti-join, then hydrates the customer dim. All joins run on the
    custkey grain (co-partitionable at 100 TB; no broadcast of the
    O(customers) flag relation). avg_acctbal is one division of exact
    integer cents by an exact count."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    pr = F.col("o_orderpriority")
    fo = o.groupBy("o_custkey").agg(
        F.max(
            F.when(pr.isin("1-URGENT", "2-HIGH"), F.lit(1)).otherwise(0)
        ).alias("has_exp"),
        F.max(F.when(pr == "5-LOW", F.lit(1)).otherwise(0)).alias("has_low"),
    )
    bigret = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48))
        .join(
            o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey")
        .distinct()
    )
    surv = (
        fo.filter((F.col("has_exp") == 1) & (F.col("has_low") == 0))
        .join(bigret, on="o_custkey", how="left_anti")
        .select("o_custkey")
    )
    return (
        c.join(surv, c.c_custkey == surv.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
                .cast("double")
                / 100
                / F.count(F.lit(1))
            ).alias("avg_acctbal"),
        )
    )


_EXP_PR = "('1-URGENT', '2-HIGH')"
_ECO_PR = "('4-NOT SPECIFIED', '5-LOW')"


@register(
    "tpcds_q31_qoq_growth",
    oracle=f"""
    WITH e AS (
        SELECT n.n_name,
               year(o.o_orderdate) * 10 + quarter(o.o_orderdate) AS yq,
               sum({_REV4}) AS v4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderpriority IN {_EXP_PR}
        GROUP BY 1, 2
    ),
    s AS (
        SELECT n.n_name,
               year(o.o_orderdate) * 10 + quarter(o.o_orderdate) AS yq,
               sum({_REV4}) AS v4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderpriority IN {_ECO_PR}
        GROUP BY 1, 2
    )
    SELECT e2.n_name,
           CAST(e2.yq AS BIGINT) AS yq,
           CAST(e2.v4 AS DOUBLE) / e1.v4 AS express_growth,
           CAST(s2.v4 AS DOUBLE) / s1.v4 AS economy_growth
    FROM e e2
    JOIN e e1 ON e1.n_name = e2.n_name
             AND e1.yq = CASE WHEN e2.yq % 10 = 1
                              THEN e2.yq - 7 ELSE e2.yq - 1 END
    JOIN s s2 ON s2.n_name = e2.n_name AND s2.yq = e2.yq
    JOIN s s1 ON s1.n_name = e2.n_name AND s1.yq = e1.yq
    WHERE e2.v4::HUGEINT * s1.v4 > s2.v4::HUGEINT * e1.v4
    """,
)
def q_tpcds_q31_qoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q31-shape: (nation, quarter) cells where the EXPRESS
    channel's quarter-over-quarter revenue growth beats the ECONOMY
    channel's. The oracle states the canonical per-channel CTEs +
    four-way self-join; the Spark side aggregates ONE scan to the
    (nation, quarter) grain with conditional per-channel sums, then
    self-joins ONCE on (nation, previous quarter) — gap-correct like
    the Q47 YoY join (a lag window would mis-pair across missing
    quarters). The growth comparison is exact cross-multiplied
    integers in decimal(38,0) (e2·s1 > s2·e1 — revenue sums are
    strictly positive when present, so no zero guard is needed);
    the emitted ratios are the allowed final double divisions."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    pr = F.col("o_orderpriority")
    is_exp = pr.isin("1-URGENT", "2-HIGH")
    is_eco = pr.isin("4-NOT SPECIFIED", "5-LOW")
    yq = (
        F.year("o_orderdate") * 10 + F.quarter("o_orderdate")
    ).cast("long")
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name", yq.alias("yq"))
        .agg(
            F.sum(F.when(is_exp, _rev4_col())).alias("e4"),
            F.sum(F.when(is_eco, _rev4_col())).alias("s4"),
        )
    )
    cur, prv = g.alias("cur"), g.alias("prv")
    prev_yq = F.when(
        F.col("cur.yq") % 10 == 1, F.col("cur.yq") - 7
    ).otherwise(F.col("cur.yq") - 1)
    j = cur.join(
        prv,
        (F.col("cur.n_name") == F.col("prv.n_name"))
        & (F.col("prv.yq") == prev_yq),
    ).filter(
        F.col("cur.e4").isNotNull() & F.col("prv.e4").isNotNull()
        & F.col("cur.s4").isNotNull() & F.col("prv.s4").isNotNull()
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return j.filter(
        d("cur.e4") * d("prv.s4") > d("cur.s4") * d("prv.e4")
    ).select(
        F.col("cur.n_name").alias("n_name"),
        F.col("cur.yq").cast("long").alias("yq"),
        (F.col("cur.e4").cast("double") / F.col("prv.e4"))
        .alias("express_growth"),
        (F.col("cur.s4").cast("double") / F.col("prv.s4"))
        .alias("economy_growth"),
    )


@register(
    "tpcds_q93_net_sales",
    oracle=f"""
    WITH sal AS (
        SELECT l_orderkey, l_partkey, sum({_REV4}) AS s4
        FROM lineitem WHERE l_returnflag <> 'R'
        GROUP BY 1, 2
    ),
    ret AS (
        SELECT l_orderkey, l_partkey, sum({_REV4}) AS r4
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY 1, 2
    ),
    net AS (
        SELECT s.l_orderkey,
               greatest(CAST(0 AS HUGEINT),
                        s.s4::HUGEINT - coalesce(r.r4, 0)) AS n4
        FROM sal s LEFT JOIN ret r
          ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
    ),
    pc AS (
        SELECT o.o_custkey, sum(n.n4) AS net4
        FROM net n JOIN orders o ON n.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
           CAST(net4 AS DOUBLE) / 10000 AS net_revenue,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, rank() OVER (ORDER BY net4 DESC, o_custkey ASC)
                        AS rnk
          FROM pc)
    WHERE rnk <= 10
    """,
)
def q_tpcds_q93_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q93-shape: returns-adjusted net revenue per customer —
    sales lines netted against the matching return lines of the same
    (order, item), clamped at zero, then the top-10 customers. Both
    sides pre-aggregate to the (orderkey, partkey) grain BEFORE the
    fact-fact left join (the join moves aggregated grains, never raw
    lines); the customer rollup joins orders on the orderkey grain; the
    final rank runs on the per-customer relation with a rank<=10
    WindowGroupLimit. All netting in exact integers (decimal(38,0) /
    HUGEINT); ties pinned by custkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sal = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum(_rev4_col()).alias("s4"))
    )
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum(_rev4_col()).alias("r4"))
    )
    net = sal.join(ret, ["l_orderkey", "l_partkey"], "left").select(
        "l_orderkey",
        F.greatest(
            F.lit(0).cast("decimal(38,0)"),
            F.col("s4").cast("decimal(38,0)")
            - F.coalesce(F.col("r4"), F.lit(0)).cast("decimal(38,0)"),
        ).alias("n4"),
    )
    pc = (
        net.join(o.select("o_orderkey", "o_custkey"),
                 net.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("n4").alias("net4"))
    )
    w = Window.orderBy(F.col("net4").desc(), F.col("o_custkey").asc())
    return (
        pc.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("o_custkey").cast("long").alias("c_custkey"),
            (F.col("net4").cast("double") / 10000).alias("net_revenue"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Fourth wave: per-entity deviation-from-cohort filters (Q1/Q65) and the
# variance-threshold + consecutive-period self-join composition (Q39).
# ---------------------------------------------------------------------------


@register(
    "tpcds_q1_return_outliers",
    oracle=f"""
    WITH r AS (
        SELECT c.c_custkey, c.c_name, c.c_nationkey,
               sum({_REV4}) AS ret4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
    ),
    w AS (
        SELECT c_custkey, c_name, c_nationkey, ret4,
               sum(ret4) OVER (PARTITION BY c_nationkey) AS tot4,
               count(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM r
    )
    SELECT w.c_custkey, w.c_name, n.n_name,
           CAST(ret4 AS DOUBLE) / 10000 AS return_revenue,
           CAST(tot4 AS DOUBLE) / 10000 / n_cust AS nation_avg
    FROM w JOIN nation n ON w.c_nationkey = n.n_nationkey
    WHERE ret4::HUGEINT * n_cust * 10 > tot4::HUGEINT * 12
    """,
)
def q_tpcds_q1_return_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1-shape: customers whose returned revenue exceeds 1.2×
    the average return revenue of their nation's returning customers
    (real Q1 compares store_returns per customer to 1.2× the store's
    state average). The cohort window runs on the AGGREGATED per-customer
    grain (#returning-customers rows, never the fact table); the 1.2×
    threshold is the exact cross-multiplied integer test
    ret·n·10 > tot·12 in decimal(38,0); the nation dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey", "o_custkey"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_name", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(_rev4_col()).alias("ret4"))
    )
    w = Window.partitionBy("c_nationkey")
    d = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    out = (
        r.withColumn("tot4", F.sum("ret4").over(w))
        .withColumn("n_cust", F.count(F.lit(1)).over(w))
        .filter(d("ret4") * F.col("n_cust") * 10 > d("tot4") * 12)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return out.select(
        "c_custkey",
        "c_name",
        "n_name",
        (F.col("ret4").cast("double") / 10000).alias("return_revenue"),
        (
            F.col("tot4").cast("double") / 10000 / F.col("n_cust")
        ).alias("nation_avg"),
    )


@register(
    "tpcds_q65_low_velocity_parts",
    oracle=f"""
    WITH g AS (
        SELECT l_suppkey, l_partkey, sum({_REV4}) AS rev4
        FROM lineitem
        GROUP BY 1, 2
    ),
    w AS (
        SELECT l_suppkey, l_partkey, rev4,
               sum(rev4) OVER (PARTITION BY l_suppkey) AS tot4,
               count(*) OVER (PARTITION BY l_suppkey) AS n_parts
        FROM g
    )
    SELECT s.s_name, p.p_name,
           CAST(rev4 AS DOUBLE) / 10000 AS revenue,
           CAST(tot4 AS DOUBLE) / 10000 / n_parts AS supplier_avg
    FROM w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    JOIN part p ON w.l_partkey = p.p_partkey
    WHERE rev4::HUGEINT * n_parts * 10 <= tot4::HUGEINT
    """,
)
def q_tpcds_q65_low_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q65-shape: (supplier, part) pairs whose revenue is at most
    10% of that supplier's average per-part revenue (real Q65 finds
    store items selling at <=10% of the store's average). Cohort window
    on the AGGREGATED (supplier, part) grain; exact cross-multiplied
    threshold rev·n·10 <= tot in decimal(38,0); both dims broadcast
    AFTER the filter (survivors only)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    g = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_rev4_col()).alias("rev4"))
    )
    w = Window.partitionBy("l_suppkey")
    d = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    out = (
        g.withColumn("tot4", F.sum("rev4").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(d("rev4") * F.col("n_parts") * 10 <= d("tot4"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    return out.select(
        "s_name",
        "p_name",
        (F.col("rev4").cast("double") / 10000).alias("revenue"),
        (
            F.col("tot4").cast("double") / 10000 / F.col("n_parts")
        ).alias("supplier_avg"),
    )


@register(
    "tpcds_q39_volatile_parts",
    oracle="""
    WITH g AS (
        SELECT l_partkey,
               year(l_shipdate) * 12 + (month(l_shipdate) - 1) AS mth,
               count(*) AS n,
               sum(CAST(round(l_quantity) AS BIGINT)) AS s,
               sum(CAST(round(l_quantity) AS BIGINT)
                   * CAST(round(l_quantity) AS BIGINT)) AS q
        FROM lineitem
        GROUP BY 1, 2
    ),
    v AS (
        SELECT l_partkey, mth, n, s, q
        FROM g
        WHERE n >= 2
          AND n::HUGEINT * (n::HUGEINT * q - s::HUGEINT * s)
              > (n::HUGEINT - 1) * s::HUGEINT * s
    )
    SELECT a.l_partkey,
           CAST(a.mth // 12 AS BIGINT) * 100 + (a.mth % 12) + 1 AS ym1,
           CAST(b.mth // 12 AS BIGINT) * 100 + (b.mth % 12) + 1 AS ym2,
           sqrt(CAST(a.n AS DOUBLE)
                * CAST(a.n::HUGEINT * a.q - a.s::HUGEINT * a.s AS DOUBLE)
                / CAST(a.n - 1 AS DOUBLE)) / CAST(a.s AS DOUBLE) AS cov1,
           sqrt(CAST(b.n AS DOUBLE)
                * CAST(b.n::HUGEINT * b.q - b.s::HUGEINT * b.s AS DOUBLE)
                / CAST(b.n - 1 AS DOUBLE)) / CAST(b.s AS DOUBLE) AS cov2
    FROM v a
    JOIN v b ON a.l_partkey = b.l_partkey AND b.mth = a.mth + 1
    """,
)
def q_tpcds_q39_volatile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q39-shape: parts whose monthly order-quantity coefficient
    of variation exceeds 1 in TWO CONSECUTIVE months (real Q39 flags
    warehouse/item inventory cov > 1 in March and April). The variance
    grain is the AGGREGATED (part, month) relation; the cov > 1 flag is
    the exact integer test n·(n·Σx² − S²) > (n−1)·S² (cov² > 1 ⇔
    sample variance > mean², cross-multiplied — no sqrt enters the
    DECISION); consecutive months pair via a gap-correct linear month
    index self-join (a lag() would mis-pair across missing months).
    The emitted cov values are one fixed sqrt/division chain for
    humans, identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    mth = (F.year("l_shipdate") * 12 + (F.month("l_shipdate") - 1)).cast(
        "long"
    )
    g = (
        li.groupBy(F.col("l_partkey"), mth.alias("mth"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(qty).alias("s"),
            F.sum(qty * qty).alias("q"),
        )
    )
    d = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    var_num = d("n") * d("q") - d("s") * d("s")     # n·Σx² − S²  (≥ 0)
    v = g.filter(
        (F.col("n") >= 2)
        & (d("n") * var_num > (d("n") - 1) * d("s") * d("s"))
    ).withColumn("qd", var_num)
    a = v.select(
        F.col("l_partkey"),
        F.col("mth"),
        F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("qd").alias("qd1"),
    )
    b = v.select(
        F.col("l_partkey"),
        (F.col("mth") - 1).alias("mth"),
        F.col("n").alias("n2"), F.col("s").alias("s2"),
        F.col("qd").alias("qd2"),
    )
    pair = a.join(b, ["l_partkey", "mth"])

    def _cov(n, s, qd):
        return (
            F.sqrt(
                (F.col(n).cast("double") * F.col(qd).cast("double"))
                / (F.col(n) - 1).cast("double")
            )
            / F.col(s).cast("double")
        )

    ym = lambda m: (  # noqa: E731
        F.expr(f"CAST({m} DIV 12 AS BIGINT)") * 100
        + F.expr(f"{m} % 12") + 1
    ).cast("long")
    return pair.select(
        "l_partkey",
        ym("mth").alias("ym1"),
        ym("(mth + 1)").alias("ym2"),
        _cov("n1", "s1", "qd1").alias("cov1"),
        _cov("n2", "s2", "qd2").alias("cov2"),
    )


# ---------------------------------------------------------------------------
# Fifth wave: cross-channel growth comparison (Q11/Q74) and the customer
# spend-band histogram (Q54) — both stated canonically in the oracle,
# both run as ONE conditional-aggregation scan on the Spark side.
# ---------------------------------------------------------------------------


@register(
    "tpcds_q11_growth_accounts",
    oracle=f"""
    WITH f AS (
        SELECT c.c_nationkey AS nk,
               CASE WHEN year(o.o_orderdate) <= 1997 THEN 1 ELSE 2 END
                   AS per,
               {_CHANNEL_SQL} AS channel,
               sum({_REV4}) AS s4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ),
    e1 AS (SELECT nk, s4 FROM f WHERE per = 1 AND channel = 'express'),
    e2 AS (SELECT nk, s4 FROM f WHERE per = 2 AND channel = 'express'),
    y1 AS (SELECT nk, s4 FROM f WHERE per = 1 AND channel = 'economy'),
    y2 AS (SELECT nk, s4 FROM f WHERE per = 2 AND channel = 'economy'),
    j AS (
        SELECT e1.nk, e1.s4 AS e1s, e2.s4 AS e2s,
               y1.s4 AS y1s, y2.s4 AS y2s
        FROM e1
        JOIN e2 USING (nk)
        JOIN y1 USING (nk)
        JOIN y2 USING (nk)
    )
    SELECT n.n_name,
           CAST(e1s AS DOUBLE) / 10000 AS express_p1,
           CAST(e2s AS DOUBLE) / 10000 AS express_p2,
           CAST(y1s AS DOUBLE) / 10000 AS economy_p1,
           CAST(y2s AS DOUBLE) / 10000 AS economy_p2,
           CAST(e2s AS DOUBLE) / CAST(e1s AS DOUBLE) AS express_growth,
           CAST(y2s AS DOUBLE) / CAST(y1s AS DOUBLE) AS economy_growth
    FROM j JOIN nation n ON j.nk = n.n_nationkey
    WHERE e1s > 0 AND y1s > 0
      AND e2s::HUGEINT * y1s > y2s::HUGEINT * e1s
    """,
)
def q_tpcds_q11_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q11/Q74-shape: accounts (nations) whose EXPRESS-channel
    revenue grew faster between two periods than their ECONOMY-channel
    revenue (real Q11 compares each customer's web vs store growth
    across two years). The oracle states the canonical four-CTE join;
    Spark runs ONE conditional-sum scan to the account grain (period ×
    channel folded into four conditional aggregates — no self-join, no
    re-scan), and the growth comparison is the exact cross-multiplied
    integer test e2·y1 > y2·e1 in decimal(38,0) — a float ratio compare
    could disagree across engines at equality boundaries. The customer
    and nation dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per1 = F.year("o_orderdate") <= 1997
    express = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    economy = ~F.col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM"
    )
    rev = _rev4_col()
    g = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.when(per1 & express, rev)).alias("e1s"),
            F.sum(F.when(~per1 & express, rev)).alias("e2s"),
            F.sum(F.when(per1 & economy, rev)).alias("y1s"),
            F.sum(F.when(~per1 & economy, rev)).alias("y2s"),
        )
    )
    d = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    out = (
        g.filter(
            F.col("e1s").isNotNull() & F.col("e2s").isNotNull()
            & F.col("y1s").isNotNull() & F.col("y2s").isNotNull()
            & (F.col("e1s") > 0) & (F.col("y1s") > 0)
            & (d("e2s") * d("y1s") > d("y2s") * d("e1s"))
        )
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("nk") == F.col("n_nationkey"))
    )
    dbl = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return out.select(
        "n_name",
        (dbl("e1s") / 10000).alias("express_p1"),
        (dbl("e2s") / 10000).alias("express_p2"),
        (dbl("y1s") / 10000).alias("economy_p1"),
        (dbl("y2s") / 10000).alias("economy_p2"),
        (dbl("e2s") / dbl("e1s")).alias("express_growth"),
        (dbl("y2s") / dbl("y1s")).alias("economy_growth"),
    )


_Q54_BAND4 = 2_500_000_000  # $250,000 in 1e-4-dollar units


@register(
    "tpcds_q54_spend_bands",
    oracle=f"""
    WITH cr AS (
        SELECT o.o_custkey, sum({_REV4}) AS spend4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT CAST(spend4 // {_Q54_BAND4} AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(spend4::HUGEINT) AS DOUBLE) / 10000 AS band_revenue
    FROM cr
    GROUP BY 1
    """,
)
def q_tpcds_q54_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q54-shape: the customer spend-band histogram — total
    lifetime revenue per customer, bucketed into $250k bands, customers
    counted per band (real Q54 uses $50 bands on one quarter's
    revenue). Two-level aggregation: fact → customer grain (map-side
    combinable), then the #customers-row grain → #bands; the band index
    is integer DIV on exact 1e-4-dollar units (a double floor would
    misround past 2^53 — the lttb slot lesson)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cr = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev4_col()).alias("spend4"))
    )
    return (
        cr.groupBy(
            F.expr(f"CAST(spend4 DIV {_Q54_BAND4} AS BIGINT)").alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (
                F.sum(F.col("spend4").cast("decimal(38,0)")).cast("double")
                / 10000
            ).alias("band_revenue"),
        )
    )


@register(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH rem AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'O'
    ),
    loc AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus <> 'O'
    )
    SELECT CAST(sum(CASE WHEN rem.c IS NOT NULL AND loc.c IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS remote_only,
           CAST(sum(CASE WHEN rem.c IS NULL AND loc.c IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS local_only,
           CAST(sum(CASE WHEN rem.c IS NOT NULL AND loc.c IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM rem FULL OUTER JOIN loc ON rem.c = loc.c AND rem.p = loc.p
    """,
)
def q_tpcds_q97_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q97-shape: the channel-overlap matrix — how many
    (customer, item) pairs bought remote-only / local-only / via both
    channels (remote = open linestatus — the derived channel dim, as in
    the other tri-fact collapses here). The oracle states the
    canonical form: two per-channel DISTINCT fact CTEs reconciled with a
    FULL OUTER JOIN. The Spark side is the single-scan rewrite: ONE
    lineitem scan aggregated straight to the (customer, item) grain
    with per-channel presence flags (max of a channel indicator — a
    map-side-combinable agg), then one conditional sum; the full-outer
    join disappears entirely because both CTEs derive from the same
    fact. The orders join runs BEFORE the grain collapse (orderkey →
    custkey is a fact-to-fact equi-join on the join key both tables
    are naturally clustered by)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    remote = F.col("l_linestatus") == "O"
    grain = (
        li.select("l_orderkey", "l_partkey", remote.alias("rem"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.max(F.col("rem").cast("int")).alias("has_rem"),
            F.max((~F.col("rem")).cast("int")).alias("has_loc"),
        )
    )
    return grain.agg(
        F.sum(((F.col("has_rem") == 1) & (F.col("has_loc") == 0)).cast("int"))
        .cast("long").alias("remote_only"),
        F.sum(((F.col("has_rem") == 0) & (F.col("has_loc") == 1)).cast("int"))
        .cast("long").alias("local_only"),
        F.sum(((F.col("has_rem") == 1) & (F.col("has_loc") == 1)).cast("int"))
        .cast("long").alias("both_channels"),
    )


def _q59_wss() -> str:
    """Per-(channel, week) day-of-week revenue pivot — integer day
    arithmetic only: week = epoch-days DIV 7, dow = (days + 4) % 7
    (1970-01-01 was a Thursday), so both engines bucket identically
    with no dayofweek()-convention dependence."""
    dows = ", ".join(
        f"sum(CASE WHEN dow = {i} THEN rev4 ELSE 0 END) AS s{i}"
        for i in range(7)
    )
    return f"""
    SELECT channel, wk, {dows}
    FROM (
        SELECT {_CHANNEL_SQL} AS channel,
               CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 // 7 AS wk,
               (CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 + 4) % 7 AS dow,
               lr.rev4
        FROM orders o JOIN (
            SELECT l_orderkey, sum({_REV4}) AS rev4
            FROM lineitem GROUP BY l_orderkey
        ) lr ON o.o_orderkey = lr.l_orderkey
        WHERE o.o_orderdate IS NOT NULL
    ) GROUP BY channel, wk
    """


@register(
    "tpcds_q59_weekly_yoy",
    oracle=f"""
    WITH wss AS ({_q59_wss()})
    SELECT a.channel, CAST(a.wk AS BIGINT) AS week1,
           {", ".join(
               f"CASE WHEN b.s{i} > 0 THEN CAST(a.s{i} AS DOUBLE)"
               f" / CAST(b.s{i} AS DOUBLE) END AS r{i}"
               for i in range(7)
           )}
    FROM wss a JOIN wss b
      ON a.channel = b.channel AND a.wk + 52 = b.wk
    """,
)
def q_tpcds_q59_weekly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59-shape: per-channel weekly day-of-week revenue compared
    against the same week one year (52 weeks) later — the gap-correct
    self-join idiom (a calendar lag() would mis-pair across absent
    weeks). Lineitem pre-aggregates to the orderkey grain BEFORE the
    fact join; the dow pivot is one conditional-sum hash-agg; revenue
    sums in decimal(38,0) (DuckDB HUGEINT twin) and the only float
    surface is the final per-dow double ratio of exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lr = li.groupBy("l_orderkey").agg(
        F.sum(_rev4_col().cast("decimal(38,0)")).alias("rev4")
    )
    days = F.expr("unix_timestamp(o_orderdate) DIV 86400")
    base = (
        o.filter(F.col("o_orderdate").isNotNull())
        .join(lr, o["o_orderkey"] == lr["l_orderkey"])
        .select(
            F.expr(_CHANNEL_SQL).alias("channel"),
            (days / 7).cast("long").alias("wk"),
            ((days + 4) % 7).cast("int").alias("dow"),
            "rev4",
        )
    )
    wss = base.groupBy("channel", "wk").agg(
        *[
            F.sum(
                F.when(F.col("dow") == i, F.col("rev4")).otherwise(F.lit(0))
            ).alias(f"s{i}")
            for i in range(7)
        ]
    )
    # the self-join consumes wss twice; without materialization each side
    # re-runs the full fact join (4 scans measured). wss is tiny
    # (channels x weeks) -> eager localCheckpoint, the small-relation
    # pattern.
    wss = wss.localCheckpoint(eager=True)
    a, b = wss.alias("a"), wss.alias("b")
    ratios = [
        F.when(
            F.col(f"b.s{i}") > 0,
            F.col(f"a.s{i}").cast("double") / F.col(f"b.s{i}").cast("double"),
        ).alias(f"r{i}")
        for i in range(7)
    ]
    return (
        a.join(
            b,
            (F.col("a.channel") == F.col("b.channel"))
            & (F.col("a.wk") + 52 == F.col("b.wk")),
        )
        .select(
            F.col("a.channel").alias("channel"),
            F.col("a.wk").cast("long").alias("week1"),
            *ratios,
        )
    )


@register(
    "tpcds_q49_return_ratios",
    oracle=f"""
    WITH f AS (
        SELECT {_CHANNEL_SQL} AS channel, l.l_partkey AS pk,
               sum(CASE WHEN l.l_returnflag = 'R'
                   THEN CAST(round(l.l_quantity) AS BIGINT) ELSE 0 END) AS rqty,
               sum(CAST(round(l.l_quantity) AS BIGINT)) AS tqty,
               sum(CASE WHEN l.l_returnflag = 'R' THEN {_REV4} ELSE 0 END) AS ramt,
               sum({_REV4}) AS tamt
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
    r AS (
        SELECT channel, pk,
               CAST(rqty AS DOUBLE) / CAST(tqty AS DOUBLE) AS qty_ratio,
               CAST(ramt AS DOUBLE) / CAST(tamt AS DOUBLE) AS amt_ratio
        FROM f WHERE tqty > 0 AND tamt > 0),
    rk AS (
        SELECT channel, pk, qty_ratio, amt_ratio,
               row_number() OVER (PARTITION BY channel
                                  ORDER BY qty_ratio DESC, pk) AS qty_rnk,
               row_number() OVER (PARTITION BY channel
                                  ORDER BY amt_ratio DESC, pk) AS amt_rnk
        FROM r)
    SELECT channel, CAST(pk AS BIGINT) AS l_partkey, qty_ratio, amt_ratio,
           CAST(qty_rnk AS BIGINT) AS qty_rnk,
           CAST(amt_rnk AS BIGINT) AS amt_rnk
    FROM rk WHERE qty_rnk <= 10 OR amt_rnk <= 10
    """,
)
def q_tpcds_q49_return_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q49-shape: per channel, the 10 worst parts by return-QTY
    ratio and by return-AMOUNT ratio (union via rank<=10 OR rank<=10) —
    the dual-ranking excess-returns report. One (channel, part)
    conditional-sum hash-agg feeds both ranking windows; ratios are
    single double divisions of exact integer sums (engine-identical),
    ties -> lowest partkey. Channel joins the order fact once."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_CHANNEL_SQL).alias("channel")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    isret = F.col("l_returnflag") == "R"
    f = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("channel", "l_partkey")
        .agg(
            F.sum(F.when(isret, qty).otherwise(F.lit(0))).alias("rqty"),
            F.sum(qty).alias("tqty"),
            F.sum(
                F.when(isret, _rev4_col()).otherwise(F.lit(0)).cast(
                    "decimal(38,0)"
                )
            ).alias("ramt"),
            F.sum(_rev4_col().cast("decimal(38,0)")).alias("tamt"),
        )
        .filter((F.col("tqty") > 0) & (F.col("tamt") > 0))
        .select(
            "channel",
            "l_partkey",
            (F.col("rqty").cast("double") / F.col("tqty").cast("double"))
            .alias("qty_ratio"),
            (F.col("ramt").cast("double") / F.col("tamt").cast("double"))
            .alias("amt_ratio"),
        )
    )
    wq = Window.partitionBy("channel").orderBy(
        F.desc("qty_ratio"), F.asc("l_partkey")
    )
    wa = Window.partitionBy("channel").orderBy(
        F.desc("amt_ratio"), F.asc("l_partkey")
    )
    return (
        f.withColumn("qty_rnk", F.row_number().over(wq).cast("long"))
        .withColumn("amt_rnk", F.row_number().over(wa).cast("long"))
        .filter((F.col("qty_rnk") <= 10) | (F.col("amt_rnk") <= 10))
        .select(
            "channel", "l_partkey", "qty_ratio", "amt_ratio",
            "qty_rnk", "amt_rnk",
        )
    )


@register(
    "tpcds_q90_ampm_ratio",
    # Hour from integer epoch arithmetic ((t DIV 3600000) % 24, UTC) —
    # never the session-tz hour() function. Ratio in exact ppm with a
    # zero-guard (ANSI DIV 0 throws).
    oracle="""
    WITH ev AS (SELECT event_type,
                       (epoch_ms(ts) // 3600000) % 24 AS hr
                FROM events WHERE ts IS NOT NULL),
    c AS (SELECT event_type,
                 count(CASE WHEN hr >= 8 AND hr < 10 THEN 1 END) AS am_ct,
                 count(CASE WHEN hr >= 19 AND hr < 21 THEN 1 END) AS pm_ct
          FROM ev GROUP BY event_type)
    SELECT event_type,
           CAST(am_ct AS BIGINT) AS am_ct,
           CAST(pm_ct AS BIGINT) AS pm_ct,
           CAST(CASE WHEN pm_ct > 0 THEN am_ct * 1000000 // pm_ct END
                AS BIGINT) AS ampm_ratio_ppm
    FROM c
    """,
)
def q_tpcds_q90_ampm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q90-shape: morning/evening activity ratio per type — the
    real Q90 runs two self-joined subqueries for the am and pm counts;
    the scale-correct plan is ONE conditional-count scan (the q88
    collapse) with the ratio in exact integer ppm. Hour comes from
    integer epoch arithmetic, immune to the session timezone."""
    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    hr = F.expr("ts DIV 3600000 % 24")
    c = ev.groupBy("event_type").agg(
        F.count(F.when((hr >= 8) & (hr < 10), F.lit(1)))
        .cast("long")
        .alias("am_ct"),
        F.count(F.when((hr >= 19) & (hr < 21), F.lit(1)))
        .cast("long")
        .alias("pm_ct"),
    )
    return c.withColumn(
        "ampm_ratio_ppm",
        F.when(
            F.col("pm_ct") > 0, F.expr("am_ct * 1000000 DIV pm_ct")
        ).cast("long"),
    )


_Q62_BANDS = ((0, 31), (31, 61), (61, 91), (91, 121), (121, 100000))


@register(
    "tpcds_q62_ship_latency",
    oracle="""
    WITH j AS (SELECT l.l_returnflag || l.l_linestatus AS ship_mode,
                      o.o_orderpriority,
                      (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate))
                          // 86400000 AS d
               FROM lineitem l JOIN orders o
                 ON o.o_orderkey = l.l_orderkey
               WHERE l.l_shipdate IS NOT NULL
                 AND o.o_orderdate IS NOT NULL)
    SELECT ship_mode, o_orderpriority,
    """ + ",\n           ".join(
        f"CAST(count(CASE WHEN d >= {lo} AND d < {hi} THEN 1 END)"
        f" AS BIGINT) AS days_{lo}_{hi}"
        for lo, hi in _Q62_BANDS
    ) + """
    FROM j GROUP BY ship_mode, o_orderpriority
    """,
)
def q_tpcds_q62_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q62-shape: days-to-ship latency distribution per derived
    ship mode (returnflag||linestatus — the synthetic tables carry no
    l_shipmode) and order priority: one fact-fact equi-join on the
    order key + one conditional-count aggregation — the real Q62's
    five CASE bands in a single pass, never five scans."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    j = li.join(o, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat("l_returnflag", "l_linestatus").alias("ship_mode"),
        "o_orderpriority",
        (
            (
                F.unix_millis(F.col("l_shipdate").cast("timestamp"))
                - F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            )
            / F.lit(86400000)
        ).cast("long").alias("__d"),
    )
    return j.groupBy("ship_mode", "o_orderpriority").agg(
        *[
            F.count(
                F.when((F.col("__d") >= lo) & (F.col("__d") < hi), F.lit(1))
            )
            .cast("long")
            .alias(f"days_{lo}_{hi}")
            for lo, hi in _Q62_BANDS
        ]
    )


@register(
    "tpcds_q88_hour_bands",
    # TPC-DS Q88 shape: the real query is EIGHT self-joined scalar
    # subqueries (one per half-hour band); the scale-correct plan is ONE
    # conditional-count scan emitting all eight bands — the same
    # collapse as Q90, at the full Q88 width. Hour from integer epoch
    # arithmetic (session-tz immune); one output row.
    oracle="""
    WITH ev AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hr, value
                FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
    SELECT
        CAST(count(CASE WHEN hr =  8 THEN 1 END) AS BIGINT) AS h8,
        CAST(count(CASE WHEN hr =  9 THEN 1 END) AS BIGINT) AS h9,
        CAST(count(CASE WHEN hr = 10 THEN 1 END) AS BIGINT) AS h10,
        CAST(count(CASE WHEN hr = 11 THEN 1 END) AS BIGINT) AS h11,
        CAST(count(CASE WHEN hr = 12 THEN 1 END) AS BIGINT) AS h12,
        CAST(count(CASE WHEN hr = 13 THEN 1 END) AS BIGINT) AS h13,
        CAST(count(CASE WHEN hr = 14 THEN 1 END) AS BIGINT) AS h14,
        CAST(count(CASE WHEN hr = 15 THEN 1 END) AS BIGINT) AS h15
    FROM ev
    """,
)
def q_tpcds_q88_hour_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88-shape: eight time-band counts in ONE scan (the real
    Q88 runs eight self-joined scalar subqueries over store_sales —
    8 scans). One conditional-count hash-agg; a single output row; all
    BIGINT. The one-scan property is plan-gated in the round-16 tests."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    hr = F.expr("ts DIV 3600000 % 24")
    return ev.agg(
        *[
            F.count(F.when(hr == h, F.lit(1))).cast("long").alias(f"h{h}")
            for h in range(8, 16)
        ]
    )


@register(
    "tpcds_q44_best_worst",
    oracle=f"""
    WITH pp AS (
        SELECT l_partkey, sum({_REV4}) AS s4
        FROM lineitem WHERE l_returnflag <> 'R'
        GROUP BY 1
    ),
    best AS (
        SELECT * FROM (
            SELECT l_partkey, s4,
                   row_number() OVER (ORDER BY s4 DESC, l_partkey ASC)
                       AS rnk
            FROM pp) WHERE rnk <= 10
    ),
    worst AS (
        SELECT * FROM (
            SELECT l_partkey, s4,
                   row_number() OVER (ORDER BY s4 ASC, l_partkey ASC)
                       AS rnk
            FROM pp) WHERE rnk <= 10
    )
    SELECT CAST(b.rnk AS BIGINT) AS rnk,
           CAST(b.l_partkey AS BIGINT) AS best_partkey,
           CAST(b.s4 AS DOUBLE) / 10000 AS best_revenue,
           CAST(w.l_partkey AS BIGINT) AS worst_partkey,
           CAST(w.s4 AS DOUBLE) / 10000 AS worst_revenue
    FROM best b JOIN worst w ON b.rnk = w.rnk
    """,
)
def q_tpcds_q44_best_worst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q44-shape: the best-10 and worst-10 performers PAIRED by
    rank — canonical Q44 ranks items by avg net profit ascending and
    descending and joins the two rankings (here: net revenue per part,
    exact integer 1e-4 units; ties pinned by partkey). The plan idiom is
    new to the registry: the canonical form's two global-sort rank
    windows over the parts relation are rewritten as two
    ``TakeOrderedAndProject`` top-k's (per-partition heap + driver-side
    merge of k rows — no global Sort, no full-relation SinglePartition
    window even at 10⁹ parts); only the two 10-row results see a window
    (to number ranks) and a broadcast join (to pair them)."""
    li = _t(spark, sf_dir, "lineitem")
    pp = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy("l_partkey")
        .agg(F.sum(_rev4_col()).alias("s4"))
    )

    def topk(order, id_alias, rev_alias):
        w = Window.orderBy(*order)
        return (
            pp.orderBy(*order)
            .limit(10)
            .select(
                F.row_number().over(w).cast("long").alias("rnk"),
                F.col("l_partkey").alias(id_alias),
                (F.col("s4").cast("double") / F.lit(10000.0)).alias(
                    rev_alias
                ),
            )
        )

    best = topk(
        [F.desc("s4"), F.asc("l_partkey")], "best_partkey", "best_revenue"
    )
    worst = topk(
        [F.asc("s4"), F.asc("l_partkey")], "worst_partkey", "worst_revenue"
    )
    return best.join(worst, "rnk").select(
        "rnk", "best_partkey", "best_revenue",
        "worst_partkey", "worst_revenue",
    )


@register(
    "tpcds_q64_repeat_purchases",
    oracle=f"""
    WITH j AS (
        SELECT o.o_custkey AS c, year(o.o_orderdate) AS y,
               l.l_returnflag AS rf, {_REV4} AS r4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    s AS (SELECT c, y, sum(r4) AS s4, count(*) AS n FROM j
          WHERE rf <> 'R' GROUP BY 1, 2),
    r AS (SELECT c, y, sum(r4) AS s4, count(*) AS n FROM j
          WHERE rf = 'R' GROUP BY 1, 2)
    SELECT CAST(s1.c AS BIGINT) AS custkey,
           CAST(s1.y AS BIGINT) AS year1,
           CAST(s1.s4 AS DOUBLE) / 10000 AS y1_sales,
           CAST(r.s4 AS DOUBLE) / 10000 AS y1_returned,
           CAST(r.n AS BIGINT) AS n_returns,
           CAST(s2.s4 AS DOUBLE) / 10000 AS y2_sales
    FROM s s1
    JOIN r  ON s1.c = r.c AND s1.y = r.y
    JOIN s s2 ON s1.c = s2.c AND s2.y = s1.y + 1
    """,
)
def q_tpcds_q64_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64-shape — the registry's first FACT-FACT-FACT plan
    (VERDICT r13 #6a): customers who bought AND returned in year Y and
    still bought in year Y+1, with the money of all three fact slices
    (canonical Q64 chains store_sales ⋈ store_returns ⋈ a second-year
    sales instance through the item/customer dimension chain; here the
    two fact slices are the lineitem return-flag split and the
    dimension chain is orders = customer + year).

    The plan idiom under gate (test_plan_quality): the canonical
    three-fact-instance join is rewritten as ONE conditional
    aggregation pass over the fact-dimension join — sales and returns
    become `sum(CASE)` columns at the (customer, year) grain — followed
    by a single self-join of the AGGREGATED relation on (c, y+1). No
    fact-fact join ever happens at row grain: the only joins touching
    raw lineitem rows are fact-dimension (orderkey), and the (c, y)
    self-join sees two already-aggregated inputs — the shape that holds
    at 10⁹ customers where the canonical form's row-grain fact-fact
    join would shuffle the fact three times."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        o["o_custkey"].alias("c"),
        F.year(o["o_orderdate"]).alias("y"),
        li["l_returnflag"].alias("rf"),
        _rev4_col().alias("r4"),
    )
    isr = F.col("rf") == "R"
    a = j.groupBy("c", "y").agg(
        F.sum(F.when(~isr, F.col("r4"))).alias("s4_sales"),
        F.count(F.when(~isr, F.lit(1))).alias("n_sales"),
        F.sum(F.when(isr, F.col("r4"))).alias("s4_ret"),
        F.count(F.when(isr, F.lit(1))).alias("n_ret"),
    )
    y1 = a.filter((F.col("n_sales") > 0) & (F.col("n_ret") > 0)).select(
        "c", "y", "s4_sales", "s4_ret", "n_ret"
    )
    y2 = a.filter(F.col("n_sales") > 0).select(
        F.col("c").alias("c2"),
        (F.col("y") - 1).alias("y1m"),
        F.col("s4_sales").alias("s4_next"),
    )
    return y1.join(
        y2, (F.col("c") == F.col("c2")) & (F.col("y") == F.col("y1m"))
    ).select(
        F.col("c").cast("long").alias("custkey"),
        F.col("y").cast("long").alias("year1"),
        (F.col("s4_sales").cast("double") / 10000).alias("y1_sales"),
        (F.col("s4_ret").cast("double") / 10000).alias("y1_returned"),
        F.col("n_ret").cast("long").alias("n_returns"),
        (F.col("s4_next").cast("double") / 10000).alias("y2_sales"),
    )


@register(
    "tpcds_q95_two_supplier",
    oracle="""
    WITH multi AS (
        SELECT DISTINCT l1.l_orderkey AS okey
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_suppkey <> l2.l_suppkey
    )
    SELECT CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_price
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND o.o_orderkey IN (SELECT okey FROM multi)
      AND o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          WHERE l_returnflag = 'R'
            AND l_orderkey IN (SELECT okey FROM multi))
    """,
)
def q_tpcds_q95_two_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q95-shape (VERDICT r14 #7b): orders in a two-year window
    whose lineitems ship from MORE THAN ONE supplier and that have at
    least one returned lineitem also from a multi-supplier order — the
    registry's first MULTI-CONSUMER CTE. The oracle states the
    canonical shape (a fact self-join CTE referenced twice, Q95's
    ``ws_wh``); the Spark side is the scale rewrite: the CTE is ONE
    aggregation of (orderkey, suppkey) with a count-distinct HAVING —
    never a fact self-join — and its subtree feeds BOTH semi-joins
    unchanged, so Catalyst's exchange reuse materializes the shared
    shuffle ONCE (a ReusedExchange under the second consumer — the plan
    gate pins it). At 100 TB the CTE relation is order-grain (~1 row
    per multi-supplier order), both consumers semi-join on the same
    key, and the fact table is scanned twice with pushed filters
    instead of three times self-joined."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    returned_multi = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .join(multi, "l_orderkey", "leftsemi")
    )
    ord_f = (
        od.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            multi.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey", "leftsemi",
        )
        .join(
            returned_multi.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey", "leftsemi",
        )
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return ord_f.agg(
        F.count_distinct("o_orderkey").cast("long").alias("n_orders"),
        (F.sum(cents).cast("double") / 100).alias("total_price"),
    )
