"""Behavioral analytics: funnel, retention, latest state, snapshot diff,
SCD2 history, CDC merge.

Split from the single-module registry (round 7); the query/oracle
registration surface (contract.QUERIES / contract.ORACLES) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.config import FuserConfig, SourceConfig
from timeseriesfuser_spark.intervals import (
    boundary_label_col,
    floor_boundary_col,
    interval_to_ms,
)
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.ops import dedup as D
from timeseriesfuser_spark.ops import packing as P
from timeseriesfuser_spark.ops import sampling as SA
from timeseriesfuser_spark.ops import similarity as S
from timeseriesfuser_spark.ops import text as X
from timeseriesfuser_spark.ops import timeseries as TS
from timeseriesfuser_spark.timeutils import coerce_to_epoch_ms, ts_epoch_ms_col

from timeseriesfuser_spark.contract._base import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
    _t,
    _events,
    _sql_hash64,
    _TOKS,
    _SHINGLES,
    _shingle_rel,
    _SHINGLE_REL,
    _H1,
    _ff,
    _fdiv,
    _NH,
    _NB,
    _MT,
    _minhash_sql,
    _H1GAP,
    _DIFF_MID,
)



# --------------------------------------------------------------------------- #
# Behavioral / product analytics (ops.behavior)
# --------------------------------------------------------------------------- #

_FUNNEL = ("signup", "view", "purchase")


@register(
    "funnel_conversion",
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events),
    s0 AS (SELECT u, min(t) AS t0 FROM ev WHERE ty = 'signup' GROUP BY u),
    s1 AS (SELECT e.u, min(e.t) AS t1 FROM ev e JOIN s0 ON e.u = s0.u
           WHERE e.ty = 'view' AND e.t > s0.t0 GROUP BY e.u),
    s2 AS (SELECT e.u, min(e.t) AS t2 FROM ev e JOIN s1 ON e.u = s1.u
           WHERE e.ty = 'purchase' AND e.t > s1.t1 GROUP BY e.u),
    c AS (SELECT (SELECT count(*) FROM s0) AS c0,
                 (SELECT count(*) FROM s1) AS c1,
                 (SELECT count(*) FROM s2) AS c2)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step,
           CAST(c0 AS BIGINT) AS n_users,
           CAST(c0 * 1000000 // c0 AS BIGINT) AS conv_ppm FROM c
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'view', CAST(c1 AS BIGINT),
           CAST(c1 * 1000000 // c0 AS BIGINT) FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase', CAST(c2 AS BIGINT),
           CAST(c2 * 1000000 // c0 AS BIGINT) FROM c
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence funnel (ops.behavior.funnel_counts): signup → view
    (after) → purchase (after) — one conditional-min agg + equi-join per
    step over a shrinking users relation; never a per-user sort-and-walk
    UDF. conv_ppm is exact-integer."""
    from timeseriesfuser_spark.ops.behavior import funnel_counts

    return funnel_counts(_events(spark, sf_dir), _FUNNEL)


_RET_P = 7 * 86_400_000


@register(
    "retention_7d",
    oracle=f"""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t FROM events),
    anchors AS (SELECT u, {_fdiv('min(t)', _RET_P)} AS cp FROM ev GROUP BY u),
    sizes AS (SELECT cp, count(*) AS csize FROM anchors GROUP BY cp),
    cells AS (SELECT DISTINCT e.u, {_fdiv('e.t', _RET_P)} - a.cp AS off, a.cp
              FROM ev e JOIN anchors a ON e.u = a.u),
    m AS (SELECT cp, off, count(*) AS n_active FROM cells GROUP BY cp, off)
    SELECT CAST(m.cp * {_RET_P} AS BIGINT) AS cohort_ts,
           CAST(m.off AS BIGINT) AS period_offset,
           CAST(m.n_active AS BIGINT) AS n_active,
           CAST(s.csize AS BIGINT) AS cohort_size,
           CAST(m.n_active * 1000000 // s.csize AS BIGINT) AS retention_ppm
    FROM m JOIN sizes s ON m.cp = s.cp
    """,
)
def q_retention_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (ops.behavior.retention_cohorts):
    users anchored to their first-event week; per (cohort, offset) cell the
    active-user count and exact-ppm retention. Two hash-aggs + one
    user-key equi-join."""
    from timeseriesfuser_spark.ops.behavior import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir), period_ms=_RET_P)


@register(
    "latest_user_state",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id, event_type,
                       value, props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_ms(ts) DESC,
                                                   event_id DESC) AS rn
                FROM events)
    SELECT user_id, ts, event_id, event_type, value, props
    FROM ev WHERE rn = 1
    """,
)
def q_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record compaction (ops.behavior.latest_snapshot): the CDC
    'current view' — whole last row per user via ONE max_by hash-agg on a
    (ts, event_id) struct key; the oracle states the same with
    row_number because DuckDB's arg_max takes no composite key."""
    from timeseriesfuser_spark.ops.behavior import latest_snapshot

    return latest_snapshot(_events(spark, sf_dir))


@register(
    "snapshot_diff",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS t, event_id, value FROM events),
    old_snap AS (SELECT user_id, value AS old_value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev WHERE t < {_DIFF_MID}) WHERE rn = 1),
    new_snap AS (SELECT user_id, value AS new_value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev) WHERE rn = 1)
    SELECT coalesce(o.user_id, n.user_id) AS user_id, old_value, new_value,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                WHEN old_value IS NOT DISTINCT FROM new_value THEN 'unchanged'
                ELSE 'changed' END AS change
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (ops.behavior.snapshot_diff): the latest
    per-user value as of mid-corpus vs end-of-corpus, full-outer joined on
    the key with added/removed/changed/unchanged labels — the audit
    primitive for incremental pipelines."""
    from timeseriesfuser_spark.ops.behavior import latest_snapshot, snapshot_diff

    ev = _events(spark, sf_dir)
    old = latest_snapshot(ev.filter(F.col("ts") < _DIFF_MID))
    new = latest_snapshot(ev)
    return snapshot_diff(old, new, key_cols=("user_id",), compare_col="value")


# --------------------------------------------------------------------------- #
# Round-6 additions: SCD2 history, semi/anti joins, entity resolution,
# Z-order layout, leakage-safe splits
# --------------------------------------------------------------------------- #


@register(
    "scd2_user_history",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS t, event_id, value FROM events),
    o AS (SELECT user_id, t, event_id, value,
                 lag(value) OVER w AS pv, row_number() OVER w AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    ch AS (SELECT * FROM o WHERE rn = 1 OR value IS DISTINCT FROM pv)
    SELECT user_id, value,
           CAST(t AS BIGINT) AS valid_from,
           CAST(lead(t) OVER w2 AS BIGINT) AS valid_to,
           (lead(t) OVER w2) IS NULL AS is_current
    FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)
    """,
)
def q_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build (ops.behavior.scd2_history): per user, the
    validity intervals of each distinct consecutive `value` — valid_from /
    valid_to (exclusive, null while current) / is_current. Two per-key
    windows, one shuffle on the key; the warehouse companion of
    latest_user_state's type-1 compaction."""
    from timeseriesfuser_spark.ops.behavior import scd2_history

    return scd2_history(_events(spark, sf_dir))


@register(
    "cdc_merge_upsert",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS t, event_id, event_type,
                       value FROM events),
    snap AS (SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev WHERE t < {_DIFF_MID}) WHERE rn = 1),
    chg AS (SELECT user_id, value,
                   CASE WHEN event_type = 'error' THEN 'delete'
                        ELSE 'upsert' END AS op
            FROM (SELECT user_id, value, event_type,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY t DESC, event_id DESC)
                           AS rn
                  FROM ev WHERE t >= {_DIFF_MID}) WHERE rn = 1)
    SELECT coalesce(s.user_id, c.user_id) AS user_id,
           CASE WHEN c.op = 'upsert' THEN c.value ELSE s.value END AS value
    FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
    WHERE c.op IS NULL OR c.op = 'upsert'
    """,
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (ops.behavior.merge_upsert): the pre-cut per-user
    snapshot updated by the post-cut compacted change set — a user's
    latest post-cut event upserts their row unless it is an 'error'
    event, which deletes them. One full-outer key join + row-local CASEs;
    the change stream is compacted by the same latest_snapshot max_by
    used for the type-1 current view."""
    from timeseriesfuser_spark.ops.behavior import latest_snapshot, merge_upsert

    ev = _events(spark, sf_dir)
    snap = latest_snapshot(ev.filter(F.col("ts") < _DIFF_MID)).select(
        "user_id", "value"
    )
    chg = latest_snapshot(ev.filter(F.col("ts") >= _DIFF_MID)).select(
        "user_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    return merge_upsert(snap, chg, key_cols=("user_id",), op_col="op")


_MB_MINSUP = 3


@register(
    "copurchase_lift",
    oracle=f"""
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    nb AS (SELECT count(DISTINCT o) AS n FROM bi),
    ic AS (SELECT p, count(*) AS c FROM bi GROUP BY p),
    pr AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS n_both
        FROM bi a JOIN bi b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= {_MB_MINSUP}
    )
    SELECT pa AS item_a, pb AS item_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(ca.c AS BIGINT) AS n_a,
           CAST(cb.c AS BIGINT) AS n_b,
           CAST(nb.n AS BIGINT) AS n_baskets,
           CAST(n_both AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence_ab,
           CAST(n_both::HUGEINT * nb.n AS DOUBLE)
               / CAST(ca.c::HUGEINT * cb.c AS DOUBLE) AS lift
    FROM pr
    JOIN ic ca ON ca.p = pa
    JOIN ic cb ON cb.p = pb, nb
    """,
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (ops.behavior.copurchase_lift):
    part pairs co-purchased in >= 3 orders with exact support counts;
    confidence and lift are one double division each of exact integer
    products (decimal(38,0)/HUGEINT). Pair generation is per-basket
    (Σ|basket|² blowup, bounded by order size), never #items²."""
    from timeseriesfuser_spark.ops.behavior import copurchase_lift
    li = _t(spark, sf_dir, "lineitem")
    return copurchase_lift(
        li, basket_col="l_orderkey", item_col="l_partkey",
        min_pair_baskets=_MB_MINSUP,
    )


@register(
    "revenue_concentration",
    oracle="""
    WITH g AS (
        SELECT s.s_nationkey AS nk,
               l.l_suppkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT nk, cents,
               row_number() OVER (PARTITION BY nk ORDER BY cents) AS i
        FROM g
    ),
    a AS (
        SELECT nk,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS total,
               sum(i::HUGEINT * cents) AS ix,
               sum(cents::HUGEINT * cents) AS xx
        FROM r GROUP BY nk
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n,
           total,
           CASE WHEN total > 0 THEN CAST(
               (2 * ix - (n::HUGEINT + 1) * total) * 1000000
               // (n::HUGEINT * total) AS BIGINT) END AS gini_ppm,
           CASE WHEN total > 0 THEN CAST(
               xx * 1000000 // (total::HUGEINT * total) AS BIGINT)
           END AS hhi_ppm
    FROM a JOIN nation ON a.nk = nation.n_nationkey
    """,
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-revenue concentration per nation
    (ops.behavior.concentration_stats): exact integer Gini and
    Herfindahl in ppm over the AGGREGATED (nation, supplier) cent
    grain — G = (2Σi·x − (n+1)S)·1e6 DIV (nS), HHI = Σx²·1e6 DIV S²,
    every output BIGINT (the tie-invariance of Σi·x makes the rank
    window deterministic). The rank window runs on #suppliers rows,
    never the fact table; the nation dim broadcasts."""
    from timeseriesfuser_spark.ops.behavior import concentration_stats
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = (
        li.join(F.broadcast(su.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey"))
        .agg(F.sum(cents).alias("cents"))
    )
    out = concentration_stats(g, group_col="nk", value_col="cents")
    return (
        out.join(F.broadcast(na.select("n_nationkey", "n_name")),
                 out.nk == F.col("n_nationkey"))
        .select("n_name", "n", "total", "gini_ppm", "hhi_ppm")
    )


_ATTR_LB = 24 * 3_600_000  # 24h lookback


def _attribution_pairs_sql() -> str:
    """Shared in-window (conversion, touch) candidate CTE text: clicks and
    views are touches, purchases convert, window = trailing 24h
    inclusive on both ends (the Spark side's [conv−lb, conv+1) half-open
    interval)."""
    return f"""
    tch AS (SELECT event_id AS touch_id, epoch_ms(ts) AS touch_ts,
                   user_id, event_type AS channel
            FROM events
            WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL),
    cnv AS (SELECT event_id AS conv_id, epoch_ms(ts) AS conv_ts, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    pairs AS (
        SELECT c.user_id, c.conv_id, c.conv_ts, c.cents,
               t.touch_id, t.touch_ts, t.channel
        FROM cnv c JOIN tch t
          ON t.user_id = c.user_id
         AND t.touch_ts >= c.conv_ts - {_ATTR_LB}
         AND t.touch_ts <= c.conv_ts
    )"""


def _attr_inputs(spark: SparkSession, sf_dir: str):
    ev = _events(spark, sf_dir)
    tch = ev.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
        "user_id",
        F.col("event_type").alias("channel"),
    )
    cnv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return tch, cnv


_ATTR_COLS = """
    SELECT user_id, conv_id, CAST(conv_ts AS BIGINT) AS conv_ts, cents,
           CAST(touch_id AS BIGINT) AS touch_id,
           CAST(touch_ts AS BIGINT) AS touch_ts, channel,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(credit_ppm AS BIGINT) AS credit_ppm"""


@register(
    "attribution_last_click",
    oracle=f"""
    WITH {_attribution_pairs_sql()},
    ranked AS (
        SELECT *, count(*) OVER (PARTITION BY user_id, conv_id) AS n_touches,
               row_number() OVER (PARTITION BY user_id, conv_id
                                  ORDER BY touch_ts DESC, touch_id DESC) AS rk
        FROM pairs
    ),
    won AS (SELECT user_id, conv_id, conv_ts, cents, touch_id, touch_ts,
                   channel, n_touches, 1000000 AS credit_ppm
            FROM ranked WHERE rk = 1),
    unattr AS (
        SELECT c.user_id, c.conv_id, c.conv_ts, c.cents,
               NULL AS touch_id, NULL AS touch_ts, NULL AS channel,
               0 AS n_touches, 0 AS credit_ppm
        FROM cnv c ANTI JOIN pairs p
          ON p.user_id = c.user_id AND p.conv_id = c.conv_id
    )
    {_ATTR_COLS} FROM won
    UNION ALL
    {_ATTR_COLS} FROM unattr
    """,
)
def q_attribution_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (ops.behavior.attribute_conversions): every
    purchase credited to the user's latest click/view in the trailing 24h
    (epoch-chunked interval_join — never a per-user nested loop);
    conversions with no in-window touch kept as unattributed audit rows."""
    from timeseriesfuser_spark.ops.behavior import attribute_conversions

    tch, cnv = _attr_inputs(spark, sf_dir)
    out = attribute_conversions(
        tch, cnv, lookback_ms=_ATTR_LB, model="last_touch"
    )
    return out.select(
        "user_id", "conv_id", "conv_ts", "cents", "touch_id", "touch_ts",
        "channel", "n_touches", "credit_ppm",
    )


@register(
    "attribution_linear",
    oracle=f"""
    WITH {_attribution_pairs_sql()},
    credited AS (
        SELECT *, count(*) OVER (PARTITION BY user_id, conv_id) AS n_touches
        FROM pairs
    )
    SELECT user_id, conv_id, CAST(conv_ts AS BIGINT) AS conv_ts, cents,
           CAST(touch_id AS BIGINT) AS touch_id,
           CAST(touch_ts AS BIGINT) AS touch_ts, channel,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(1000000 // n_touches AS BIGINT) AS credit_ppm
    FROM credited
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every in-window touch shares the
    conversion equally (credit_ppm = 1e6 DIV n, exact integer — no float
    credit drift when re-aggregated per channel). One interval_join + one
    count window; unattributed conversions excluded (the per-channel
    rollup reads credited rows only)."""
    from timeseriesfuser_spark.ops.behavior import attribute_conversions

    tch, cnv = _attr_inputs(spark, sf_dir)
    out = attribute_conversions(
        tch, cnv, lookback_ms=_ATTR_LB, model="linear",
        include_unattributed=False, cache=False,
    )
    return out.select(
        "user_id", "conv_id", "conv_ts", "cents", "touch_id", "touch_ts",
        "channel", "n_touches", "credit_ppm",
    )


@register(
    "dau_stickiness_7d",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, user_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    ud AS (SELECT DISTINCT user_id, {_fdiv("t", 86_400_000)} AS day FROM ev),
    spine AS (SELECT unnest(range((SELECT min(day) FROM ud),
                                  (SELECT max(day) FROM ud) + 1)) AS day),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
    win AS (SELECT s.day, count(DISTINCT u.user_id) AS window_active
            FROM spine s JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
            GROUP BY s.day)
    SELECT CAST(s.day * 86400000 AS BIGINT) AS day_start,
           CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
           CAST(coalesce(win.window_active, 0) AS BIGINT) AS window_active,
           CASE WHEN coalesce(win.window_active, 0) > 0
                THEN CAST(coalesce(dau.dau, 0) * 1000000
                          // win.window_active AS BIGINT)
                END AS stickiness_ppm
    FROM spine s
    LEFT JOIN dau ON dau.day = s.day
    LEFT JOIN win ON win.day = s.day
    """,
)
def q_dau_stickiness_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement (ops.behavior.rolling_active_users): per
    calendar day, DAU, trailing-7-day actives, and DAU/WAU stickiness in
    exact ppm. The trailing distinct is the constant-fan-out explode on
    the (user, day) grain — never a per-day rescan of the corpus."""
    from timeseriesfuser_spark.ops.behavior import rolling_active_users

    return rolling_active_users(_events(spark, sf_dir), window_days=7)


def _lag_pctl_oracle() -> str:
    from timeseriesfuser_spark.contract.timeseries import _pctl_case

    return f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, user_id, event_type FROM events
                WHERE user_id IS NOT NULL),
    c AS (SELECT user_id, min(t) AS tc FROM ev
          WHERE event_type = 'click' GROUP BY user_id),
    p AS (SELECT e.user_id, min(e.t) AS tp, min(c.tc) AS tc
          FROM ev e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.t > c.tc
          GROUP BY e.user_id),
    v AS (SELECT 'all' AS g, tp - tc AS v FROM p),
    nr AS (SELECT g, count(*) AS n FROM v GROUP BY g),
    r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
          FROM v),
    j AS (SELECT r.g, r.v, r.rn, nr.n FROM r JOIN nr ON r.g = nr.g)
    SELECT g AS cohort, CAST(max(n) AS BIGINT) AS n,
           {_pctl_case(1, 2)}, {_pctl_case(9, 10)}, {_pctl_case(99, 100)}
    FROM j GROUP BY g
    """


@register("conversion_lag_percentiles", oracle=_lag_pctl_oracle())
def q_conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: for every user whose first 'click'
    is later followed by a 'purchase', the click→purchase lag in ms —
    summarized as EXACT p50×2 / p90×10 / p99×100 (exact_percentiles
    with ``cents=False``: the lag is already an exact integer; the
    money scaling would be wrong here). The funnel pair uses
    funnel_counts' strict-sequence semantics (first purchase STRICTLY
    after the first click). Two user-keyed aggs + one equi-join — the
    funnel shape; then the percentile rank window runs on the tiny
    one-row-per-converting-user relation."""
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    pairs = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"), F.min("tc").alias("tc"))
    )
    lags = pairs.select(
        F.lit("all").alias("cohort"),
        (F.col("tp") - F.col("tc")).cast("long").alias("lag_ms"),
    )
    return TS.exact_percentiles(
        lags, ((1, 2), (9, 10), (99, 100)),
        group_col="cohort", value_col="lag_ms", cents=False,
    )


@register(
    "streaming_latest_by_user",
    # Emission contract: one row per (key, change) in append mode; the
    # CURRENT view is the max-(ts, seq) row per key over the emitted
    # stream, which equals the batch per-key argmax regardless of how
    # the source split into micro-batches (state keeps the max — late
    # arrivals never regress it). NULL ordering keys are skipped by the
    # op; NULL user ids are filtered on both sides.
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
                FROM events
                WHERE ts IS NOT NULL AND event_id IS NOT NULL
                  AND user_id IS NOT NULL),
    r AS (SELECT user_id, ts_ms, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts_ms DESC, event_id DESC) AS rn
          FROM ev)
    SELECT user_id, ts_ms, event_id, value FROM r WHERE rn = 1
    """,
)
def q_streaming_latest_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming type-1 current view driven THROUGH the driver
    harness (streaming.latest_stream, applyInPandasWithState): per-user
    latest (ts, seq)-ordered row maintained across micro-batches — the
    incremental CDC view whose batch twin is latest_user_state's
    compaction. The registered result is the FINAL view (max-(ts, seq)
    over the emitted changes)."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import latest_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        "user_id",
        ts_ms.cast("long").alias("ts_ms"),
        "event_id",
        "value",
    ).filter(F.col("user_id").isNotNull())
    view = latest_stream(
        ev, keys=["user_id"], ts_col="ts_ms", seq_col="event_id",
        value_cols=["value"],
    )
    emitted = _run_availablenow_to_memory(view, "sl")
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts_ms", "event_id", "value"),
                F.struct("ts_ms", "event_id"),
            ).alias("__m")
        )
        .select(
            "user_id",
            F.col("__m.ts_ms").alias("ts_ms"),
            F.col("__m.event_id").alias("event_id"),
            F.col("__m.value").alias("value"),
        )
    )


_IVD_CUT = "1998-01-01"


@register(
    "incremental_join_delta",
    # The oracle states the SEMANTIC definition — the refreshed full
    # join minus the base join, per group — a deliberately different
    # formulation from the op's three-term delta expansion, so the IVM
    # identity itself is what the parity check proves.
    oracle=f"""
    WITH fullv AS (
        SELECT o_orderpriority AS p, count(*) AS n,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1),
    basev AS (
        SELECT o_orderpriority AS p, count(*) AS n,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '{_IVD_CUT}'
          AND l_shipdate < TIMESTAMP '{_IVD_CUT}'
        GROUP BY 1)
    SELECT f.p AS o_orderpriority,
           CAST(f.n - coalesce(b.n, 0) AS BIGINT) AS delta_rows,
           CAST(f.c - coalesce(b.c, 0) AS BIGINT) AS delta_cents
    FROM fullv f LEFT JOIN basev b ON f.p IS NOT DISTINCT FROM b.p
    WHERE f.n - coalesce(b.n, 0) > 0
    """,
)
def q_incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance (ops.behavior.join_view_delta):
    orders/lineitem split at a date cutoff into base + insert deltas;
    the view delta is the three-term IVM expansion ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    — each term joins a small delta against a base (broadcast-able),
    never re-joining the bases. The oracle proves the identity against
    the refreshed-full-minus-base formulation."""
    from timeseriesfuser_spark.ops.behavior import join_view_delta

    cut = F.lit(_IVD_CUT).cast("timestamp")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_shipdate",
    )
    d = join_view_delta(
        o.filter(F.col("o_orderdate") < cut).drop("o_orderdate"),
        # the delta is the exact complement — NULL dates land in the
        # delta, not nowhere (a bare ~(col < cut) drops them from BOTH)
        o.filter(
            F.col("o_orderdate").isNull() | (F.col("o_orderdate") >= cut)
        ).drop("o_orderdate"),
        li.filter(F.col("l_shipdate") < cut).drop("l_shipdate"),
        li.filter(
            F.col("l_shipdate").isNull() | (F.col("l_shipdate") >= cut)
        ).drop("l_shipdate"),
        on="o_orderkey",
    )
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("delta_rows"),
        F.sum("cents").cast("long").alias("delta_cents"),
    )


_WF_WITHIN = 3 * 86_400_000  # 3 days


@register(
    "window_funnel_3d",
    oracle=f"""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events),
    a0 AS (SELECT u, t AS a, t AS t0 FROM ev WHERE ty = 'signup'),
    s1 AS (SELECT e.u, a0.a, min(e.t) AS t1 FROM ev e
           JOIN a0 ON e.u = a0.u
           WHERE e.ty = 'view' AND e.t > a0.t0
             AND e.t <= a0.a + {_WF_WITHIN}
           GROUP BY e.u, a0.a),
    s2 AS (SELECT e.u, s1.a, min(e.t) AS t2 FROM ev e
           JOIN s1 ON e.u = s1.u
           WHERE e.ty = 'purchase' AND e.t > s1.t1
             AND e.t <= s1.a + {_WF_WITHIN}
           GROUP BY e.u, s1.a),
    c AS (SELECT (SELECT count(DISTINCT u) FROM a0) AS c0,
                 (SELECT count(DISTINCT u) FROM s1) AS c1,
                 (SELECT count(DISTINCT u) FROM s2) AS c2)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step,
           CAST(c0 AS BIGINT) AS n_users,
           CAST(c0 * 1000000 // c0 AS BIGINT) AS conv_ppm FROM c
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'view', CAST(c1 AS BIGINT),
           CAST(c1 * 1000000 // c0 AS BIGINT) FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase', CAST(c2 AS BIGINT),
           CAST(c2 * 1000000 // c0 AS BIGINT) FROM c
    """,
)
def q_window_funnel_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (ops.behavior.window_funnel,
    ClickHouse windowFunnel semantics): signup → view → purchase with
    the whole chain completing within 3 days of ANY signup anchor —
    per-step conditional-min agg + user equi-join over the shrinking
    (user, anchor) relation, exact by the greedy-anchor argument."""
    from timeseriesfuser_spark.ops.behavior import window_funnel

    return window_funnel(
        _events(spark, sf_dir), ["signup", "view", "purchase"], _WF_WITHIN
    )


@register(
    "window_funnel_depths",
    oracle=f"""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events),
    a0 AS (SELECT u, t AS a, t AS t0 FROM ev WHERE ty = 'signup'),
    s1 AS (SELECT e.u, a0.a, min(e.t) AS t1 FROM ev e
           JOIN a0 ON e.u = a0.u
           WHERE e.ty = 'view' AND e.t > a0.t0
             AND e.t <= a0.a + {_WF_WITHIN}
           GROUP BY e.u, a0.a),
    s2 AS (SELECT e.u, s1.a, min(e.t) AS t2 FROM ev e
           JOIN s1 ON e.u = s1.u
           WHERE e.ty = 'purchase' AND e.t > s1.t1
             AND e.t <= s1.a + {_WF_WITHIN}
           GROUP BY e.u, s1.a),
    d AS (SELECT u, 1 AS d FROM a0
          UNION ALL SELECT u, 2 FROM s1
          UNION ALL SELECT u, 3 FROM s2)
    SELECT u AS user_id, CAST(max(d) AS BIGINT) AS depth
    FROM d GROUP BY u
    """,
)
def q_window_funnel_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel depth (ops.behavior.window_funnel_depth) — the
    ClickHouse windowFunnel return form for the signup → view → purchase
    3-day funnel: one row per anchored user with the deepest consecutive
    step count, as a joinable relation. window_funnel_3d is exactly this
    relation aggregated to per-step counts, now in one lazy plan with a
    single caller action."""
    from timeseriesfuser_spark.ops.behavior import window_funnel_depth

    return window_funnel_depth(
        _events(spark, sf_dir), ["signup", "view", "purchase"], _WF_WITHIN
    )


@register(
    "streaming_latest_daily_watermarked",
    # Append mode emits exactly the day windows whose end <= final
    # watermark = max event time - delay, where the delay is SIZED FROM
    # the batch lateness profile (global max_late_ms ceiled to seconds
    # + 1 s) — the oracle derives the same delay from the same data, so
    # the emitted-window boundary is part of the verified contract.
    oracle="""
    WITH ev0 AS (SELECT epoch_ms(ts) AS t, event_id FROM events
                 WHERE ts IS NOT NULL AND event_id IS NOT NULL),
    l0 AS (SELECT greatest(coalesce(max(t) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - t, 0),
               0) AS late
           FROM ev0),
    lt AS (SELECT max(late) AS ml FROM l0),
    ev AS (SELECT user_id, epoch_ms(ts) AS t, event_id, value FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_id IS NOT NULL),
    wm AS (SELECT (SELECT max(t) FROM ev)
               - ((SELECT ml FROM lt) // 1000 + 1) * 1000 AS w),
    lab AS (SELECT user_id, t - (t % 86400000) + 86400000 AS b,
                   t, event_id, value
            FROM ev),
    r AS (SELECT user_id, b, t, event_id, value,
                 row_number() OVER (PARTITION BY user_id, b
                                    ORDER BY t DESC, event_id DESC) AS rn
          FROM lab)
    SELECT CAST(b AS BIGINT) AS ts_ms, user_id, value,
           event_id
    FROM r WHERE rn = 1 AND b <= (SELECT w FROM wm)
    """,
)
def q_streaming_latest_daily_watermarked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked per-user DAILY latest (streaming.resample_stream,
    tumbling 1d windows + max_by) with the watermark delay sized from
    ops.timeseries.lateness_stats — the windowed, bounded-state
    complement to the stateful streaming_latest_by_user view: state is
    one row per (user, open day window) and closed windows are emitted
    exactly when the lateness-profiled watermark passes them."""
    from timeseriesfuser_spark.contract._base import (
        _events,
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.ops.timeseries import lateness_stats
    from timeseriesfuser_spark.streaming import resample_stream

    prof = (
        lateness_stats(_events(spark, sf_dir).withColumn("__g", F.lit(1)),
                       group_col="__g")
        .agg(F.max("max_late_ms").alias("m"))
        .first()
    )
    delay_s = int((prof["m"] or 0) // 1000 + 1)
    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("ts_ms"), "user_id", "event_id", "value"
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("ts_ms").isNotNull()
        & F.col("event_id").isNotNull()
    )
    agg = resample_stream(
        ev, "1d", keys=["user_id"], value_cols=["value", "event_id"],
        watermark=f"{delay_s} seconds", ts_col="ts_ms",
        tiebreak_cols=["event_id"],
    )
    return _run_availablenow_to_memory(agg, "sldw")


_TREND_D = 86_400_000


@register(
    "trending_daily",
    oracle=f"""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) AS t FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    c AS (SELECT k, t - ((t % {_TREND_D} + {_TREND_D}) % {_TREND_D}) AS b,
                 count(*) AS n
          FROM ev GROUP BY 1, 2),
    l AS (SELECT k, b, n,
                 lag(b) OVER (PARTITION BY k ORDER BY b) AS pb,
                 lag(n) OVER (PARTITION BY k ORDER BY b) AS pn
          FROM c),
    s AS (SELECT k, b, n,
                 CASE WHEN pb = b - {_TREND_D} THEN pn ELSE 0 END AS prev_n
          FROM l),
    g AS (SELECT k, b, n, prev_n,
                 (n - prev_n) * 1000000 // greatest(prev_n, 1) AS growth,
                 row_number() OVER (
                     PARTITION BY b
                     ORDER BY (n - prev_n) * 1000000
                              // greatest(prev_n, 1) DESC, n DESC, k
                 ) AS rk
          FROM s)
    SELECT CAST(b AS BIGINT) AS bucket_ts, k AS event_type,
           CAST(n AS BIGINT) AS n, CAST(prev_n AS BIGINT) AS prev_n,
           CAST(growth AS BIGINT) AS growth_ppm, CAST(rk AS BIGINT) AS rank
    FROM g WHERE rk <= 3
    """,
)
def q_trending_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily trending event types (ops.behavior.trending_topk): top-3
    per day by exact-integer growth vs the type's own previous day
    (first appearance = max growth). One hash-agg to the (key, day)
    grain, a lag window over that aggregated grain only, and a
    per-bucket WindowGroupLimit — never a window over raw events."""
    from timeseriesfuser_spark.ops.behavior import trending_topk

    return trending_topk(
        _events(spark, sf_dir), _TREND_D, key_col="event_type", top_n=3
    )


@register(
    "seasonal_profile_types",
    oracle="""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) AS t FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    lab AS (SELECT k,
                   CAST(((t - ((t % 86400000 + 86400000) % 86400000))
                         // 86400000 + 3) % 7 AS INT) AS dow,
                   CAST(((t - ((t % 3600000 + 3600000) % 3600000))
                         // 3600000) % 24 AS INT) AS hour
            FROM ev),
    c AS (SELECT k, dow, hour, count(*) AS n FROM lab GROUP BY 1, 2, 3),
    tot AS (SELECT k, sum(n) AS kt FROM c GROUP BY 1)
    SELECT c.k AS event_type, c.dow, c.hour, CAST(c.n AS BIGINT) AS n,
           CAST(tot.kt AS BIGINT) AS key_total,
           CAST(c.n * 1000000 // tot.kt AS BIGINT) AS share_ppm
    FROM c JOIN tot ON c.k = tot.k
    """,
)
def q_seasonal_profile_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC dow×hour seasonal baseline per event type
    (ops.behavior.seasonal_profile): one hash-agg to the ≤168·|keys|
    grain + broadcast totals; exact-integer shares."""
    from timeseriesfuser_spark.ops.behavior import seasonal_profile

    return seasonal_profile(_events(spark, sf_dir))


_SEQ_WITHIN = 7 * 24 * 3_600_000  # 7 days


@register(
    "sequence_match_no_error",
    # Mirrors ops.behavior.sequence_match's strictly-after window
    # formulation on the per-(user, ts) deduplicated grain: a blocker AT
    # the closing event's ts is not "strictly between" (next_b <=
    # next_c), and the pair must close within the window of its anchor.
    oracle=f"""
    WITH g AS (SELECT user_id AS u, epoch_ms(ts) AS t,
                      sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_a,
                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_b,
                      max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_c
               FROM events WHERE ts IS NOT NULL
               GROUP BY 1, 2),
    w AS (SELECT *,
                 min(CASE WHEN has_b = 1 THEN t END) OVER
                     (PARTITION BY u ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_b,
                 min(CASE WHEN has_c = 1 THEN t END) OVER
                     (PARTITION BY u ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_c
          FROM g),
    m AS (SELECT u, t, n_a,
                 (n_a > 0 AND next_b IS NOT NULL
                  AND (next_c IS NULL OR next_b <= next_c)
                  AND next_b <= t + {_SEQ_WITHIN}) AS ok
          FROM w)
    SELECT u AS user_id,
           CAST(max(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS matched,
           CAST(COALESCE(sum(CASE WHEN ok THEN n_a END), 0) AS BIGINT) AS n_matches,
           CAST(min(CASE WHEN ok THEN t END) AS BIGINT) AS first_anchor_ts
    FROM m GROUP BY u
    HAVING sum(n_a) > 0
    """,
)
def q_sequence_match_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern with negation (ops.behavior.sequence_match, the
    ClickHouse sequenceMatch '(?1)(?!3)(?2)' shape): users whose signup
    is followed by a purchase within 7 days with NO error event strictly
    between — the interrupted-path predicate window_funnel can't
    express. One strictly-after conditional-min window on the
    (user, ts) grain; no self-join."""
    from timeseriesfuser_spark.ops.behavior import sequence_match

    return sequence_match(
        _events(spark, sf_dir),
        "signup",
        "purchase",
        not_between="error",
        within_ms=_SEQ_WITHIN,
    )


@register(
    "rfm_customer_segments",
    # Mirrors ops.behavior.rfm_segments: per-customer last-activity-day /
    # order-count / exact cent spend, each equal-depth-binned by the
    # (rank-1)*k DIV n rule with the customer id as tie break (the
    # quantile_bins contract — no ntile, no single-partition window).
    oracle="""
    WITH base AS (SELECT o_custkey AS u,
                         epoch_ms(o_orderdate) // 86400000 AS day,
                         COALESCE(CAST(round(o_totalprice * 100) AS BIGINT), 0)
                             AS cents
                  FROM orders
                  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
    pu AS (SELECT u, max(day) AS last_day, count(*) AS n_orders,
                  sum(cents) AS monetary
           FROM base GROUP BY u),
    mx AS (SELECT max(day) AS max_day FROM base),
    rel AS (SELECT u, max_day - last_day AS recency_days, n_orders, monetary
            FROM pu CROSS JOIN mx),
    tot AS (SELECT count(*) AS n FROM rel),
    rb AS (SELECT u, (row_number() OVER (ORDER BY recency_days, u) - 1) * 5 // n
                     AS r_bin FROM rel CROSS JOIN tot),
    fb AS (SELECT u, (row_number() OVER (ORDER BY n_orders, u) - 1) * 5 // n
                     AS f_bin FROM rel CROSS JOIN tot),
    mb AS (SELECT u, (row_number() OVER (ORDER BY monetary, u) - 1) * 5 // n
                     AS m_bin FROM rel CROSS JOIN tot)
    SELECT rel.u AS o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(monetary AS BIGINT) AS monetary_cents,
           CAST(r_bin AS BIGINT) AS r_bin,
           CAST(f_bin AS BIGINT) AS f_bin,
           CAST(m_bin AS BIGINT) AS m_bin,
           CAST(r_bin * 100 + f_bin * 10 + m_bin AS BIGINT) AS rfm_code
    FROM rel JOIN rb ON rb.u = rel.u JOIN fb ON fb.u = rel.u
    JOIN mb ON mb.u = rel.u
    """,
)
def q_rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (ops.behavior.rfm_segments): recency /
    frequency / monetary quintiles via the two-pass bucketed global
    ranking (quantile_bins) — the classic customer-value grid with no
    single-partition ntile anywhere. Exact integer metrics (day index,
    counts, cents)."""
    from timeseriesfuser_spark.ops.behavior import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


@register(
    "journey_paths_3",
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_id AS s,
                       COALESCE(CAST(event_type AS VARCHAR), '') AS e
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    rn AS (SELECT *, row_number() OVER (PARTITION BY u ORDER BY t, s) AS rnk
           FROM ev),
    p AS (SELECT u, string_agg(e, '>' ORDER BY rnk) AS path,
                 count(*) AS n_steps
          FROM rn WHERE rnk <= 3 GROUP BY u)
    SELECT path, CAST(n_steps AS BIGINT) AS n_steps,
           CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path, n_steps
    ORDER BY n_users DESC, path LIMIT 20
    """,
)
def q_journey_paths_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-3-event user journeys (ops.behavior.journey_paths) —
    the Sankey/"what do users do first" report. Per-user prefix via one
    activity-bounded window (event_id tie break), paths reassembled in
    rank order through sort_array (never collect_list arrival order),
    TakeOrdered top-20."""
    from timeseriesfuser_spark.ops.behavior import journey_paths

    return journey_paths(_events(spark, sf_dir), depth=3, top=20)


@register(
    "attribution_position",
    # U-shaped 40/20/40: rank touches per conversion by (ts, touch_id);
    # first/last 400k ppm, middles 200000 // (n-2) with the truncation
    # remainder to the LAST touch — credits sum to exactly 1e6.
    oracle="""
    WITH
    tch AS (SELECT event_id AS touch_id, epoch_ms(ts) AS touch_ts,
                   user_id, event_type AS channel
            FROM events
            WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL),
    cnv AS (SELECT event_id AS conv_id, epoch_ms(ts) AS conv_ts, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    pairs AS (
        SELECT c.user_id, c.conv_id, c.conv_ts, c.cents,
               t.touch_id, t.touch_ts, t.channel
        FROM cnv c JOIN tch t
          ON t.user_id = c.user_id
         AND t.touch_ts >= c.conv_ts - 86400000
         AND t.touch_ts <= c.conv_ts
    ),
    ranked AS (
        SELECT *,
               count(*) OVER (PARTITION BY user_id, conv_id) AS n_touches,
               row_number() OVER (PARTITION BY user_id, conv_id
                                  ORDER BY touch_ts, touch_id) AS rk
        FROM pairs
    )
    SELECT user_id, conv_id, CAST(conv_ts AS BIGINT) AS conv_ts, cents,
           CAST(touch_id AS BIGINT) AS touch_id,
           CAST(touch_ts AS BIGINT) AS touch_ts, channel,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN n_touches = 1 THEN 1000000
                     WHEN n_touches = 2 THEN 500000
                     WHEN rk = 1 THEN 400000
                     WHEN rk = n_touches
                     THEN 400000 + 200000
                          - (200000 // (n_touches - 2)) * (n_touches - 2)
                     ELSE 200000 // (n_touches - 2)
                END AS BIGINT) AS credit_ppm
    FROM ranked
    """,
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution
    (ops.behavior.attribute_conversions, model='position_based'): first
    and last in-window touch carry 400k ppm each, middles share 200k
    with the integer-DIV remainder pinned to the last touch — every
    conversion's credits sum to EXACTLY 1e6 (linear's truncation loss
    re-aggregates clean per channel here). Same chunked interval_join +
    per-conversion window as the other models."""
    from timeseriesfuser_spark.ops.behavior import attribute_conversions

    tch, cnv = _attr_inputs(spark, sf_dir)
    out = attribute_conversions(
        tch, cnv, lookback_ms=_ATTR_LB, model="position_based",
        include_unattributed=False, cache=False,
    )
    return out.select(
        "user_id", "conv_id", "conv_ts", "cents", "touch_id", "touch_ts",
        "channel", "n_touches", "credit_ppm",
    )


@register(
    "streaming_sequence_match",
    # Emission contract: one append row per MATCHED anchor; aggregating
    # per user equals the batch sequence_match's matched=1 rows
    # (availableNow over one parquet file = one micro-batch, rows sorted
    # per group, so the pending-anchor state machine sees full
    # event-time order).
    oracle=f"""
    WITH g AS (SELECT user_id AS u, epoch_ms(ts) AS t,
                      sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_a,
                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_b,
                      max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_c
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
               GROUP BY 1, 2),
    w AS (SELECT *,
                 min(CASE WHEN has_b = 1 THEN t END) OVER
                     (PARTITION BY u ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_b,
                 min(CASE WHEN has_c = 1 THEN t END) OVER
                     (PARTITION BY u ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_c
          FROM g),
    m AS (SELECT u, t, n_a,
                 (n_a > 0 AND next_b IS NOT NULL
                  AND (next_c IS NULL OR next_b <= next_c)
                  AND next_b <= t + {_SEQ_WITHIN}) AS ok
          FROM w)
    SELECT u AS user_id,
           CAST(sum(CASE WHEN ok THEN n_a END) AS BIGINT) AS n_matches,
           CAST(min(CASE WHEN ok THEN t END) AS BIGINT) AS first_anchor_ts,
           CAST(count(*) FILTER (ok) AS BIGINT) AS n_anchors_matched
    FROM m GROUP BY u
    HAVING max(CASE WHEN ok THEN 1 ELSE 0 END) = 1
    """,
)
def q_streaming_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live pattern-with-negation detection driven through the driver
    harness (streaming.sequence_match_stream, applyInPandasWithState):
    pending signup anchors ride the state store; a purchase inside the
    7-day window matches and clears them, an error kills strictly-
    earlier anchors. Aggregated append emissions equal the batch
    sequence_match's matched users exactly."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import sequence_match_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        "user_id",
        ts_ms.cast("long").alias("ts"),
        "event_type",
    ).filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    hits = sequence_match_stream(
        ev, "signup", "purchase", not_between="error",
        within_ms=_SEQ_WITHIN, keys=["user_id"], ts_col="ts",
    )
    emitted = _run_availablenow_to_memory(hits, "sq")
    return emitted.groupBy("user_id").agg(
        F.sum("n_anchor_events").cast("long").alias("n_matches"),
        F.min("anchor_ts").cast("long").alias("first_anchor_ts"),
        F.count(F.lit(1)).cast("long").alias("n_anchors_matched"),
    )


@register(
    "funnel_step_lags",
    # The greedy funnel chain unrolls step by step (min ts strictly
    # after the previous step's time); lag percentiles are den-scaled
    # exact order statistics per transition.
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    s0 AS (SELECT u, min(t) AS t0 FROM ev WHERE ty = 'signup' GROUP BY u),
    s1 AS (SELECT e.u, s0.t0, min(e.t) AS t1
           FROM ev e JOIN s0 ON s0.u = e.u AND e.t > s0.t0
           WHERE e.ty = 'view' GROUP BY 1, 2),
    s2 AS (SELECT e.u, s1.t1, min(e.t) AS t2
           FROM ev e JOIN s1 ON s1.u = e.u AND e.t > s1.t1
           WHERE e.ty = 'purchase' GROUP BY 1, 2),
    lags AS (SELECT 1 AS step_idx, 'signup' AS from_step, 'view' AS to_step,
                    t1 - t0 AS lag FROM s1
             UNION ALL
             SELECT 2, 'view', 'purchase', t2 - t1 FROM s2),
    cnt AS (SELECT step_idx, count(*) AS n FROM lags GROUP BY step_idx),
    rn AS (SELECT l.step_idx, l.from_step, l.to_step, lag, n,
                  row_number() OVER (PARTITION BY l.step_idx ORDER BY lag)
                      AS rnk
           FROM lags l JOIN cnt ON cnt.step_idx = l.step_idx)
    SELECT step_idx, min(from_step) AS from_step, min(to_step) AS to_step,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN rnk = (n - 1) // 2 + 1
                         THEN lag * (2 - (n - 1) % 2)
                         WHEN (n - 1) % 2 > 0 AND rnk = (n - 1) // 2 + 2
                         THEN lag * ((n - 1) % 2) END) AS BIGINT) AS p50_x2,
           CAST(sum(CASE WHEN rnk = (9 * (n - 1)) // 10 + 1
                         THEN lag * (10 - (9 * (n - 1)) % 10)
                         WHEN (9 * (n - 1)) % 10 > 0
                          AND rnk = (9 * (n - 1)) // 10 + 2
                         THEN lag * ((9 * (n - 1)) % 10) END) AS BIGINT)
               AS p90_x10,
           CAST(max(lag) AS BIGINT) AS max_lag_ms
    FROM rn GROUP BY step_idx
    """,
)
def q_funnel_step_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition time-to-convert for the signup→view→purchase
    funnel (ops.behavior.funnel_step_lags): exact lag medians/p90s over
    the greedy strict-sequence chain — WHERE the funnel loses time, the
    companion to funnel_conversion's where-it-loses-users. One
    shrinking conditional-min join per step, percentile rank windows on
    converting users only."""
    from timeseriesfuser_spark.ops.behavior import funnel_step_lags

    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return funnel_step_lags(ev, ["signup", "view", "purchase"])


@register(
    "cohort_ltv_weekly",
    # Cohort = first-order week (pmod-floor per _ff); cumulative revenue
    # runs over the aggregated (cohort, weeks-since) grain.
    oracle=f"""
    WITH base AS (SELECT o_custkey AS u,
                         {_ff("epoch_ms(o_orderdate)", 7 * 86_400_000)}
                             // {7 * 86_400_000} AS p,
                         COALESCE(CAST(round(o_totalprice * 100) AS BIGINT), 0)
                             AS cents
                  FROM orders
                  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
    first AS (SELECT u, min(p) AS cohort FROM base GROUP BY u),
    grain AS (SELECT f.cohort AS cohort_period,
                     b.p - f.cohort AS periods_since,
                     count(*) AS n_orders,
                     sum(b.cents) AS revenue_cents
              FROM base b JOIN first f ON f.u = b.u
              GROUP BY 1, 2)
    SELECT CAST(cohort_period AS BIGINT) AS cohort_period,
           CAST(periods_since AS BIGINT) AS periods_since,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(sum(revenue_cents) OVER
                    (PARTITION BY cohort_period ORDER BY periods_since
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_revenue_cents
    FROM grain
    """,
)
def q_cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV triangle (ops.behavior.cohort_ltv): customers
    cohorted by first-order week; per (cohort, weeks-since) cell the
    period revenue and the running cumulative — the LTV curve behind
    'what is a week-N customer worth', the revenue companion to
    retention_7d. Cumulative window on the aggregated grain only."""
    from timeseriesfuser_spark.ops.behavior import cohort_ltv

    return cohort_ltv(_t(spark, sf_dir, "orders"))


@register(
    "user_activity_span",
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t,
                       epoch_ms(ts) // 86400000 AS d
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL)
    SELECT u AS user_id,
           CAST(min(t) AS BIGINT) AS first_ts,
           CAST(max(t) AS BIGINT) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT d) AS BIGINT) AS n_active_days,
           CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
           CAST(count(DISTINCT d) * 1000000 // (max(d) - min(d) + 1)
                AS BIGINT) AS density_ppm
    FROM ev GROUP BY u
    """,
)
def q_user_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime span and activity density: first/last event,
    active-day count, calendar span and the active/span ratio in exact
    ppm — the engagement-segmentation base table (tourists vs
    regulars). One hash aggregation with a count-distinct Expand."""
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).withColumn("__d", F.expr("ts DIV 86400000").cast("long"))
    return ev.groupBy("user_id").agg(
        F.min("ts").cast("long").alias("first_ts"),
        F.max("ts").cast("long").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("__d").cast("long").alias("n_active_days"),
        (F.max("__d") - F.min("__d") + 1).cast("long").alias("span_days"),
        F.expr(
            "count(DISTINCT __d) * 1000000 DIV (max(__d) - min(__d) + 1)"
        ).cast("long").alias("density_ppm"),
    )


@register(
    "peak_concurrency_daily",
    # Sweep line over session boundaries: +1 at start, −1 at end+1
    # (inclusive-end sessions), ordered (t, delta) so a session ending
    # strictly before another's start never overlaps it; the default
    # RANGE window frame makes tie groups cumulative as a unit on both
    # engines. Sessions are assigned to their START day.
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    flagged AS (SELECT user_id, t, event_id,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800000
                            THEN 1 ELSE 0 END AS is_new
                FROM ev WINDOW w AS (PARTITION BY user_id
                                     ORDER BY t, event_id)),
    sess AS (SELECT user_id,
                    sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid,
                    t
             FROM flagged),
    spans AS (SELECT min(t) AS s, max(t) AS e,
                     min(t) // 86400000 AS day
              FROM sess GROUP BY user_id, sid),
    bounds AS (SELECT day, s AS t, 1 AS delta FROM spans
               UNION ALL
               SELECT day, e + 1, -1 FROM spans),
    swept AS (SELECT day,
                     sum(delta) OVER (PARTITION BY day ORDER BY t, delta)
                         AS cur
              FROM bounds)
    SELECT CAST(day AS BIGINT) AS day,
           CAST((SELECT count(*) FROM spans s2 WHERE s2.day = swept.day)
                AS BIGINT) AS n_sessions,
           CAST(max(cur) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def q_peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions per day: 30-min-gap sessions swept as
    +1/−1 boundary events — the capacity-planning number (how many
    concurrent users must the serving tier hold). Runs the DISTRIBUTED
    two-level sweep (``ops.behavior.peak_concurrency``): per-(day,
    range-bucket) local running maxima merged on the tiny per-bucket
    grain — never one window task walking a whole day's boundaries."""
    from timeseriesfuser_spark.ops.behavior import peak_concurrency

    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("t"), "user_id"
    )
    return peak_concurrency(ev, 1_800_000, ts_col="t")


@register(
    "streaming_peak_concurrency",
    # The batch sweep (peak_concurrency_daily) restricted to FINALIZED
    # days — the streaming op's emission contract: with late_ms=0 the
    # high-water mark wm is the corpus max event time; a day emits iff
    # wm is past its midnight AND every session anchored to it has
    # gap-closed (max session end + gap < wm). Trailing days stay in
    # state, the sessionize_stream open-session caveat.
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    flagged AS (SELECT user_id, t, event_id,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800000
                            THEN 1 ELSE 0 END AS is_new
                FROM ev WINDOW w AS (PARTITION BY user_id
                                     ORDER BY t, event_id)),
    sess AS (SELECT user_id,
                    sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid,
                    t
             FROM flagged),
    spans AS (SELECT min(t) AS s, max(t) AS e,
                     min(t) // 86400000 AS day
              FROM sess GROUP BY user_id, sid),
    wm AS (SELECT max(t) AS m FROM ev),
    final_days AS (SELECT day FROM spans GROUP BY day
                   HAVING (day + 1) * 86400000 <= (SELECT m FROM wm)
                      AND max(e) + 1800000 < (SELECT m FROM wm)),
    fs AS (SELECT * FROM spans WHERE day IN (SELECT day FROM final_days)),
    bounds AS (SELECT day, s AS t, 1 AS delta FROM fs
               UNION ALL
               SELECT day, e + 1, -1 FROM fs),
    swept AS (SELECT day,
                     sum(delta) OVER (PARTITION BY day ORDER BY t, delta)
                         AS cur
              FROM bounds)
    SELECT CAST(day AS BIGINT) AS day,
           CAST((SELECT count(*) FROM fs s2 WHERE s2.day = swept.day)
                AS BIGINT) AS n_sessions,
           CAST(max(cur) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def q_streaming_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live capacity planning through the driver harness
    (streaming.peak_concurrency_stream, applyInPandasWithState): per-day
    session counts and peak simultaneous sessions on the
    session-boundary grain, finalized by the event-time high-water mark
    — the streaming twin of peak_concurrency_daily. One append row per
    finalized day; state (open sessions + pending day boundaries) rides
    the checkpoint and survives restarts (pinned by the restart pytest).
    """
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__timestamp"), "user_id"
    ).filter(F.col("user_id").isNotNull())
    days = peak_concurrency_stream(ev, 1_800_000)
    emitted = _run_availablenow_to_memory(days, "spc")
    return emitted.select(
        F.col("day").cast("long").alias("day"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("peak_concurrent").cast("long").alias("peak_concurrent"),
    )


@register(
    "streaming_peak_flush",
    # The FULL batch sweep — no final_days filter: flush_on_close plus a
    # FLUSH_SENTINEL_TS row as the stream's last input finalizes every
    # open session and pending day, so streaming emissions equal the
    # batch peak_concurrency_daily exactly (VERDICT r10 #5's Done
    # criterion, driver-certified).
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    flagged AS (SELECT user_id, t, event_id,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800000
                            THEN 1 ELSE 0 END AS is_new
                FROM ev WINDOW w AS (PARTITION BY user_id
                                     ORDER BY t, event_id)),
    sess AS (SELECT user_id,
                    sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid,
                    t
             FROM flagged),
    spans AS (SELECT min(t) AS s, max(t) AS e,
                     min(t) // 86400000 AS day
              FROM sess GROUP BY user_id, sid),
    bounds AS (SELECT day, s AS t, 1 AS delta FROM spans
               UNION ALL
               SELECT day, e + 1, -1 FROM spans),
    swept AS (SELECT day,
                     sum(delta) OVER (PARTITION BY day ORDER BY t, delta)
                         AS cur
              FROM bounds)
    SELECT CAST(day AS BIGINT) AS day,
           CAST((SELECT count(*) FROM spans s2 WHERE s2.day = swept.day)
                AS BIGINT) AS n_sessions,
           CAST(max(cur) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def q_streaming_peak_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end batch parity for the stateful streaming counter: the
    peak-concurrency twin run with ``flush_on_close=True`` and a
    :data:`FLUSH_SENTINEL_TS` row fed as the stream's last input — the
    finalize signal closes every open session and emits every pending
    day, so the append emissions equal the FULL batch sweep (the
    ``peak_concurrency_daily`` oracle verbatim, trailing days
    included). The events relation is pre-normalized to
    (user_id, epoch-ms) and staged to a temp dir so the sentinel file
    shares its schema; teardown removes the staging dir after the
    memory-sink rows are driver-local.
    """
    import shutil
    import tempfile

    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import (
        close_stream,
        peak_concurrency_stream,
    )

    src = _t(spark, sf_dir, "events")
    ev = src.select(
        ts_epoch_ms_col(src, "ts").cast("long").alias("__timestamp"),
        "user_id",
    ).filter(
        F.col("user_id").isNotNull() & F.col("__timestamp").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="tsf_flush_")
    try:
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        # default counter = ONE state group → keys=(): one global
        # sentinel row (with shard_keys you'd pass them here — the
        # close_stream helper exists precisely so the per-group
        # contract can't be silently under-fed, VERDICT r11 #3)
        close_stream(ev, keys=(), ts_col="__timestamp", path=f"{tmp}/in")
        stream = spark.readStream.schema(ev.schema).parquet(f"{tmp}/in")
        days = peak_concurrency_stream(
            stream, 1_800_000, flush_on_close=True
        )
        emitted = _run_availablenow_to_memory(days, "spf")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return emitted.select(
        F.col("day").cast("long").alias("day"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("peak_concurrent").cast("long").alias("peak_concurrent"),
    )


@register(
    "streaming_peak_sharded",
    # The DISTRIBUTED streaming peak (VERDICT r11 #2): hash-sharded
    # stateful sessionization emits exact gap-closed session spans
    # (state groups = user shards, NO global group), and the sweep —
    # the only part needing a total order — runs as the batch two-level
    # segment-max over the emitted spans. Flushed via per-user
    # close_stream sentinels, the composed result equals the FULL batch
    # sweep: the same oracle as streaming_peak_flush, verbatim.
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    flagged AS (SELECT user_id, t, event_id,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800000
                            THEN 1 ELSE 0 END AS is_new
                FROM ev WINDOW w AS (PARTITION BY user_id
                                     ORDER BY t, event_id)),
    sess AS (SELECT user_id,
                    sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY t, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid,
                    t
             FROM flagged),
    spans AS (SELECT min(t) AS s, max(t) AS e,
                     min(t) // 86400000 AS day
              FROM sess GROUP BY user_id, sid),
    bounds AS (SELECT day, s AS t, 1 AS delta FROM spans
               UNION ALL
               SELECT day, e + 1, -1 FROM spans),
    swept AS (SELECT day,
                     sum(delta) OVER (PARTITION BY day ORDER BY t, delta)
                         AS cur
              FROM bounds)
    SELECT CAST(day AS BIGINT) AS day,
           CAST((SELECT count(*) FROM spans s2 WHERE s2.day = swept.day)
                AS BIGINT) AS n_sessions,
           CAST(max(cur) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def q_streaming_peak_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed streaming peak-concurrency pipeline end-to-end:
    ``session_spans_stream`` (8 user-hash shards — per-shard state is
    open sessions only, no global group anywhere) finalized with
    per-user ``close_stream`` sentinels, then the batch
    ``ops.behavior.sweep_spans`` two-level segment-max composed over
    the emitted span relation. Equals the FULL batch sweep exactly —
    the serial 116.8 s single-group worst case becomes n_shards
    parallel sessionizers + a fully distributed sweep."""
    import shutil
    import tempfile

    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.ops.behavior import sweep_spans
    from timeseriesfuser_spark.streaming import (
        close_stream,
        session_spans_stream,
    )

    src = _t(spark, sf_dir, "events")
    ev = src.select(
        ts_epoch_ms_col(src, "ts").cast("long").alias("__timestamp"),
        "user_id",
    ).filter(
        F.col("user_id").isNotNull() & F.col("__timestamp").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="tsf_sps_")
    try:
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        close_stream(
            ev, keys=["user_id"], ts_col="__timestamp", path=f"{tmp}/in"
        )
        stream = spark.readStream.schema(ev.schema).parquet(f"{tmp}/in")
        spans = session_spans_stream(
            stream, 1_800_000, n_shards=8, flush_on_close=True
        )
        emitted = _run_availablenow_to_memory(spans, "sps")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return sweep_spans(
        emitted.select(
            "day",
            F.col("session_start").alias("s"),
            F.col("session_end").alias("e"),
        )
    ).select(
        F.col("day").cast("long").alias("day"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("peak_concurrent").cast("long").alias("peak_concurrent"),
    )


@register(
    "streaming_window_funnel",
    # Per-anchor funnel depths over RETIRED anchors — the streaming op's
    # emission contract: an anchor (distinct step-0 instant) emits when
    # its chain completes (depth 3) or when its window expires against
    # the user's own event-time high mark (anchor + within < the user's
    # max event ts). The oracle unrolls the same greedy per-anchor chain
    # as window_funnel_depths and applies that retirement filter.
    oracle=f"""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    um AS (SELECT u, max(t) AS umax FROM ev GROUP BY u),
    a0 AS (SELECT DISTINCT u, t AS a FROM ev WHERE ty = 'signup'),
    s1 AS (SELECT e.u, a0.a, min(e.t) AS t1 FROM ev e
           JOIN a0 ON e.u = a0.u
           WHERE e.ty = 'view' AND e.t > a0.a
             AND e.t <= a0.a + {_WF_WITHIN}
           GROUP BY e.u, a0.a),
    s2 AS (SELECT e.u, s1.a, min(e.t) AS t2 FROM ev e
           JOIN s1 ON e.u = s1.u
           WHERE e.ty = 'purchase' AND e.t > s1.t1
             AND e.t <= s1.a + {_WF_WITHIN}
           GROUP BY e.u, s1.a),
    d AS (SELECT a0.u, a0.a,
                 CASE WHEN s2.a IS NOT NULL THEN 3
                      WHEN s1.a IS NOT NULL THEN 2
                      ELSE 1 END AS depth
          FROM a0
          LEFT JOIN s1 ON s1.u = a0.u AND s1.a = a0.a
          LEFT JOIN s2 ON s2.u = a0.u AND s2.a = a0.a)
    SELECT d.u AS user_id,
           CAST(d.a AS BIGINT) AS anchor_ts,
           CAST(d.depth AS BIGINT) AS depth
    FROM d JOIN um ON um.u = d.u
    WHERE d.depth = 3 OR d.a + {_WF_WITHIN} < um.umax
    """,
)
def q_streaming_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live time-bounded funnel through the driver harness
    (streaming.window_funnel_stream, applyInPandasWithState): the
    signup → view → purchase 3-day funnel's pending-anchor set rides the
    checkpointed state; one append row per retired anchor (completed or
    window-expired against the user's event-time high mark) — the 16th
    driver-checked streaming query, the ClickHouse-windowFunnel shape
    live."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import window_funnel_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__timestamp"), "user_id", "event_type"
    ).filter(F.col("user_id").isNotNull())
    out = window_funnel_stream(
        ev, ["signup", "view", "purchase"], _WF_WITHIN, keys=["user_id"]
    )
    emitted = _run_availablenow_to_memory(out, "swf")
    return emitted.select(
        "user_id",
        F.col("anchor_ts").cast("long").alias("anchor_ts"),
        F.col("depth").cast("long").alias("depth"),
    )


@register(
    "streaming_funnel_flush",
    # The KEYED flush-parity twin of streaming_peak_flush (VERDICT r11
    # #3): window_funnel_stream finalized with flush_on_close=True and
    # ONE sentinel PER USER (close_stream builds the distinct-key
    # sentinel relation — a single hand-rolled sentinel row would flush
    # one user and strand every other user's pending anchors). With
    # every anchor retired, emissions equal the FULL per-anchor greedy
    # chain — the streaming_window_funnel oracle WITHOUT its
    # window-expiry retirement filter.
    oracle=f"""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    a0 AS (SELECT DISTINCT u, t AS a FROM ev WHERE ty = 'signup'),
    s1 AS (SELECT e.u, a0.a, min(e.t) AS t1 FROM ev e
           JOIN a0 ON e.u = a0.u
           WHERE e.ty = 'view' AND e.t > a0.a
             AND e.t <= a0.a + {_WF_WITHIN}
           GROUP BY e.u, a0.a),
    s2 AS (SELECT e.u, s1.a, min(e.t) AS t2 FROM ev e
           JOIN s1 ON e.u = s1.u
           WHERE e.ty = 'purchase' AND e.t > s1.t1
             AND e.t <= s1.a + {_WF_WITHIN}
           GROUP BY e.u, s1.a)
    SELECT a0.u AS user_id,
           CAST(a0.a AS BIGINT) AS anchor_ts,
           CAST(CASE WHEN s2.a IS NOT NULL THEN 3
                     WHEN s1.a IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS depth
    FROM a0
    LEFT JOIN s1 ON s1.u = a0.u AND s1.a = a0.a
    LEFT JOIN s2 ON s2.u = a0.u AND s2.a = a0.a
    """,
)
def q_streaming_funnel_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end batch parity for the KEYED stateful funnel: the
    signup → view → purchase stream finalized with ``flush_on_close``
    plus :func:`streaming.close_stream`'s per-user sentinel relation as
    the stream's last file — every pending in-window anchor retires at
    its (final, in-order-feed) depth, so the append emissions equal the
    complete batch per-anchor chain including the trailing anchors the
    un-flushed twin must hold back. Events are pre-normalized and
    staged to a temp dir so the sentinel file shares their schema."""
    import shutil
    import tempfile

    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import (
        close_stream,
        window_funnel_stream,
    )

    src = _t(spark, sf_dir, "events")
    ev = src.select(
        ts_epoch_ms_col(src, "ts").cast("long").alias("__timestamp"),
        "user_id",
        "event_type",
    ).filter(
        F.col("user_id").isNotNull() & F.col("__timestamp").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="tsf_ffl_")
    try:
        ev.write.mode("overwrite").parquet(f"{tmp}/in")
        close_stream(
            ev, keys=["user_id"], ts_col="__timestamp", path=f"{tmp}/in"
        )
        stream = spark.readStream.schema(ev.schema).parquet(f"{tmp}/in")
        out = window_funnel_stream(
            stream,
            ["signup", "view", "purchase"],
            _WF_WITHIN,
            keys=["user_id"],
            flush_on_close=True,
        )
        emitted = _run_availablenow_to_memory(out, "sff")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return emitted.select(
        "user_id",
        F.col("anchor_ts").cast("long").alias("anchor_ts"),
        F.col("depth").cast("long").alias("depth"),
    )
