"""Time-series analytics: OHLC/VWAP/TWAP bars, transitions, sliding
counts, z-score anomalies, rates, interpolation, EWMA.

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



@register(
    "ohlc_1h",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events),
    r AS (SELECT event_type, CAST({_ff('t', _H1GAP)} AS BIGINT) AS bar_ts,
                 t, event_id, value FROM ev),
    o AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t DESC, event_id DESC) AS rn_d
          FROM r)
    SELECT event_type, bar_ts,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM o GROUP BY event_type, bar_ts
    """,
)
def q_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, 1h) OHLC candlestick bars (ops.timeseries.ohlc_bars):
    open/close picked by min_by/max_by on a (ts, event_id) struct key — one
    hash-agg shuffle, no per-bucket window. The oracle states the same
    semantics with row_number because DuckDB's arg_min can't take a
    composite key. A2/T1/T2 generalized to candlestick shape."""
    return TS.ohlc_bars(_events(spark, sf_dir), "1h")


_D1 = 86_400_000


@register(
    "vwap_1d",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       CAST(props ->> 'k' AS BIGINT) AS w
                FROM events)
    SELECT event_type,
           CAST({_ff('t', _D1)} AS BIGINT) AS bar_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents * w) AS BIGINT) AS pw_cents,
           CAST(sum(w) AS BIGINT) AS sum_weight,
           CASE WHEN sum(w) > 0
                THEN CAST(sum(cents * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
           END AS vwap_cents
    FROM ev GROUP BY event_type, bar_ts
    """,
)
def q_vwap_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VWAP-style weighted-average bars (ops.timeseries.vwap_bars):
    price = cent-quantized value, weight = the integer JSON prop `k`. Exact
    integer numerator/denominator, one final double division. Single
    hash-agg, map-side combinable."""
    ev = _events(spark, sf_dir).withColumn(
        "weight", F.get_json_object("props", "$.k").cast("long")
    )
    return TS.vwap_bars(ev, "1d")


@register(
    "event_transitions",
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id, event_type
                FROM events),
    s AS (SELECT event_type AS next_type,
                 lag(event_type) OVER w AS prev_type,
                 t - lag(t) OVER w AS gap_ms
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
    SELECT prev_type, next_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(gap_ms) AS BIGINT) AS min_gap_ms,
           CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
           CAST(sum(gap_ms) AS BIGINT) AS sum_gap_ms,
           CAST(sum(gap_ms) AS DOUBLE) / count(*) AS avg_gap_ms
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences
    (ops.timeseries.event_transitions): lag window partitioned by user
    (small per-user partitions — embarrassingly parallel at any scale),
    then a hash-agg on the tiny (prev, next) key space. Gap stats are
    exact-integer with one final division."""
    return TS.event_transitions(_events(spark, sf_dir))


_SLIDE_L, _SLIDE_S = 3_600_000, 900_000


@register(
    "sliding_1h_15m",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
    w AS (SELECT event_type, cents,
                 unnest(generate_series({_ff('t', _SLIDE_S)} - {_SLIDE_L - _SLIDE_S},
                                        {_ff('t', _SLIDE_S)}, {_SLIDE_S}))
                   AS window_start
          FROM ev)
    SELECT event_type,
           CAST(window_start AS BIGINT) AS window_start,
           CAST(window_start + {_SLIDE_L} AS BIGINT) AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM w GROUP BY event_type, window_start
    """,
)
def q_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (ops.timeseries.sliding_counts): 1h
    windows every 15m — the batch twin of streaming F.window(ts, 1h, 15m),
    via a constant L/S=4 sequence+explode then ONE hash-agg on
    (key, window_start); map-side partial agg absorbs the fan-out."""
    return TS.sliding_counts(_events(spark, sf_dir), "1h", "15m")


_ZK, _ZMIN, _ZLOOK = 3, 3, 10


@register(
    "rolling_zscore",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
    w AS (SELECT user_id, ts, event_id, cents,
                 count(cents) OVER win AS n_base,
                 sum(cents) OVER win AS sum_base,
                 sum(cents * cents) OVER win AS sumsq_base
          FROM ev
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {_ZLOOK} PRECEDING AND 1 PRECEDING))
    SELECT user_id, ts, event_id, cents,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(sum_base AS BIGINT) AS sum_base,
           CAST(sumsq_base AS BIGINT) AS sumsq_base,
           CASE WHEN n_base >= {_ZMIN}
                THEN CAST(sum_base AS DOUBLE) / n_base END AS mean_cents,
           CASE WHEN n_base >= {_ZMIN}
                THEN sqrt(CAST(CAST(n_base AS HUGEINT) * sumsq_base - CAST(sum_base AS HUGEINT) * sum_base AS DOUBLE)
                          / CAST(n_base * (n_base - 1) AS DOUBLE)) END AS std_cents,
           CASE WHEN n_base >= {_ZMIN}
                 AND CAST(n_base AS HUGEINT) * sumsq_base - CAST(sum_base AS HUGEINT) * sum_base > 0
                THEN (CAST(n_base * cents - sum_base AS DOUBLE) / n_base)
                     / sqrt(CAST(CAST(n_base AS HUGEINT) * sumsq_base - CAST(sum_base AS HUGEINT) * sum_base AS DOUBLE)
                            / CAST(n_base * (n_base - 1) AS DOUBLE))
           END AS zscore,
           (n_base >= {_ZMIN}
            AND CAST(n_base * cents - sum_base AS HUGEINT)
                * CAST(n_base * cents - sum_base AS HUGEINT)
                * (n_base - 1)
                > CAST({_ZK * _ZK} AS HUGEINT) * n_base
                  * (CAST(n_base AS HUGEINT) * sumsq_base - CAST(sum_base AS HUGEINT) * sum_base)) AS is_anomaly
    FROM w
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags (ops.timeseries.
    rolling_anomalies): per-user 10-event baseline; the anomaly DECISION is
    the exact integer inequality (n·x−S)²·(n−1) > k²·n·(nQ−S²) — no float
    threshold — so the flag is oracle-bit-identical. One per-key window,
    no other shuffle."""
    return TS.rolling_anomalies(
        _events(spark, sf_dir), lookback=_ZLOOK, min_points=_ZMIN, k=_ZK
    )


@register(
    "rate_of_change",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
    d AS (SELECT user_id, ts, event_id, cents,
                 cents - lag(cents) OVER w AS delta_cents,
                 ts - lag(ts) OVER w AS delta_ms
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, ts, event_id, cents,
           CAST(delta_cents AS BIGINT) AS delta_cents,
           CAST(delta_ms AS BIGINT) AS delta_ms,
           CASE WHEN delta_ms > 0
                THEN CAST(delta_cents AS DOUBLE) * 1000.0
                     / CAST(delta_ms AS DOUBLE) END AS rate_cps
    FROM d WHERE delta_ms IS NOT NULL
    """,
)
def q_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user discrete derivative (ops.timeseries.value_rates): PromQL
    rate-style Δcents/Δms with one double division over exact ints. Single
    per-key lag window."""
    return TS.value_rates(_events(spark, sf_dir))


@register(
    "interpolate_1h",
    oracle=f"""
    WITH ev AS (SELECT user_id AS k, epoch_ms(ts) AS t, event_id AS seq,
                       CAST(round(value * 100) AS BIGINT) AS c FROM events),
    b AS (SELECT k, CAST({_ff(f'min(t) + {_H1 - 1}', _H1)} AS BIGINT) AS gmin,
                 CAST({_ff('max(t)', _H1)} AS BIGINT) AS gmax
          FROM ev GROUP BY k),
    g AS (SELECT k, unnest(generate_series(gmin, gmax, {_H1})) AS t
          FROM b WHERE gmin <= gmax),
    u AS (
      SELECT k, t, 0 AS side, seq, c FROM ev
      UNION ALL
      SELECT k, t, 1 AS side, NULL, NULL FROM g
    ),
    m AS (SELECT k, t, side,
            last_value(CASE WHEN side = 0 THEN struct_pack(t := t, c := c) END
                       IGNORE NULLS)
              OVER (PARTITION BY k ORDER BY t, side, seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
            first_value(CASE WHEN side = 0 THEN struct_pack(t := t, c := c) END
                        IGNORE NULLS)
              OVER (PARTITION BY k ORDER BY t, side, seq
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
          FROM u)
    SELECT k AS user_id, CAST(t AS BIGINT) AS grid_ts,
           CASE WHEN (prev).t = t THEN CAST((prev).c AS DOUBLE)
                ELSE CAST((prev).c AS DOUBLE)
                     + CAST(((nxt).c - (prev).c) * (t - (prev).t) AS DOUBLE)
                       / CAST((nxt).t - (prev).t AS DOUBLE) END AS interp_cents,
           ((prev).t = t) AS exact_hit,
           CAST((prev).t AS BIGINT) AS prev_ts,
           CASE WHEN (prev).t != t THEN CAST((nxt).t AS BIGINT) END AS next_ts
    FROM m
    WHERE side = 1 AND prev IS NOT NULL AND ((prev).t = t OR nxt IS NOT NULL)
    """,
)
def q_interpolate_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation onto the hourly grid (ops.timeseries.
    interpolate_grid): straight-line value between the bracketing events of
    each per-user grid point — exact-int numerator/denominator, one double
    division. Chunked spine + diagonal union + two per-key windows; the
    extrapolating cousin is the engine's forward-fill resample (T3/W2)."""
    return TS.interpolate_grid(_events(spark, sf_dir), "1h")


@register(
    "twap_1d",
    oracle=f"""
    WITH ev AS (SELECT user_id AS k, epoch_ms(ts) AS t, event_id AS seq,
                       CAST(round(value * 100) AS BIGINT) AS c FROM events),
    seg AS (SELECT k, c, t AS s,
                   coalesce(lead(t) OVER (PARTITION BY k ORDER BY t, seq),
                            (SELECT max(t) FROM ev)) AS e
            FROM ev),
    ex AS (SELECT k, c, s, e,
                  unnest(generate_series({_fdiv('s', _D1)}, {_fdiv('(e - 1)', _D1)})) AS b
           FROM seg WHERE e > s),
    agg AS (SELECT k, b,
                   sum(least(e, (b + 1) * {_D1}) - greatest(s, b * {_D1}))
                     AS dur_ms,
                   sum(c * (least(e, (b + 1) * {_D1}) - greatest(s, b * {_D1})))
                     AS tw
            FROM ex GROUP BY k, b)
    SELECT k AS user_id, CAST(b * {_D1} AS BIGINT) AS bar_ts,
           CAST(dur_ms AS BIGINT) AS dur_ms,
           CAST(tw AS BIGINT) AS tw_cents,
           CAST(tw AS DOUBLE) / CAST(dur_ms AS DOUBLE) AS twap_cents
    FROM agg
    """,
)
def q_twap_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily TIME-weighted average value per user (ops.timeseries.
    twap_bars): the integral of the LOCF value over each day — a value held
    for hours outweighs a flurry of short-lived ones. Per-key lead window +
    bounded segment-over-bucket explode + one hash-agg; exact-int
    cents·duration sums, one double division."""
    return TS.twap_bars(_events(spark, sf_dir), "1d")


_EWMA_A = 0.25


@register(
    "ewma_user",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id AS k, epoch_ms(ts) AS t, event_id AS seq,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS rn
        FROM events),
    r AS (
        SELECT k, t, seq, cents, rn, CAST(cents AS DOUBLE) AS ewma
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.k, e.t, e.seq, e.cents, e.rn,
               {_EWMA_A} * e.cents + {1.0 - _EWMA_A} * r.ewma
        FROM ev e JOIN r ON e.k IS NOT DISTINCT FROM r.k AND e.rn = r.rn + 1
    )
    SELECT k AS user_id, t AS ts, seq AS event_id, cents, ewma FROM r
    """,
)
def q_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (ops.timeseries.ewma): a genuinely recursive operator
    (each row depends on the previous OUTPUT) — the sanctioned
    applyInPandas case, per-key Arrow groups. The oracle steps the same
    recursion with a recursive CTE; α = 0.25 is exactly representable so
    the identical IEEE mult-mult-add chain matches bit-for-bit."""
    return TS.ewma(_events(spark, sf_dir), alpha=_EWMA_A)


# ---------------------------------------------------------------------------
# round 7: bar rollup identity, drawdown, Donchian channel
# ---------------------------------------------------------------------------


@register(
    "ohlc_1d_rollup",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events),
    r AS (SELECT event_type, CAST({{d1}} AS BIGINT) AS bar_ts,
                 t, event_id, value FROM ev),
    o AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t DESC, event_id DESC) AS rn_d
          FROM r)
    SELECT event_type, bar_ts,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM o GROUP BY event_type, bar_ts
    """.format(d1=_ff("t", _D1)),
)
def q_ohlc_1d_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar rollup (materialized-view maintenance identity): the
    QUERY composes rollup_ohlc(ohlc_bars(ev,'1h'), '1d') — fine bars
    aggregated to coarse, never rescanning events — while the ORACLE
    computes daily OHLC directly from raw events. Equality IS the
    incremental-rollup correctness property (open/close compose through
    min_by/max_by on the fine bar_ts; high/low/counts associatively)."""
    ev = _events(spark, sf_dir)
    fine = TS.ohlc_bars(ev, "1h")
    return TS.rollup_ohlc(fine, "1d").select(
        "event_type", "bar_ts", "open", "high", "low", "close",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )


@register(
    "user_drawdown",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
    dd AS (SELECT user_id, ts, event_id, cents,
                  max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS peak_cents
           FROM ev)
    SELECT user_id,
           CAST(max(peak_cents - cents) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak_cents) AS BIGINT) AS peak_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM dd GROUP BY user_id
    """,
)
def q_user_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown from the running peak
    (ops.timeseries.drawdown): one per-key running-max window (incremental
    frame — O(n) per partition) + one hash-agg. Integer cents throughout;
    the risk metric every portfolio/telemetry monitor computes."""
    dd = TS.drawdown(_events(spark, sf_dir))
    return dd.groupBy("user_id").agg(
        F.max("drawdown_cents").cast("long").alias("max_drawdown_cents"),
        F.max("peak_cents").cast("long").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DON_N = 20


@register(
    "donchian_20",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
    SELECT user_id, ts, event_id, cents,
           CAST(min(cents) OVER w AS BIGINT) AS chan_lo,
           CAST(max(cents) OVER w AS BIGINT) AS chan_hi,
           CAST(max(cents) OVER w - min(cents) OVER w AS BIGINT) AS chan_width
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_DON_N - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_donchian_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian-channel trailing extrema (ops.timeseries.rolling_extrema):
    per-user 20-row trailing min/max/width — the breakout-detection
    primitive. One window pass, running frames stay incremental."""
    return TS.rolling_extrema(_events(spark, sf_dir), _DON_N)


@register(
    "streaming_ohlc_1h",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events),
    r AS (SELECT event_type, CAST({_ff('t', _H1GAP)} AS BIGINT) AS bar_ts,
                 t, event_id, value FROM ev),
    o AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bar_ts
                                    ORDER BY t DESC, event_id DESC) AS rn_d
          FROM r)
    SELECT event_type, bar_ts,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM o
    GROUP BY event_type, bar_ts
    -- append mode emits exactly the windows whose END has passed the
    -- final watermark (= max event time at 0s delay)
    HAVING bar_ts + {_H1GAP} <= (SELECT max(t) FROM ev)
    """,
)
def q_streaming_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming candlesticks driven THROUGH the driver
    harness (streaming.ohlc_stream): availableNow file stream →
    watermarked tumbling OHLC bars → memory sink. Append mode emits
    exactly the windows whose end <= final watermark (max event time, 0s
    delay) — the oracle is the batch ohlc_1h oracle with that HAVING
    clause; on this bounded fixture every bar but the final partial one
    is emitted, row-identical to the batch op."""
    import shutil
    import tempfile
    import uuid

    from timeseriesfuser_spark.streaming import ohlc_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__ts_ms"), "event_id", "event_type", "value"
    )
    agg = ohlc_stream(ev, "1h", ts_col="__ts_ms")
    name = f"so_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="tsf_ckpt_")
    q = None
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise TimeoutError(
                "streaming_ohlc_1h: query still running after 300s"
            )
        if q.exception() is not None:
            raise q.exception()
        # Memory-sink rows already live on the driver; materialize into a
        # plain local DataFrame so the sink table and query can be torn
        # down here instead of leaking for the session.
        sink = spark.table(name)
        return spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        if q is not None and q.isActive:
            q.stop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)


_LTTB_NB = 16
_LTTB_SCALE = 10**6


@register(
    "lttb_downsample_16",
    oracle=f"""
    WITH p AS (
        SELECT event_type, epoch_ms(ts) AS x, value,
               CAST(round(value * {_LTTB_SCALE}) AS BIGINT) AS yq
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    b AS (SELECT event_type, min(x) AS mn, max(x) AS mx
          FROM p GROUP BY 1),
    q AS (
        SELECT p.event_type, p.x - b.mn AS x0, p.x AS ts, p.value, p.yq,
               -- BIGINT // truncates toward zero; operands >= 0 so it is
               -- the floor here (the _ff idiom is not needed)
               CASE WHEN b.mx > b.mn
                    THEN (p.x - b.mn) * {_LTTB_NB} // (b.mx - b.mn + 1)
                    ELSE 0 END AS slot
        FROM p JOIN b ON p.event_type IS NOT DISTINCT FROM b.event_type
    ),
    s AS (SELECT event_type, slot, sum(x0) AS sx, sum(yq) AS sy,
                 count(*) AS n, min(x0) AS mnx
          FROM q GROUP BY 1, 2),
    w AS (
        SELECT *,
               lag(sx)  OVER wk AS psx, lag(sy) OVER wk AS psy,
               lag(n)   OVER wk AS pn,  lag(mnx) OVER wk AS pmn,
               lead(sx) OVER wk AS nsx, lead(sy) OVER wk AS nsy,
               lead(n)  OVER wk AS nn,
               row_number() OVER wk AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM s
        WINDOW wk AS (PARTITION BY event_type ORDER BY slot)
    ),
    j AS (
        SELECT q.event_type, q.ts, q.value, q.slot, q.yq,
               CASE WHEN w.rn > 1 AND w.rn < w.cnt THEN abs(
                   (CAST(w.psx - w.pn * w.pmn AS HUGEINT) * w.nn
                    - CAST(w.nsx - w.nn * w.pmn AS HUGEINT) * w.pn)
                   * (CAST(q.yq AS HUGEINT) * w.pn - w.psy)
                 - (CAST(w.psx - w.pn * w.pmn AS HUGEINT)
                    - CAST(q.x0 - w.pmn AS HUGEINT) * w.pn)
                   * (CAST(w.nsy AS HUGEINT) * w.pn
                      - CAST(w.psy AS HUGEINT) * w.nn))
               ELSE CAST(0 AS HUGEINT) END AS o1,
               CASE WHEN w.rn = w.cnt AND w.rn > 1 THEN q.x0
                    ELSE -q.x0 END AS o2
        FROM q JOIN w ON q.event_type IS NOT DISTINCT FROM w.event_type
                     AND q.slot = w.slot
    )
    SELECT event_type, ts, value, CAST(slot AS BIGINT) AS slot
    FROM j
    QUALIFY row_number() OVER (PARTITION BY event_type, slot
                               ORDER BY o1 DESC, o2 DESC, yq DESC) = 1
    """,
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB visualization downsampling (ops.timeseries.lttb_downsample):
    <= 16 shape-preserving points per event_type. The oracle replicates
    the parallel variant exactly — equal-time slots, neighbor-slot
    centroid anchors, cross-multiplied integer areas in HUGEINT (Spark:
    decimal(38,0)), first/last slot pinned to earliest/latest point,
    ties to earliest ts then largest quantized value."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    out = TS.lttb_downsample(
        ev, _LTTB_NB, ts_col="ts", key_cols=["event_type"],
        value_col="value", scale=_LTTB_SCALE,
    )
    return out.select(
        "event_type", F.col("ts").cast("long").alias("ts"), "value",
        F.col("slot").cast("long").alias("slot"),
    )


_XC_LAGS = [-2, -1, 0, 1, 2]


@register(
    "crosscorr_click_purchase",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type IN ('click', 'purchase')
    ),
    g AS (
        SELECT event_type AS k,
               CAST({_ff('t', _H1GAP)} AS BIGINT) AS b,
               CAST(round(value * 100) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY event_type, {_ff('t', _H1GAP)}
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev
    ),
    l AS (SELECT k, b, v FROM g WHERE rn = 1),
    lag_list AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
    a AS (SELECT lag, b + lag * {_H1GAP} AS bb, v AS x
          FROM l, lag_list WHERE k = 'click'),
    bb AS (SELECT b AS bb, v AS y FROM l WHERE k = 'purchase'),
    p AS (SELECT lag, x, y FROM a JOIN bb USING (bb)),
    s AS (SELECT lag, count(*) AS n,
                 sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM p GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS pearson_r,
           CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n2
    FROM s
    """,
)
def q_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (ops.timeseries.lagged_crosscorr):
    Pearson r of (click bar-close at t, purchase bar-close at t+lag) on
    the 1h grid for lags -2..2. Every Σ is an exact integer
    (decimal(38,0) / HUGEINT), one final double chain; the lag fan-out
    and the join run on the AGGREGATED bar grain only."""
    ev = _events(spark, sf_dir)
    return TS.lagged_crosscorr(
        ev, "click", "purchase", _XC_LAGS, "1h",
        ts_col="ts", key_col="event_type", value_col="value",
        seq_col="event_id",
    )


_RC_W = 7
_D1GAP = 86_400_000


@register(
    "rolling_corr_7d",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type IN ('click', 'purchase')
    ),
    g AS (
        SELECT event_type AS k,
               CAST({_ff('t', _D1GAP)} AS BIGINT) AS b,
               CAST(round(value * 100) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY event_type, {_ff('t', _D1GAP)}
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev
    ),
    l AS (SELECT k, b, v FROM g WHERE rn = 1),
    p AS (
        SELECT a.b AS bar_ts, a.v AS x, bb.v AS y
        FROM l a JOIN l bb ON a.b = bb.b
        WHERE a.k = 'click' AND bb.k = 'purchase'
    ),
    s AS (
        SELECT bar_ts,
               count(*) OVER w AS n,
               sum(CAST(x AS HUGEINT)) OVER w AS sx,
               sum(CAST(y AS HUGEINT)) OVER w AS sy,
               sum(CAST(x AS HUGEINT) * y) OVER w AS sxy,
               sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
               sum(CAST(y AS HUGEINT) * y) OVER w AS syy
        FROM p
        WINDOW w AS (ORDER BY bar_ts
                     ROWS BETWEEN {_RC_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT bar_ts, CAST(n AS BIGINT) AS n_bars,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS pearson_r
    FROM s
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-bar Pearson correlation of click vs purchase daily bar
    closes (ops.timeseries.rolling_corr): frame counts co-present bars
    (trading-day convention), all rolling sums in decimal(38,0) /
    HUGEINT, one final double chain; the join and window run on the
    aligned daily-bar grain only."""
    ev = _events(spark, sf_dir)
    return TS.rolling_corr(
        ev, "click", "purchase", _RC_W, "1d",
        ts_col="ts", key_col="event_type", value_col="value",
        seq_col="event_id",
    )


@register(
    "value_drift_bins",
    oracle="""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_type, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT (min(t) + max(t)) // 2 AS mid FROM ev),
    b AS (
        SELECT event_type,
               CASE WHEN value < 0.0 THEN CAST(-1 AS BIGINT)
                    WHEN value >= 100.0 THEN CAST(10 AS BIGINT)
                    ELSE least(CAST(floor((value - 0.0) * 10 / 100.0)
                                    AS BIGINT), CAST(9 AS BIGINT)) END AS bin,
               CAST(count(CASE WHEN t < mid THEN 1 END) AS BIGINT) AS n_base,
               CAST(count(CASE WHEN t >= mid THEN 1 END) AS BIGINT) AS n_cur
        FROM ev, m GROUP BY 1, 2
    ),
    w AS (
        SELECT *, sum(n_base) OVER (PARTITION BY event_type) AS tb,
                  sum(n_cur) OVER (PARTITION BY event_type) AS tc
        FROM b
    )
    SELECT event_type, bin, n_base, n_cur,
           CASE WHEN tb > 0
                THEN CAST(n_base * 1000000 // tb AS BIGINT) END AS p_ppm,
           CASE WHEN tc > 0
                THEN CAST(n_cur * 1000000 // tc AS BIGINT) END AS q_ppm
    FROM w
    """,
)
def q_value_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift bins (ops.timeseries.psi_drift): per-(event_type, bin)
    baseline-vs-current distribution of value, split at the series
    midpoint timestamp. ONE conditional-agg scan to the #keys x 12
    grain; shares are integer DIV ppm. The op's ln-based psi_term is
    deliberately OFF this oracle surface (libm last-ulp divergence —
    same policy as hll_estimate_corrected); the driver checks the exact
    count/ppm columns."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    b = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).first()
    mid = (int(b["mn"]) + int(b["mx"])) // 2
    out = TS.psi_drift(
        ev, mid, ts_col="ts", value_col="value",
        key_cols=["event_type"], lo=0.0, hi=100.0, bins=10,
    )
    return out.select(
        "event_type", "bin", "n_base", "n_cur", "p_ppm", "q_ppm"
    )


_CUSUM_H, _CUSUM_MP = 400, 20


@register(
    "cusum_value_shift",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, epoch_ms(ts) AS t, event_id,
               CAST(round(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    tot AS (SELECT event_type, sum(x) AS s, count(*) AS n
            FROM ev GROUP BY 1),
    p AS (
        SELECT ev.*, tot.s, tot.n,
               sum(x) OVER (PARTITION BY ev.event_type
                            ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) AS st,
               row_number() OVER (PARTITION BY ev.event_type
                                  ORDER BY t, event_id) AS ti
        FROM ev JOIN tot USING (event_type)
    )
    SELECT event_type, CAST(t AS BIGINT) AS ts,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(ti AS BIGINT) AS n_seen,
           CAST(st::HUGEINT * n - ti::HUGEINT * s AS DOUBLE)
               / (CAST(ti AS DOUBLE) * n) AS cusum_cents
    FROM p
    WHERE ti >= {_CUSUM_MP}
      AND abs(st::HUGEINT * n - ti::HUGEINT * s)
          > {_CUSUM_H} * ti::HUGEINT * n
    """,
)
def q_cusum_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift flags (ops.timeseries.cusum_shifts): rows
    whose running mean deviates from the key's series mean by more than
    4.00 (400 cents), after a 20-row warm-up. The flag is the exact
    cross-multiplied integer test |S_t·n − t·S| > h·t·n in
    decimal(38,0)/HUGEINT; cusum_cents is the one final double chain."""
    ev = _events(spark, sf_dir)
    return TS.cusum_shifts(
        ev, _CUSUM_H, ts_col="ts", key_cols=["event_type"],
        value_col="value", seq_col="event_id", min_points=_CUSUM_MP,
    )


@register(
    "streaming_vwap_1d",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(props ->> 'k' AS BIGINT) AS w
        FROM events
    )
    SELECT event_type,
           CAST({_ff('t', 86_400_000)} AS BIGINT) AS bar_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents * w) AS BIGINT) AS pw_cents,
           CAST(sum(w) AS BIGINT) AS sum_weight,
           CASE WHEN sum(w) > 0
                THEN CAST(sum(cents * w) AS DOUBLE)
                     / CAST(sum(w) AS DOUBLE) END AS vwap_cents
    FROM ev GROUP BY event_type, bar_ts
    -- append mode emits exactly the windows whose END has passed the
    -- final watermark (= max event time at 0s delay)
    HAVING bar_ts + 86_400_000 <= (SELECT max(t) FROM ev)
    """,
)
def q_streaming_vwap_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming daily VWAP bars driven THROUGH the driver
    harness (streaming.vwap_stream): availableNow file stream →
    watermarked tumbling weighted bars → memory sink. Append mode emits
    exactly the windows whose end <= final watermark (max event time,
    0s delay) — the oracle is the batch vwap oracle with that HAVING
    clause (same emission contract as streaming_ohlc_1h)."""
    import shutil
    import tempfile
    import uuid

    from timeseriesfuser_spark.streaming import vwap_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__ts_ms"),
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("weight"),
    )
    agg = vwap_stream(ev, "1d", ts_col="__ts_ms")
    name = f"sv_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="tsf_ckpt_")
    q = None
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise TimeoutError(
                "streaming_vwap_1d: query still running after 300s"
            )
        if q.exception() is not None:
            raise q.exception()
        sink = spark.table(name)
        return spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        if q is not None and q.isActive:
            q.stop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)


_ACF_MAXLAG = 5


@register(
    "acf_value_1d",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_id, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type = 'click'
    ),
    g AS (
        SELECT CAST({_ff('t', _D1GAP)} AS BIGINT) AS b,
               CAST(round(value * 100) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY {_ff('t', _D1GAP)}
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev
    ),
    l AS (SELECT b, v FROM g WHERE rn = 1),
    st AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s FROM l),
    c AS (SELECT b, CAST(n AS HUGEINT) * v - s AS c, n FROM l, st),
    den AS (SELECT sum(c * c) AS den, max(n) AS n FROM c),
    lag_list AS (SELECT unnest([1, 2, 3, 4, 5]) AS lag),
    a AS (SELECT lag, b + lag * {_D1GAP} AS bb, c AS ca FROM c, lag_list),
    b2 AS (SELECT b AS bb, c AS cb FROM c),
    num AS (
        SELECT lag, count(*) AS n_pairs, sum(ca * cb) AS num
        FROM a JOIN b2 USING (bb) GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(den.n AS BIGINT) AS n_bars,
           CASE WHEN den.den > 0 AND n_pairs >= 1
                THEN CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)
           END AS acf
    FROM num, den
    """,
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (ops.timeseries.acf_bars): global-mean
    ACF of the 'click' daily bar-close series at lags 1..5 —
    numerator/denominator are exact cross-multiplied integers
    (Σ(n·x−S)(n·x'−S) / Σ(n·x−S)², decimal(38,0)/HUGEINT), one double
    division per lag; everything after the bar compaction runs on the
    AGGREGATED bar grain."""
    ev = _events(spark, sf_dir)
    return TS.acf_bars(
        ev, "click", _ACF_MAXLAG, "1d",
        ts_col="ts", key_col="event_type", value_col="value",
        seq_col="event_id",
    )


@register(
    "robust_outlier_summary",
    oracle="""
    WITH v AS (
        SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    nr AS (SELECT g, count(*) AS n FROM v GROUP BY g),
    r AS (SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v) AS rn
          FROM v),
    med AS (
        SELECT r.g,
               CAST(sum(CASE WHEN (n + 1) // 2 = (n + 2) // 2
                             THEN v * 2 ELSE v END) AS BIGINT) AS med2
        FROM r JOIN nr ON r.g = nr.g
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY r.g
    ),
    d AS (
        SELECT v.g, abs(v.v * 2 - med.med2) AS dev, med.med2 AS med2
        FROM v JOIN med ON v.g = med.g
    ),
    rd AS (SELECT g, dev,
                  row_number() OVER (PARTITION BY g ORDER BY dev) AS rn
           FROM d),
    mad AS (
        SELECT rd.g,
               CAST(sum(CASE WHEN (n + 1) // 2 = (n + 2) // 2
                             THEN dev * 2 ELSE dev END) AS BIGINT) AS mad4
        FROM rd JOIN nr ON rd.g = nr.g
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY rd.g
    )
    SELECT d.g AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           d.med2 AS med_x2,
           mad.mad4 AS mad_x4,
           CAST(sum(CASE WHEN d.dev * 2 > 3 * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad ON d.g = mad.g
    GROUP BY d.g, d.med2, mad.mad4
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier summary per event_type
    (ops.timeseries.robust_outlier_summary, k=3): doubled median and
    doubled-MAD are exact integer order statistics (med_x2 = sum of the
    two middle order stats; mad_x4 likewise over doubled deviations);
    the outlier decision 2·dev > k·mad_x4 is all-integer — every output
    column BIGINT, zero float surface."""
    ev = _events(spark, sf_dir)
    return TS.robust_outlier_summary(
        ev, group_col="event_type", value_col="value", k=3, ts_col="ts"
    )


_SN_SEASON = 7


@register(
    "seasonal_error_7d",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type IS NOT NULL
    ),
    g AS (
        SELECT event_type AS k,
               CAST({_ff('t', _D1GAP)} AS BIGINT) AS b,
               CAST(round(value * 100) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY event_type, {_ff('t', _D1GAP)}
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM ev
    ),
    l AS (SELECT k, b, v FROM g WHERE rn = 1),
    p AS (
        SELECT cur.k, cur.v AS x, pr.v AS pv
        FROM l cur
        JOIN l pr ON cur.k = pr.k
                 AND pr.b + {_SN_SEASON} * {_D1GAP} = cur.b
    ),
    s AS (
        SELECT k, count(*) AS n_pairs,
               CAST(sum(abs(x - pv)) AS BIGINT) AS sum_abs_err,
               CAST(sum(x - pv) AS BIGINT) AS sum_err
        FROM p GROUP BY k
    )
    SELECT k AS event_type,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           sum_abs_err, sum_err,
           CAST(sum_abs_err AS DOUBLE) / CAST(n_pairs AS DOUBLE)
               AS mae_cents,
           CAST(sum_err AS DOUBLE) / CAST(n_pairs AS DOUBLE)
               AS bias_cents
    FROM s
    """,
)
def q_seasonal_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast error (ops.timeseries.seasonal_naive_error):
    per event_type, predict each daily bar close by the close 7 days
    earlier; MAE/bias over the bars whose seasonal predecessor exists.
    Error sums are exact BIGINT cents; mae/bias are one double division
    each; the seasonal self-join runs on the aggregated bar grain."""
    ev = _events(spark, sf_dir)
    return TS.seasonal_naive_error(
        ev, _SN_SEASON, "1d",
        ts_col="ts", key_col="event_type", value_col="value",
        seq_col="event_id",
    )


def _pctl_case(num: int, den: int) -> str:
    # frac carries its OWN parens: `v * frac` must not rebind as
    # `(v * ...) % den` (multiplication and modulo share precedence)
    lo = f"(({num} * (n - 1)) // {den} + 1)"
    frac = f"(({num} * (n - 1)) % {den})"
    return (
        f"CAST(sum(CASE WHEN rn = {lo} THEN v * ({den} - {frac}) "
        f"WHEN {frac} > 0 AND rn = {lo} + 1 THEN v * {frac} END) "
        f"AS BIGINT) AS p{num}_{den}_x{den}"
    )


@register(
    "value_percentiles_by_type",
    oracle=f"""
    WITH v AS (
        SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    nr AS (SELECT g, count(*) AS n FROM v GROUP BY g),
    r AS (SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v) AS rn
          FROM v),
    j AS (SELECT r.g, r.v, r.rn, nr.n FROM r JOIN nr ON r.g = nr.g)
    SELECT g AS event_type,
           CAST(max(n) AS BIGINT) AS n,
           {_pctl_case(1, 2)},
           {_pctl_case(9, 10)},
           {_pctl_case(99, 100)}
    FROM j GROUP BY g
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type percentiles (ops.timeseries.exact_percentiles):
    the linear-interpolation p50/p90/p99 of cent values as EXACT scaled
    integers — den·Q_p = x_(lo+1)·(den−frac) + x_(lo+2)·frac with
    lo/frac from integer division of num·(n−1) by den (the
    doubled-median trick generalized to any rational p). Every output
    BIGINT; one rank window per group; no float anywhere."""
    ev = _events(spark, sf_dir)
    return TS.exact_percentiles(
        ev, ((1, 2), (9, 10), (99, 100)),
        group_col="event_type", value_col="value",
    )


@register(
    "streaming_anomaly_zscore",
    # Emission contract: one row per event (key ordered by ts, event_id
    # inside each micro-batch; availableNow over one parquet file = one
    # batch, so the baseline ring buffer sees the full event-time order
    # and the flags are bit-identical to the batch window). NULL
    # ts/seq/value/key rows are filtered on both sides — the stream's
    # exact-int state machine has no place for them.
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
                WHERE value IS NOT NULL AND ts IS NOT NULL
                  AND user_id IS NOT NULL AND event_id IS NOT NULL),
    w AS (SELECT user_id, ts, event_id, cents,
                 count(*) OVER win AS n_base,
                 sum(cents) OVER win AS s,
                 sum(cents * cents) OVER win AS q
          FROM ev
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {_ZLOOK} PRECEDING AND 1 PRECEDING))
    SELECT user_id, ts, event_id, cents,
           CAST(n_base AS BIGINT) AS n_base,
           (n_base >= {_ZMIN}
            AND CAST(n_base * cents - s AS HUGEINT)
                * CAST(n_base * cents - s AS HUGEINT) * (n_base - 1)
                > CAST({_ZK * _ZK} AS HUGEINT) * n_base
                  * (CAST(n_base AS HUGEINT) * q
                     - CAST(s AS HUGEINT) * s)) AS is_anomaly
    FROM w
    """,
)
def q_streaming_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming anomaly flags driven THROUGH the driver harness
    (streaming.anomaly_stream, applyInPandasWithState): per-user trailing
    z-score ring buffer carried in the state store; the anomaly DECISION
    is the same exact integer inequality as the batch op, so stream ==
    batch bit-for-bit on the chronological availableNow replay."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import anomaly_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = (
        stream.select(
            "user_id",
            ts_ms.cast("long").alias("ts"),
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(
            F.col("cents").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
    )
    flags = anomaly_stream(
        ev, keys=["user_id"], ts_col="ts", seq_col="event_id",
        cents_col="cents", lookback=_ZLOOK, min_points=_ZMIN, k=_ZK,
    )
    return _run_availablenow_to_memory(flags, "sa")


_HOLT_A, _HOLT_B = 0.25, 0.25


@register(
    "holt_user",
    # The trend row recomputes the level expression verbatim (DuckDB has
    # no lateral alias into the same recursive SELECT) — deterministic,
    # so the recomputed double is bit-identical to the one emitted.
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id AS k, epoch_ms(ts) AS t, event_id AS seq,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS rn
        FROM events),
    r AS (
        SELECT k, t, seq, cents, rn,
               CAST(cents AS DOUBLE) AS level,
               CAST(0 AS DOUBLE) AS trend
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.k, e.t, e.seq, e.cents, e.rn,
               {_HOLT_A} * e.cents + {1.0 - _HOLT_A} * (r.level + r.trend),
               {_HOLT_B} * (({_HOLT_A} * e.cents
                             + {1.0 - _HOLT_A} * (r.level + r.trend))
                            - r.level)
               + {1.0 - _HOLT_B} * r.trend
        FROM ev e JOIN r ON e.k IS NOT DISTINCT FROM r.k AND e.rn = r.rn + 1
    )
    SELECT k AS user_id, t AS ts, seq AS event_id, cents,
           level, trend, level + trend AS forecast
    FROM r
    """,
)
def q_holt_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double exponential smoothing
    (ops.timeseries.holt_linear): level + linear trend + one-step-ahead
    forecast — the trend-aware upgrade over ewma_user, same recursive
    applyInPandas/recursive-CTE determinism contract (α = β = 0.25
    exactly representable → bit-identical IEEE chains)."""
    return TS.holt_linear(
        _events(spark, sf_dir), alpha=_HOLT_A, beta=_HOLT_B
    )


@register(
    "event_lateness_stats",
    oracle="""
    WITH ev AS (SELECT event_type AS g, epoch_ms(ts) AS t, event_id
                FROM events
                WHERE ts IS NOT NULL AND event_id IS NOT NULL),
    w AS (SELECT g,
                 greatest(coalesce(max(t) OVER (
                     PARTITION BY g ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     - t, 0), 0) AS late
          FROM ev)
    SELECT g AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS late_ppm,
           CAST(max(late) AS BIGINT) AS max_late_ms,
           CAST(sum(late) AS BIGINT) AS sum_late_ms
    FROM w GROUP BY g
    """,
)
def q_event_lateness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival profile per event type
    (ops.timeseries.lateness_stats): event_id as arrival order, lateness
    = event-time high-water mark ahead of each row — the exact-integer
    measurement that sizes a streaming watermark delay (max_late_ms is
    the no-drop bound). One running-max window + one hash-agg."""
    return TS.lateness_stats(_events(spark, sf_dir))


_PAGE_S, _PAGE_H = 50, 500


@register(
    "cusum_user",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id AS k, epoch_ms(ts) AS t, event_id AS seq,
               CAST(round(value * 100) AS BIGINT) AS cents,
               first_value(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS ref,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS rn
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL),
    r AS (
        SELECT k, t, seq, cents, rn,
               greatest(0, cents - ref - {_PAGE_S}) AS sp_raw,
               greatest(0, ref - cents - {_PAGE_S}) AS sn_raw,
               CASE WHEN greatest(0, cents - ref - {_PAGE_S}) >= {_PAGE_H}
                      OR greatest(0, ref - cents - {_PAGE_S}) >= {_PAGE_H}
                    THEN 1 ELSE 0 END AS alarm,
               ref
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.k, e.t, e.seq, e.cents, e.rn,
               greatest(0, (CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp_raw END)
                           + e.cents - e.ref - {_PAGE_S}),
               greatest(0, (CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn_raw END)
                           + e.ref - e.cents - {_PAGE_S}),
               CASE WHEN
                 greatest(0, (CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp_raw END)
                             + e.cents - e.ref - {_PAGE_S}) >= {_PAGE_H}
                 OR greatest(0, (CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn_raw END)
                             + e.ref - e.cents - {_PAGE_S}) >= {_PAGE_H}
               THEN 1 ELSE 0 END,
               e.ref
        FROM ev e JOIN r ON e.k IS NOT DISTINCT FROM r.k AND e.rn = r.rn + 1
    )
    SELECT k AS user_id, t AS ts, seq AS event_id, cents,
           CAST(sp_raw AS BIGINT) AS cusum_pos,
           CAST(sn_raw AS BIGINT) AS cusum_neg,
           CAST(alarm AS BIGINT) AS alarm
    FROM r
    """,
)
def q_cusum_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user two-sided integer CUSUM drift detection
    (ops.timeseries.cusum_changepoints): level-shift-from-baseline with
    slack 50¢ and alarm threshold 500¢, both sides resetting after an
    alarm. Genuinely recursive (previous OUTPUT feeds each row) — the
    sanctioned per-key Arrow applyInPandas case; ALL arithmetic is
    integer max(0, ·) chains, so the recursive-CTE oracle matches with
    no float involved at all."""
    return TS.cusum_changepoints(
        _events(spark, sf_dir),
        slack_cents=_PAGE_S,
        threshold_cents=_PAGE_H,
    )


@register(
    "theil_sen_daily",
    # Mirrors ops.timeseries.theil_sen_trend exactly: last-cent daily
    # bars (row_number formulation — DuckDB arg_max can't take a struct
    # key), pairwise slope_u = dv*1e6 // dd (both engines truncate
    # integer division toward zero, negatives agree), doubled-median
    # order stats.
    oracle="""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) // 86400000 AS d,
                       CAST(round(value * 100) AS BIGINT) AS v,
                       epoch_ms(ts) AS t, event_id AS s
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                  AND event_type IS NOT NULL),
    bars AS (SELECT k, d, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY k, d
                                              ORDER BY t DESC, s DESC) AS rnk
                 FROM ev) WHERE rnk = 1),
    slopes AS (SELECT a.k, CAST(CAST(b.v - a.v AS HUGEINT) * 1000000
                                // (b.d - a.d) AS BIGINT) AS sl
               FROM bars a JOIN bars b ON a.k = b.k AND a.d < b.d),
    cnt AS (SELECT k, count(*) AS n FROM slopes GROUP BY k),
    rn AS (SELECT s.k, sl, n,
                  row_number() OVER (PARTITION BY s.k ORDER BY sl) AS rnk
           FROM slopes s JOIN cnt ON cnt.k = s.k),
    med AS (SELECT k, n,
                   CAST(sum(CASE WHEN (n + 1) // 2 = (n + 2) // 2
                                 THEN sl * 2 ELSE sl END) AS BIGINT)
                       AS slope_x2_u
            FROM rn WHERE rnk = (n + 1) // 2 OR rnk = (n + 2) // 2
            GROUP BY k, n),
    nb AS (SELECT k, count(*) AS n_bars FROM bars GROUP BY k)
    SELECT nb.k AS event_type, CAST(n_bars AS BIGINT) AS n_bars,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_pairs, slope_x2_u
    FROM nb LEFT JOIN med ON med.k = nb.k
    """,
)
def q_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type
    (ops.timeseries.theil_sen_trend): median of all pairwise daily-bar
    slopes in exact integer micro-cent-per-day units (doubled-median
    order stats, no float surface) — the outlier-immune complement to
    holt_user's recursive level/trend fit. Pair space is bars², bounded
    by span/interval, never corpus rows."""
    from timeseriesfuser_spark.ops.timeseries import theil_sen_trend

    return theil_sen_trend(_events(spark, sf_dir), "1d")


@register(
    "session_error_overlap",
    # Naive range-join oracle (the O(n·m) overlap predicate stated
    # directly) — parity proves the chunked equi-join + first-shared-
    # chunk election is exactly the overlap relation.
    oracle="""
    WITH ev AS (SELECT user_id AS u, epoch_ms(ts) AS t, event_type AS ty
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    act AS (SELECT u AS user_id,
                   t // 86400000 AS a_day,
                   min(t) AS a_start, max(t) + 1 AS a_end
            FROM ev GROUP BY 1, 2),
    burst AS (SELECT (t // 3600000) * 3600000 AS b_start,
                     (t // 3600000) * 3600000 + 3600000 AS b_end,
                     count(*) AS n_errors
              FROM ev WHERE ty = 'error'
              GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT a.user_id, CAST(a.a_day AS BIGINT) AS a_day,
           CAST(a.a_start AS BIGINT) AS a_start,
           CAST(a.a_end AS BIGINT) AS a_end,
           CAST(b.b_start AS BIGINT) AS b_start,
           CAST(b.b_end AS BIGINT) AS b_end,
           CAST(b.n_errors AS BIGINT) AS n_errors
    FROM act a JOIN burst b
      ON greatest(a.a_start, b.b_start) < least(a.a_end, b.b_end)
    """,
)
def q_session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join
    (operators.rangejoin.interval_overlap_join): per-user daily activity
    spans × corpus-wide error-burst hours (≥2 errors). Both sides
    explode to epoch chunks and equi-join — never a nested-loop range
    join; each overlapping pair is elected once in its overlap-start
    chunk (no distinct). The oracle states the naive O(n·m) overlap
    predicate, so parity proves the chunked election is exact."""
    from timeseriesfuser_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    act = (
        ev.groupBy(
            "user_id",
            F.expr("ts DIV 86400000").cast("long").alias("a_day"),
        )
        .agg(
            F.min("ts").cast("long").alias("a_start"),
            (F.max("ts") + 1).cast("long").alias("a_end"),
        )
    )
    burst = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            (F.expr("ts DIV 3600000") * 3600000).cast("long").alias("b_start")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_errors"))
        .filter(F.col("n_errors") >= 2)
        .withColumn("b_end", (F.col("b_start") + 3600000).cast("long"))
        .select("b_start", "b_end", "n_errors")
    )
    return interval_overlap_join(
        act,
        burst,
        left_start="a_start",
        left_end="a_end",
        right_start="b_start",
        right_end="b_end",
        chunk_ms=3_600_000,
    )


@register(
    "winsorized_value_stats",
    # Mirrors ops.timeseries.winsorized_stats: exact p10/p90 clamp
    # bounds in shared-denominator form (D = 100), clamp in HUGEINT,
    # one truncating division for the milli mean (negative sums
    # truncate toward zero in BOTH engines).
    oracle="""
    WITH base AS (SELECT event_type AS g,
                         CAST(round(value * 100) AS BIGINT) AS v
                  FROM events
                  WHERE value IS NOT NULL AND event_type IS NOT NULL),
    cnt AS (SELECT g, count(*) AS n FROM base GROUP BY g),
    rn AS (SELECT b.g, v, n,
                  row_number() OVER (PARTITION BY b.g ORDER BY v) AS rnk
           FROM base b JOIN cnt ON cnt.g = b.g),
    bounds AS (
        SELECT g, max(n) AS n,
               CAST(sum(CASE WHEN rnk = (n - 1) // 10 + 1
                             THEN v * (10 - (n - 1) % 10)
                             WHEN (n - 1) % 10 > 0
                              AND rnk = (n - 1) // 10 + 2
                             THEN v * ((n - 1) % 10) END) * 10 AS BIGINT)
                   AS p_lo_xD,
               CAST(sum(CASE WHEN rnk = (9 * (n - 1)) // 10 + 1
                             THEN v * (10 - (9 * (n - 1)) % 10)
                             WHEN (9 * (n - 1)) % 10 > 0
                              AND rnk = (9 * (n - 1)) // 10 + 2
                             THEN v * ((9 * (n - 1)) % 10) END) * 10
                    AS BIGINT) AS p_hi_xD
        FROM rn GROUP BY g),
    clamped AS (
        SELECT b.g, bo.n, bo.p_lo_xD, bo.p_hi_xD,
               sum(greatest(bo.p_lo_xD,
                            least(bo.p_hi_xD, CAST(b.v AS HUGEINT) * 100)))
                   AS s
        FROM base b JOIN bounds bo ON bo.g = b.g
        GROUP BY 1, 2, 3, 4)
    SELECT g AS event_type, CAST(n AS BIGINT) AS n, p_lo_xD, p_hi_xD,
           CAST(s AS BIGINT) AS winsorized_sum_xD,
           CAST(s * 1000 // (CAST(n AS HUGEINT) * 100) AS BIGINT)
               AS winsorized_mean_milli
    FROM clamped
    """,
)
def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type (ops.timeseries.winsorized_stats):
    values clamped to the exact p10/p90 linear-interpolation order
    statistics (den-scaled integers, no float) before an exact scaled
    sum — the whale-proof mean that keeps every row. One rank window +
    one broadcast bounds join + one hash-agg."""
    from timeseriesfuser_spark.ops.timeseries import winsorized_stats

    return winsorized_stats(_events(spark, sf_dir))


@register(
    "burst_flags_1h",
    # Hysteresis as LOCF over decisive bars: state = last non-NULL of
    # (1 at >= hi, 0 at <= lo, NULL in the dead band), default 0;
    # burst_id = running count of entries while in-burst.
    oracle=f"""
    WITH bars AS (SELECT event_type AS key,
                         {_ff("epoch_ms(ts)", 3_600_000)} AS bar_start,
                         count(*) AS n_events
                  FROM events
                  WHERE ts IS NOT NULL AND event_type IS NOT NULL
                  GROUP BY 1, 2),
    d AS (SELECT *, CASE WHEN n_events >= 5 THEN 1
                         WHEN n_events <= 1 THEN 0 END AS dec
          FROM bars),
    st AS (SELECT *, COALESCE(last_value(dec IGNORE NULLS) OVER
                         (PARTITION BY key ORDER BY bar_start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     0) AS in_burst
           FROM d),
    en AS (SELECT *, CASE WHEN in_burst = 1 AND COALESCE(lag(in_burst) OVER
                          (PARTITION BY key ORDER BY bar_start), 0) = 0
                          THEN 1 ELSE 0 END AS entered
           FROM st)
    SELECT key, CAST(bar_start AS BIGINT) AS bar_start,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(in_burst AS BIGINT) AS in_burst,
           CAST(entered AS BIGINT) AS entered,
           CAST(CASE WHEN in_burst = 1 THEN sum(entered) OVER
                    (PARTITION BY key ORDER BY bar_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                END AS BIGINT) AS burst_id
    FROM en
    """,
)
def q_burst_flags_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis burst detection per event type
    (ops.timeseries.burst_flags): enter at >= 5 events/hour, exit at
    <= 1 — the flap-suppression state machine, computed RELATIONALLY as
    last-decisive-value LOCF (no recursion, no per-row UDF); burst_id
    numbers each episode. Windows run on the bar grain only."""
    from timeseriesfuser_spark.ops.timeseries import burst_flags

    return burst_flags(_events(spark, sf_dir), "1h", hi=5, lo=1)


@register(
    "interarrival_gaps",
    # Gaps in (ts, event_id) order per type; p50/p90 are the exact
    # den-scaled linear-interpolation order stats (x2 / x10).
    oracle="""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS q
                FROM events
                WHERE ts IS NOT NULL AND event_id IS NOT NULL
                  AND event_type IS NOT NULL),
    g AS (SELECT k, t - lag(t) OVER (PARTITION BY k ORDER BY t, q) AS gap
          FROM ev),
    gaps AS (SELECT k, gap FROM g WHERE gap IS NOT NULL),
    cnt AS (SELECT k, count(*) AS n FROM gaps GROUP BY k),
    rn AS (SELECT gaps.k, gap, n,
                  row_number() OVER (PARTITION BY gaps.k ORDER BY gap) AS rnk
           FROM gaps JOIN cnt ON cnt.k = gaps.k),
    pct AS (SELECT k, max(n) AS n_gaps,
                   CAST(sum(CASE WHEN rnk = (n - 1) // 2 + 1
                                 THEN gap * (2 - (n - 1) % 2)
                                 WHEN (n - 1) % 2 > 0
                                  AND rnk = (n - 1) // 2 + 2
                                 THEN gap * ((n - 1) % 2) END) AS BIGINT)
                       AS p50_x2,
                   CAST(sum(CASE WHEN rnk = (9 * (n - 1)) // 10 + 1
                                 THEN gap * (10 - (9 * (n - 1)) % 10)
                                 WHEN (9 * (n - 1)) % 10 > 0
                                  AND rnk = (9 * (n - 1)) // 10 + 2
                                 THEN gap * ((9 * (n - 1)) % 10) END)
                        AS BIGINT) AS p90_x10
            FROM rn GROUP BY k),
    agg AS (SELECT k, CAST(sum(gap) AS BIGINT) AS sum_gap_ms,
                   CAST(max(gap) AS BIGINT) AS max_gap_ms
            FROM gaps GROUP BY k)
    SELECT pct.k AS event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
           sum_gap_ms, max_gap_ms, p50_x2, p90_x10
    FROM pct JOIN agg ON agg.k = pct.k
    """,
)
def q_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile per event type
    (ops.timeseries.interarrival_stats): exact count/sum/max and
    den-scaled p50/p90 order statistics of consecutive-event gaps — the
    feed-liveness measurement whose p90 growth flags degradation before
    the mean moves. One per-key lag window + the exact_percentiles rank
    machinery on the persisted gap relation."""
    from timeseriesfuser_spark.ops.timeseries import interarrival_stats

    return interarrival_stats(_events(spark, sf_dir))


@register(
    "spearman_click_purchase",
    # Doubled average ranks (2·rank + ties − 1, exact ints) → exact
    # HUGEINT sums → ONE double chain; NULL for constant sides / n < 2.
    oracle="""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) // 86400000 AS d,
                       CAST(round(value * 100) AS BIGINT) AS v,
                       epoch_ms(ts) AS t, event_id AS s
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                  AND event_type IN ('click', 'purchase')),
    bars AS (SELECT k, d, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY k, d
                                              ORDER BY t DESC, s DESC) AS rnk
                 FROM ev) WHERE rnk = 1),
    paired AS (SELECT a.d, a.v AS va, b.v AS vb
               FROM bars a JOIN bars b ON b.d = a.d
               WHERE a.k = 'click' AND b.k = 'purchase'),
    ranked AS (SELECT
                   rank() OVER (ORDER BY va) * 2
                       + count(*) OVER (PARTITION BY va) - 1 AS ra,
                   rank() OVER (ORDER BY vb) * 2
                       + count(*) OVER (PARTITION BY vb) - 1 AS rb
               FROM paired),
    agg AS (SELECT count(*) AS n,
                   sum(CAST(ra AS HUGEINT)) AS sx,
                   sum(CAST(rb AS HUGEINT)) AS sy,
                   sum(CAST(ra AS HUGEINT) * rb) AS sxy,
                   sum(CAST(ra AS HUGEINT) * ra) AS sxx,
                   sum(CAST(rb AS HUGEINT) * rb) AS syy
            FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           END AS rho
    FROM agg
    """,
)
def q_spearman_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of click vs purchase daily closes
    (ops.timeseries.spearman_corr): Pearson of doubled average ranks —
    exact integer rank sums, one fixed double chain — the
    outlier-immune association screen beside crosscorr's Pearson. Rank
    windows run on the paired BAR grain only."""
    from timeseriesfuser_spark.ops.timeseries import spearman_corr

    return spearman_corr(_events(spark, sf_dir), "click", "purchase", "1d")


@register(
    "realized_vol_daily",
    # RV_day = Σ (Δclose_cents)² over the day's consecutive 1h bars —
    # exact HUGEINT sums; bar closes are the last-(ts, seq) cent value.
    oracle="""
    WITH ev AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS s,
                       CAST(round(value * 100) AS BIGINT) AS v
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                  AND event_type IS NOT NULL),
    bars AS (SELECT k, t // 3600000 AS h, v FROM (
                 SELECT *, row_number() OVER (PARTITION BY k, t // 3600000
                                              ORDER BY t DESC, s DESC) AS rnk
                 FROM ev) WHERE rnk = 1),
    d AS (SELECT k, h, v,
                 v - lag(v) OVER (PARTITION BY k ORDER BY h) AS dv
          FROM bars)
    SELECT k AS event_type,
           CAST(h // 24 AS BIGINT) AS day,
           CAST(count(dv) AS BIGINT) AS n_returns,
           CAST(sum(CAST(dv AS HUGEINT) * dv) AS BIGINT) AS rv_cents2
    FROM d WHERE dv IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_realized_vol_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized volatility per type: Σ of squared hourly bar-close
    changes in exact cent² integers (HUGEINT/decimal sums) — the
    classic high-frequency variance estimator, built on the house bar
    conventions (last-(ts, seq) closes, lag on the bar grain only)."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    ).select(
        F.col("event_type").alias("k"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    bars = ev.groupBy(
        "k", F.expr("ts DIV 3600000").cast("long").alias("h")
    ).agg(
        F.max_by(
            F.col("v"), F.struct(F.col("ts"), F.col("event_id"))
        ).alias("v")
    )
    w = Window.partitionBy("k").orderBy("h")
    d = bars.withColumn("dv", F.col("v") - F.lag("v").over(w)).filter(
        F.col("dv").isNotNull()
    )
    return d.groupBy(
        F.col("k").alias("event_type"),
        F.expr("h DIV 24").cast("long").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_returns"),
        F.sum(F.expr("CAST(dv AS DECIMAL(38,0)) * dv"))
        .cast("long")
        .alias("rv_cents2"),
    )


@register(
    "streaming_burst_flags",
    # Emission contract: a bar emits when the key's NEXT bar opens, so
    # the stream equals the batch hysteresis rows MINUS each key's final
    # bar (the append-emission pattern of streaming_resample_1h).
    oracle=f"""
    WITH bars AS (SELECT event_type AS key,
                         {_ff("epoch_ms(ts)", 3_600_000)} AS bar_start,
                         count(*) AS n_events
                  FROM events
                  WHERE ts IS NOT NULL AND event_type IS NOT NULL
                  GROUP BY 1, 2),
    d AS (SELECT *, CASE WHEN n_events >= 5 THEN 1
                         WHEN n_events <= 1 THEN 0 END AS dec
          FROM bars),
    st AS (SELECT *, COALESCE(last_value(dec IGNORE NULLS) OVER
                         (PARTITION BY key ORDER BY bar_start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     0) AS in_burst,
                 max(bar_start) OVER (PARTITION BY key) AS last_bar
           FROM d),
    en AS (SELECT *, CASE WHEN in_burst = 1 AND COALESCE(lag(in_burst) OVER
                          (PARTITION BY key ORDER BY bar_start), 0) = 0
                          THEN 1 ELSE 0 END AS entered
           FROM st)
    SELECT key, CAST(bar_start AS BIGINT) AS bar_start,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(in_burst AS BIGINT) AS in_burst,
           CAST(entered AS BIGINT) AS entered,
           CAST(CASE WHEN in_burst = 1 THEN sum(entered) OVER
                    (PARTITION BY key ORDER BY bar_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                END AS BIGINT) AS burst_id
    FROM en WHERE bar_start < last_bar
    """,
)
def q_streaming_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live hysteresis burst detection driven through the driver harness
    (streaming.burst_flags_stream, applyInPandasWithState): the open
    bar's count and the enter/exit state machine ride the state store; a
    bar emits when its key's next bar opens. 14th driver-checked
    streaming query; oracle = the batch hysteresis minus each key's
    final (never-closing) bar."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import burst_flags_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        "event_type", ts_ms.cast("long").alias("ts")
    ).filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    flags = burst_flags_stream(
        ev, 3_600_000, hi=5, lo=1, keys=["event_type"], ts_col="ts"
    )
    out = _run_availablenow_to_memory(flags, "bf")
    return out.withColumnRenamed("event_type", "key")
