"""Driver-contract query registry: every implemented operator exposed as a
named (Spark query, DuckDB oracle SQL) pair over the /root/testdata tables.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; the
paired oracle is ANSI-ish SQL DuckDB runs on the same parquet registered as
views. The pairs are value-hash comparable because every computation here is
engine-portable-deterministic:

- integer/count arithmetic wherever possible (cents for money, quantized
  embeddings, md5-derived 60-bit hashes);
- at most a short fixed chain of IEEE double ops applied to *exact* integer
  inputs at the end (one division, sqrt of exact ints) — bit-identical in
  any IEEE-754 engine;
- never an order-dependent float accumulation;
- all integer outputs cast to long/BIGINT on both sides, ties broken by
  explicit unique keys.

Query name → SURVEY.md §2 operator ids covered is noted on each entry.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

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

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Session TZ must be UTC for unix_millis to agree with DuckDB epoch_ms.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects
    # unless mapped to a long (of nanoseconds).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` normalized to epoch-ms long (DuckDB epoch_ms twin).

    The nanos→ms conversion must be integer division (`DIV`): epoch-nanos
    exceed 2^53, so a double round-trip would corrupt low bits.
    """
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn("ts", ts_epoch_ms_col(ev, "ts"))


# The DuckDB twin of ops.dedup.md5_hash64 (60-bit md5-derived hash).
def _sql_hash64(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
# Distinct word-3-gram shingles of `text` (DuckDB list comprehension); the
# twin of ops.dedup.shingle_array(text, 3).
_SHINGLES = (
    "list_distinct([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk)-1)])"
)
def _shingle_rel(table: str = "documents") -> str:
    return f"""
    SELECT doc_id AS id, unnest({_SHINGLES}) AS sh
    FROM (SELECT doc_id, {_TOKS} AS tk FROM {table})
"""


_SHINGLE_REL = _shingle_rel()

# Quantized embedding (DuckDB twin of ops.similarity.quantized, scale 1000).
_QV = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


# --------------------------------------------------------------------------- #
# Core engine: fuse / window / resample / fill  (SURVEY §2.1-2.6)
# --------------------------------------------------------------------------- #

_CLICK_TYPES = ("click", "view")
_IN_CLICKS = "event_type IN ('click', 'view')"


def _event_sources(spark: SparkSession, sf_dir: str):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type").isin(*_CLICK_TYPES)).select(
        "ts", "event_id", "user_id", "value"
    )
    txns = ev.filter(~F.col("event_type").isin(*_CLICK_TYPES)).select(
        "ts", "event_id", "user_id", "value"
    )
    return (
        SourceConfig(name="clicks", df=clicks, ts_col="ts"),
        SourceConfig(name="txns", df=txns, ts_col="ts"),
    )


@register(
    "fuse_merge",
    oracle=f"""
    SELECT epoch_ms(ts) AS __timestamp, event_id, user_id,
           CASE WHEN {_IN_CLICKS} THEN value END AS "value||clicks",
           CASE WHEN NOT {_IN_CLICKS} THEN value END AS "value||txns"
    FROM events
    """,
)
def q_fuse_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4/W5 + P2/P3 + F1: k-way chronological merge as diagonal union
    with collision renaming (`value` -> `value||<src>`), shared merge_cols,
    ts normalized to epoch-ms (ref core.py:353-637, 297-318)."""
    s1, s2 = _event_sources(spark, sf_dir)
    fuser = TimeSeriesFuser(
        [s1, s2],
        FuserConfig(merge_cols=("event_id", "user_id"), remove_internal_cols=True),
    )
    return fuser.fused(spark)


_W_LO = coerce_to_epoch_ms("2024-01-10T00:00:00Z")
_W_HI = coerce_to_epoch_ms("2024-01-20T00:00:00Z")


@register(
    "fuse_window_filter",
    oracle=f"""
    SELECT epoch_ms(ts) AS __timestamp, event_id, user_id,
           CASE WHEN {_IN_CLICKS} THEN value END AS "value||clicks",
           CASE WHEN NOT {_IN_CLICKS} THEN value END AS "value||txns"
    FROM events
    WHERE epoch_ms(ts) BETWEEN {_W_LO} AND {_W_HI}
    """,
)
def q_fuse_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + F2: procstart/procend window predicate with polymorphic time
    coercion (ISO-8601 'Z' strings; ref core.py:145-213, helpers.py:52-95)."""
    s1, s2 = _event_sources(spark, sf_dir)
    fuser = TimeSeriesFuser(
        [s1, s2],
        FuserConfig(
            procstart="2024-01-10T00:00:00Z",
            procend="2024-01-20T00:00:00Z",
            merge_cols=("event_id", "user_id"),
            remove_internal_cols=True,
        ),
    )
    return fuser.fused(spark)


_M1 = interval_to_ms("1m")
_H1 = interval_to_ms("1h")


def _ff(x: str, m: int) -> str:
    """DuckDB SQL: largest multiple of ``m`` <= ``x`` (floor), negative-safe.

    DuckDB BIGINT ``//`` truncates toward zero (verified: ``-7200001 //
    3600000 = -2``), so ``x // m * m`` drifts one step up for negative x.
    Every Spark-side bucket label pmod-floors
    (``intervals.floor_boundary_col``); oracles must floor the same way or
    the pair silently diverges for pre-1970 timestamps.
    """
    return f"(({x}) - ((({x}) % {m}) + {m}) % {m})"


def _fdiv(x: str, m: int) -> str:
    """DuckDB SQL: floor((x)/m) for a possibly-negative integer ``x``."""
    return f"({_ff(x, m)} // {m})"


@register(
    "resample_1m_global",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, value, event_type FROM events),
    lab AS (SELECT {_ff('t', _M1)} + {_M1} AS b, t, event_id, value, event_type FROM ev),
    buckets AS (
        -- row_number, not max_by(col, t*1e6+event_id): the combined
        -- scalar key conflates ts and sequence once event_id >= 1e6
        -- (DuckDB arg_max can't take a composite key; the window is the
        -- safe formulation)
        SELECT b, value AS lv, event_type AS le FROM (
            SELECT b, value, event_type,
                   row_number() OVER (PARTITION BY b
                                      ORDER BY t DESC, event_id DESC) AS rn
            FROM lab) WHERE rn = 1
    ),
    ext AS (SELECT min(t) AS mn, max(t) AS mx FROM ev),
    bounds AS (SELECT {_ff('mn', _M1)} + {_M1} AS bmin,
                      {_ff('mx', _M1)} + {_M1} AS bmax
               FROM ext),
    spine AS (SELECT unnest(generate_series(bmin, bmax, {_M1})) AS b FROM bounds),
    j AS (SELECT s.b AS b, bu.lv, bu.le, bu.b IS NOT NULL AS hit
          FROM spine s LEFT JOIN buckets bu USING (b)),
    c AS (SELECT b, lv, le, hit,
                 (last_value(CASE WHEN hit THEN {{'v': lv}} END IGNORE NULLS)
                    OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS cv
          FROM j)
    SELECT b AS __timestamp,
           CASE WHEN hit THEN lv ELSE cv END AS value,
           le AS event_type
    FROM c
    """,
)
def q_resample_1m_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T4/A2/W2: interval resample to a 1-minute grid — last event
    strictly before each boundary wins, empty boundaries gap-filled with
    `value` carried forward, `event_type` left null (ref classes.py:589-637)."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("__timestamp"), "event_id", "value", "event_type"
    )
    return resample_last_interval(
        ev,
        "1m",
        value_cols=["value", "event_type"],
        ffill_keys=["value"],
        tiebreak_cols=["event_id"],
    )


@register(
    "resample_keys_1h",
    oracle=f"""
    WITH lab AS (SELECT {_ff('epoch_ms(ts)', _H1)} + {_H1} AS b,
                        event_type, value, user_id,
                        epoch_ms(ts) AS t, event_id
                 FROM events),
    r AS (SELECT *, row_number() OVER (PARTITION BY b, event_type
                                       ORDER BY t DESC, event_id DESC) AS rn
          FROM lab)
    SELECT b AS __timestamp, event_type, value, user_id FROM r WHERE rn = 1
    """,
)
def q_resample_keys_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/T3 keyed variant: last-value-per-interval per event_type, no gap
    fill — one partial-aggregated shuffle on (key, bucket)."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("__timestamp"),
        "event_id",
        "event_type",
        "value",
        "user_id",
    )
    return resample_last_interval(
        ev,
        "1h",
        keys=["event_type"],
        value_cols=["value", "user_id"],
        tiebreak_cols=["event_id"],
        gap_fill=False,
    )


_MASK = "CASE WHEN event_type IN ('view', 'error') THEN NULL ELSE value END"


@register(
    "forward_fill_global",
    oracle=f"""
    SELECT event_id,
           last_value({_MASK} IGNORE NULLS) OVER (
               ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled
    FROM events
    """,
)
def q_forward_fill_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: global-order LOCF via the two-pass range-bucketed scheme
    (ref core.py:1034-1072; SURVEY §4.3.1) — values masked to null for
    view/error events, then carried forward in (ts, event_id) order."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("__timestamp"),
        "event_id",
        F.when(F.col("event_type").isin("view", "error"), F.lit(None))
        .otherwise(F.col("value"))
        .alias("value_filled"),
    )
    filled = forward_fill(ev, ["__timestamp", "event_id"], ["value_filled"])
    return filled.select("event_id", "value_filled")


@register(
    "source_window_bounds",
    oracle="""
    SELECT event_type,
           min(epoch_ms(ts)) AS first_ts,
           max(epoch_ms(ts)) AS last_ts,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_source_window_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S4/S5/W3: per-source processing-window bounds (first/last ts) —
    the distributed analogue of the reference's file head/tail probes
    (core.py:145-213, 738-872)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


_LABEL_IVS = ["100l", "10s", "5m", "2h", "1d"]


def _label_sql() -> str:
    cols = []
    for iv in _LABEL_IVS:
        step = interval_to_ms(iv)
        cols.append(f"{_ff('epoch_ms(ts)', step)} + {step} AS label_{iv}")
    cols.append(f"{_ff('epoch_ms(ts)', interval_to_ms('5m'))} AS floor_5m")
    return "SELECT event_id, " + ", ".join(cols) + " FROM events"


@register("interval_labels", oracle=_label_sql())
def q_interval_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2: interval parsing + next/floor boundary labels for every unit
    (l/s/m/h/d) as integer epoch-ms math (ref classes.py:708-801)."""
    ev = _events(spark, sf_dir)
    ts = F.col("ts")
    cols = [F.col("event_id")]
    for iv in _LABEL_IVS:
        cols.append(boundary_label_col(ts, interval_to_ms(iv)).alias(f"label_{iv}"))
    cols.append(floor_boundary_col(ts, interval_to_ms("5m")).alias("floor_5m"))
    return ev.select(*cols)


_GAP = 30 * 60 * 1000


@register(
    "sessionize_30m",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id FROM events),
    flagged AS (
        SELECT user_id, t, event_id,
               CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > {_GAP}
                    THEN 1 ELSE 0 END AS is_new
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sess AS (
        SELECT user_id, t, event_id,
               -- CAST: DuckDB sum(INT) is HUGEINT -> pandas float64; the
               -- driver's value-hash is type-sensitive (same fix as
               -- tpch_q1_pricing).
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           min(t) AS session_start, max(t) AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_idx
    """,
)
def q_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-flavored extension: gap-based sessionization (30-min
    inactivity splits a session). Window ops partition by user — no global
    single-task stage; the standard scalable idiom."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("t"), "event_id", "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lag_t = F.lag("t").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(lag_t.isNull() | (F.col("t") - lag_t > _GAP), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("t").alias("session_start"),
        F.max("t").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------- #
# Relational analytics (engine generality; joins/agg/topk beyond reference)
# --------------------------------------------------------------------------- #


@register(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000 AS sum_charge,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary. Money is summed in exact integer cents
    (order-independent) and converted to double once at the end, so the
    result is bit-identical to the oracle; a naive double SUM would drift
    with Spark's reduction order."""
    l = _t(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity")).cast("long")
    epc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    tc = F.round(F.col("l_tax") * 100).cast("long")
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qc).cast("double").alias("sum_qty"),
            (F.sum(epc).cast("double") / 100).alias("sum_base_price"),
            (F.sum(epc * (100 - dc)).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(epc * (100 - dc) * (100 + tc)).cast("double") / 1000000).alias(
                "sum_charge"
            ),
            (F.sum(qc).cast("double") / cnt).alias("avg_qty"),
            (F.sum(epc).cast("double") / 100 / cnt).alias("avg_price"),
            (F.sum(dc).cast("double") / 100 / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "top_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window / top-k per group with fully deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "revenue_per_nation",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg with explicit broadcast of the small dimensions — on a
    cluster the fact table never shuffles for these joins."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents).cast("double") / 100).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# Dedup suite (documents)
# --------------------------------------------------------------------------- #


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-groupBy, map-side partial agg, single shuffle."""
    return D.exact_duplicates(_t(spark, sf_dir, "documents"))


_JT = 0.5
_JMAXDF = 64  # candidate-generation document-frequency cutoff


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLE_REL}),
    dfreq AS (SELECT sh, count(*) AS c FROM sh GROUP BY sh),
    rare AS (SELECT s.id, s.sh FROM sh s JOIN dfreq d USING (sh)
             WHERE d.c <= {_JMAXDF}),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM rare a JOIN rare b ON a.sh = b.sh AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS intersection
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT c.id_a, c.id_b, intersection,
           sa.sz + sb.sz - intersection AS union_size,
           CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) AS jaccard
    FROM cand c
    JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes sa ON sa.id = c.id_a
    JOIN sizes sb ON sb.id = c.id_b
    WHERE CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) >= {_JT}
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. Candidates come from the
    df-capped inverted index (shingles in > _JMAXDF (=64) docs skipped —
    a hot shingle fans out df² pairs in the self-join, the documented
    100 TB killer of the uncapped baseline); jaccard is then EXACT over
    the full shingle sets (array_intersect verify). The oracle mirrors
    the same candidate rule; its intersection CTE may stay all-pairs
    because DuckDB only ever sees sf0.01."""
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=_JT, max_df=_JMAXDF
    )


_NH, _NB = 16, 4  # 16 hashes, 4 bands of r=4
_MT = 0.4


def _minhash_sql() -> str:
    from timeseriesfuser_spark.ops.dedup import MINHASH_MASK

    r = _NH // _NB
    # Kirsch-Mitzenmacher double hashing, the Spark side's twin: one md5
    # per shingle, h_i = (h1 + i*h2) & (2^52-1) — overflow-free in both
    # engines.
    mins = ", ".join(
        f"min((h1 + {i} * h2) & {MINHASH_MASK}) AS h{i}" for i in range(_NH)
    )
    bands = "\n        UNION ALL ".join(
        f"SELECT id, {b} AS band, md5(concat_ws(',', "
        + ", ".join(f"h{b * r + j}" for j in range(r))
        + ")) AS bkey FROM sig"
        for b in range(_NB)
    )
    return f"""
    WITH sh AS ({_SHINGLE_REL}),
    hh AS (SELECT id,
                  CAST(concat('0x', substr(md5(sh), 1, 13)) AS BIGINT) AS h1,
                  CAST(concat('0x', substr(md5(sh), 14, 13)) AS BIGINT) AS h2
           FROM sh),
    sig AS (SELECT id, {mins} FROM hh GROUP BY id),
    bands AS ({bands}),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
    ),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT id_a, id_b, count(*) AS intersection
        FROM cand
        JOIN sh sa ON sa.id = cand.id_a
        JOIN sh sb ON sb.id = cand.id_b AND sb.sh = sa.sh
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) >= {_MT}
    """


def _minhash_between_sql() -> str:
    """Cross-corpus twin of :func:`_minhash_sql`: odd doc_ids are the
    'new shard', even the 'reference corpus'."""
    from timeseriesfuser_spark.ops.dedup import MINHASH_MASK

    r = _NH // _NB
    mins = ", ".join(
        f"min((h1 + {i} * h2) & {MINHASH_MASK}) AS h{i}" for i in range(_NH)
    )

    def side(tag: str, pred: str) -> str:
        bands = "\n        UNION ALL ".join(
            f"SELECT id, {b} AS band, md5(concat_ws(',', "
            + ", ".join(f"h{b * r + j}" for j in range(r))
            + f")) AS bkey FROM sig{tag}"
            for b in range(_NB)
        )
        return f"""
    sh{tag} AS ({_shingle_rel(f"(SELECT * FROM documents WHERE {pred})")}),
    hh{tag} AS (SELECT id,
                  CAST(concat('0x', substr(md5(sh), 1, 13)) AS BIGINT) AS h1,
                  CAST(concat('0x', substr(md5(sh), 14, 13)) AS BIGINT) AS h2
           FROM sh{tag}),
    sig{tag} AS (SELECT id, {mins} FROM hh{tag} GROUP BY id),
    bands{tag} AS ({bands}),
    sizes{tag} AS (SELECT id, count(*) AS sz FROM sh{tag} GROUP BY id)"""

    return f"""
    WITH {side('n', 'doc_id % 2 = 1')},
    {side('r', 'doc_id % 2 = 0')},
    cand AS (
        SELECT DISTINCT a.id AS new_id, b.id AS ref_id
        FROM bandsn a JOIN bandsr b ON a.band = b.band AND a.bkey = b.bkey
    ),
    inter AS (
        SELECT new_id, ref_id, count(*) AS intersection
        FROM cand
        JOIN shn sa ON sa.id = cand.new_id
        JOIN shr sb ON sb.id = cand.ref_id AND sb.sh = sa.sh
        GROUP BY new_id, ref_id
    )
    SELECT new_id, ref_id,
           CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) AS jaccard
    FROM inter
    JOIN sizesn sa ON sa.id = new_id
    JOIN sizesr sb ON sb.id = ref_id
    WHERE CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) >= {_MT}
    """


@register("cross_corpus_dedup", oracle=_minhash_between_sql())
def q_cross_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the odd-doc_id 'new shard' checked against
    the even-doc_id 'reference corpus' via the asymmetric MinHash-LSH join
    (ops.dedup.minhash_lsh_pairs_between) — shared buckets only, never
    |new| x |ref|."""
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_between(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


@register("dedup_minhash_lsh", oracle=_minhash_sql())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: per-row band keys (zero signature shuffles),
    banding equi-join with first-shared-band pair dedup, exact-Jaccard
    verification — the web-corpus scale path."""
    return D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


@register(
    "dedup_clusters",
    # Component labels via DuckDB's recursive CTE: reach(x, r) holds every
    # (node, label-of-some-component-member); min(r) per node is the
    # component min — the same fixpoint the Spark min-label propagation
    # converges to.
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    cnt AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT comp.doc_id, comp.cluster_id, cnt.cluster_size
    FROM comp JOIN cnt USING (cluster_id)
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs → distributed connected
    components (min-label propagation over the edge subgraph only) →
    (doc_id, cluster_id = canonical min id, cluster_size). The step a real
    dedup pipeline runs after pair generation to pick survivors."""
    return D.neardup_clusters(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


@register(
    "doc_chunks",
    # Sliding windows of 32 tokens every 24: starts 0,24,48,… while < the
    # token count; chunk key = token offset (no ordinality required).
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(t[s+1 : s+32]) AS BIGINT) AS n_tokens,
           array_to_string(t[s+1 : s+32], ' ') AS chunk_text
    FROM tk, unnest(range(0, len(t), 24)) AS u(s)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window doc chunking (32-token windows, stride 24) — the
    RAG/context-prep step; pure projection + explode, zero shuffles."""
    return P.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    )


@register(
    "tfidf_keywords",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
    dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
               tf.tf * 1000000 // dfr.df AS score
        FROM tf JOIN dfr USING (token)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token
        ) AS rk FROM scored
    )
    SELECT doc_id, token, tf, df, score FROM ranked WHERE rk <= 5
    """,
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per doc by integer tf-idf rank (score =
    tf·1e6 DIV df — rank-equivalent to tf·idf within one corpus, exact in
    any engine). Keyword extraction for corpus exploration/routing."""
    return X.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


_SB, _SHAM = 48, 3


def _simhash_sql() -> str:
    hash_list = (
        "list_transform(list_distinct(tk), t -> "
        + _sql_hash64("t")
        + ")"
    )
    bit_terms = []
    for i in range(_SB):
        mask = 1 << i
        vote = (
            f"list_aggregate(list_transform(hs, h -> CASE WHEN h & {mask} != 0 "
            f"THEN 1 ELSE -1 END), 'sum')"
        )
        bit_terms.append(f"CASE WHEN {vote} > 0 THEN CAST({mask} AS BIGINT) ELSE 0 END")
    sim = " + ".join(bit_terms)
    nchunks = _SHAM + 1
    chunk = _SB // nchunks
    parts = []
    for c in range(nchunks):
        width = chunk if c < nchunks - 1 else _SB - chunk * (nchunks - 1)
        mask = ((1 << width) - 1) << (c * chunk)
        parts.append(f"SELECT id, sim, {c} AS chunk, sim & {mask} AS ckey FROM sig")
    blocks = "\n        UNION ALL ".join(parts)
    return f"""
    WITH hv AS (SELECT doc_id AS id, {hash_list} AS hs
                FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
    sig AS (SELECT id, {sim} AS sim FROM hv),
    blocks AS ({blocks})
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM blocks a
    JOIN blocks b ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id
    WHERE bit_count(xor(a.sim, b.sim)) <= {_SHAM}
    """


@register("dedup_simhash", oracle=_simhash_sql())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: bit-vote fingerprints + pigeonhole chunk blocking."""
    out = D.simhash_pairs(
        _t(spark, sf_dir, "documents"), bits=_SB, max_hamming=_SHAM
    )
    return out.withColumn("hamming", F.col("hamming").cast("long"))


# --------------------------------------------------------------------------- #
# Text analysis (documents)
# --------------------------------------------------------------------------- #

_SW = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it']"


@register(
    "text_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    m AS (SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars_actual,
                 CAST(len(tk) AS BIGINT) AS n_tokens,
                 CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
                 CAST(len(list_filter(tk, t -> list_contains({_SW}, t))) AS BIGINT) AS n_stopwords,
                 CAST(len(list_filter(tk, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT) AS n_alpha,
                 CAST(list_aggregate([length(t) FOR t IN tk] || [0], 'sum') AS BIGINT) AS tok_chars
          FROM d)
    SELECT doc_id, n_chars_actual, n_tokens, n_bpe_tokens, n_punct, n_stopwords,
           CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
           CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_chars_actual > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_actual AS DOUBLE) ELSE 0.0 END AS punct_ratio,
           CASE WHEN 3 * n_tokens > 0 THEN CAST(2 * n_stopwords + n_alpha AS DOUBLE) / CAST(3 * n_tokens AS DOUBLE) ELSE 0.0 END AS quality_score
    FROM m
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: token/BPE/punct/stopword counts + composite score."""
    return X.text_stats(_t(spark, sf_dir, "documents"))


def _langid_sql() -> str:
    langs = sorted(X.LANG_STOPWORDS)
    votes = []
    for lang in langs:
        arr = "[" + ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS[lang]) + "]"
        votes.append(
            f"CAST(len(list_filter(tk, t -> list_contains({arr}, t))) AS BIGINT) AS votes_{lang}"
        )
    mx = "greatest(" + ", ".join(f"votes_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN votes_{lang} = {mx} THEN '{lang}'" for lang in langs
    ) + " END"
    vote_cols = ", ".join(f"votes_{lang}" for lang in langs)
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    v AS (SELECT doc_id, {', '.join(votes)} FROM d)
    SELECT doc_id, {vote_cols}, {pred} AS lang_pred FROM v
    """


@register("lang_id", oracle=_langid_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (argmax, alphabetical tie-break)."""
    return X.language_id(_t(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp_md5,
           list_aggregate(list_transform({_SHINGLES}, s -> {_sql_hash64('s')}), 'min') AS fp_minshingle
    FROM (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fingerprints: normalized-md5 + min-shingle hash."""
    return X.doc_fingerprint(_t(spark, sf_dir, "documents"))


def _ngram_all_sql(n: int) -> str:
    """ALL word n-grams with multiplicities (twin of ops.text.ngram_all_col)."""
    return f"[array_to_string(tk[i:i+{n - 1}], ' ') FOR i IN range(1, len(tk) - {n - 2})]"


def _repetition_sql() -> str:
    tops = []
    for n in (2, 3):
        tops.append(f"""
    g{n} AS (SELECT doc_id, unnest({_ngram_all_sql(n)}) AS g
             FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
    pg{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY doc_id, g),
    top{n} AS (SELECT doc_id, max(c * length(g)) AS m FROM pg{n}
               WHERE c >= 2 GROUP BY doc_id)""")
    return f"""
    WITH lines AS (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents
    ),
    pl AS (SELECT doc_id, ln, count(*) AS c FROM lines GROUP BY doc_id, ln),
    ls AS (
        SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
               sum(length(ln) * c) AS line_chars, sum(length(ln)) AS distinct_chars
        FROM pl GROUP BY doc_id
    ),{','.join(tops)}
    SELECT d.doc_id,
           CASE WHEN ls.n_lines > 0
                THEN CAST(ls.n_lines - ls.n_distinct AS DOUBLE) / ls.n_lines
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN ls.line_chars > 0
                THEN CAST(ls.line_chars - ls.distinct_chars AS DOUBLE) / ls.line_chars
                ELSE 0.0 END AS dup_line_char_frac,
           CASE WHEN top2.m IS NOT NULL AND length(d.text) > 0
                THEN CAST(top2.m AS DOUBLE) / length(d.text)
                ELSE 0.0 END AS top2gram_char_frac,
           CASE WHEN top3.m IS NOT NULL AND length(d.text) > 0
                THEN CAST(top3.m AS DOUBLE) / length(d.text)
                ELSE 0.0 END AS top3gram_char_frac
    FROM documents d
    LEFT JOIN ls ON ls.doc_id = d.doc_id
    LEFT JOIN top2 ON top2.doc_id = d.doc_id
    LEFT JOIN top3 ON top3.doc_id = d.doc_id
    """


@register(
    "source_quality_rollup",
    oracle=f"""
    WITH d AS (
        SELECT source, md5(text) AS h, {_TOKS} AS tk, text FROM documents
    ),
    m AS (
        SELECT source, h,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(tk, t -> list_contains({_SW}, t))) AS BIGINT) AS n_stop,
               CASE WHEN len(tk) >= 50 THEN 1 ELSE 0 END AS keep
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT h) AS DOUBLE) / count(*) AS dup_frac,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_stop) AS DOUBLE) / sum(n_tokens) AS stopword_token_frac,
           CAST(sum(keep) AS DOUBLE) / count(*) AS keep_frac
    FROM m
    GROUP BY source
    """,
)
def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-crawl-source health rollup — the "which feeds are worth
    keeping" report: doc count, exact-dup fraction (distinct content
    hashes), token volume, corpus-level stopword density, and the
    fraction passing a minimum-length gate. Every emitted ratio is one
    division of integer sums, so the aggregate is order-independent and
    oracle-exact (double sums would not be)."""
    toks = X.tokens_col(F.col("text"))
    sw = F.array([F.lit(s) for s in X.EN_STOPWORDS])
    m = _t(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.col("text")).alias("h"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("long")
        .alias("n_stop"),
        F.when(F.size(toks) >= 50, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.countDistinct("h")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_frac"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_stop").cast("double") / F.sum("n_tokens").cast("double")).alias(
            "stopword_token_frac"
        ),
        (F.sum("keep").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "keep_frac"
        ),
    )


@register(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["email"]}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["ip"]}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{X.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
               '{X.PII_PATTERNS["ip"]}', '<IP>', 'g'),
               '{X.PII_PATTERNS["phone"]}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub counts + md5 of the fully-redacted text — the hash makes
    the oracle verify the redaction TRANSFORMATION on every doc, not just
    the (possibly zero) match counts (ops.text.pii_scrub)."""
    out = X.pii_scrub(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone",
        F.md5("text_redacted").alias("redacted_md5"),
    )


@register(
    "corpus_length_stats",
    oracle=f"""
    WITH l AS ({_langid_sql()}),
    t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents)
    SELECT l.lang_pred,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(t.n_tokens) AS BIGINT) AS min_tokens,
           quantile_cont(t.n_tokens, 0.25) AS q25_tokens,
           quantile_cont(t.n_tokens, 0.5) AS median_tokens,
           quantile_cont(t.n_tokens, 0.75) AS q75_tokens,
           CAST(max(t.n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(t.n_tokens) AS DOUBLE) / count(*) AS avg_tokens
    FROM l JOIN t USING (doc_id)
    GROUP BY l.lang_pred
    """,
)
def q_corpus_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per predicted language: exact
    interpolated quartiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    both linear interpolation — deterministic on integer token counts),
    composed from language_id + a token-count aggregate. The per-group
    exact percentile sorts only within a (language) group — the shuffle
    keys on language, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    lang = X.language_id(docs).select("doc_id", "lang_pred")
    toks = docs.select(
        "doc_id",
        F.size(X.tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return (
        lang.join(toks, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.expr("percentile(n_tokens, 0.25)").alias("q25_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("median_tokens"),
            F.expr("percentile(n_tokens, 0.75)").alias("q75_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            (
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_tokens"),
        )
    )


@register(
    "quality_filter",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(COALESCE(list_aggregate(list_transform(tk, t -> length(t)), 'sum'), 0) AS BIGINT) AS tok_chars,
               CAST(len(list_filter(tk, t -> regexp_matches(t, '^[a-z]+$'))) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
               CAST(len(list_intersect(list_distinct(tk), {_SW})) AS BIGINT) AS n_stop_distinct
        FROM d
    ),
    r AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
               CASE WHEN n_tokens > 0 THEN CAST(n_punct AS DOUBLE) / n_tokens ELSE 0.0 END AS punct_token_ratio,
               CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens ELSE 0.0 END AS alpha_token_frac,
               n_stop_distinct
        FROM m
    )
    SELECT doc_id, n_tokens, mean_token_len, punct_token_ratio,
           alpha_token_frac, n_stop_distinct,
           (n_tokens >= 50 AND n_tokens <= 100000) AS ok_token_count,
           (mean_token_len >= 3.0 AND mean_token_len <= 10.0) AS ok_mean_token_len,
           (punct_token_ratio <= 0.5) AS ok_punct_ratio,
           (alpha_token_frac >= 0.8) AS ok_alpha_frac,
           (n_stop_distinct >= 2) AS ok_stopwords,
           ((n_tokens >= 50 AND n_tokens <= 100000)
            AND (mean_token_len >= 3.0 AND mean_token_len <= 10.0)
            AND (punct_token_ratio <= 0.5)
            AND (alpha_token_frac >= 0.8)
            AND (n_stop_distinct >= 2)) AS keep,
           CASE WHEN NOT (n_tokens >= 50 AND n_tokens <= 100000) THEN 'token_count'
                WHEN NOT (mean_token_len >= 3.0 AND mean_token_len <= 10.0) THEN 'mean_token_len'
                WHEN NOT (punct_token_ratio <= 0.5) THEN 'punct_ratio'
                WHEN NOT (alpha_token_frac >= 0.8) THEN 'alpha_frac'
                WHEN NOT (n_stop_distinct >= 2) THEN 'stopwords'
                ELSE NULL END AS drop_reason
    FROM r
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate (ops.text.quality_filter,
    paper defaults): per-rule booleans + keep + first-failing-rule
    drop_reason."""
    return X.quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "contamination_check",
    oracle=f"""
    WITH bg AS (
        SELECT DISTINCT unnest({_SHINGLES}) AS g
        FROM (SELECT {_TOKS} AS tk FROM documents WHERE doc_id < 10)
    ),
    dg AS (
        SELECT doc_id, unnest({_SHINGLES}) AS g
        FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
    ),
    pd AS (
        SELECT dg.doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated
        FROM dg LEFT JOIN bg ON dg.g = bg.g
        GROUP BY dg.doc_id
    )
    SELECT d.doc_id,
           COALESCE(pd.n_ngrams, CAST(0 AS BIGINT)) AS n_ngrams,
           COALESCE(pd.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
           CASE WHEN pd.n_ngrams > 0
                THEN CAST(pd.n_contaminated AS DOUBLE) / pd.n_ngrams
                ELSE 0.0 END AS contamination_frac
    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination signal: distinct word-3-gram overlap of
    each document against a broadcast 'benchmark' sample (docs 0-9 here) —
    ops.text.contamination_check, the GPT-3-style n-gram overlap rule."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    return X.contamination_check(docs, bench, n=3)


@register("repetition_stats", oracle=_repetition_sql())
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-line fractions + top
    repeated-n-gram character mass (ops.text.repetition_stats)."""
    return X.repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "token_frequencies",
    oracle=f"""
    SELECT token,
           CAST(count(*) AS BIGINT) AS term_freq,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY term_freq DESC, token
    LIMIT 100
    """,
)
def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-100 tokens by term frequency with
    document frequency (ops.text.token_frequencies) — the word-count shape
    feeding vocab/BPE construction."""
    out = X.token_frequencies(_t(spark, sf_dir, "documents"))
    return out.orderBy(F.desc("term_freq"), F.asc("token")).limit(100)


@register(
    "token_rarity",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    f AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY token),
    per AS (
        SELECT tk.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(f.tf) AS BIGINT) AS sum_corpus_tf,
               CAST(sum(CASE WHEN f.tf <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM tk JOIN f USING (token)
        GROUP BY tk.doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
           COALESCE(per.sum_corpus_tf, CAST(0 AS BIGINT)) AS sum_corpus_tf,
           CASE WHEN per.n_tokens > 0
                THEN CAST(per.sum_corpus_tf AS DOUBLE) / CAST(per.n_tokens AS DOUBLE)
                ELSE 0.0 END AS mean_token_tf,
           COALESCE(per.n_rare, CAST(0 AS BIGINT)) AS n_rare,
           CASE WHEN per.n_tokens > 0
                THEN CAST(per.n_rare AS DOUBLE) / CAST(per.n_tokens AS DOUBLE)
                ELSE 0.0 END AS rare_frac
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-free perplexity proxy (ops.text.token_rarity): each document
    scored by the corpus frequency of its own tokens — mean corpus term
    frequency + rare-token fraction, the CCNet-style quality bucket signal
    computable without a language model. Frequency table broadcast so the
    exploded token relation never shuffles on the Zipf-skewed token key."""
    return X.token_rarity(_t(spark, sf_dir, "documents"), rare_threshold=2)


# Per-source sampling rates used by the stratified-sample query: sources
# src0..src19; src<N> keeps 20/40/60/80% by N mod 4 — exercising several
# distinct rates plus determinism across engines.
_SAMPLE_RATES = {f"src{i}": (200_000 + (i % 4) * 200_000) / 1e6 for i in range(20)}


@register(
    "stratified_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source,
               {_sql_hash64("source || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 AS hash_ppm,
               CAST(200000 + (CAST(substr(source, 4) AS BIGINT) % 4) * 200000 AS BIGINT) AS rate_ppm
        FROM documents
    )
    SELECT doc_id, source, CAST(hash_ppm AS BIGINT) AS hash_ppm, rate_ppm
    FROM s WHERE hash_ppm < rate_ppm
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based per-source sampling
    (ops.sampling.stratified_sample): md5(source:doc_id) mod 1e6 under a
    per-source ppm rate. Pure projection + filter — no shuffle; the verdict
    for a row is stable under corpus growth and nested across rates."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return SA.stratified_sample(docs, _SAMPLE_RATES)


@register(
    "mixing_weights",
    oracle=f"""
    WITH per AS (
        SELECT source AS stratum,
               CAST((CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS BIGINT) AS share,
               CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens
        FROM documents GROUP BY source
    ),
    k AS (SELECT CAST(sum(share) AS BIGINT) AS kk FROM per),
    c AS (
        SELECT per.*, k.kk,
               CASE WHEN share > 0
                    THEN CAST(total_tokens * k.kk AS DOUBLE) / CAST(share AS DOUBLE)
                    END AS capacity
        FROM per, k
    ),
    t AS (SELECT min(capacity) AS tstar FROM c)
    SELECT stratum AS source, total_tokens, share,
           CAST(share AS DOUBLE) / CAST(kk AS DOUBLE) AS target_weight,
           capacity,
           CASE WHEN share > 0
                THEN (CAST(share AS DOUBLE) * t.tstar) / CAST(kk * total_tokens AS DOUBLE)
                ELSE 0.0 END AS sample_rate,
           (CASE WHEN share > 0
                 THEN (CAST(share AS DOUBLE) * t.tstar) / CAST(kk * total_tokens AS DOUBLE)
                 ELSE 0.0 END) * CAST(total_tokens AS DOUBLE) AS expected_tokens
    FROM c, t
    """,
)
def q_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing rates (ops.sampling.mixing_weights): per-source token
    totals + integer target shares (src<N> gets share N%4+1) → the largest
    downsample-only corpus hitting the target mixture, and each source's
    sampling rate (1.0 for the binding source). All doubles are fixed
    chains on exact integer counts — engine-reproducible."""
    shares = {f"src{i}": i % 4 + 1 for i in range(20)}
    return SA.mixing_weights(_t(spark, sf_dir, "documents"), shares)


# line_dedup demo corpus: the raw documents are single-line bags of words,
# so the query deterministically re-lines each doc (8 tokens per line) and
# appends a constant boilerplate footer to every doc — which the operator
# must then detect (doc frequency 100+) and strip from all of them. Both
# engines build the same input expression, so the check is end-to-end.
_LD_FOOTER = "copyright 2024 example corp all rights reserved"
_LD_MIN_DF = 100


@register(
    "line_dedup",
    oracle=f"""
    WITH base AS (SELECT doc_id, split(text, ' ') AS tk FROM documents),
    built AS (
        SELECT doc_id,
               concat(
                   array_to_string(
                       [array_to_string(tk[g*8+1 : g*8+8], ' ')
                        FOR g IN range(0, (len(tk)+7)//8)],
                       chr(10)),
                   chr(10), '{_LD_FOOTER}') AS text
        FROM base
    ),
    l AS (
        SELECT doc_id, u.pos AS pos, u.ln AS ln
        FROM (SELECT doc_id, split(text, chr(10)) AS ls FROM built),
             unnest([{{'pos': i, 'ln': ls[i]}} FOR i IN range(1, len(ls)+1)]) AS t(u)
    ),
    b AS (SELECT ln FROM l GROUP BY ln HAVING count(DISTINCT doc_id) >= {_LD_MIN_DF}),
    m AS (SELECT l.doc_id, l.pos, l.ln, (b.ln IS NOT NULL) AS dropped
          FROM l LEFT JOIN b USING (ln))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN NOT dropped THEN ln END,
                                   chr(10) ORDER BY pos), '')) AS dedup_md5
    FROM m GROUP BY doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate line removal (ops.text.line_dedup): drop lines present
    in ≥N distinct docs, reassemble survivors in order. Input lines are
    built deterministically (8-token lines + a constant footer on every
    doc); the footer must be stripped corpus-wide. Compared via md5 of the
    reassembled text — byte-exact reassembly in both engines."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__tk")
    )
    ng = F.expr("(size(__tk) + 7) DIV 8").cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda g: F.concat_ws(" ", F.slice(F.col("__tk"), g * 8 + 1, 8)),
    )
    built = d.select(
        "doc_id",
        F.concat(
            F.concat_ws("\n", lines), F.lit("\n"), F.lit(_LD_FOOTER)
        ).alias("text"),
    )
    out = X.line_dedup(built, min_doc_count=_LD_MIN_DF)
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5("text_dedup").alias("dedup_md5")
    )


@register(
    "embedding_clusters",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d AS (
        SELECT q.vec_id, c.cid,
               CAST(list_aggregate(
                   [(q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]) FOR i IN range(1, len(q.v)+1)],
                   'sum') AS BIGINT) AS d2
        FROM q, c
    ),
    m AS (SELECT vec_id, min(d2 * 16 + cid) AS mk FROM d GROUP BY vec_id),
    a AS (SELECT vec_id, CAST(mk % 16 AS BIGINT) AS cluster_id,
                 CAST(mk // 16 AS BIGINT) AS d2 FROM m)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id,
           CAST(max(vec_id) AS BIGINT) AS max_vec_id,
           CAST(sum(d2) AS BIGINT) AS sum_d2
    FROM a GROUP BY cluster_id
    """,
)
def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-centroid clustering rollup
    (ops.similarity.assign_to_centroids): the 8 lowest-id vectors act as
    centroids; every vector is assigned by integer squared-L2 on quantized
    embeddings (ties → lowest centroid id), centroids broadcast so the
    corpus never shuffles. Per-cluster size, id range, and exact total
    distortion."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    a = S.assign_to_centroids(emb, cents)
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("id").alias("min_vec_id"),
        F.max("id").alias("max_vec_id"),
        F.sum("d2").alias("sum_d2"),
    )


_PACK_BUDGET = 256


@register(
    "sequence_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(COALESCE(len({_TOKS}), 0) AS BIGINT) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER
                   (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS bin_first,
           CAST(CASE WHEN n_tokens > 0
                     THEN (start_offset + n_tokens - 1) // {_PACK_BUDGET}
                     ELSE start_offset // {_PACK_BUDGET} END AS BIGINT) AS bin_last,
           CAST(start_offset % {_PACK_BUDGET} AS BIGINT) AS offset_in_bin,
           CAST(CASE WHEN n_tokens > 0
                     THEN (start_offset + n_tokens - 1) // {_PACK_BUDGET}
                          - start_offset // {_PACK_BUDGET} + 1
                     ELSE 0 END AS BIGINT) AS n_bins
    FROM o
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (ops.packing.sequence_pack): each
    document's span of fixed-256-token training sequences under the global
    doc_id concat order. The global prefix sum is the two-pass
    range-bucketed scheme (bucketed window + literal per-bucket carry) —
    no global-order single-task window; the SQL twin is the plain window
    cumsum."""
    return P.sequence_pack(
        _t(spark, sf_dir, "documents"), budget=_PACK_BUDGET
    )


# --------------------------------------------------------------------------- #
# Similarity search (embeddings)
# --------------------------------------------------------------------------- #

_DOT = "list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum')"
_NORM = "list_aggregate([x * x FOR x IN v], 'sum')"


@register(
    "similarity_topk",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM vecs),
    q AS (SELECT vec_id AS query_id, v, n FROM nv WHERE vec_id < 10),
    pairs AS (
        SELECT qa.query_id, qb.vec_id AS neighbor_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST({_DOT} AS DOUBLE) / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM q qa JOIN nv qb ON qa.query_id != qb.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    ) WHERE rn <= 5
    """,
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (broadcast query side): the ANN
    correctness baseline. Integer-quantized dot/norms → engine-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk(emb, queries, k=5, id_col="vec_id", vec_col="embedding")
    return out.withColumn("rank", F.col("rank").cast("long"))


_NC, _NP = 16, 4


def _ivf_oracle_sql(query_pred: str, k: int) -> str:
    """IVF top-k oracle, parametrized by the query-vector predicate and k
    (shared by similarity_ivf and the semantic_search composition so the
    two can't drift)."""
    return f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM vecs),
    cents AS (SELECT vec_id AS centroid_id, v AS cv, n AS cn FROM nv
              ORDER BY vec_id LIMIT {_NC}),
    c_assign AS (
        SELECT vec_id AS neighbor_id, v, n, centroid_id
        FROM (
            SELECT nv.vec_id, nv.v, nv.n, cents.centroid_id,
                   row_number() OVER (
                       PARTITION BY nv.vec_id
                       ORDER BY CASE WHEN cents.cn > 0 AND nv.n > 0
                                     THEN CAST(list_aggregate([nv.v[i] * cents.cv[i] FOR i IN range(1, len(nv.v) + 1)], 'sum') AS DOUBLE)
                                          / (sqrt(nv.n) * sqrt(cents.cn))
                                     ELSE 0.0 END DESC, cents.centroid_id) AS rk
            FROM nv CROSS JOIN cents
        ) WHERE rk <= 1
    ),
    q_probe AS (
        SELECT vec_id AS query_id, v, n, centroid_id
        FROM (
            SELECT nv.vec_id, nv.v, nv.n, cents.centroid_id,
                   row_number() OVER (
                       PARTITION BY nv.vec_id
                       ORDER BY CASE WHEN cents.cn > 0 AND nv.n > 0
                                     THEN CAST(list_aggregate([nv.v[i] * cents.cv[i] FOR i IN range(1, len(nv.v) + 1)], 'sum') AS DOUBLE)
                                          / (sqrt(nv.n) * sqrt(cents.cn))
                                     ELSE 0.0 END DESC, cents.centroid_id) AS rk
            FROM nv CROSS JOIN cents
            WHERE {query_pred}
        ) WHERE rk <= {_NP}
    ),
    pairs AS (
        SELECT DISTINCT qa.query_id, qb.neighbor_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                               / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM q_probe qa JOIN c_assign qb USING (centroid_id)
        WHERE qa.query_id != qb.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    ) WHERE rn <= {k}
    """


@register("similarity_ivf", oracle=_ivf_oracle_sql("nv.vec_id < 10", 5))
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-k: probe nprobe nearest inverted
    lists only — the corpus-side work drops by ~nprobe/n_centroids."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.ivf_cosine_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


_NDT = 0.25


@register(
    "embedding_neardup",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, label, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, label, v, {_NORM} AS n FROM vecs)
    SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
           CAST(qa.label AS BIGINT) AS label,
           round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                 / (sqrt(qa.n) * sqrt(qb.n)), 6) AS cosine
    FROM nv qa JOIN nv qb ON qa.label = qb.label AND qa.vec_id < qb.vec_id
    WHERE qa.n > 0 AND qb.n > 0
      AND round(CAST(list_aggregate([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v) + 1)], 'sum') AS DOUBLE)
                / (sqrt(qa.n) * sqrt(qb.n)), 6) >= {_NDT}
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on `label` (the cluster
    assignment) so the pair space is per-block, not corpus²."""
    from timeseriesfuser_spark.ops.util import spread_small_input

    emb = spread_small_input(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("label").cast("long").alias("label"),
        S.quantized(F.col("embedding")).alias("v"),
    ).withColumn("n", S._sq_norm(F.col("v")))
    a = emb.alias("a")
    b = emb.alias("b")
    dot = S._dot(F.col("a.v"), F.col("b.v"))
    cos = F.round(
        dot.cast("double") / (F.sqrt(F.col("a.n")) * F.sqrt(F.col("b.n"))), 6
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter((F.col("a.n") > 0) & (F.col("b.n") > 0))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= _NDT)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            "cosine",
        )
    )


_SRP_P = 16


@register(
    "srp_signatures",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    planes AS (
        SELECT CAST(p AS INT) AS p,
               [({_sql_hash64("p || ':' || i")} % 2001) - 1000
                FOR i IN range(0, 64)] AS parr
        FROM range({_SRP_P}) t(p)
    )
    SELECT vecs.vec_id AS id,
           CAST(sum(CASE WHEN list_aggregate(
                       [vecs.v[i] * planes.parr[i] FOR i IN range(1, len(vecs.v) + 1)],
                       'sum') >= 0
                    THEN (CAST(1 AS BIGINT) << planes.p) ELSE 0 END) AS BIGINT) AS sh
    FROM vecs CROSS JOIN planes
    GROUP BY vecs.vec_id
    """,
)
def q_srp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH bit signatures over the embedding
    column (ops.similarity.srp_signatures): the deterministic md5-derived
    hyperplanes make the 16-bit sketch reproducible in ANSI SQL — the
    blocking key for srp_neardup_pairs, the embedding near-dup scale path."""
    return S.srp_signatures(_t(spark, sf_dir, "embeddings"), planes=_SRP_P)


@register(
    "rp_projection",
    # Same md5-derived planes as srp_signatures, but keeping the integer
    # dot products (JL compression) instead of their signs; serialized to
    # a string because the harness canonicalizer can't hash lists.
    oracle=f"""
    WITH vecs AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    planes AS (
        SELECT CAST(p AS INT) AS p,
               [({_sql_hash64("p || ':' || i")} % 2001) - 1000
                FOR i IN range(0, 64)] AS parr
        FROM range(16) t(p)
    ),
    dots AS (
        SELECT vecs.vec_id, planes.p,
               CAST(list_aggregate(
                   [vecs.v[i] * planes.parr[i] FOR i IN range(1, len(vecs.v) + 1)],
                   'sum') AS BIGINT) AS c
        FROM vecs CROSS JOIN planes
    )
    SELECT vec_id, array_to_string(list(c ORDER BY p), ',') AS proj
    FROM dots GROUP BY vec_id
    """,
)
def q_rp_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection embedding compression (ops.similarity.rp_project):
    16 integer dot products per vector against the deterministic
    md5-derived hyperplanes — the JL-style coarse representation for
    compressed-space ANN/clustering."""
    out = S.rp_project(_t(spark, sf_dir, "embeddings"), out_dim=16)
    return out.select(
        F.col("id").alias("vec_id"),
        F.concat_ws(",", F.transform("proj", lambda x: x.cast("string"))).alias(
            "proj"
        ),
    )


@register(
    "tpch_q3_shipping",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: three-way join (dimension sides
    broadcast) + exact integer-cents revenue."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    epc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(epc * (100 - dc)).cast("double") / 10000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value >= 100 THEN 10
                     WHEN value < 0 THEN -1
                     ELSE CAST(floor(value / 10) AS BIGINT) END AS BIGINT) AS bucket,
           count(*) AS n,
           min(value) AS lo,
           max(value) AS hi
    FROM events GROUP BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of a measure — one partial-aggregated
    shuffle; the building block for distribution profiling at scale."""
    ev = _events(spark, sf_dir)
    v = F.col("value")
    bucket = (
        F.when(v >= 100, F.lit(10))
        .when(v < 0, F.lit(-1))
        .otherwise(F.floor(v / 10))
        .cast("long")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )



def _asof_streams(spark, sf_dir, value_alias):
    """Shared left/right prep of the as-of contract queries: click/view
    events as the left side, the per-(user, ts) latest transaction as the
    deduped right side (so DuckDB's ASOF is deterministic). One
    definition — the backward and forward queries must agree on what the
    'transaction' stream is."""
    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type").isin(*_CLICK_TYPES)).select(
        F.col("ts").alias("__timestamp"), "event_id", "user_id", "value"
    )
    rw = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = (
        ev.filter(~F.col("event_type").isin(*_CLICK_TYPES))
        .withColumn("__rn", F.row_number().over(rw))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("ts").alias("__timestamp"),
            "user_id",
            F.col("value").alias(value_alias),
        )
    )
    return left, right


@register(
    "asof_join_user",
    oracle="""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id, event_type, value FROM events),
    l AS (SELECT t AS __timestamp, event_id, user_id, value FROM ev
          WHERE event_type IN ('click', 'view')),
    r AS (SELECT user_id, t AS __timestamp, value AS txn_value
          FROM (SELECT user_id, t, value,
                       row_number() OVER (PARTITION BY user_id, t
                                          ORDER BY event_id DESC) AS rn
                FROM ev WHERE event_type NOT IN ('click', 'view'))
          WHERE rn = 1)
    SELECT l.__timestamp, l.event_id, l.user_id, l.value,
           r.__timestamp AS __timestamp_right, r.txn_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.__timestamp >= r.__timestamp
    """,
)
def q_asof_join_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension; SURVEY §2.3 notes it as the join formulation
    of the reference's union+ffill): each click/view event joined to the
    user's latest at-or-before transaction. Single shuffle on the key +
    window — not a quadratic range join. Oracle = DuckDB's native ASOF."""
    from timeseriesfuser_spark.operators.asof import asof_join

    left, right = _asof_streams(spark, sf_dir, "txn_value")
    return asof_join(left, right, keys=["user_id"], right_cols=["txn_value"])


_ROLL = 6 * 86_400_000  # 6 days back + current = 7-day window


@register(
    "rolling_7d_stats",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS vc
                FROM events)
    SELECT event_id,
           CAST(sum(vc) OVER w AS DOUBLE) / 100 AS roll_sum,
           count(*) OVER w AS roll_n,
           CAST(sum(vc) OVER w AS DOUBLE) / 100 / count(*) OVER w AS roll_avg
    FROM ev
    WINDOW w AS (PARTITION BY event_type ORDER BY t
                 RANGE BETWEEN {_ROLL} PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_7d_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: per-type 7-day trailing sum/count/avg.
    Values summed as exact integer cents inside the frame, one double
    division at the end — frame-order-independent, so oracle-exact."""
    ev = _events(spark, sf_dir).select(
        "ts", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts")
        .rangeBetween(-_ROLL, 0)
    )
    roll_sum_c = F.sum("vc").over(w)
    roll_n = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        (roll_sum_c.cast("double") / 100).alias("roll_sum"),
        roll_n.alias("roll_n"),
        (roll_sum_c.cast("double") / 100 / roll_n).alias("roll_avg"),
    )


@register(
    "json_props_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props ->> 'k' AS BIGINT)) AS min_k,
           max(CAST(props ->> 'k' AS BIGINT)) AS max_k,
           CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS DOUBLE) / count(*) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns: JSON property extraction (JVM-side
    get_json_object, no UDF) + exact integer aggregation per key."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    cnt = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        cnt.alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        (F.sum(k).cast("double") / cnt).alias("avg_k"),
    )


# --------------------------------------------------------------------------- #
# Multimodal + streaming surfaces
# --------------------------------------------------------------------------- #


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checkable slice: binary media column →
    Arrow-batched mapInPandas → per-item byte length + sha256. The binary
    payload never leaves the executors."""
    from timeseriesfuser_spark.ops.multimodal import extract_features, text_to_media
    from timeseriesfuser_spark.ops.util import spread_small_input

    docs = spread_small_input(_t(spark, sf_dir, "documents"))
    media = text_to_media(docs, "doc_id", "text")
    return extract_features(media).select(
        "media_id", "media_type", "n_bytes", "content_sha256"
    )


@register(
    "multimodal_features",
    # The fake decode is sha256-derived (digest doubled to 64 bytes, 16
    # means of 4-byte blocks — so block i ≥ 8 repeats block i-8), which
    # DuckDB replicates from the hex digest: byte j of the digest is hex
    # chars [2j+1, 2j+2]. Each mean of four uint8s is an exact multiple of
    # 0.25, so float32 (Spark) and double (DuckDB) agree bit-for-bit and
    # '%.4f' formatting is engine-portable.
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           array_to_string(
             [printf('%.4f',
                (CAST(concat('0x', substr(sha256(text), 8*(i%8)+1, 2)) AS BIGINT)
               + CAST(concat('0x', substr(sha256(text), 8*(i%8)+3, 2)) AS BIGINT)
               + CAST(concat('0x', substr(sha256(text), 8*(i%8)+5, 2)) AS BIGINT)
               + CAST(concat('0x', substr(sha256(text), 8*(i%8)+7, 2)) AS BIGINT)
                ) / 4.0)
              FOR i IN range(16)], ',') AS features
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline incl. the deterministic fake decode +
    16-dim feature vector. The fake features derive purely from sha256 of
    the payload bytes, so the DuckDB oracle reproduces them exactly (see
    oracle comment); determinism across runs is additionally asserted in
    tests/test_sinks_replay.py.

    The typed ``array<float>`` API lives in ``ops.multimodal``; the driver
    surface serializes the vector to a string because the harness
    canonicalizer sorts columns and Python lists are unhashable
    (CORRECTNESS_r01 err). Fixed 4-decimal formatting keeps the string
    deterministic across float-repr differences."""
    from timeseriesfuser_spark.ops.multimodal import extract_features, text_to_media
    from timeseriesfuser_spark.ops.util import spread_small_input

    docs = spread_small_input(_t(spark, sf_dir, "documents"))
    feats = extract_features(text_to_media(docs, "doc_id", "text"))
    return feats.withColumn(
        "features",
        F.concat_ws(
            ",",
            F.transform("features", lambda x: F.format_string("%.4f", x)),
        ),
    )


_H1GAP = 3_600_000


@register(
    "gap_report",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_type FROM events)
    SELECT event_type,
           CAST(min(t) AS BIGINT) AS first_ts,
           CAST(max(t) AS BIGINT) AS last_ts,
           CAST({_fdiv('max(t)', _H1GAP)} - {_fdiv('min(t)', _H1GAP)} + 1
                AS BIGINT) AS n_buckets,
           CAST(count(DISTINCT {_fdiv('t', _H1GAP)}) AS BIGINT) AS n_present,
           CAST({_fdiv('max(t)', _H1GAP)} - {_fdiv('min(t)', _H1GAP)} + 1
                - count(DISTINCT {_fdiv('t', _H1GAP)}) AS BIGINT) AS n_gaps
    FROM ev GROUP BY event_type
    """,
)
def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness monitoring (A1/T2 composition): per key, how many
    1h grid intervals in the key's own [first, last] span contain no
    events. One groupBy with a count-distinct — integer bucket math only."""
    ev = _events(spark, sf_dir)
    b = F.expr(f"(ts - pmod(ts, {_H1GAP})) DIV {_H1GAP}")
    span = F.max(b) - F.min(b) + F.lit(1)
    return ev.groupBy("event_type").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        span.cast("long").alias("n_buckets"),
        F.count_distinct(b).alias("n_present"),
        (span - F.count_distinct(b)).cast("long").alias("n_gaps"),
    )


@register(
    "ngram_novelty",
    oracle=f"""
    WITH s AS ({_SHINGLE_REL}),
    o AS (SELECT id, min(id) OVER (PARTITION BY sh) AS first_id FROM s),
    a AS (SELECT id, count(*) AS n_shingles,
                 sum(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS n_novel
          FROM o GROUP BY id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(a.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(a.n_shingles, 0) > 0
                THEN CAST(a.n_novel AS DOUBLE) / CAST(a.n_shingles AS DOUBLE)
           END AS novelty
    FROM documents d LEFT JOIN a ON a.id = d.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram novelty (ops.dedup.ngram_novelty): fraction of each
    doc's distinct 3-gram shingles first seen in that doc (owner = lowest
    doc_id). First-owner via a min window partitioned by shingle — one
    shuffle on the shingle key, no self-join."""
    return D.ngram_novelty(_t(spark, sf_dir, "documents"))


@register(
    "dedup_verdicts",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
    ex AS (SELECT doc_id AS id,
                  min(doc_id) OVER (PARTITION BY md5(text)) AS ec
           FROM documents)
    SELECT ex.id AS doc_id,
           CASE WHEN ex.ec != ex.id THEN 'exact_dup'
                WHEN comp.cluster_id != ex.id THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           (CASE WHEN ex.ec != ex.id THEN 'exact_dup'
                 WHEN comp.cluster_id != ex.id THEN 'near_dup'
                 ELSE 'keep' END = 'keep') AS keep,
           CAST(CASE WHEN ex.ec != ex.id THEN ex.ec
                     ELSE comp.cluster_id END AS BIGINT) AS canonical_id
    FROM ex JOIN comp ON comp.id = ex.id
    """,
)
def q_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized per-doc keep/drop decision (ops.dedup.dedup_verdicts):
    exact content-hash dedup composed with MinHash-LSH near-dup clustering;
    survivor = lowest id, exact-dup reason takes precedence."""
    return D.dedup_verdicts(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


_SEM_TAU = 0.3


@register(
    "semantic_dedup",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    nv AS (SELECT vec_id, v, {_NORM} AS n FROM q),
    c AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d AS (
        SELECT nv.vec_id, c.cid,
               CAST(list_aggregate(
                   [(nv.v[i]-c.cv[i])*(nv.v[i]-c.cv[i]) FOR i IN range(1, len(nv.v)+1)],
                   'sum') AS BIGINT) AS d2
        FROM nv, c
    ),
    m AS (SELECT vec_id, CAST(min(d2 * 16 + cid) % 16 AS BIGINT) AS cl
          FROM d GROUP BY vec_id),
    wv AS (SELECT m.vec_id, m.cl, nv.v, nv.n FROM m JOIN nv USING (vec_id)),
    p AS (
        SELECT qa.cl AS cluster_id, qa.vec_id AS keep_id, qb.vec_id AS drop_id,
               CASE WHEN qa.n > 0 AND qb.n > 0
                    THEN round(CAST({_DOT} AS DOUBLE)
                               / (sqrt(qa.n) * sqrt(qb.n)), 6)
                    ELSE 0.0 END AS cosine
        FROM wv qa JOIN wv qb ON qa.cl = qb.cl AND qa.vec_id < qb.vec_id
    )
    SELECT cluster_id, keep_id, drop_id, cosine FROM p
    WHERE cosine >= {_SEM_TAU}
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs
    (ops.similarity.semantic_dedup_pairs): exact-integer nearest-centroid
    blocking (8 lowest-id vectors as centroids), then pairwise quantized
    cosine ONLY within each cluster — never corpus^2. Survivor = lower id."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    return S.semantic_dedup_pairs(emb, cents, threshold=_SEM_TAU)


@register(
    "embedding_quantize",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    w AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS amax FROM q),
    e AS (SELECT vec_id, amax, len(v) AS nd,
                 CASE WHEN amax > 0
                      THEN list_transform(v, x ->
                          CAST(round((CAST(x AS DOUBLE) * 127.0) / amax) AS BIGINT))
                      ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                 END AS q8
          FROM w)
    SELECT vec_id,
           CAST(nd AS BIGINT) AS n_dims,
           CAST(amax AS BIGINT) AS amax_q,
           CAST(list_aggregate(q8, 'sum') AS BIGINT) AS sum_q8,
           CAST(list_aggregate([x*x FOR x IN q8], 'sum') AS BIGINT) AS sum_sq_q8,
           CAST(len(list_filter(q8, x -> abs(x) = 127)) AS BIGINT) AS n_saturated,
           array_to_string(q8, ',') AS q8_csv
    FROM e
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization
    (ops.similarity.quantize_int8): the billion-scale ANN storage format.
    Exact-int amax over the scale-quantized vector, one double divide +
    round per element → oracle-exact. Pure projection, zero shuffle."""
    return S.quantize_int8(_t(spark, sf_dir, "embeddings"))


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


_SHUF_SHARDS = 8


@register(
    "epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST({_sql_hash64("concat('epoch0:', CAST(doc_id AS VARCHAR))")}
                % {_SHUF_SHARDS} AS BIGINT) AS shard,
           CAST({_sql_hash64("concat('epoch0:', CAST(doc_id AS VARCHAR))")}
                AS BIGINT) AS rank
    FROM documents
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (ops.sampling.epoch_shuffle): md5-derived
    60-bit rank + shard per doc — a reproducible global permutation with no
    RNG state; the op itself is a zero-shuffle projection (the permutation
    is realized by the shard-partitioned write)."""
    return SA.epoch_shuffle(
        _t(spark, sf_dir, "documents"), n_shards=_SHUF_SHARDS
    )


@register(
    "streaming_resample_1h",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, event_type, value FROM events),
    lab AS (SELECT {_ff('t', _H1)} + {_H1} AS b, event_type, value, t, event_id
            FROM ev),
    r AS (SELECT *, row_number() OVER (PARTITION BY b, event_type
                                       ORDER BY t DESC, event_id DESC) AS rn
          FROM lab)
    SELECT b AS __timestamp, event_type, value FROM r
    WHERE rn = 1 AND b <= (SELECT max(t) FROM ev)
    """,
)
def q_streaming_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming T3: availableNow file stream → watermarked
    tumbling last-value buckets → memory sink. Append mode emits exactly
    the windows whose end <= final watermark (= max event time with 0s
    delay) — the oracle's HAVING clause states that contract."""
    import tempfile
    import uuid

    from timeseriesfuser_spark.streaming import resample_stream

    # Normalize exactly like the batch path (nanos → ms integer division).
    schema = _t(spark, sf_dir, "events").schema
    # File streams need a directory; glob-filter to the events table only.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__timestamp"), "event_id", "event_type", "value"
    )
    agg = resample_stream(
        ev, "1h", keys=["event_type"], value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    name = f"sr_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="tsf_ckpt_")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
        return spark.table(name)
    finally:
        # one-shot availableNow query: remove its checkpoint state (each
        # harness run otherwise leaks a tsf_ckpt_* dir into the temp fs)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


# --------------------------------------------------------------------------- #


def flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: the fused chronological stream at sf0.001."""
    return q_fuse_merge(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------- #
# Round-5 additions: range join, anomaly flags, LM scoring, passage dedup,
# hashed classifier, PQ codes, length-bucketed batching
# --------------------------------------------------------------------------- #

_PROMO_MS = 7_200_000


@register(
    "interval_join_2h",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id, event_type, value
                FROM events),
    promo AS (SELECT user_id, event_id AS promo_id, t AS start_ms,
                     t + {_PROMO_MS} AS end_ms
              FROM ev WHERE event_type = 'purchase'),
    pts AS (SELECT user_id, event_id, t, value FROM ev
            WHERE event_type IN ('click', 'view'))
    SELECT p.promo_id, c.user_id, c.event_id,
           CAST(c.t AS BIGINT) AS ts,
           CAST(c.t - p.start_ms AS BIGINT) AS offset_ms
    FROM promo p JOIN pts c
      ON c.user_id = p.user_id AND c.t >= p.start_ms AND c.t < p.end_ms
    """,
)
def q_interval_join_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via epoch-chunked equi-join
    (operators.rangejoin.interval_join): every click/view landing inside a
    [purchase, purchase+2h) per-user window. The generalization of the
    reference's single-interval window predicate (core.py:353-420) to a
    TABLE of intervals; the plan is a hash equi-join on (user, chunk) —
    never a BroadcastNestedLoop/cartesian (gated in test_plan_quality)."""
    from timeseriesfuser_spark.operators.rangejoin import interval_join

    ev = _events(spark, sf_dir)
    promo = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("promo_id"),
        F.col("ts").alias("start_ms"),
        (F.col("ts") + _PROMO_MS).alias("end_ms"),
    )
    pts = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id", "ts", "value"
    )
    out = interval_join(pts, promo, keys=["user_id"], chunk_ms=_PROMO_MS)
    return out.select(
        "promo_id",
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts"),
        (F.col("ts") - F.col("start_ms")).cast("long").alias("offset_ms"),
    )


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
    "bigram_lm",
    oracle="""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    bg AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS bg
           FROM tk),
    c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1 FROM bg GROUP BY 1),
    model AS (SELECT bg, CAST(c2 * 1000000 // c1 AS BIGINT) AS ppm
              FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
    per AS (SELECT b.doc_id, count(*) AS nb, sum(m.ppm) AS sp, min(m.ppm) AS mp
            FROM bg b JOIN model m USING (bg) GROUP BY b.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
           CAST(sp AS BIGINT) AS sum_ppm,
           CAST(mp AS BIGINT) AS min_ppm,
           CASE WHEN nb > 0 THEN CAST(sp AS DOUBLE) / nb END AS avg_ppm
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM likelihood proxy (ops.lm.bigram_lm_score): KenLM-
    style quality axis — P(w2|w1) = c2/c1 stored integer-exact in ppm;
    per-doc Σ/min/avg over bigram occurrences. Model build = one word-count
    agg (+c1 derived from the distinct-bigram relation); scoring join left
    to AQE, which broadcasts small (Zipf) models and shuffles web-scale
    ones."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.bigram_lm_score(_t(spark, sf_dir, "documents"))


_QC_BUCKETS, _QC_SPAN = 1 << 20, 1000


@register(
    "quality_classifier",
    oracle=f"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    t AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    w AS (SELECT doc_id,
                 {_sql_hash64("concat('17', chr(31), tok)")} % {_QC_BUCKETS} AS bucket
          FROM t),
    ws AS (SELECT doc_id,
                  {_sql_hash64("concat('qw:', CAST(bucket AS VARCHAR))")}
                    % {2 * _QC_SPAN + 1} - {_QC_SPAN} AS wt
           FROM w),
    per AS (SELECT doc_id, count(*) AS n, sum(wt) AS s FROM ws GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s, 0) AS BIGINT) AS sum_weight,
           CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / n END AS logit,
           (coalesce(s, 0) > 0) AS label_keep
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality scorer (ops.lm.
    hashed_classifier_score): token → 2^20 feature buckets → md5-derived
    bucket weight; logit = mean weight, keep-decision integer-exact.
    Pure projection — ZERO shuffles (the per-doc sum runs inside the row
    via F.aggregate)."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.hashed_classifier_score(
        _t(spark, sf_dir, "documents"), n_buckets=_QC_BUCKETS, span=_QC_SPAN
    )


_PASS_TOK, _PASS_MAXPPM = 16, 500_000


@register(
    "passage_dedup",
    oracle=f"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    p AS (SELECT doc_id,
                 unnest([struct_pack(cs := s,
                                     pt := array_to_string(tk[s+1:s+{_PASS_TOK}], ' '))
                         FOR s IN range(0, len(tk), {_PASS_TOK})],
                        recursive := true)
          FROM tk),
    h AS (SELECT doc_id, cs, {_sql_hash64("pt")} AS hh FROM p),
    f AS (SELECT doc_id, cs,
                 row_number() OVER (PARTITION BY hh ORDER BY doc_id, cs) AS rn
          FROM h),
    per AS (SELECT doc_id, count(*) AS np,
                   sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS nd
            FROM f GROUP BY doc_id)
    SELECT doc_id,
           CAST(np AS BIGINT) AS n_passages,
           CAST(nd AS BIGINT) AS n_dup_passages,
           CAST(1000000 * nd // np AS BIGINT) AS dup_ppm,
           (1000000 * nd // np <= {_PASS_MAXPPM}) AS keep
    FROM per
    """,
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (ops.dedup.passage_dedup): RefinedWeb-
    style — non-overlapping 16-token passages, corpus-wide first-occurrence
    ownership (min(struct) window on the passage hash), per-doc dup ratio
    and keep gate. Zero-shuffle chunking + one hash-key window + one
    hash-agg."""
    return D.passage_dedup(
        _t(spark, sf_dir, "documents"),
        passage_tokens=_PASS_TOK,
        max_dup_ppm=_PASS_MAXPPM,
    )


_PQ_M, _PQ_K, _PQ_DSUB = 4, 16, 16


@register(
    "pq_codes",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_QV} AS v FROM embeddings),
    seeds AS (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) - 1 AS code
              FROM q ORDER BY vec_id LIMIT {_PQ_K}),
    cb AS (SELECT code,
                  unnest([struct_pack(sub := j,
                                      csv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])
                          FOR j IN range(0, {_PQ_M})], recursive := true)
           FROM seeds),
    ex AS (SELECT vec_id,
                  unnest([struct_pack(sub := j,
                                      sv := v[j*{_PQ_DSUB}+1:(j+1)*{_PQ_DSUB}])
                          FOR j IN range(0, {_PQ_M})], recursive := true)
           FROM q),
    d AS (SELECT e.vec_id, e.sub, cb.code,
                 CAST(list_aggregate(
                     [(e.sv[i] - cb.csv[i]) * (e.sv[i] - cb.csv[i])
                      FOR i IN range(1, len(e.sv) + 1)], 'sum') AS BIGINT) AS d2
          FROM ex e JOIN cb ON e.sub = cb.sub),
    best AS (SELECT vec_id, sub, code, d2,
                    row_number() OVER (PARTITION BY vec_id, sub
                                       ORDER BY d2, code) AS rn
             FROM d)
    SELECT vec_id,
           array_to_string(list(CAST(code AS VARCHAR) ORDER BY sub), '-') AS pq,
           CAST(sum(d2) AS BIGINT) AS sq_err
    FROM best WHERE rn = 1 GROUP BY vec_id
    """,
)
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (ops.similarity.pq_codes): 64-dim
    vectors → 4 subspaces × 16-entry codebooks (deterministic lowest-id
    seeds, integer squared-L2 argmin). The broadcast-codebook plan: corpus
    fans out ×4, probes 16 entries, never shuffles on a data key."""
    return S.pq_codes(
        _t(spark, sf_dir, "embeddings"), m=_PQ_M, k=_PQ_K
    )


_LB_BAND, _LB_BATCH, _LB_SHARDS = 16, 8, 4


@register(
    "length_batches",
    oracle=f"""
    WITH tk AS (SELECT doc_id,
                       COALESCE(len(regexp_extract_all(lower(text),
                                                       '[a-z0-9]+')), 0)
                         AS n_tokens
                FROM documents),
    r AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(n_tokens // {_LB_BAND} AS BIGINT) AS band,
                 {_sql_hash64("concat('lb0:', CAST(doc_id AS VARCHAR))")} AS rk
          FROM tk),
    s AS (SELECT *, CAST(rk % {_LB_SHARDS} AS BIGINT) AS shard FROM r),
    w AS (SELECT doc_id, n_tokens, band, shard,
                 row_number() OVER (PARTITION BY band, shard
                                    ORDER BY rk, doc_id) - 1 AS rn
          FROM s)
    SELECT doc_id, n_tokens, band, shard,
           CAST(rn // {_LB_BATCH} AS BIGINT) AS batch_in_shard,
           CAST(rn % {_LB_BATCH} AS BIGINT) AS pos_in_batch
    FROM w
    """,
)
def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (ops.packing.
    length_bucketed_batches): similar-length docs share padded batches;
    md5-rank epoch shuffle; batches cut per (band, shard) so window
    partitions are data/|bands·shards| — each shard is one writer task."""
    return P.length_bucketed_batches(
        _t(spark, sf_dir, "documents"),
        band_tokens=_LB_BAND,
        batch_size=_LB_BATCH,
        n_shards=_LB_SHARDS,
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


_SKEW_TOPN = 10


@register(
    "skew_report",
    oracle=f"""
    WITH c AS (SELECT event_type, user_id, count(*) AS cnt
               FROM events GROUP BY 1, 2),
    top AS (SELECT * FROM c ORDER BY cnt DESC, event_type, user_id
            LIMIT {_SKEW_TOPN})
    SELECT event_type, user_id,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // (SELECT count(*) FROM events) AS BIGINT)
             AS share_ppm,
           CAST(dense_rank() OVER (ORDER BY cnt DESC) AS BIGINT) AS rank
    FROM top
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key heavy-hitter diagnostics (ops.scale.key_skew_report):
    exact top-10 (event_type, user_id) counts with corpus share in ppm and
    dense rank — the pre-flight check for salting/AQE-skew decisions. One
    map-side-combinable count agg + driver-bounded TakeOrdered."""
    from timeseriesfuser_spark.ops.scale import key_skew_report

    return key_skew_report(
        _events(spark, sf_dir), ["event_type", "user_id"], top_n=_SKEW_TOPN
    )


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
        FROM ev e JOIN r ON e.k = r.k AND e.rn = r.rn + 1
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


_Q6_LO = 978_307_200_000   # 2001-01-01T00:00:00Z  (within the data's range)
_Q6_HI = 1_009_843_200_000  # 2002-01-01T00:00:00Z


@register(
    "tpch_q6_forecast",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c4
    FROM lineitem
    WHERE epoch_ms(l_shipdate) >= {_Q6_LO}
      AND epoch_ms(l_shipdate) < {_Q6_HI}
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter + global sum —
    the canonical predicate-pushdown/column-pruning showcase; the scan
    should read 4 columns and push every predicate (price·discount kept
    as exact cent×cent integer, no float aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    ship_ms = ts_epoch_ms_col(li, "l_shipdate")
    return (
        li.withColumn("__ship", ship_ms)
        .filter(
            (F.col("__ship") >= _Q6_LO)
            & (F.col("__ship") < _Q6_HI)
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(price_c * disc_c).alias("revenue_c4"),
        )
    )


_Q18_MINQTY = 150


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {_Q18_MINQTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(epoch_ms(o.o_orderdate) AS BIGINT) AS o_orderdate_ms,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): lineitem pre-aggregated to
    per-order quantity BEFORE any join (map-side combinable; the HAVING
    filter shrinks the join input to the few big orders), then joined to
    orders and broadcast-joined to customer."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MINQTY)
    )
    odate = ts_epoch_ms_col(orders, "o_orderdate")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            odate.alias("o_orderdate_ms"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            "sum_qty",
        )
    )


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def _pivot_oracle() -> str:
    cols = []
    for v in _PIVOT_TYPES:
        cols.append(
            f"CAST(sum(CASE WHEN event_type = '{v}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS {v}_n"
        )
        cols.append(
            f"CAST(sum(CASE WHEN event_type = '{v}' "
            f"THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) "
            f"AS BIGINT) AS {v}_cents"
        )
    return (
        "SELECT user_id, " + ", ".join(cols) + " FROM events GROUP BY user_id"
    )


@register("pivot_user_features", oracle=_pivot_oracle())
def q_pivot_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user feature matrix (ops.timeseries.pivot_features): one
    (count, cent-sum) column pair per event type — pivot with an EXPLICIT
    value list, so there is no domain-discovery scan and the schema is
    static; compiles to one map-side-combinable hash-agg of conditional
    aggregates."""
    return TS.pivot_features(
        _events(spark, sf_dir), pivot_values=_PIVOT_TYPES
    )


@register(
    "semantic_search",
    oracle=f"""
    WITH ann AS ({_ivf_oracle_sql("nv.vec_id < 5", 3)})
    SELECT t.query_id, t.neighbor_id, t.cosine, CAST(t.rank AS BIGINT) AS rank,
           d.lang, d.source,
           CAST(length(d.text) AS BIGINT) AS n_chars
    FROM ann t JOIN documents d ON d.doc_id = t.neighbor_id
    """,
)
def q_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval composition on the SCALE path: IVF top-3
    neighbors per query vector (probe nprobe inverted lists — never the
    Q·C brute-force product; recall vs exact is tracked by `ann_recall`),
    then the neighbor ids broadcast-joined back to `documents` for display
    metadata — the RAG serving shape (ANN hit → metadata hydrate). The
    oracle embeds the shared IVF component oracle so the composition
    can't drift from `similarity_ivf`. `similarity_topk` remains the
    labeled exactness baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    queries = emb.filter(F.col("vec_id") < 5)
    hits = S.ivf_cosine_topk(
        emb, queries, k=3, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    ).withColumn("rank", F.col("rank").cast("long"))
    return hits.join(docs, hits["neighbor_id"] == docs["doc_id"]).drop("doc_id")


_CUR_LM_MIN = 30_000

# The curation oracle COMPOSES the already-registered component oracles as
# CTEs (each body carries its own WITH — legal subquery SQL), so the
# composition can never drift from the components.
_CURATION_ORACLE = f"""
    WITH qf AS ({{qf}}),
    cls AS ({{cls}}),
    lm AS ({{lm}}),
    ex AS (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(text)) != doc_id AS is_dup
        FROM documents
    ),
    v AS (
        SELECT d.doc_id,
               CASE WHEN ex.is_dup THEN 'exact_dup'
                    WHEN NOT qf.keep THEN 'gopher:' || qf.drop_reason
                    WHEN NOT cls.label_keep THEN 'classifier'
                    WHEN coalesce(lm.sum_ppm, 0) < {_CUR_LM_MIN} * lm.n_bigrams
                         THEN 'low_lm_score'
                    ELSE 'keep' END AS verdict
        FROM documents d
        JOIN ex USING (doc_id)
        JOIN qf USING (doc_id)
        JOIN cls USING (doc_id)
        JOIN lm USING (doc_id)
    )
    SELECT doc_id, verdict, verdict = 'keep' AS keep FROM v
"""


@register(
    "curation_verdicts",
    oracle=_CURATION_ORACLE.format(
        qf=ORACLES["quality_filter"],
        cls=ORACLES["quality_classifier"],
        lm=ORACLES["bigram_lm"],
    ),
)
def q_curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-pipeline curation decision (ops.lm.curation_verdicts):
    exact-dup → Gopher gate → classifier → bigram-LM threshold composed
    with first-failing-stage reasons — the quality twin of
    `dedup_verdicts`. Each component keeps its own scalable plan; the
    composition is per-doc equi-joins."""
    from timeseriesfuser_spark.ops import lm as LM

    return LM.curation_verdicts(
        _t(spark, sf_dir, "documents"), lm_min_avg_ppm=_CUR_LM_MIN
    )


_SHARD_BYTES = 65_536


@register(
    "byte_shards",
    oracle=f"""
    WITH b AS (SELECT doc_id, CAST(COALESCE(length(text), 0) AS BIGINT)
                 AS n_bytes
               FROM documents),
    o AS (SELECT doc_id, n_bytes,
                 CAST(coalesce(sum(n_bytes) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
          FROM b)
    SELECT doc_id, n_bytes, start_offset,
           CAST(start_offset // {_SHARD_BYTES} AS BIGINT) AS shard,
           CAST(start_offset % {_SHARD_BYTES} AS BIGINT) AS shard_offset
    FROM o
    """,
)
def q_byte_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment (ops.packing.byte_shards):
    ~64 KiB shards cut over the byte prefix sum in doc order, each object
    whole in the shard holding its first byte. The prefix sum is the
    two-pass range-bucketed scheme (no global-order window); the SQL twin
    is the plain window cumsum."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        # NULL text = zero bytes, still a position in the shard order
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    return P.byte_shards(docs, _SHARD_BYTES)


@register(
    "rollup_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(GROUPING(o_orderpriority, year(o_orderdate)) AS BIGINT) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, year(o_orderdate))
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP grouping sets: revenue by
    (priority, year) + per-priority subtotals + grand total in ONE
    aggregation pass (Catalyst expands grouping sets into a single
    Expand + hash-agg — no self-union of three scans); `gid`
    disambiguates subtotal levels from genuine nulls."""
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long")
    return (
        orders.rollup("o_orderpriority", yr.alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


_PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props")


@register(
    "profile_events",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM events"""
        for c in _PROFILE_COLS
    ),
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset profiler (ops.scale.profile_columns): per-column
    null + exact distinct counts via a single multi-distinct aggregate
    (Catalyst Expand, one shuffle) exploded into report rows; the
    full-scale variant swaps in HyperLogLog (approx_count_distinct)."""
    from timeseriesfuser_spark.ops.scale import profile_columns

    return profile_columns(_t(spark, sf_dir, "events"), _PROFILE_COLS)


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


_DIFF_MID = 1_705_276_800_000  # 2024-01-15T00:00:00Z — mid-corpus


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


_Q4_LATE_MS = 90 * 86_400_000  # "shipped > 90 days after order" predicate


@register(
    "tpch_q4_late_orders",
    oracle=f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND epoch_ms(l.l_shipdate) >
                        epoch_ms(o.o_orderdate) + {_Q4_LATE_MS})
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS = LEFT SEMI join (orders with at least one
    line shipped >90 days after the order date), then a priority rollup.
    The semi join keeps orders' row count (never multiplies by matching
    lines) and Spark plans it as one shuffled semi sort-merge join the
    optimizer can flip to broadcast at small SF."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o = o.withColumn("__o_ms", ts_epoch_ms_col(o, "o_orderdate"))
    l = li.select(
        F.col("l_orderkey"),
        ts_epoch_ms_col(li, "l_shipdate").alias("__s_ms"),
    )
    sem = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["__s_ms"] > o["__o_ms"] + F.lit(_Q4_LATE_MS)),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


_DORMANT_CUT_MS = 991_353_600_000  # 2001-06-01T00:00:00Z (orders end 2001-08)


@register(
    "dormant_customers",
    oracle=f"""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_dormant
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND epoch_ms(o.o_orderdate) >= {_DORMANT_CUT_MS})
    GROUP BY c_mktsegment
    """,
)
def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS = LEFT ANTI join: customers with no order on/after the
    cutoff (churn detection; also the GDPR 'orphaned records' shape).
    The anti join probes customer against the pre-filtered recent-orders
    key set — the filter shrinks the build side before the join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    recent = (
        o.withColumn("__o_ms", ts_epoch_ms_col(o, "o_orderdate"))
        .filter(F.col("__o_ms") >= _DORMANT_CUT_MS)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    dormant = c.join(recent, "c_custkey", "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_dormant")
    )


_FUZZY_SQL = """
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_type FROM part)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@register("fuzzy_part_matches", oracle=_FUZZY_SQL)
def q_fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (ops.entity.fuzzy_match_pairs): parts
    sharing (brand, type) whose names are <=2 Levenshtein edits apart.
    One equi-join shuffle on the blocking key; the length-difference lower
    bound prunes before the edit-distance kernel runs."""
    from timeseriesfuser_spark.ops.entity import fuzzy_match_pairs

    return fuzzy_match_pairs(
        _t(spark, sf_dir, "part"),
        id_col="p_partkey",
        name_col="p_name",
        block_cols=("p_brand", "p_type"),
        max_distance=2,
    )


@register(
    "part_canonical_ids",
    oracle=f"""
    WITH RECURSIVE pr AS ({_FUZZY_SQL}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(id, r) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS canonical_id
    FROM reach GROUP BY id
    """,
)
def q_part_canonical_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (ops.entity.canonical_entities): fuzzy
    match pairs -> connected components (edge-subgraph min-label
    propagation) -> every part mapped to its group's canonical (minimum)
    id; unmatched parts map to themselves."""
    from timeseriesfuser_spark.ops.entity import canonical_entities, fuzzy_match_pairs

    part = _t(spark, sf_dir, "part")
    pairs = fuzzy_match_pairs(
        part,
        id_col="p_partkey",
        name_col="p_name",
        block_cols=("p_brand", "p_type"),
        max_distance=2,
    )
    return canonical_entities(pairs, part, id_col="p_partkey")


_Z_BITS = 16


def _zorder_oracle() -> str:
    from timeseriesfuser_spark.ops.scale import zorder_key_sql

    z = zorder_key_sql(["l_partkey", "l_suppkey"], bits=_Z_BITS)
    return f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST({z} AS BIGINT) AS zkey
    FROM lineitem
    """


@register("zorder_lineitem", oracle=_zorder_oracle())
def q_zorder_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (ops.scale.zorder_key): interleave
    the low 16 bits of (l_partkey, l_suppkey) so a range-partitioned write
    gets tight parquet min/max footers on BOTH dimensions — multi-column
    data skipping from plain column expressions; zero shuffle for the key
    itself."""
    from timeseriesfuser_spark.ops.scale import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        zorder_key(["l_partkey", "l_suppkey"], bits=_Z_BITS).alias("zkey"),
    )


@register(
    "leakage_split",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    h AS (SELECT doc_id, CAST(cluster_id AS BIGINT) AS group_id,
                 {_sql_hash64("concat('split0:', CAST(cluster_id AS VARCHAR))")}
                   % 1000000 AS hp
          FROM comp)
    SELECT doc_id, group_id,
           CASE WHEN hp < 100000 THEN 'test'
                WHEN hp < 200000 THEN 'val'
                ELSE 'train' END AS split
    FROM h
    """,
)
def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (ops.sampling.leakage_safe_split
    over near-dup clusters): the split verdict hashes the doc's CLUSTER,
    so near-duplicates can never straddle train and test — the eval-
    contamination guard a pretraining pipeline runs after dedup."""
    from timeseriesfuser_spark.ops.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    clusters = D.neardup_clusters(
        docs, num_hashes=_NH, bands=_NB, threshold=_MT
    )
    return leakage_safe_split(
        docs,
        clusters,
        id_col="doc_id",
        group_id_col="cluster_id",
        splits=(("test", 0.10), ("val", 0.10), ("train", 0.80)),
        seed="split0",
    )


_FWD_TOL = 3_600_000  # next outcome within 1 hour


@register(
    "asof_forward_label",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_id, user_id, event_type, value
                FROM events),
    l AS (SELECT t AS __timestamp, event_id, user_id, value FROM ev
          WHERE event_type IN ('click', 'view')),
    r AS (SELECT user_id, t AS __timestamp, value AS label_value
          FROM (SELECT user_id, t, value,
                       row_number() OVER (PARTITION BY user_id, t
                                          ORDER BY event_id DESC) AS rn
                FROM ev WHERE event_type NOT IN ('click', 'view'))
          WHERE rn = 1),
    j AS (SELECT l.__timestamp, l.event_id, l.user_id, l.value,
                 r.__timestamp AS rt, r.label_value AS rv
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.__timestamp <= r.__timestamp)
    SELECT __timestamp, event_id, user_id, value,
           CASE WHEN rt <= __timestamp + {_FWD_TOL} THEN rt END
             AS __timestamp_right,
           CASE WHEN rt <= __timestamp + {_FWD_TOL} THEN rv END AS label_value
    FROM j
    """,
)
def q_asof_forward_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators.asof direction='forward'): each
    click/view event labeled with the user's NEXT transaction value at or
    after it, within a 1 h tolerance — the outcome-label join of a
    training-data pipeline. Same union+carry cost class as the backward
    form (one shuffle on the key), scanned over the reversed time axis;
    oracle = DuckDB native forward ASOF + tolerance CASE."""
    from timeseriesfuser_spark.operators.asof import asof_join

    left, right = _asof_streams(spark, sf_dir, "label_value")
    return asof_join(
        left,
        right,
        keys=["user_id"],
        right_cols=["label_value"],
        direction="forward",
        tolerance_ms=_FWD_TOL,
    )


def _pagerank_oracle() -> str:
    from timeseriesfuser_spark.ops.graph import pagerank_oracle_sql

    inner = pagerank_oracle_sql(
        _minhash_sql(),
        "SELECT doc_id AS id FROM documents",
        iterations=3,
        damping_ppm=850_000,
    )
    return f"SELECT id AS doc_id, rank FROM ({inner})"


@register("doc_pagerank", oracle=_pagerank_oracle())
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (ops.graph.pagerank) over the
    symmetrized MinHash-LSH near-dup graph: 3 damped iterations, ppm
    arithmetic (integer DIV only) so the ranks are engine-reproducible.
    Per iteration one edge-equi-join + one dst hash-agg — the canonical
    distributed PageRank shape; lineage cut per round. Docs central to
    big near-dup families score high (canonical-pick heuristic)."""
    from timeseriesfuser_spark.ops.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, num_hashes=_NH, bands=_NB, threshold=_MT)
    ranks = pagerank(
        pairs,
        directed=False,
        iterations=3,
        damping_ppm=850_000,
        all_ids=docs.select("doc_id"),
    )
    return ranks.select(F.col("id").alias("doc_id"), "rank")


@register(
    "dedup_normalized",
    oracle=r"""
    SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
             AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY 1
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over NORMALIZED text (ops.dedup.exact_duplicates with
    normalize=True): whitespace-collapsed lowercase content hash, so
    case/spacing variants of the same document collapse to one group —
    the cheap first pass before near-dup machinery. Same one-shuffle
    hash-groupBy as dedup_exact."""
    return D.exact_duplicates(
        _t(spark, sf_dir, "documents"), normalize=True
    )


@register(
    "distinctive_terms",
    oracle=f"""
    WITH tok AS (SELECT source AS stratum, unnest({_TOKS}) AS tk
                 FROM documents),
    st AS (SELECT stratum, tk, count(*) AS cnt_s FROM tok GROUP BY 1, 2),
    corpus AS (SELECT tk, sum(cnt_s) AS cnt_c FROM st GROUP BY tk),
    tots AS (SELECT stratum, sum(cnt_s) AS tot_s FROM st GROUP BY stratum),
    total AS (SELECT sum(cnt_s) AS tot_c FROM st),
    scored AS (
        SELECT st.stratum, st.tk, st.cnt_s,
               st.cnt_s * 1000000 // t.tot_s AS ppm_stratum,
               c.cnt_c * 1000000 // total.tot_c AS ppm_corpus
        FROM st JOIN corpus c USING (tk)
        JOIN tots t ON st.stratum IS NOT DISTINCT FROM t.stratum, total
        WHERE st.cnt_s >= 5),
    l AS (SELECT *, ppm_stratum * 1000000 // ppm_corpus AS lift_ppm
          FROM scored WHERE ppm_corpus > 0),
    r AS (SELECT *, row_number() OVER (PARTITION BY stratum
                                       ORDER BY lift_ppm DESC, tk) AS rnk
          FROM l)
    SELECT stratum AS source, tk AS token,
           CAST(cnt_s AS BIGINT) AS cnt_s,
           CAST(ppm_stratum AS BIGINT) AS ppm_stratum,
           CAST(ppm_corpus AS BIGINT) AS ppm_corpus,
           CAST(lift_ppm AS BIGINT) AS lift_ppm,
           CAST(rnk AS BIGINT) AS rank
    FROM r WHERE rnk <= 10
    """,
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source characteristic vocabulary (ops.text.distinctive_terms):
    tokens over-represented in a source vs the corpus, exact-integer
    lift_ppm, top-10 per source. Two hash-aggs + broadcast totals; the
    ranking window runs on the aggregated source×vocab relation, never
    the exploded token stream."""
    from timeseriesfuser_spark.ops.text import distinctive_terms

    return distinctive_terms(
        _t(spark, sf_dir, "documents"),
        strata_col="source",
        min_count=5,
        top_k=10,
    )


@register(
    "customer_deciles",
    oracle="""
    WITH sp AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS spend_cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment)
    SELECT c_custkey, c_mktsegment, spend_cents,
           CAST(ntile(10) OVER w AS BIGINT) AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM sp WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY spend_cents DESC, c_custkey)
    """,
)
def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window breadth (ntile / percent_rank / cume_dist): customer
    lifetime spend bucketed into deciles within market segment, with the
    percentile position. Ordering is total (cents DESC, custkey) so every
    rank function is deterministic; percent_rank/cume_dist are single
    divisions of exact integers — engine-bit-identical. One join + one
    hash-agg + one per-segment window over the |customers|-sized
    aggregate (never over raw orders)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    sp = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend_cents"), F.col("c_custkey")
    )
    return sp.select(
        "c_custkey",
        "c_mktsegment",
        "spend_cents",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "incremental_rollup",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY user_id
    """,
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance pattern: yesterday's per-user rollup
    STATE merged with today's DELTA by re-aggregating the two partial
    relations (sum of counts, sum of sums) — the associative partial-agg
    merge every incremental 100 TB pipeline relies on instead of
    recomputing from raw. The oracle aggregates the full table directly,
    so the test proves merge(state, delta) == full recompute."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("__cents"),
    )

    def rollup(part: DataFrame) -> DataFrame:
        return part.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__cents").alias("value_cents"),
        )

    state = rollup(ev.filter(F.col("ts") < _DIFF_MID))
    delta = rollup(ev.filter(F.col("ts") >= _DIFF_MID))
    return (
        state.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )


@register(
    "hourly_active_users",
    oracle="""
    SELECT CAST(epoch_ms(ts)
                - ((epoch_ms(ts) % 3600000) + 3600000) % 3600000
                AS BIGINT) AS hour_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def q_hourly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window DISTINCT aggregation: hourly event volume and exact
    active-user count. Catalyst plans count(DISTINCT) per group as the
    two-phase Expand + partial/final aggregation — one extra shuffle, no
    per-group window; at 100 TB swap the exact count for
    approx_count_distinct (HLL) as profile_columns documents."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            # pmod-floor, not DIV: truncation diverges from the DuckDB //
            # floor for pre-1970 (negative) timestamps.
            F.expr("ts - pmod(ts, 3600000)").cast("long").alias("hour_ts")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    WITH pa AS (SELECT l_partkey,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                         AS sq,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM lineitem GROUP BY l_partkey)
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(round(l.l_quantity) AS BIGINT) * 5 * pa.cnt < pa.sq
    """,
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity order revenue): the correlated
    scalar subquery `l_quantity < 0.2 * avg(quantity) per part`
    DECORRELATED into a per-part pre-aggregate + equi-join — one extra
    hash-agg instead of a per-row subquery; the avg comparison is the
    cross-multiplied integer form (qty·5·cnt < sum) so no float division
    exists anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("__sq"), F.count(F.lit(1)).alias("__cnt")
    )
    j = li.join(pa, "l_partkey").filter(
        qty * 5 * F.col("__cnt") < F.col("__sq")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


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


@register(
    "ann_recall",
    # The oracle EMBEDS the exact and IVF oracles as CTEs (the
    # curation_verdicts pattern), so the recall measurement can never
    # drift from the two operators it grades.
    oracle=f"""
    WITH ex AS ({ORACLES["similarity_topk"]}),
    ap AS ({ORACLES["similarity_ivf"]}),
    hits AS (SELECT ex.query_id, count(*) AS c
             FROM ex JOIN ap ON ex.query_id = ap.query_id
                            AND ex.neighbor_id = ap.neighbor_id
             GROUP BY ex.query_id),
    base AS (SELECT query_id, count(*) AS n FROM ex GROUP BY query_id)
    SELECT base.query_id,
           CAST(n AS BIGINT) AS n_exact,
           CAST(coalesce(c, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(c, 0) * 1000000 // n AS BIGINT) AS recall_ppm
    FROM base LEFT JOIN hits USING (query_id)
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement: per-query recall@5 of the IVF index
    against the exact brute-force top-k — the metric every approximate
    similarity deployment tracks before trusting the fast path. One
    equi-join of two k-bounded relations + two tiny aggs; both inputs
    are the already-registered deterministic operators."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding"
    ).select("query_id", "neighbor_id")
    approx = S.ivf_cosine_topk(
        emb, queries, k=5, n_centroids=_NC, nprobe=_NP,
        id_col="vec_id", vec_col="embedding",
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.col("__n").cast("long").alias("n_exact"),
        F.coalesce("__c", F.lit(0)).cast("long").alias("n_hit"),
        F.expr("coalesce(__c, 0) * 1000000 DIV __n").cast("long").alias(
            "recall_ppm"
        ),
    )


@register(
    "lang_confusion",
    oracle=f"""
    WITH pred AS ({ORACLES["lang_id"]}),
    j AS (SELECT d.lang AS lang_true, p.lang_pred
          FROM documents d JOIN pred p USING (doc_id)),
    cells AS (SELECT lang_true, lang_pred, count(*) AS n
              FROM j GROUP BY lang_true, lang_pred),
    tot AS (SELECT lang_true, sum(n) AS t FROM cells GROUP BY lang_true)
    SELECT c.lang_true, c.lang_pred, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // t.t AS BIGINT) AS share_ppm
    FROM cells c JOIN tot t ON c.lang_true IS NOT DISTINCT FROM t.lang_true
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix: the stopword-vote lang-ID
    predictions against the documents' labeled `lang`, with the exact-ppm
    share of each true language routed to each prediction — the
    measure-before-trust companion of ann_recall, for the text side. Two
    hash-aggs over the |docs|-sized prediction join."""
    docs = _t(spark, sf_dir, "documents")
    pred = X.language_id(docs).select("doc_id", "lang_pred")
    j = docs.select("doc_id", F.col("lang").alias("lang_true")).join(
        pred, "doc_id"
    )
    cells = j.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy(F.col("lang_true").alias("__lt")).agg(
        F.sum("n").alias("__t")
    )
    # null-safe totals join: an unlabeled (NULL) language is still a row
    # of the confusion matrix, and equi-joins drop NULL keys.
    return cells.join(
        tot, cells["lang_true"].eqNullSafe(tot["__lt"])
    ).select(
        "lang_true",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000000 DIV __t").cast("long").alias("share_ppm"),
    )


@register(
    "value_equal_depth_bins",
    oracle="""
    WITH ev AS (SELECT event_id, value FROM events),
    r AS (SELECT event_id, value,
                 row_number() OVER (ORDER BY value ASC NULLS FIRST,
                                    event_id) AS rn,
                 count(*) OVER () AS n
          FROM ev)
    SELECT event_id, value,
           CAST(rn AS BIGINT) AS global_rank,
           CAST((rn - 1) * 10 // n AS BIGINT) AS bin
    FROM r
    """,
)
def q_value_equal_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-depth decile binning of the value column
    (ops.scale.quantile_bins): exact global rank via the two-pass
    range-bucketed scheme — the oracle states it as the plain
    row_number window, the Spark plan contains NO single-task stage
    (gated in tests)."""
    from timeseriesfuser_spark.ops.scale import quantile_bins

    ev = _events(spark, sf_dir).select("event_id", "value")
    return quantile_bins(ev, "value", 10, tiebreak_cols=["event_id"]).select(
        "event_id", "value", "global_rank", "bin"
    )


_CONT_T = 0.9


@register(
    "dedup_containment",
    oracle=f"""
    WITH sh AS ({_SHINGLE_REL}),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS intersection
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b, CAST(i.intersection AS BIGINT) AS intersection,
           CAST(least(sa.sz, sb.sz) AS BIGINT) AS min_size,
           CAST(i.intersection AS DOUBLE) / least(sa.sz, sb.sz) AS containment
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE CAST(i.intersection AS DOUBLE) / least(sa.sz, sb.sz) >= {_CONT_T}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment dedup (ops.dedup.ngram_containment_pairs): pairs
    where the smaller doc's shingle set is >= 90% inside the larger's —
    the quote-inclusion/page-wrapper duplication that symmetric Jaccard
    under-scores. Same inverted-index join as the Jaccard baseline; one
    int/int division."""
    return D.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=_CONT_T
    )


_FIXN = 5


@register(
    "fixed_n_sample",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source,
               {_sql_hash64("'fixed0' || ':' || source || ':' || CAST(doc_id AS VARCHAR)")}
                 % 1000000 AS hp
        FROM documents),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hp, doc_id) AS rn
          FROM h)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank
    FROM r WHERE rn <= {_FIXN}
    """,
)
def q_fixed_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget eval-set sampling (ops.sampling.stratified_fixed_n):
    exactly min(5, |stratum|) docs per source by deterministic md5 rank —
    Bernoulli sampling only hits a size in expectation; benchmark sets
    need exact budgets. One per-stratum ranking window."""
    from timeseriesfuser_spark.ops.sampling import stratified_fixed_n

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_fixed_n(
        docs, _FIXN, strata_col="source", id_col="doc_id", seed="fixed0"
    )
