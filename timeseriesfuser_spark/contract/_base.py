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


# Inferred-schema memo keyed on file identity (realpath, size, mtime_ns).
# `spark.read.parquet` runs a footer-inference pass per CALL (~60-90 ms of
# driver latency each, measured sf0.1); with the schema declared the read
# plans with no inference job. Metadata only — never rows or results — and
# the mtime/size key makes a rewritten file re-infer, so results can never
# be served from a stale schema of different data.
_SCHEMA_MEMO: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    # Session TZ must be UTC for unix_millis to agree with DuckDB epoch_ms.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects
    # unless mapped to a long (of nanoseconds).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = (os.path.realpath(path), st.st_size, st.st_mtime_ns)
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = schema
    return spark.read.schema(schema).parquet(path)


def _events_ts_cuts(spark: SparkSession, sf_dir: str):
    """Range-bucket cut points (epoch-ms floats) for events.ts, derived
    ONLY from parquet footer min/max stats — a metadata read, replacing
    forward_fill's driver-side approxQuantile input pass (a full scan at
    100 TB). Balance-only by forward_fill's ``bounds`` contract; ``None``
    (no stats) falls back to the sketch."""
    from timeseriesfuser_spark.sources.readers import parquet_footer_cuts

    n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return parquet_footer_cuts(f"{sf_dir}/events.parquet", "ts", n, to_ms=True)


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


_H1GAP = 3_600_000


_DIFF_MID = 1_705_276_800_000  # 2024-01-15T00:00:00Z — mid-corpus


def _run_availablenow_to_memory(
    stream_df, prefix: str, timeout: int = 300, output_mode: str = "append"
):
    """Shared streaming-query harness: run an availableNow append query
    into a uniquely-named memory sink, return the collected rows as a
    LOCAL DataFrame, and ALWAYS tear down (stop if active, drop the
    temp view, remove the checkpoint) — the drift-prone
    uuid/mkdtemp/awaitTermination/finally block previously copy-pasted
    per harness (one older copy had already drifted and leaked its temp
    view, ADVICE r7)."""
    import shutil
    import tempfile
    import uuid

    spark = stream_df.sparkSession
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="tsf_ckpt_")
    q = None
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout):
            raise TimeoutError(
                f"{prefix}: streaming query still running after {timeout}s"
            )
        if q.exception() is not None:
            raise q.exception()
        sink = spark.table(name)
        # memory-sink rows are driver-resident; materializing lets the
        # sink table be dropped here instead of leaking for the session
        return spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        if q is not None and q.isActive:
            q.stop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
