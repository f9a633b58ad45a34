"""Unit semantics for ops.timeseries: OHLC bars, VWAP bars, transitions.

Oracle parity at sf scale lives in test_entry_oracle.py; these pin the edge
semantics (tie-breaking, null/zero weights, first-event exclusion) on tiny
hand-checkable frames.
"""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops import timeseries as TS

H1 = 3_600_000


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


def test_ohlc_open_close_tiebreak(spark):
    # Two events at the SAME ts in one bucket: seq (event_id) must break the
    # tie — open = lower seq, close = higher seq. Plus one later event.
    df = spark.createDataFrame(
        [
            (1000, 1, "a", 5.0),
            (1000, 2, "a", 7.0),
            (2000, 3, "a", 6.0),
        ],
        "ts long, event_id long, event_type string, value double",
    )
    out = TS.ohlc_bars(df, "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert r.bar_ts == 0
    assert r.open == 5.0      # ts tie -> lower event_id
    assert r.close == 6.0     # chronologically last
    assert r.high == 7.0 and r.low == 5.0
    assert r.n_events == 3
    assert r.sum_cents == 500 + 700 + 600


def test_ohlc_bucket_boundaries(spark):
    # An event exactly on a boundary belongs to the bucket it starts.
    df = spark.createDataFrame(
        [(H1 - 1, 1, "a", 1.0), (H1, 2, "a", 2.0)],
        "ts long, event_id long, event_type string, value double",
    )
    out = {r.bar_ts: r for r in TS.ohlc_bars(df, "1h").collect()}
    assert set(out) == {0, H1}
    assert out[0].close == 1.0 and out[H1].open == 2.0


def test_vwap_exact_and_zero_weight(spark):
    df = spark.createDataFrame(
        [
            (0, "a", 10.0, 2),
            (1, "a", 20.0, 3),
            (2, "b", 5.0, 0),     # zero total weight -> NULL vwap
            (3, "c", 5.0, None),  # null weight -> excluded from both sums
        ],
        "ts long, event_type string, value double, weight long",
    )
    out = {r.event_type: r for r in TS.vwap_bars(df, "1d").collect()}
    a = out["a"]
    assert a.pw_cents == 1000 * 2 + 2000 * 3
    assert a.sum_weight == 5
    assert a.vwap_cents == pytest.approx(8000 / 5, abs=0)
    assert out["b"].vwap_cents is None
    assert out["c"].vwap_cents is None and out["c"].pw_cents is None


def test_transitions_per_user_sequences(spark):
    # user 1: a(0) -> b(10) -> a(30); user 2: b(5) alone (no transition).
    df = spark.createDataFrame(
        [
            (0, 1, 1, "a"),
            (10, 2, 1, "b"),
            (30, 3, 1, "a"),
            (5, 4, 2, "b"),
        ],
        "ts long, event_id long, user_id long, event_type string",
    )
    out = {(r.prev_type, r.next_type): r for r in TS.event_transitions(df).collect()}
    assert set(out) == {("a", "b"), ("b", "a")}
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert (ab.n, ab.min_gap_ms, ab.max_gap_ms, ab.sum_gap_ms) == (1, 10, 10, 10)
    assert (ba.n, ba.sum_gap_ms) == (1, 20)
    assert ba.avg_gap_ms == 20.0


def test_transitions_ts_tie_uses_seq(spark):
    # Same-ts events ordered by event_id: a(id1) -> b(id2) at ts=0.
    df = spark.createDataFrame(
        [(0, 2, 1, "b"), (0, 1, 1, "a")],
        "ts long, event_id long, user_id long, event_type string",
    )
    out = TS.event_transitions(df).collect()
    assert len(out) == 1
    assert (out[0].prev_type, out[0].next_type, out[0].gap_ms if hasattr(out[0], "gap_ms") else out[0].sum_gap_ms) == ("a", "b", 0)


def test_ohlc_plan_is_single_hash_agg(spark):
    # Scale gate: the physical plan must be scan -> partial agg -> exchange
    # on the group key -> final agg. No window exchange, no sort-on-all.
    df = spark.range(1000).select(
        (F.col("id") * 1000).alias("ts"),
        F.col("id").alias("event_id"),
        F.lit("a").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    plan = TS.ohlc_bars(df, "1h")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
