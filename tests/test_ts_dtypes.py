"""The driver regenerates testdata between rounds and the `ts` physical type
has already drifted once (round 1: TIMESTAMP(NANOS) → round 2: timestamp[us]
naive → Spark TIMESTAMP_NTZ, which broke every events query). This test
fabricates events.parquet with each dtype the driver could plausibly ship —
TIMESTAMP (LTZ), TIMESTAMP_NTZ, epoch-ns / epoch-us / epoch-ms / epoch-s
bigint — and asserts contract._events normalizes all of them to the same
epoch-ms longs."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from timeseriesfuser_spark.contract import _events
from timeseriesfuser_spark.timeutils import ts_epoch_ms_col

# 2024-01-01T00:00:01.234Z and 2025-06-30T23:59:59.999Z
MS = [1704067201234, 1751327999999]
UTC = [dt.datetime.fromtimestamp(m / 1000.0, tz=dt.timezone.utc) for m in MS]
NAIVE = [u.replace(tzinfo=None) for u in UTC]


def _write_events(path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(tbl, str(path))


CASES = {
    "timestamp_ltz": pa.array(UTC, pa.timestamp("us", tz="UTC")),
    "timestamp_ntz_us": pa.array(NAIVE, pa.timestamp("us")),
    "epoch_ns_bigint": pa.array([m * 1_000_000 for m in MS], pa.int64()),
    "epoch_us_bigint": pa.array([m * 1_000 for m in MS], pa.int64()),
    "epoch_ms_bigint": pa.array(MS, pa.int64()),
    "epoch_s_bigint": pa.array([m // 1000 for m in MS], pa.int64()),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_events_normalizes_every_ts_dtype(spark, tmp_path, case):
    _write_events(tmp_path / "events.parquet", CASES[case])
    ev = _events(spark, str(tmp_path))
    assert dict(ev.dtypes)["ts"] == "bigint"
    got = {r["event_id"]: r["ts"] for r in ev.select("event_id", "ts").collect()}
    want = dict(zip([1, 2], MS))
    if case == "epoch_s_bigint":  # second precision truncates the ms part
        want = {k: (v // 1000) * 1000 for k, v in want.items()}
    assert got == want


def test_nanos_survive_exactly(spark):
    # epoch-nanos exceed 2^53: integer DIV must not round-trip via double.
    ns = 1704067201234567891  # ...234.567891 ms — expect exact floor to ms
    df = spark.createDataFrame([(ns,)], "ts long")
    (row,) = df.select(ts_epoch_ms_col(df, "ts").alias("ms")).collect()
    assert row["ms"] == 1704067201234


def test_epoch_unit_heuristic_roundtrip_property(spark):
    """Property: for any instant in 1973–2260 and any epoch unit the
    driver might ship, ts_epoch_ms_col recovers the same epoch-ms (up to
    the unit's own precision)."""
    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=100_000_000_000, max_value=9_150_000_000_000),
           st.sampled_from(["s", "ms", "us", "ns"]))
    def collect(ms, unit):
        mult = {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[unit]
        raw = (ms // 1000) if unit == "s" else ms * mult
        want = (ms // 1000) * 1000 if unit == "s" else ms
        cases.append((raw, want))

    collect()
    df = spark.createDataFrame([(r,) for r, _ in cases], "ts long")
    got = [r["ms"] for r in
           df.select(ts_epoch_ms_col(df, "ts").alias("ms")).collect()]
    assert got == [w for _, w in cases]
