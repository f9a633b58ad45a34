"""Interval math unit tests — assertions mirror the reference's
tests/unit/test_string_to_unix_interval_conversion.py:10-47 and
tests/unit/test_next_intervals.py:13-60 (root ts 1627776123213)."""

from datetime import datetime, timezone

import pytest

from timeseriesfuser_spark.intervals import (
    interval_to_ms,
    next_boundary_ms,
    step_boundary_ms,
    floor_boundary_ms,
)

ROOT_TS = 1627776123213  # 2021-08-01T00:02:03.213Z


def iso(ms: int) -> str:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).isoformat()


def test_interval_to_ms():
    assert interval_to_ms("100l") == 100
    assert interval_to_ms("1s") == 1000
    assert interval_to_ms("10s") == 10_000
    assert interval_to_ms("1m") == 60_000
    assert interval_to_ms("5m") == 300_000
    assert interval_to_ms("1h") == 3_600_000
    assert interval_to_ms("2h") == 7_200_000
    assert interval_to_ms("1d") == 86_400_000
    with pytest.raises(ValueError):
        interval_to_ms("10x")
    with pytest.raises(ValueError):
        interval_to_ms("s")


def test_next_boundary_aligns():
    # ceil to the next grid point
    assert iso(next_boundary_ms(ROOT_TS, "1s")) == "2021-08-01T00:02:04+00:00"
    assert iso(next_boundary_ms(ROOT_TS, "1m")) == "2021-08-01T00:03:00+00:00"
    assert iso(next_boundary_ms(ROOT_TS, "1h")) == "2021-08-01T01:00:00+00:00"
    assert iso(next_boundary_ms(ROOT_TS, "1d")) == "2021-08-02T00:00:00+00:00"
    assert next_boundary_ms(ROOT_TS, "100l") == 1627776123300
    assert next_boundary_ms(ROOT_TS, "10s") == 1627776130000


def test_next_boundary_exact_boundary_advances_full_interval():
    on_boundary = 1627776120000  # exactly :02:00
    assert next_boundary_ms(on_boundary, "1m") == on_boundary + 60_000
    assert next_boundary_ms(on_boundary, "1s") == on_boundary + 1000


def test_step_boundary_no_alignment():
    assert step_boundary_ms(ROOT_TS, "1h") == ROOT_TS + 3_600_000
    assert step_boundary_ms(ROOT_TS, "100l") == ROOT_TS + 100


def test_negative_epoch_floors_correctly():
    # pre-1970 timestamps are legal (reference docs: negative values allowed)
    assert floor_boundary_ms(-1500, 1000) == -2000
    assert next_boundary_ms(-1500, "1s") == -1000
    assert next_boundary_ms(-1000, "1s") == 0


def test_day_boundary_timezone_midnight():
    # 2021-08-01T00:02:03Z is 2021-07-31T20:02 in New York → next NY midnight
    # is 2021-08-01T00:00 EDT = 04:00 UTC.
    nxt = next_boundary_ms(ROOT_TS, "1d", tz="America/New_York")
    assert iso(nxt) == "2021-08-01T04:00:00+00:00"
    # Tokyo (UTC+9): next Tokyo midnight after 09:02 JST is Aug 2 00:00 JST.
    nxt = next_boundary_ms(ROOT_TS, "1d", tz="Asia/Tokyo")
    assert iso(nxt) == "2021-08-01T15:00:00+00:00"
