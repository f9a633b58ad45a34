"""Polymorphic time coercion — semantics from reference
helpers/helpers.py:35-95 (digit-count heuristic, ISO strings, naive=UTC)."""

from datetime import datetime, timezone

import pytest

from timeseriesfuser_spark.timeutils import coerce_to_epoch_ms, iso_utc, parse_size_bytes


def test_millis_passthrough():
    assert coerce_to_epoch_ms(1627776123213) == 1627776123213


def test_seconds_upscaled():
    assert coerce_to_epoch_ms(1627776123) == 1627776123000


def test_ambiguous_digit_count_rejected():
    with pytest.raises(ValueError):
        coerce_to_epoch_ms(12345)


def test_iso_string():
    assert coerce_to_epoch_ms("2021-08-01T00:02:03.213Z") == 1627776123213
    assert coerce_to_epoch_ms("2021-08-01T00:02:03.213+00:00") == 1627776123213


def test_numeric_string():
    assert coerce_to_epoch_ms("1627776123213") == 1627776123213
    assert coerce_to_epoch_ms("1627776123") == 1627776123000


def test_datetime_aware_and_naive():
    dt = datetime(2021, 8, 1, 0, 2, 3, 213000, tzinfo=timezone.utc)
    assert coerce_to_epoch_ms(dt) == 1627776123213
    with pytest.warns(UserWarning):
        assert coerce_to_epoch_ms(dt.replace(tzinfo=None)) == 1627776123213


def test_iso_utc_none_safe():
    assert iso_utc(None) is None
    assert iso_utc(0) == "1970-01-01T00:00:00+00:00"


def test_parse_size_bytes():
    assert parse_size_bytes("1.5MB") == int(1.5 * 1024 * 1024)
    assert parse_size_bytes("512B") == 512
