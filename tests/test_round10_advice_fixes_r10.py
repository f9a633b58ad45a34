"""Regression tests for the round-9 ADVICE fixes (applied in round 10).

1. ``ops.__init__`` no longer shadows ``entity.fuzzy_match_pairs`` with the
   text deletion-neighborhood op — the text op exports as ``fuzzy_text_pairs``.
2. ``ts_epoch_ms_col`` on DATE is session-timezone independent
   (``unix_date``-based), so ``rfm_segments`` / ``cohort_ltv`` day and
   period indices do not shift in a non-UTC session.
"""

import datetime

import pytest
from pyspark.sql import functions as F


def test_package_fuzzy_exports_distinct():
    from timeseriesfuser_spark import ops
    from timeseriesfuser_spark.ops import entity, text

    assert ops.fuzzy_match_pairs is entity.fuzzy_match_pairs
    assert ops.fuzzy_text_pairs is text.fuzzy_match_pairs
    assert ops.fuzzy_text_pairs is text.fuzzy_text_pairs
    assert ops.__all__.count("fuzzy_match_pairs") == 1
    assert ops.__all__.count("fuzzy_text_pairs") == 1


@pytest.fixture()
def la_timezone(spark):
    """Temporarily run the session in a non-UTC timezone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_ts_epoch_ms_col_date_tz_independent(la_timezone):
    spark = la_timezone
    from timeseriesfuser_spark.timeutils import ts_epoch_ms_col

    df = spark.createDataFrame(
        [(datetime.date(2024, 3, 15),), (datetime.date(1969, 12, 31),)],
        "d date",
    )
    got = [r[0] for r in df.select(ts_epoch_ms_col(df, "d")).collect()]
    # UTC midnights regardless of the LA session timezone.
    assert got == [1710460800000, -86400000]


def test_rfm_day_index_tz_independent(spark):
    from timeseriesfuser_spark.ops.behavior import rfm_segments

    rows = [
        (1, datetime.date(2024, 1, 1), 10.0),
        (1, datetime.date(2024, 1, 9), 20.0),
        (2, datetime.date(2024, 1, 5), 5.0),
        (2, datetime.date(2024, 1, 6), 7.0),
        (3, datetime.date(2024, 1, 2), 50.0),
    ]
    df = spark.createDataFrame(rows, "o_custkey bigint, o_orderdate date, o_totalprice double")

    def run():
        return sorted(
            tuple(r) for r in rfm_segments(df, k=2).collect()
        )

    utc = run()
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        la = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == la
    assert utc  # non-degenerate


def test_rfm_bigint_epoch_ms_not_read_as_seconds(spark):
    """An epoch-ms BIGINT ts must go through the unit heuristic, not
    CAST-as-seconds (which would land in year 55976)."""
    from timeseriesfuser_spark.ops.behavior import rfm_segments

    ms = 1704067200000  # 2024-01-01
    rows = [(1, ms, 10.0), (2, ms + 86400000 * 4, 5.0)]
    df = spark.createDataFrame(rows, "o_custkey bigint, o_orderdate bigint, o_totalprice double")
    out = {r["o_custkey"]: r["recency_days"] for r in rfm_segments(df, k=2).collect()}
    # max day is custkey 2's; custkey 1 is exactly 4 days older.
    assert out[2] == 0
    assert out[1] == 4
