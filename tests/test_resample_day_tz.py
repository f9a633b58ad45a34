"""Day-interval resample anchored at local midnight in a timezone,
including a DST transition (reference classes.py:787-795 semantics)."""

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import Row

from timeseriesfuser_spark.operators.resample import resample_last_interval

NY = "America/New_York"


def ny_ms(y, m, d, hh=0, mm=0):
    return int(datetime(y, m, d, hh, mm, tzinfo=ZoneInfo(NY)).timestamp() * 1000)


def utc_of(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def test_day_tz_boundaries_cross_dst(spark):
    # Events on Mar 7, 8, 9, 10 2025 local (DST starts Mar 9 in NY):
    rows = [
        Row(__timestamp=ny_ms(2025, 3, 7, 10), v="fri"),
        Row(__timestamp=ny_ms(2025, 3, 8, 10), v="sat"),
        Row(__timestamp=ny_ms(2025, 3, 9, 10), v="sun"),  # 23-hour day
        Row(__timestamp=ny_ms(2025, 3, 10, 10), v="mon"),
    ]
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, "1d", tz=NY, value_cols=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    # Boundaries = local midnights: Mar 8 (EST, 05:00Z), Mar 9 (05:00Z),
    # Mar 10 (EDT, 04:00Z), Mar 11 (04:00Z — final partial flush).
    got = [(utc_of(r["__timestamp"]), r["v"]) for r in out]
    assert [g[1] for g in got] == ["fri", "sat", "sun", "mon"]
    assert got[0][0].hour == 5  # EST midnight
    assert got[1][0].hour == 5
    assert got[2][0].hour == 4  # EDT midnight after spring-forward
    assert got[3][0].hour == 4
    # each label is exactly local midnight
    for ms, _ in [(r["__timestamp"], r) for r in out]:
        local = datetime.fromtimestamp(ms / 1000, tz=ZoneInfo(NY))
        assert (local.hour, local.minute) == (0, 0)


def test_day_tz_gap_fill_carries(spark):
    rows = [
        Row(__timestamp=ny_ms(2025, 3, 7, 10), v="a", nf="a"),
        Row(__timestamp=ny_ms(2025, 3, 11, 10), v="b", nf="b"),  # 3-day gap
    ]
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, "1d", tz=NY, value_cols=["v", "nf"], ffill_keys=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    assert [r["v"] for r in out] == ["a", "a", "a", "a", "b"]
    assert [r["nf"] for r in out] == ["a", None, None, None, "b"]


def test_day_tz_keyed_and_utc_equivalence(spark):
    # With tz=UTC, the day-tz path must agree with the fixed-grid path.
    rows = [
        Row(__timestamp=1700000000000 + i * 86_400_000 // 2, k="x", v=float(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    a = resample_last_interval(
        df, "1d", tz="UTC", keys=["k"], value_cols=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    b = resample_last_interval(
        df, "1d", keys=["k"], value_cols=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_multiday_anchored_grid_no_dropped_buckets(spark):
    # ADVICE r1 regression: '2d' grid must anchor at the first event's
    # midnight, and EVENTS must bucket against that same grid — previously
    # each event was labeled own-midnight+2d while the spine stepped from
    # min(ts), so half the buckets missed the join and rows were lost.
    rows = [
        Row(__timestamp=ny_ms(2025, 3, 7, 10), v="d7"),
        Row(__timestamp=ny_ms(2025, 3, 8, 10), v="d8"),
        Row(__timestamp=ny_ms(2025, 3, 9, 10), v="d9"),
        Row(__timestamp=ny_ms(2025, 3, 10, 10), v="d10"),
    ]
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, "2d", tz=NY, value_cols=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    got = [(utc_of(r["__timestamp"]), r["v"]) for r in out]
    # anchor = Mar 7 midnight; grid = Mar 9, Mar 11 local midnights.
    # Mar 9 bucket: last of {Mar 7, Mar 8} = d8; Mar 11 (final partial
    # flush): last of {Mar 9, Mar 10} = d10. Nothing dropped.
    assert [g[1] for g in got] == ["d8", "d10"]
    for ms in (r["__timestamp"] for r in out):
        local = datetime.fromtimestamp(ms / 1000, tz=ZoneInfo(NY))
        assert (local.hour, local.minute) == (0, 0)
    assert [g[0].date().isoformat() for g in got] == ["2025-03-09", "2025-03-11"]


def test_multiday_no_tz_anchors_at_first_event_midnight(spark):
    # 'Nd' without tz is anchored at the first event's UTC midnight
    # (reference _initialize_timing), NOT at the epoch: events on Jan 2
    # and Jan 4 with '3d' emit one boundary at Jan 5 midnight.
    def utc_ms(y, m, d, hh=0):
        return int(datetime(y, m, d, hh, tzinfo=timezone.utc).timestamp() * 1000)

    rows = [
        Row(__timestamp=utc_ms(2020, 1, 2, 6), v="a"),
        Row(__timestamp=utc_ms(2020, 1, 4, 6), v="b"),
    ]
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, "3d", value_cols=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    assert [(utc_of(r["__timestamp"]), r["v"]) for r in out] == [
        (datetime(2020, 1, 5, tzinfo=timezone.utc), "b"),
    ]


def test_multiday_gap_fill_and_ffill(spark):
    rows = [
        Row(__timestamp=ny_ms(2025, 1, 1, 12), v="a", nf="a"),
        Row(__timestamp=ny_ms(2025, 1, 9, 12), v="b", nf="b"),  # 8-day gap
    ]
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, "2d", tz=NY, value_cols=["v", "nf"], ffill_keys=["v"], tiebreak_cols=[]
    ).orderBy("__timestamp").collect()
    # grid: Jan 3, 5, 7, 9 (crossed), Jan 11 (final flush of b)
    assert [r["v"] for r in out] == ["a", "a", "a", "a", "b"]
    assert [r["nf"] for r in out] == ["a", None, None, None, "b"]
