"""LTTB downsampling (ops.timeseries.lttb_downsample) — the parallel
variant: equal-time slots, neighbor-slot centroid anchors, exact
integer cross-multiplied areas. The mid-slot pick below is
hand-verified: anchors a=(1000, 10/3), c=(5500, 1.5); area(3000,1) ∝
6833, area(4000,0) ∝ 9500 → (4000, 0) wins slot 1."""

import pytest

from timeseriesfuser_spark.ops.timeseries import lttb_downsample

VALS = [0, 1, 9, 1, 0, 1, 2, 1, 0, 5]


def series(spark, rows=None):
    rows = rows or [(i * 1000, float(v)) for i, v in enumerate(VALS)]
    return spark.createDataFrame(rows, "ts long, value double")


def test_hand_verified_selection(spark):
    out = lttb_downsample(series(spark), 4)
    got = sorted((r["slot"], r["ts"], r["value"]) for r in out.collect())
    assert got == [
        (0, 0, 0.0),       # first slot -> earliest point
        (1, 4000, 0.0),    # mid: larger triangle than (3000, 1.0)
        (2, 6000, 2.0),    # mid: larger triangle than (5000, 1.0)
        (3, 9000, 5.0),    # last slot -> latest point
    ]


def test_outputs_are_input_points_and_bounded(spark):
    df = series(spark)
    out = lttb_downsample(df, 5).collect()
    assert len(out) <= 5
    pts = {(r["ts"], r["value"]) for r in out}
    inp = {(r["ts"], r["value"]) for r in df.collect()}
    assert pts <= inp
    # endpoints always survive
    assert (0, 0.0) in pts and (9000, 5.0) in pts


def test_keyed_independence(spark):
    rows = [(k, i * 1000, float(v)) for k in ("a", "b")
            for i, v in enumerate(VALS)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = lttb_downsample(df, 4, key_cols=["k"]).collect()
    per = {}
    for r in out:
        per.setdefault(r["k"], []).append((r["slot"], r["ts"]))
    assert sorted(per["a"]) == sorted(per["b"])
    assert len(per["a"]) == 4


def test_null_key_group_kept_null_points_dropped(spark):
    rows = [(None, 0, 1.0), (None, 1000, 2.0), ("a", 0, 1.0),
            ("a", 1000, None), ("a", None, 3.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = lttb_downsample(df, 3, key_cols=["k"]).collect()
    keys = sorted((r["k"] is None, r["ts"]) for r in out)
    # null-key group has 2 points (first+last slots); 'a' keeps only its
    # one fully-populated point
    assert keys == [(False, 0), (True, 0), (True, 1000)]


def test_single_slot_takes_earliest(spark):
    df = spark.createDataFrame([(5, 1.0), (5, 2.0)], "ts long, value double")
    out = lttb_downsample(df, 4).collect()
    assert [(r["ts"], r["value"]) for r in out] == [(5, 2.0)]  # tie -> max yq


def test_n_buckets_validation(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        lttb_downsample(series(spark), 2)
