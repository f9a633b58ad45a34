"""Unit tests for the as-of join operator (union + windowed carry)."""

import pytest
from pyspark.sql import Row

from timeseriesfuser_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(__timestamp=100, k="a", lv=1.0),
            Row(__timestamp=200, k="a", lv=2.0),
            Row(__timestamp=50, k="b", lv=3.0),
            Row(__timestamp=500, k="b", lv=4.0),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(__timestamp=90, k="a", rv=10.0),
            Row(__timestamp=100, k="a", rv=11.0),  # tie with left@100 → wins
            Row(__timestamp=150, k="a", rv=12.0),
            Row(__timestamp=400, k="b", rv=13.0),
        ]
    )
    return left, right


def collect_map(df):
    return {(r["k"], r["__timestamp"]): r for r in df.collect()}


def test_asof_basic_and_tie(spark, frames):
    left, right = frames
    out = collect_map(asof_join(left, right, keys=["k"]))
    assert out[("a", 100)]["rv"] == 11.0  # at-or-before: tie matches
    assert out[("a", 100)]["__timestamp_right"] == 100
    assert out[("a", 200)]["rv"] == 12.0
    assert out[("b", 50)]["rv"] is None  # nothing before
    assert out[("b", 500)]["rv"] == 13.0


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = collect_map(asof_join(left, right, keys=["k"], tolerance_ms=60))
    assert out[("a", 200)]["rv"] == 12.0  # 200-150=50 <= 60
    assert out[("b", 500)]["rv"] is None  # 500-400=100 > 60


def test_asof_keyless_global(spark, frames):
    left, right = frames
    out = {
        r["__timestamp"]: r
        for r in asof_join(left.drop("k"), right.drop("k")).collect()
    }
    assert out[50]["rv"] is None
    assert out[200]["rv"] == 12.0
    assert out[500]["rv"] == 13.0


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([Row(__timestamp=10, v=1.0)])
    right = spark.createDataFrame([Row(__timestamp=5, v=2.0)])
    row = asof_join(left, right).collect()[0]
    assert row["v"] == 1.0 and row["v_right"] == 2.0


def test_asof_nearest_keyed(spark, frames):
    """direction='nearest': minimal |right.ts − left.ts|, ties backward
    (the merge_asof rule)."""
    left, right = frames
    out = collect_map(
        asof_join(left, right, keys=["k"], direction="nearest")
    )
    # a@100: right@100 at distance 0 (the tie-winning arrival rv=11)
    assert out[("a", 100)]["rv"] == 11.0
    # a@200: backward 150 (d=50) beats nothing forward → 12.0
    assert out[("a", 200)]["rv"] == 12.0
    # b@50: nothing backward, forward 400 (d=350) → 13.0
    assert out[("b", 50)]["rv"] == 13.0
    assert out[("b", 50)]["__timestamp_right"] == 400
    # b@500: backward 400 → 13.0
    assert out[("b", 500)]["rv"] == 13.0


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([Row(__timestamp=100, k="a", lv=1.0)])
    right = spark.createDataFrame(
        [
            Row(__timestamp=90, k="a", rv=1.0),   # d=10 backward
            Row(__timestamp=110, k="a", rv=2.0),  # d=10 forward
        ]
    )
    out = asof_join(left, right, keys=["k"], direction="nearest").collect()
    assert out[0]["rv"] == 1.0
    assert out[0]["__timestamp_right"] == 90


def test_asof_nearest_tolerance_and_keyless(spark, frames):
    left, right = frames
    out = collect_map(
        asof_join(
            left, right, keys=["k"], direction="nearest", tolerance_ms=60
        )
    )
    assert out[("a", 200)]["rv"] == 12.0   # d=50 within 60
    assert out[("b", 50)]["rv"] is None    # forward d=350 > 60
    assert out[("b", 500)]["rv"] is None   # backward d=100 > 60

    # keyless global: two-pass LOCF path both directions
    got = {
        r["__timestamp"]: r["rv"]
        for r in asof_join(
            left.drop("k"), right.drop("k"), direction="nearest"
        ).collect()
    }
    assert got[50] == 10.0   # nearest of 90 (d=40) vs nothing below
    assert got[200] == 12.0  # 150 (d=50) beats 400 (d=200)
    assert got[500] == 13.0


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Property check vs pandas.merge_asof(direction='nearest') on a
    randomized keyed fixture."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    lpd = pd.DataFrame(
        {
            "__timestamp": np.sort(rng.randint(0, 10_000, 300)),
            "k": rng.choice(["x", "y", "z"], 300),
        }
    )
    lpd["lid"] = np.arange(len(lpd))
    rpd = pd.DataFrame(
        {
            "__timestamp": np.sort(rng.randint(0, 10_000, 200)),
            "k": rng.choice(["x", "y", "z"], 200),
            "rv": rng.randn(200).round(6),
        }
    )
    # merge_asof needs unique (ts) per key ordering; drop dup (k, ts) to
    # keep the last-arrival convention out of the comparison
    rpd = rpd.drop_duplicates(["k", "__timestamp"], keep="last")
    expect = pd.merge_asof(
        lpd.sort_values("__timestamp", kind="stable"),
        rpd.sort_values("__timestamp", kind="stable"),
        on="__timestamp",
        by="k",
        direction="nearest",
    ).set_index("lid")["rv"]

    got_df = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        keys=["k"],
        direction="nearest",
    )
    got = {r["lid"]: r["rv"] for r in got_df.collect()}
    for lid, ev in expect.items():
        gv = got[lid]
        if pd.isna(ev):
            assert gv is None, lid
        else:
            assert gv == pytest.approx(ev), lid
