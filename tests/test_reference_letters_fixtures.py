"""Interval-resample parity on the reference's OWN letters fixtures —
the exact assertions of its test_batchinterval_handler.py:100-145 and
test_batchinterval_fill.py:57-204, run through both the vectorized
resampler and the row-level handler."""

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.handlers import BatchEveryIntervalHandler
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.replay import replay

FIX = "/root/reference/tests/integration/data/interval_handler"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not available"
)


def ts(*args):
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


def load(spark, name, limit=200):
    df = (
        spark.read.parquet(f"{FIX}/{name}.parquet")
        .withColumnRenamed("Timestamp", "__timestamp")
        .limit(limit)
    )
    return df


def both_impls(spark, df, interval, **kw):
    vec = [
        r.asDict()
        for r in resample_last_interval(df, interval, tiebreak_cols=[], **kw)
        .orderBy("__timestamp")
        .collect()
    ]
    h = BatchEveryIntervalHandler(interval, **{
        k: v for k, v in kw.items() if k in ("ffill_keys", "process_batch_end")
    })
    replay(df, h)
    assert h.get_results() == vec
    return vec


def test_1m_letters(spark):
    df = load(spark, "1minute_letters").select("__timestamp", "Letter")
    out = both_impls(spark, df, "1m", value_cols=["Letter"])
    first5 = [(r["__timestamp"], r["Letter"]) for r in out[:5]]
    assert first5 == [
        (ts(2020, 1, 1, 0, 1), "A"),
        (ts(2020, 1, 1, 0, 2), "B"),
        (ts(2020, 1, 1, 0, 3), "C"),
        (ts(2020, 1, 1, 0, 4), "D"),
        (ts(2020, 1, 1, 0, 5), "E"),
    ]


def test_1d_letters(spark):
    df = load(spark, "1day_letters").select("__timestamp", "Letter")
    out = both_impls(spark, df, "1d", value_cols=["Letter"])
    first5 = [(r["__timestamp"], r["Letter"]) for r in out[:5]]
    assert first5 == [
        (ts(2020, 1, 2), "A"),
        (ts(2020, 1, 3), "B"),
        (ts(2020, 1, 4), "C"),
        (ts(2020, 1, 5), "D"),
        (ts(2020, 1, 6), "E"),
    ]


def test_1s_letters_gap_fill(spark):
    """Events every 5 s on a 1 s grid with ffill_keys=['Letter']:
    letters carry through blank seconds, the non-fill column goes null
    (reference test_batchinterval_fill.py)."""
    df = load(spark, "1second_letters_gaps").select(
        "__timestamp", "Letter", "Nonfill_letter"
    )
    out = both_impls(
        spark, df, "1s",
        value_cols=["Letter", "Nonfill_letter"], ffill_keys=["Letter"],
    )
    letters = [r["Letter"] for r in out[:6]]
    nonfill = [r["Nonfill_letter"] for r in out[:6]]
    assert letters == ["A", "A", "A", "A", "A", "B"]
    assert nonfill == ["A", None, None, None, None, "B"]
