"""BatchEveryIntervalHandler (row-level T3) — cross-validated against the
vectorized resample operator on the same streams, plus the reference's
letters-fixture semantics (interval tests in the reference's
test_batchinterval_handler.py / test_batchinterval_fill.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.handlers import BatchEveryIntervalHandler
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.replay import replay


def run_handler(spark, rows, interval, **kw):
    df = spark.createDataFrame(rows)
    h = BatchEveryIntervalHandler(interval, **kw)
    replay(df, h, remove_internal_cols=True)
    return h.get_results()


def run_vectorized(spark, rows, interval, **kw):
    df = spark.createDataFrame(rows)
    out = resample_last_interval(
        df, interval, value_cols=[c for c in df.columns if c != "__timestamp"],
        tiebreak_cols=[], **kw
    )
    return [r.asDict() for r in out.orderBy("__timestamp").collect()]


CASES = [
    # sparse with gaps + final partial interval
    [Row(__timestamp=t, price=float(i), tag=chr(65 + i))
     for i, t in enumerate([5, 12, 48, 103, 155])],
    # event exactly on a boundary (drops at finalize, defers to next bucket)
    [Row(__timestamp=t, price=float(i), tag=chr(65 + i))
     for i, t in enumerate([5, 20, 30])],
    # single event
    [Row(__timestamp=7, price=1.0, tag="A")],
]


@pytest.mark.parametrize("rows", CASES)
@pytest.mark.parametrize("ffill", [(), ("price",)])
def test_handler_matches_vectorized(spark, rows, ffill):
    got = run_handler(spark, rows, "10l", ffill_keys=ffill)
    want = run_vectorized(spark, rows, "10l", ffill_keys=ffill)
    assert got == want


def test_handler_letters_semantics(spark):
    """The reference's gap-fill letters scenario
    (test_batchinterval_fill.py): events every 5s on a 1s grid,
    ffill_keys=['Letter'] carries letters through blanks while the
    non-fill column goes null."""
    rows = [
        Row(__timestamp=i * 5000 + 100, Letter=c, Nonfill_letter=c)
        for i, c in enumerate("ABC")
    ]
    out = run_handler(spark, rows, "1s", ffill_keys=["Letter"])
    letters = [r["Letter"] for r in out]
    nonfill = [r["Nonfill_letter"] for r in out]
    # boundaries: 1s..5s blank-carry A, 6s flush B's predecessor etc.
    assert letters[:6] == ["A", "A", "A", "A", "A", "B"]
    assert nonfill[:6] == ["A", None, None, None, None, "B"]
    assert out[0]["__timestamp"] == 1000
    # final partial interval flushed (last event not on a boundary)
    assert out[-1]["Letter"] == "C" and out[-1]["Nonfill_letter"] == "C"


def test_handler_no_batch_end(spark):
    rows = [Row(__timestamp=5, v=1.0), Row(__timestamp=23, v=2.0)]
    out = run_handler(spark, rows, "10l", process_batch_end=False)
    want = run_vectorized(spark, rows, "10l", process_batch_end=False)
    assert out == want
    assert out[-1]["__timestamp"] == 20  # 30 (partial) dropped
