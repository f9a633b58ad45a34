"""Property-based differential tests (hypothesis): random streams checked
across independent implementations of the same semantics —

- resample: the stateful row-level handler vs the vectorized DataFrame plan;
- forward fill: the two-pass range-bucketed scheme vs a naive
  single-partition window.

Each pair is implemented independently, so agreement on random inputs is
strong evidence for both."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.handlers import BatchEveryIntervalHandler
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.replay import replay

# distinct, sorted-agnostic small timestamp lists; values 0..999
stream = st.lists(
    st.tuples(st.integers(min_value=0, max_value=400), st.integers(0, 999)),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=stream, step=st.sampled_from(["7l", "10l", "25l"]), ffill=st.booleans())
@SETTINGS
def test_resample_handler_vs_vectorized(spark, rows, step, ffill):
    data = [Row(__timestamp=t, v=float(v)) for t, v in rows]
    df = spark.createDataFrame(data)
    ffill_keys = ["v"] if ffill else []

    h = BatchEveryIntervalHandler(step, ffill_keys=ffill_keys)
    replay(df, h)
    got = h.get_results()

    want_df = resample_last_interval(
        df, step, value_cols=["v"], ffill_keys=ffill_keys, tiebreak_cols=[]
    )
    want = [r.asDict() for r in want_df.orderBy("__timestamp").collect()]
    assert got == want


pair_streams = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 200), st.sampled_from(["a", "b"])),
        min_size=1, max_size=15, unique_by=lambda t: t,
    ),
    st.lists(
        st.tuples(st.integers(0, 200), st.sampled_from(["a", "b"]), st.integers(0, 99)),
        min_size=0, max_size=15, unique_by=lambda t: (t[0], t[1]),
    ),
)


@given(data=pair_streams, tol=st.sampled_from([None, 30]))
@SETTINGS
def test_asof_join_vs_naive_quadratic(spark, data, tol):
    from timeseriesfuser_spark.operators.asof import asof_join

    lrows, rrows = data
    left = spark.createDataFrame(
        [Row(__timestamp=t, k=k) for t, k in lrows], "__timestamp long, k string"
    )
    right = spark.createDataFrame(
        [Row(__timestamp=t, k=k, rv=v) for t, k, v in rrows],
        "__timestamp long, k string, rv long",
    )
    got = {
        (r["k"], r["__timestamp"]): r["rv"]
        for r in asof_join(left, right, keys=["k"], tolerance_ms=tol).collect()
    }
    # naive python reference: latest right at-or-before, same key, in window
    want = {}
    for lt, lk in lrows:
        best = None
        for rt, rk, rv in rrows:
            if rk == lk and rt <= lt and (tol is None or lt - rt <= tol):
                if best is None or rt > best[0]:
                    best = (rt, rv)
        want[(lk, lt)] = best[1] if best else None
    assert got == want


@given(rows=stream, nulls=st.sets(st.integers(0, 400)))
@SETTINGS
def test_forward_fill_vs_naive_window(spark, rows, nulls):
    data = [
        Row(__timestamp=t, v=(None if t in nulls else float(v)))
        for t, v in rows
    ]
    df = spark.createDataFrame(data, "__timestamp long, v double")

    got = {
        r["__timestamp"]: r["v"]
        for r in forward_fill(df, ["__timestamp"], ["v"], num_partitions=3).collect()
    }
    naive_w = Window.orderBy("__timestamp").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["__timestamp"]: r["v"]
        for r in df.withColumn(
            "v", F.last("v", ignorenulls=True).over(naive_w)
        ).collect()
    }
    assert got == want
