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


class TestLaggedCrosscorr:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "ts long, event_id long, event_type string, value double"
        )

    def test_perfect_lead_detected(self, spark):
        from timeseriesfuser_spark.ops.timeseries import lagged_crosscorr

        # B(t+1 bucket) == A(t): r must be exactly 1.0 at lag 1
        vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0]
        rows = []
        for i, v in enumerate(vals):
            rows.append((i * 3_600_000 + 10, i * 10 + 1, "A", v))
            rows.append(((i + 1) * 3_600_000 + 10, i * 10 + 2, "B", v))
        out = lagged_crosscorr(
            self._mk(spark, rows), "A", "B", [-1, 0, 1], "1h",
            key_col="event_type",
        ).collect()
        by_lag = {r["lag"]: r for r in out}
        assert by_lag[1]["pearson_r"] == 1.0
        assert by_lag[1]["n_pairs"] == len(vals)
        assert by_lag[0]["n_pairs"] == len(vals) - 1  # overlap shrinks

    def test_last_per_bucket_wins(self, spark):
        from timeseriesfuser_spark.ops.timeseries import lagged_crosscorr

        # two A events in one bucket: the later one is the bar close
        rows = [
            (10, 1, "A", 100.0), (20, 2, "A", 1.0),
            (15, 3, "B", 1.0),
            (3_600_000 + 10, 4, "A", 2.0), (3_600_000 + 20, 5, "B", 2.0),
        ]
        out = lagged_crosscorr(
            self._mk(spark, rows), "A", "B", [0], "1h", key_col="event_type"
        ).collect()
        assert out[0]["pearson_r"] == 1.0  # (1,1),(2,2) — 100.0 superseded

    def test_zero_variance_null(self, spark):
        from timeseriesfuser_spark.ops.timeseries import lagged_crosscorr

        rows = [
            (i * 3_600_000, i * 10 + o, t, v)
            for i in range(4)
            for o, (t, v) in enumerate([("A", 7.0), ("B", float(i))])
        ]
        out = lagged_crosscorr(
            self._mk(spark, rows), "A", "B", [0], "1h", key_col="event_type"
        ).collect()
        assert out[0]["pearson_r"] is None  # A constant
        assert out[0]["n_pairs"] == 4

    def test_empty_lags_rejected(self, spark):
        import pytest as _pytest

        from timeseriesfuser_spark.ops.timeseries import lagged_crosscorr

        with _pytest.raises(ValueError, match="lags"):
            lagged_crosscorr(self._mk(spark, []), "A", "B", [], "1h")


class TestRollingCorr:
    def test_windows_and_exactness(self, spark):
        from timeseriesfuser_spark.ops.timeseries import rolling_corr

        # y = 2x for 5 days: r = 1.0 once n >= 2; day 0 is NULL (n=1)
        rows = []
        for i in range(5):
            rows.append((i * 86_400_000 + 50, i * 10 + 1, "A", float(i)))
            rows.append((i * 86_400_000 + 60, i * 10 + 2, "B", float(2 * i)))
        df = spark.createDataFrame(
            rows, "ts long, event_id long, event_type string, value double"
        )
        out = rolling_corr(
            df, "A", "B", 3, "1d", key_col="event_type"
        ).orderBy("bar_ts").collect()
        assert [r["n_bars"] for r in out] == [1, 2, 3, 3, 3]
        assert out[0]["pearson_r"] is None
        # exact-integer sums, one float sqrt chain: 1.0 up to 1 ulp
        assert all(abs(r["pearson_r"] - 1.0) < 1e-12 for r in out[1:])

    def test_gap_days_do_not_dilute_frame(self, spark):
        from timeseriesfuser_spark.ops.timeseries import rolling_corr

        # day 1 has only A -> dropped from the pair grid; frame spans
        # bars PRESENT (days 0,2,3), so n at day 3 is 3, not 2
        rows = []
        for i, both in [(0, True), (1, False), (2, True), (3, True)]:
            rows.append((i * 86_400_000, i * 10 + 1, "A", float(i + 1)))
            if both:
                rows.append((i * 86_400_000, i * 10 + 2, "B", float(9 - i)))
        df = spark.createDataFrame(
            rows, "ts long, event_id long, event_type string, value double"
        )
        out = rolling_corr(
            df, "A", "B", 3, "1d", key_col="event_type"
        ).orderBy("bar_ts").collect()
        assert [r["n_bars"] for r in out] == [1, 2, 3]
        assert abs(out[-1]["pearson_r"] + 1.0) < 1e-12  # B falls as A rises

    def test_validation(self, spark):
        import pytest as _pytest

        from timeseriesfuser_spark.ops.timeseries import rolling_corr

        df = spark.createDataFrame(
            [], "ts long, event_id long, event_type string, value double"
        )
        with _pytest.raises(ValueError, match="window_bars"):
            rolling_corr(df, "A", "B", 0, "1d")


class TestDriftOps:
    def test_psi_drift_counts_and_shares(self, spark):
        from timeseriesfuser_spark.ops.timeseries import psi_drift

        # baseline: values in bin 0; current: shifted to bin 9 + one OOR
        rows = (
            [(i, 5.0) for i in range(4)]
            + [(100 + i, 95.0) for i in range(3)]
            + [(103, 200.0), (104, -1.0), (105, None), (None, 5.0)]
        )
        df = spark.createDataFrame(rows, "ts long, value double")
        out = {
            r["bin"]: r
            for r in psi_drift(
                df, 100, ts_col="ts", lo=0, hi=100, bins=10
            ).collect()
        }
        assert out[0]["n_base"] == 4 and out[0]["n_cur"] == 0
        assert out[9]["n_base"] == 0 and out[9]["n_cur"] == 3
        assert out[10]["n_cur"] == 1 and out[-1]["n_cur"] == 1  # OOR buckets
        assert out[0]["p_ppm"] == 1_000_000 and out[9]["q_ppm"] == 600_000
        # one-sided-empty bins carry NULL psi_term (no epsilon fudge)
        assert out[0]["psi_term"] is None
        total = sum(r["n_base"] + r["n_cur"] for r in out.values())
        assert total == 9  # null value / null ts rows dropped

    def test_psi_term_sign(self, spark):
        from timeseriesfuser_spark.ops.timeseries import psi_drift

        # both sides present in both bins, shifted mass -> positive terms
        rows = [(0, 5.0)] * 3 + [(1, 95.0)] + [(100, 5.0)] + [(101, 95.0)] * 3
        df = spark.createDataFrame(rows, "ts long, value double")
        out = psi_drift(df, 100, ts_col="ts", lo=0, hi=100, bins=10).collect()
        terms = [r["psi_term"] for r in out]
        assert all(t is not None and t > 0 for t in terms)

    def test_cusum_exact_flagging(self, spark):
        from timeseriesfuser_spark.ops.timeseries import cusum_shifts

        # 10 points at 10.0 then 10 at 30.0: mean 20.0; running mean of
        # the first k points deviates by 10.0 -> every row past warm-up
        # in the first half flags at h=500 (5.0), converging after
        rows = [(i, i, float(10 if i < 10 else 30)) for i in range(20)]
        df = spark.createDataFrame(rows, "ts long, event_id long, value double")
        out = cusum_shifts(
            df, 500, ts_col="ts", value_col="value", min_points=2
        ).orderBy("ts").collect()
        seen = [r["n_seen"] for r in out]
        assert seen[0] == 2 and 10 in seen
        # running mean at t=10 is 10.0 -> deviation exactly -10.00
        r10 = next(r for r in out if r["n_seen"] == 10)
        assert r10["cusum_cents"] == -1000.0
        # by t=20 the running mean equals the global mean: never flagged
        assert 20 not in seen

    def test_cusum_validation(self, spark):
        import pytest as _pytest

        from timeseriesfuser_spark.ops.timeseries import cusum_shifts

        df = spark.createDataFrame([], "ts long, event_id long, value double")
        with _pytest.raises(ValueError, match="threshold"):
            cusum_shifts(df, -1)
        with _pytest.raises(ValueError, match="min_points"):
            cusum_shifts(df, 1, min_points=0)
