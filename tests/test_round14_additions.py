"""Round-14 session additions: scale-safe lateness_stats (two-pass
range-bucketed running max), single-action window_funnel + per-user
depth surface, persisted/bucketed token index, default-on LSH skew
telemetry, and the round's ADVICE fixes."""

import pyspark.sql.functions as F
import pytest


class TestLatenessBucketed:
    def test_one_group_flood_matches_serial(self, spark):
        """100k rows in ONE group with shuffled arrival order: the
        bucketed formulation must equal the serial running-max result
        (computed here with a deliberate single-bucket call)."""
        from timeseriesfuser_spark.ops.timeseries import lateness_stats

        n = 100_000
        df = spark.range(n).select(
            F.lit("only").alias("event_type"),
            F.col("id").alias("event_id"),
            # event time scrambled vs arrival: multiplicative hash mod n
            ((F.col("id") * 48271) % n).cast("long").alias("ts"),
        )
        fast = lateness_stats(df).collect()[0]
        slow = lateness_stats(df, num_buckets=1).collect()[0]
        assert fast.asDict() == slow.asDict()
        assert fast["n"] == n and fast["n_late"] > 0

    def test_multi_group_ties_and_nulls(self, spark):
        from timeseriesfuser_spark.ops.timeseries import lateness_stats

        rows = [
            ("a", 1, 100), ("a", 2, 50), ("a", 3, 200), ("a", 4, None),
            ("b", 1, 10), ("b", 2, 10), ("b", None, 99),
        ]
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long"
        )
        out = {r["event_type"]: r for r in lateness_stats(df, num_buckets=4).collect()}
        assert out["a"]["n"] == 3 and out["a"]["n_late"] == 1
        assert out["a"]["max_late_ms"] == 50 and out["a"]["sum_late_ms"] == 50
        assert out["b"]["n"] == 2 and out["b"]["n_late"] == 0
