#!/usr/bin/env python
"""End-to-end time-series analytics tour over the synthetic events table:
fuse-normalized stream → candlesticks → TWAP → anomaly flags → hourly
linear interpolation → per-user EWMA → promo-window interval join.

Run:  python examples/demo_timeseries_analytics.py [sf_dir]
(default sf_dir /root/testdata/sf0.001 — ~1k events, finishes in ~30 s)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from timeseriesfuser_spark.operators.rangejoin import interval_join
from timeseriesfuser_spark.ops.timeseries import (
    ewma,
    interpolate_grid,
    ohlc_bars,
    rolling_anomalies,
    twap_bars,
)
from timeseriesfuser_spark.timeutils import ts_epoch_ms_col


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("demo_timeseries_analytics")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts", ts_epoch_ms_col(ev, "ts"))

    print("== hourly OHLC bars (per event type) ==")
    ohlc_bars(ev, "1h").orderBy("event_type", "bar_ts").show(5)

    print("== daily TWAP per user (time-weighted LOCF integral) ==")
    twap_bars(ev, "1d").orderBy("user_id", "bar_ts").show(5)

    print("== rolling z-score anomalies (per user, 10-event baseline) ==")
    anomalies = rolling_anomalies(ev)
    anomalies.filter("is_anomaly").orderBy("user_id", "ts").show(5)
    print("flagged:", anomalies.filter("is_anomaly").count(), "events")

    print("== linear interpolation onto the hourly grid ==")
    interpolate_grid(ev, "1h").orderBy("user_id", "grid_ts").show(5)

    print("== per-user EWMA (alpha=0.25, applyInPandas recursion) ==")
    ewma(ev).orderBy("user_id", "ts").show(5)

    print("== clicks/views landing inside [purchase, purchase+2h) ==")
    promo = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("promo_id"),
        F.col("ts").alias("start_ms"),
        (F.col("ts") + 7_200_000).alias("end_ms"),
    )
    pts = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id", "ts", "value"
    )
    hits = interval_join(pts, promo, keys=["user_id"], chunk_ms=7_200_000)
    hits.orderBy("promo_id", "ts").show(5)
    print("promo-window hits:", hits.count())

    spark.stop()


if __name__ == "__main__":
    main()
