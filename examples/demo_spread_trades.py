#!/usr/bin/env python
"""End-to-end demo: fuse two exchange tick streams (trades + bid/ask
spread), resample to a 100 ms grid with forward-filled prices, write
batched output, and replay a slice row-by-row.

The Spark-native counterpart of the reference's
examples/demo_spread_trades_memecoin.py — same data, same semantics,
declarative plan instead of a file loop. Run:

    python examples/demo_spread_trades.py
"""

import os
import sys
from datetime import datetime, timezone

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import timeseriesfuser_spark as tsf  # noqa: E402

REF = "/root/reference/tests/integration/data/full_tests/sourcedata"


def ms(*args):
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("tsf_demo")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    trades = tsf.SourceConfig(
        name="trades_meme",
        path=f"{REF}/trades/binance/MEME-USDT",
        fmt="csv",
        schema=[int, float, float, int, int, int, int, int],
    )
    spread = tsf.SourceConfig(
        name="bidask_meme",
        path=f"{REF}/spread/binance/MEME-USDT",
        fmt="csv",
        schema=[int, float, float, float, float, int, int],
    )

    fuser = tsf.TimeSeriesFuser(
        [trades, spread],
        procstart=ms(2023, 11, 4, 13, 48),
        procend=ms(2023, 11, 6),
        forward_fill=True,
    )
    merged = fuser.fused(spark)
    grid = tsf.resample_last_interval(merged, "100l", ffill_keys=["Price"])

    print("resampled rows:", grid.count())
    grid.orderBy("__timestamp").show(5)

    # batched sink (rolling parquet files, 25k rows each)
    res = tsf.write_batched(
        grid, "/tmp/tsf_demo_out", fmt="parquet", rows_per_file=25_000
    )
    print("wrote", len(res.files), "batch files to", res.output_path)

    # row-level replay of the first second, reference-handler style
    class PrintFirstN(tsf.BaseHandler):
        def __init__(self, n):
            self.n, self.seen = n, 0

        def process(self, ts, msg):
            if self.seen < self.n:
                print("replay:", ts, {k: msg[k] for k in ("Price", "bid", "ask")})
            self.seen += 1

    status = tsf.replay(grid.limit(1000), PrintFirstN(3))
    print("replayed", status.rows, "rows:", status.status)
    spark.stop()


if __name__ == "__main__":
    main()
