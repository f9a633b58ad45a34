"""Round-4 surface tests: ORC sources, sliding windows (batch + streaming
twin parity), deterministic epoch shuffle."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.config import SourceConfig
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.ops import sampling as SA
from timeseriesfuser_spark.ops import timeseries as TS
from timeseriesfuser_spark.sources.readers import build_source_df
from timeseriesfuser_spark.streaming import sliding_stream, stream_source


# --------------------------------------------------------------------------- #
# ORC sources
# --------------------------------------------------------------------------- #


def test_orc_source_roundtrip(spark, tmp_path):
    d = str(tmp_path / "orc_src")
    spark.createDataFrame(
        [(1000, 1.5, "x"), (2000, 2.5, "y")], "ts long, price double, tag string"
    ).coalesce(1).write.orc(d)
    src = SourceConfig(name="o", path=d, fmt="orc", ts_col="ts")
    df = build_source_df(spark, src, 0)
    rows = {r["__timestamp"]: r for r in df.collect()}
    assert set(rows) == {1000, 2000}
    assert rows[1000]["price"] == 1.5


def test_orc_declared_schema_cast(spark, tmp_path):
    # price stored as string; declared schema casts through (force_schema
    # semantics — unparseable cells would null out).
    d = str(tmp_path / "orc_cast")
    spark.createDataFrame(
        [(1000, "3.5")], "ts long, price string"
    ).coalesce(1).write.orc(d)
    src = SourceConfig(
        name="o", path=d, fmt="orc",
        schema={"ts": int, "price": float}, ts_col="ts",
    )
    df = build_source_df(spark, src, 0)
    r = df.collect()[0]
    assert r["price"] == 3.5 and isinstance(r["price"], float)


def test_orc_fuses_with_parquet(spark, tmp_path):
    od, pd_ = str(tmp_path / "o"), str(tmp_path / "p")
    spark.createDataFrame(
        [(1000, 1.0), (3000, 3.0)], "ts long, a double"
    ).coalesce(1).write.orc(od)
    spark.createDataFrame(
        [(2000, 2.0)], "ts long, b double"
    ).coalesce(1).write.parquet(pd_)
    fuser = TimeSeriesFuser(
        [
            SourceConfig(name="o", path=od, fmt="orc", ts_col="ts"),
            SourceConfig(name="p", path=pd_, fmt="parquet", ts_col="ts"),
        ]
    )
    out = fuser.fused(spark).orderBy("__timestamp").collect()
    assert [r["__timestamp"] for r in out] == [1000, 2000, 3000]
    assert out[1]["b"] == 2.0 and out[1]["a"] is None


# --------------------------------------------------------------------------- #
# Sliding windows
# --------------------------------------------------------------------------- #


def test_sliding_counts_membership(spark):
    # L=40ms, S=10ms: an event at t=25 belongs to starts {0,10,20} minus
    # none (first_ws = 20-30 = -10 -> floor grid): starts 0,10,20 and -10.
    df = spark.createDataFrame(
        [(25, "a", 1.0)], "ts long, event_type string, value double"
    )
    out = TS.sliding_counts(df, "40l", "10l").collect()
    starts = sorted(r.window_start for r in out)
    assert starts == [-10, 0, 10, 20]
    for r in out:
        assert r.window_end == r.window_start + 40
        assert r.n_events == 1 and r.sum_cents == 100


def test_sliding_rejects_non_multiple(spark):
    df = spark.createDataFrame([(0, "a", 0.0)], "ts long, event_type string, value double")
    with pytest.raises(ValueError):
        TS.sliding_counts(df, "1h", "7m")


def test_sliding_stream_matches_batch(spark, tmp_path):
    rows = [(1000 * i, float(i), "a" if i % 2 else "b") for i in range(100)]
    d = str(tmp_path / "ticks")
    spark.createDataFrame(rows, "ts long, value double, tag string").coalesce(
        1
    ).write.parquet(d)
    src = SourceConfig(
        name="ticks", path=d, fmt="parquet",
        schema={"ts": int, "value": float, "tag": str}, ts_col="ts",
    )
    stream = stream_source(spark, src, 0)
    agg = sliding_stream(
        stream, "20s", "5s", keys=["tag"], ts_col="__timestamp"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slides")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.tag, r.window_start): (r.n_events, r.sum_cents)
        for r in spark.sql("select * from slides").collect()
    }
    batch_df = spark.read.parquet(d).select(
        F.col("ts"), F.col("value"), F.col("tag").alias("tag")
    )
    want_all = {
        (r.tag, r.window_start): (r.n_events, r.sum_cents)
        for r in TS.sliding_counts(
            batch_df, "20s", "5s", key_cols=("tag",), value_col="value"
        ).collect()
    }
    # Append mode emits only windows closed by the final watermark
    # (max event time): window_end <= 99000.
    want = {k: v for k, v in want_all.items() if k[1] + 20_000 <= 99_000}
    assert got == want
    assert len(got) > 10


# --------------------------------------------------------------------------- #
# Epoch shuffle
# --------------------------------------------------------------------------- #


def test_epoch_shuffle_deterministic_and_balanced(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = SA.epoch_shuffle(df, n_shards=8, seed="epoch0").collect()
    b = SA.epoch_shuffle(df, n_shards=8, seed="epoch0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    ranks = set()
    for r in a:
        assert r.shard == r.rank % 8
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
        ranks.add(r.rank)
    assert len(ranks) == 1000  # rank collisions would break ordering
    assert set(by_shard) == set(range(8))
    assert max(by_shard.values()) < 1000 / 8 * 1.5  # roughly balanced

    # A different seed yields a different permutation.
    c = SA.epoch_shuffle(df, n_shards=8, seed="epoch1").collect()
    order_a = [r.doc_id for r in sorted(a, key=lambda r: r.rank)]
    order_c = [r.doc_id for r in sorted(c, key=lambda r: r.rank)]
    assert order_a != order_c


def test_epoch_shuffle_plan_no_exchange(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = SA.epoch_shuffle(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
