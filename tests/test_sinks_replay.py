"""Tests for batched sinks (S8/S9), row-level replay (T6), and the
multimodal plumbing."""

import glob

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.multimodal import (
    extract_features,
    resize_images,
    text_to_media,
)
from timeseriesfuser_spark.replay import (
    CollectHandler,
    RoutingHandler,
    StopFlag,
    foreach_batch,
    replay,
)
from timeseriesfuser_spark.sinks import write_batched


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [Row(__timestamp=1000 * i, v=float(i), s=f"r{i}") for i in range(10)]
    )


def test_write_batched_parquet_rolls_files(spark, small_df, tmp_path):
    res = write_batched(
        small_df.repartition(1),
        str(tmp_path),
        fmt="parquet",
        rows_per_file=3,
        fulldata=True,
        count_rows=True,
    )
    assert res.rows == 10
    assert len(res.files) == 4  # ceil(10/3) rolling files
    back = spark.read.parquet(res.output_path)
    assert back.count() == 10
    full = spark.read.parquet(res.fulldata_path)
    assert full.count() == 10
    assert len(glob.glob(f"{res.fulldata_path}/*.parquet")) == 1


def test_write_batched_csv_gzip(spark, small_df, tmp_path):
    res = write_batched(
        small_df, str(tmp_path), fmt="csv", compress=True, count_rows=True
    )
    assert res.rows == 10
    assert all(f.endswith(".csv.gz") for f in res.files)
    back = spark.read.option("header", "true").csv(res.output_path)
    assert back.count() == 10


def test_replay_ordered_delivery(spark, small_df):
    h = CollectHandler()
    status = replay(small_df.orderBy(F.rand(seed=7)), h)
    assert status.status == "COMPLETED"
    assert status.rows == 10
    assert status.start_ts == 0 and status.end_ts == 9000
    got_ts = [r["__timestamp"] for r in h.get_results()]
    assert got_ts == sorted(got_ts)
    assert h.get_results()[3] == {"__timestamp": 3000, "v": 3.0, "s": "r3"}


def test_replay_stop_flag(spark, small_df):
    stop = StopFlag()

    class StopAfter3(CollectHandler):
        def process(self, ts, msg):
            super().process(ts, msg)
            if len(self.rows) == 3:
                stop.stop()

    h = StopAfter3()
    status = replay(small_df, h, stop=stop)
    assert status.status == "FORCESTOP"
    assert status.rows == 3


def test_foreach_batch_arrow(spark, small_df):
    seen = []
    total = foreach_batch(small_df, seen.append, batch_size=4)
    assert total == 10
    assert sum(b.num_rows for b in seen) == 10
    first = seen[0].to_pylist()
    assert first[0]["__timestamp"] == 0


def test_multimodal_feature_pipeline(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="hello world"),
         Row(doc_id=3, text="different bytes")]
    )
    media = text_to_media(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "content", "media_type", "meta",
    ]
    feats = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 11
    # deterministic: identical bytes -> identical hash + features
    assert by_id[1]["content_sha256"] == by_id[2]["content_sha256"]
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["features"] != by_id[3]["features"]
    assert len(by_id[1]["features"]) == 16


def test_multimodal_non_netpbm_resize_raises_in_task(spark):
    # resize is REAL for netpbm; other payloads (here: UTF-8 text bytes)
    # still need a codec library and raise inside the task at execution.
    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    media = text_to_media(docs, "doc_id", "text")
    plan = resize_images(media, 4, 4)  # lazy: building the plan is fine
    with pytest.raises(Exception, match="codec"):
        plan.collect()


def test_foreach_batch_chunked_bounded_driver(spark):
    # Force the quantile-range chunked path (n >> batch_size): ordering
    # must hold across chunk boundaries, including duplicate timestamps.
    df = spark.range(0, 1000).select(
        (F.col("id") % 97 * 1000).alias("__timestamp"), F.col("id").alias("v")
    )
    seen = []
    total = foreach_batch(df, seen.append, batch_size=100)
    assert total == 1000
    assert len(seen) >= 10  # genuinely chunked
    ts = [t for b in seen for t in b.column("__timestamp").to_pylist()]
    assert ts == sorted(ts)
    assert sum(b.num_rows for b in seen) == 1000


def test_replay_stop_cancels_spark_jobs(spark):
    # After a FORCESTOP, the job group backing the prefetching iterator is
    # cancelled: no replay jobs may stay active.
    import time as _t

    df = spark.range(0, 200_000).select(
        F.col("id").alias("__timestamp"), (F.col("id") * 2).alias("v")
    ).repartition(16)
    stop = StopFlag()

    class StopFast(CollectHandler):
        def process(self, ts, msg):
            super().process(ts, msg)
            if len(self.rows) >= 5:
                stop.stop()

    status = replay(df, StopFast(), stop=stop)
    assert status.status == "FORCESTOP"
    tracker = spark.sparkContext.statusTracker()
    deadline = _t.time() + 15
    while _t.time() < deadline and tracker.getActiveJobsIds():
        _t.sleep(0.2)
    assert tracker.getActiveJobsIds() == [], "straggler replay jobs survived stop"


def test_routing_handler_by_source_id(spark):
    # distribute_to_event_handlers parity (classes.py:279-286): one replay
    # stream fans out to two handlers keyed on the __src_id source tag.
    rows = [
        Row(__timestamp=1000 * i, __src_id=i % 2, __seq=i, v=float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    even, odd = CollectHandler(), CollectHandler()
    router = RoutingHandler({0: even, 1: odd}, drop_key_col=True)
    status = replay(df, router, remove_internal_cols=False)
    assert status.status == "COMPLETED" and status.rows == 10
    res = router.get_results()
    assert [r["v"] for r in res[0]] == [0.0, 2.0, 4.0, 6.0, 8.0]
    assert [r["v"] for r in res[1]] == [1.0, 3.0, 5.0, 7.0, 9.0]
    # key col dropped from routed messages, ordering preserved per route
    assert "__src_id" not in res[0][0]
    assert [r["__timestamp"] for r in res[1]] == sorted(
        r["__timestamp"] for r in res[1]
    )


def test_routing_handler_default_and_custom_key(spark):
    df = spark.createDataFrame(
        [Row(__timestamp=t, sym=s, v=1.0) for t, s in
         [(1, "BTC"), (2, "ETH"), (3, "DOGE"), (4, "BTC")]]
    )
    btc, rest = CollectHandler(), CollectHandler()
    router = RoutingHandler(
        {"BTC": btc}, key=lambda ts, msg: msg["sym"], default=rest
    )
    replay(df, router)
    assert [r["__timestamp"] for r in btc.get_results()] == [1, 4]
    assert [r["sym"] for r in rest.get_results()] == ["ETH", "DOGE"]


def test_routing_handler_finalize_fans_out(spark):
    from timeseriesfuser_spark.handlers import BatchEveryIntervalHandler

    df = spark.createDataFrame(
        [Row(__timestamp=t, __src_id=sid, __seq=i, p=float(t))
         for i, (t, sid) in enumerate([(5, 0), (8, 1), (20, 0), (23, 1)])]
    )
    h0 = BatchEveryIntervalHandler("10l")
    h1 = BatchEveryIntervalHandler("10l")
    router = RoutingHandler({0: h0, 1: h1}, drop_key_col=True)
    replay(df, router, remove_internal_cols=False)
    # finalize() reached both: each route flushes its final partial
    # interval; the empty (10,20] interval emits a blank (no ffill_keys)
    assert [(r["__timestamp"], r["p"]) for r in h0.get_results()] == [
        (10, 5.0), (20, None), (30, 20.0)
    ]
    assert [(r["__timestamp"], r["p"]) for r in h1.get_results()] == [
        (10, 8.0), (20, None), (30, 23.0)
    ]
