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


def test_multimodal_stubs_raise(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    media = text_to_media(docs, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        resize_images(media, 4, 4)
