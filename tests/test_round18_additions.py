"""Round-18 additions: the ``close_stream`` flush helper (VERDICT r11
#3 — the per-key sentinel contract packaged so a caller can't silently
flush one key and strand the rest) and its keyed end-to-end parity."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.streaming import FLUSH_SENTINEL_TS, close_stream

DAY = 86_400_000
GAP = 1_800_000


def _avail_now(out, ckpt, sink):
    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None


def test_close_stream_relation_shape(spark):
    df = spark.createDataFrame(
        [(1, 10, "a", 2.5), (1, 20, "b", None), (2, 30, "a", 1.0)],
        "user_id bigint, __timestamp bigint, event_type string, value double",
    )
    rel = close_stream(df, keys=["user_id"])
    # schema-aligned to the input (same names, types, order; nullability
    # may tighten on the literal columns — parquet append ignores it)
    assert [(f.name, f.dataType) for f in rel.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    rows = sorted(rel.collect(), key=lambda r: r["user_id"])
    assert [r["user_id"] for r in rows] == [1, 2]  # one row per distinct key
    for r in rows:
        assert r["__timestamp"] == FLUSH_SENTINEL_TS
        assert r["event_type"] is None and r["value"] is None


def test_close_stream_global_single_row(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "user_id bigint, __timestamp bigint"
    )
    rel = close_stream(df)  # keys=() → the single-state-group contract
    rows = rel.collect()
    assert len(rows) == 1
    assert rows[0]["__timestamp"] == FLUSH_SENTINEL_TS
    assert rows[0]["user_id"] is None


def test_close_stream_validation(spark):
    df = spark.createDataFrame(
        [(1, 10)], "user_id bigint, __timestamp bigint"
    )
    with pytest.raises(ValueError, match="not in input"):
        close_stream(df, keys=["nope"])
    with pytest.raises(ValueError, match="cannot also be a key"):
        close_stream(df, keys=["__timestamp"])
    with pytest.raises(ValueError, match="not in input"):
        close_stream(df, ts_col="nope")
    narrow = df.select("user_id", F.col("__timestamp").cast("int").alias("ts"))
    with pytest.raises(ValueError, match="LongType"):
        close_stream(narrow, ts_col="ts")


def test_close_stream_writer_glue_appends(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "user_id bigint, __timestamp bigint"
    )
    d = str(tmp_path / "glue")
    df.write.mode("overwrite").parquet(d)
    close_stream(df, keys=["user_id"], path=d)
    back = spark.read.parquet(d)
    assert back.count() == 4  # 2 data + 2 sentinel rows
    assert (
        back.filter(F.col("__timestamp") == FLUSH_SENTINEL_TS).count() == 2
    )


def test_keyed_funnel_flush_needs_sentinel_per_key(spark, tmp_path):
    """The trap close_stream exists for, both halves pinned: a single
    hand-rolled sentinel row flushes ONE user and strands the rest; the
    close_stream relation flushes every user and total emissions equal
    the batch per-anchor greedy chain (python reference)."""
    from timeseriesfuser_spark.streaming import window_funnel_stream

    schema = "user_id bigint, __timestamp bigint, event_type string"
    within = 2 * DAY
    # per user: anchor at t0, view inside window; chains stay PENDING at
    # stream end (no later event expires them)
    rows = []
    for u in range(5):
        t0 = u * 1000
        rows += [(u, t0, "signup"), (u, t0 + 50, "view")]

    def run(d, ckpt, got):
        def sink(bdf, _):
            got.extend(
                (r["user_id"], r["anchor_ts"], r["depth"])
                for r in bdf.collect()
            )

        stream = spark.readStream.schema(schema).parquet(str(d))
        _avail_now(
            window_funnel_stream(
                stream, ["signup", "view", "purchase"], within,
                keys=["user_id"], flush_on_close=True,
            ),
            ckpt, sink,
        )

    data = spark.createDataFrame(rows, schema)

    # HALF 1 — hand-rolled single sentinel: only user 0 flushes
    d1, got1 = tmp_path / "in1", []
    data.coalesce(1).write.mode("append").parquet(str(d1))
    spark.createDataFrame(
        [(0, FLUSH_SENTINEL_TS, None)], schema
    ).coalesce(1).write.mode("append").parquet(str(d1))
    run(d1, str(tmp_path / "ck1"), got1)
    assert {u for u, _, _ in got1} == {0}

    # HALF 2 — close_stream per-key sentinels: every user flushes
    d2, got2 = tmp_path / "in2", []
    data.coalesce(1).write.mode("append").parquet(str(d2))
    close_stream(data, keys=["user_id"], path=str(d2))
    run(d2, str(tmp_path / "ck2"), got2)
    want = {(u, u * 1000, 2) for u in range(5)}  # depth 2: signup+view
    assert set(got2) == want
