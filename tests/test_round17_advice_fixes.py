"""Round-17 ADVICE fixes (judge round 10):

- peak_concurrency_stream drops rows below the batch-start watermark —
  a late event anchored to an already-emitted day can no longer
  recreate the day in state and double-emit it (ADVICE medium).
- window_funnel_stream keeps a per-key high-water mark of retired
  anchors — a late / batch-straddling duplicate step-0 event at a
  retired instant never re-anchors (one row per anchor, ever).
- per-user streaming state keys are type-tagged (_typed_state_key), so
  ids whose str() forms collide (int 1 vs str '1') stay distinct.
"""

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

DAY = 86_400_000
GAP = 1_800_000
PC_SCHEMA = "user_id bigint, __timestamp bigint"
WF_SCHEMA = "user_id bigint, __timestamp bigint, event_type string"


def _run_pc(spark, d, ckpt, rows_out):
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    stream = spark.readStream.schema(PC_SCHEMA).parquet(str(d))
    out = peak_concurrency_stream(stream, GAP)

    def sink(batch_df, batch_id):
        rows_out.extend(
            (r["day"], r["n_sessions"], r["peak_concurrent"])
            for r in batch_df.collect()
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None


def test_peak_concurrency_late_event_never_reemits_a_day(spark, tmp_path):
    """Batch 1 finalizes day 0 (one emission). Batch 2 replays a LATE
    day-0 event (far below the watermark): the row must be dropped, not
    sessionized — no second (day 0, …) append row."""
    d = tmp_path / "pl_in"
    ckpt = str(tmp_path / "ck")
    got = []
    batch1 = [
        (1, 0), (1, 1000),                # day-0 session
        (2, 1001), (2, 2000),             # day-0 session
        (9, DAY + GAP + 10_000),          # advance wm past day 0 + gap
        (9, DAY + GAP + 20_000),
    ]
    spark.createDataFrame(batch1, PC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run_pc(spark, d, ckpt, got)
    assert got == [(0, 2, 1)]
    batch2 = [
        (5, 1000),                        # LATE: day 0, ts << wm → drop
        (9, DAY + GAP + 30_000),          # keeps the batch non-trivial
    ]
    spark.createDataFrame(batch2, PC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run_pc(spark, d, ckpt, got)
    # the ONE-row-per-day append contract holds: no duplicate day-0 row
    assert got == [(0, 2, 1)]


def _run_wf(spark, d, ckpt, rows_out, steps=("A", "B"), within=1000):
    from timeseriesfuser_spark.streaming import window_funnel_stream

    stream = spark.readStream.schema(WF_SCHEMA).parquet(str(d))
    out = window_funnel_stream(stream, list(steps), within)

    def sink(batch_df, batch_id):
        rows_out.extend(
            (r["user_id"], r["anchor_ts"], r["depth"])
            for r in batch_df.collect()
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None


def test_window_funnel_retired_anchor_never_reanchors(spark, tmp_path):
    """Anchor 0 completes in batch 1; batch 2 redelivers the step-0
    event at the same instant. Without the retired-anchor high-water
    mark it would re-anchor and retire a second time (duplicate
    (user, anchor_ts) row); with it the duplicate is ignored."""
    d = tmp_path / "wr_in"
    ckpt = str(tmp_path / "ck")
    got = []
    batch1 = [(1, 0, "A"), (1, 100, "B")]  # completes → emits (1, 0, 2)
    spark.createDataFrame(batch1, WF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run_wf(spark, d, ckpt, got)
    assert got == [(1, 0, 2)]
    batch2 = [
        (1, 0, "A"),        # duplicate step-0 at the retired anchor
        (1, 50_000, "X"),   # would expire a re-anchored funnel → 2nd row
    ]
    spark.createDataFrame(batch2, WF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run_wf(spark, d, ckpt, got)
    assert got == [(1, 0, 2)]  # exactly one row per anchor, ever


def test_window_funnel_k1_duplicate_across_batches(spark, tmp_path):
    """k=1 funnels emit on sight; a cross-batch duplicate step-0 at the
    same instant must not emit twice."""
    d = tmp_path / "w1_in"
    ckpt = str(tmp_path / "ck")
    got = []
    spark.createDataFrame(
        [(1, 500, "A")], WF_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_wf(spark, d, ckpt, got, steps=("A",))
    assert got == [(1, 500, 1)]
    spark.createDataFrame(
        [(1, 500, "A"), (1, 9000, "X")], WF_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_wf(spark, d, ckpt, got, steps=("A",))
    assert got == [(1, 500, 1)]


def test_typed_state_key_disambiguates_colliding_str_forms():
    import numpy as np

    from timeseriesfuser_spark.streaming import _typed_state_key

    # int 1 / str '1' / float 1.0: all distinct str()-collision classes
    assert _typed_state_key(1) != _typed_state_key("1")
    assert _typed_state_key(1) != _typed_state_key(1.0)
    # numpy scalars unwrap to their Python twins (stable across batches
    # whether the value arrives as np.int64 or int)
    assert _typed_state_key(np.int64(7)) == _typed_state_key(7)
    assert _typed_state_key(np.float64(1.5)) == _typed_state_key(1.5)
    assert _typed_state_key(np.str_("u1")) == _typed_state_key("u1")
    # non-JSON types fall back to a tagged repr, deterministically
    assert _typed_state_key(b"x") == _typed_state_key(b"x")
    assert _typed_state_key(b"1") != _typed_state_key("1")
