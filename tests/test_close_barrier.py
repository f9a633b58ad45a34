"""Ordering-proof close barrier (VERDICT r13 #4) and watermark-gated
straggler sessions (ADVICE r13 #1).

The barrier test is the adversarial delivery the r13 verdict asked for:
``maxFilesPerTrigger=1`` AND a data file whose mtime is forced PAST the
sentinel's, so the file source delivers the sentinel BEFORE the last
data — the regime where the mtime-bump heuristic cannot help. The flush
must park on the embedded barrier and apply only once the group's
event-time high mark reaches it; output equals the single-batch run."""

import os

DAY = 86_400_000
GAP = 1_800_000
M = 60_000
SCHEMA = "user_id bigint, __timestamp bigint"
FSCHEMA = "user_id bigint, __timestamp bigint, event_type string"


def _stage_split(spark, tmp_path, rows, keys, schema=SCHEMA):
    """Write rows[0] first, sentinel second, rows[1] LAST (mtime forced
    past the sentinel) — sentinel outruns the tail data."""
    from timeseriesfuser_spark.streaming import close_stream

    d = str(tmp_path / "in")
    ev_full = spark.createDataFrame(rows[0] + rows[1], schema)
    spark.createDataFrame(rows[0], schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    close_stream(ev_full, keys, path=d)
    sent_mt = max(
        os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    before = {
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    }
    spark.createDataFrame(rows[1], schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    for f in os.listdir(d):
        p = os.path.join(d, f)
        if f.endswith(".parquet") and p not in before:
            os.utime(p, (sent_mt + 10, sent_mt + 10))  # data AFTER sentinel
    return d


def _drain(q):
    q.awaitTermination(180)
    if q.exception() is not None:
        raise q.exception()


def test_sessionize_flush_survives_sentinel_before_data(spark, tmp_path):
    from timeseriesfuser_spark.streaming import sessionize_stream

    rows = [
        [(1, 10 * M), (1, 12 * M), (2, 50 * M)],
        [(1, 13 * M), (2, 52 * M)],  # staged after the sentinel
    ]
    d = _stage_split(spark, tmp_path, rows, ["user_id"])
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        sessionize_stream(stream, GAP, flush_on_close=True)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # one session per user spanning BOTH staged parts — the sentinel
    # (delivered mid-stream) must not have flushed the prefix early
    assert sorted(got) == [
        (1, 10 * M, 13 * M, 3),
        (2, 50 * M, 52 * M, 2),
    ]


def test_peak_flush_survives_sentinel_before_data(spark, tmp_path):
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    rows = [
        [(1, 10 * M), (2, 15 * M)],
        [(1, 20 * M), (2, 22 * M)],  # same sessions continue after sentinel
    ]
    d = _stage_split(spark, tmp_path, rows, [])
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["day"], r["n_sessions"], r["peak_concurrent"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        peak_concurrency_stream(stream, GAP, flush_on_close=True)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # 2 users, one session each, overlapping → day 0: n=2, peak=2.
    # An early flush would emit day 0 twice (split sessions).
    assert got == [(0, 2, 2)]


def test_funnel_flush_survives_sentinel_before_data(spark, tmp_path):
    from timeseriesfuser_spark.streaming import window_funnel_stream

    rows = [
        [(1, 10 * M, "view"), (1, 11 * M, "cart")],
        [(1, 12 * M, "buy")],  # completes the funnel after the sentinel
    ]
    d = _stage_split(spark, tmp_path, rows, ["user_id"], schema=FSCHEMA)
    got = []

    def sink(bdf, bid):
        got.extend((r["user_id"], r["anchor_ts"], r["depth"])
                   for r in bdf.collect())

    stream = spark.readStream.schema(FSCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        window_funnel_stream(
            stream, ["view", "cart", "buy"], 60 * M, flush_on_close=True
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # full depth 3 — an early flush would have retired the anchor at 2
    assert got == [(1, 10 * M, 3)]


def test_session_spans_flush_survives_sentinel_before_data(spark, tmp_path):
    from timeseriesfuser_spark.streaming import session_spans_stream

    rows = [
        [(1, 10 * M), (1, 12 * M)],
        [(1, 14 * M)],
    ]
    d = _stage_split(spark, tmp_path, rows, ["user_id"])
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["day"], r["session_start"], r["session_end"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        session_spans_stream(stream, GAP, n_shards=4, flush_on_close=True)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    assert got == [(0, 10 * M, 14 * M)]


def test_plain_sentinel_still_flushes_immediately(spark, tmp_path):
    """A hand-rolled FLUSH_SENTINEL_TS row (barrier 0) keeps the legacy
    flush-immediately contract."""
    from timeseriesfuser_spark.streaming import (
        FLUSH_SENTINEL_TS,
        sessionize_stream,
    )

    d = str(tmp_path / "in")
    spark.createDataFrame([(1, 10 * M), (1, 12 * M)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(d)
    spark.createDataFrame([(1, FLUSH_SENTINEL_TS)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(d)
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["user_id"], r["session_start"], r["session_end"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(SCHEMA).parquet(d)
    q = (
        sessionize_stream(stream, GAP, flush_on_close=True)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    assert got == [(1, 10 * M, 12 * M)]


# ------------------------- watermark-gated stragglers (ADVICE r13 #1)


def _run_peak(spark, d, ckpt, rows_out, **kw):
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    stream = spark.readStream.schema(SCHEMA).parquet(str(d))
    out = peak_concurrency_stream(stream, GAP, **kw)

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
    _drain(q)


def test_peak_chaining_straggler_merges_across_batches(spark, tmp_path):
    """A gap-separated earlier group whose end + gap_ms is still at/above
    the watermark must stay PENDING (not eager-close): a later-batch
    straggler that chains with it merges into ONE session. The old eager
    close counted the chain as two sessions."""
    d = tmp_path / "in"
    ckpt = str(tmp_path / "ck")
    got = []
    late = 4 * 3600_000  # 4h disorder horizon
    s0 = 5 * 3600_000  # day-0 05:00 carried session
    spark.createDataFrame(
        [(1, s0), (1, s0 + 5 * M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_peak(spark, d, ckpt, got, late_ms=late)
    assert got == []

    # straggler group 2h before the carried start: gap-separated from it,
    # and NOT yet watermark-eligible (end + gap >= wm = s0 + 5m − 4h)
    g1 = s0 - 2 * 3600_000
    spark.createDataFrame(
        [(1, g1), (1, g1 + 5 * M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_peak(spark, d, ckpt, got, late_ms=late)
    assert got == []  # parked, nothing emitted

    # chaining straggler 20m after the parked group's end (within gap):
    # must MERGE with it — one session [g1, g1+25m]
    spark.createDataFrame(
        [(1, g1 + 25 * M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_peak(spark, d, ckpt, got, late_ms=late)

    # advance the watermark past day 0 + gap to finalize
    adv = DAY + GAP + late + 3600_000
    spark.createDataFrame(
        [(9, adv), (9, adv + M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run_peak(spark, d, ckpt, got, late_ms=late)
    # merged straggler session + carried session = 2 (eager close → 3)
    assert got == [(0, 2, 1)]


def test_spans_chaining_straggler_merges_across_batches(spark, tmp_path):
    from timeseriesfuser_spark.streaming import session_spans_stream

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    late = 4 * 3600_000
    s0 = 5 * 3600_000
    got = []

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(d)
        q = (
            session_spans_stream(stream, GAP, n_shards=2, late_ms=late)
            .writeStream.foreachBatch(
                lambda bdf, bid: got.extend(
                    (r["day"], r["session_start"], r["session_end"])
                    for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    spark.createDataFrame(
        [(1, s0), (1, s0 + 5 * M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    run()
    g1 = s0 - 2 * 3600_000
    spark.createDataFrame(
        [(1, g1), (1, g1 + 5 * M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    run()
    assert got == []  # parked
    spark.createDataFrame([(1, g1 + 25 * M)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(d)
    run()
    adv = DAY + GAP + late + 3600_000
    spark.createDataFrame(
        [(1, adv), (1, adv + M)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    run()
    # the straggler chain emitted as ONE span [g1, g1+25m], then the
    # carried session [s0, s0+5m]
    assert sorted(got) == [
        (0, g1, g1 + 25 * M),
        (0, s0, s0 + 5 * M),
    ]
