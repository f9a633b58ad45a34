"""flush_on_close (VERDICT r10 #5): the shared end-of-stream FINALIZE
sentinel across the stateful twins that otherwise hold open state at
stream end. Each test proves the Done criterion: flushed streaming
output equals the batch op on the same data."""

from collections import defaultdict

from pyspark.sql import functions as F

from timeseriesfuser_spark.streaming import FLUSH_SENTINEL_TS

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


def _rand_rows(n, n_users, span_ms, seed=11):
    state = seed
    rows = []
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % n_users
        state = (state * 1103515245 + 12345) % (1 << 31)
        rows.append((u, state % span_ms))
    return rows


def test_sessionize_flush_equals_batch_sessions(spark, tmp_path):
    """Data batch → no final sessions; sentinel batch → every open
    session emits; total emissions == ALL sessions (python reference).
    Post-flush events start FRESH sessions (state cleared)."""
    from timeseriesfuser_spark.streaming import sessionize_stream

    schema = "user_id bigint, __timestamp bigint"
    rows = _rand_rows(300, 7, 2 * DAY)
    d = tmp_path / "fs_in"
    ckpt = str(tmp_path / "ck")
    got = []

    def sink(bdf, _):
        got.extend(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in bdf.collect()
        )

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        _avail_now(
            sessionize_stream(stream, GAP, flush_on_close=True), ckpt, sink
        )

    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    sent = [(u, FLUSH_SENTINEL_TS) for u in {u for u, _ in rows}]
    spark.createDataFrame(sent, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()

    # python reference: ALL sessions (the batch semantics)
    byu = defaultdict(list)
    for u, t in rows:
        byu[u].append(t)
    want = []
    for u, ts in byu.items():
        ts.sort()
        s, e, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - e > GAP:
                want.append((u, s, e, n))
                s, e, n = t, t, 1
            else:
                e, n = t, n + 1
        want.append((u, s, e, n))
    assert sorted(got) == sorted(want)

    # state cleared: a post-flush event within gap of the old end still
    # starts a NEW session (and flushes again on a second sentinel)
    u0, last_end = max(want, key=lambda r: r[2])[0], max(w[2] for w in want)
    extra = [(u0, last_end + 1000)]
    spark.createDataFrame(extra, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    spark.createDataFrame(
        [(u0, FLUSH_SENTINEL_TS)], schema
    ).coalesce(1).write.mode("append").parquet(str(d))
    run()
    assert (u0, last_end + 1000, last_end + 1000, 1) in got


def test_peak_concurrency_flush_equals_batch_op(spark, tmp_path):
    """Sentinel finalize: streaming emissions == the batch distributed
    sweep (ops.behavior.peak_concurrency) on the same rows — no
    trailing-day / open-session asymmetry left."""
    from timeseriesfuser_spark.ops.behavior import peak_concurrency
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    schema = "user_id bigint, __timestamp bigint"
    rows = _rand_rows(400, 9, 3 * DAY)
    d = tmp_path / "fp_in"
    ckpt = str(tmp_path / "ck")
    got = []

    def sink(bdf, _):
        got.extend(
            (r["day"], r["n_sessions"], r["peak_concurrent"])
            for r in bdf.collect()
        )

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        _avail_now(
            peak_concurrency_stream(stream, GAP, flush_on_close=True),
            ckpt, sink,
        )

    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    spark.createDataFrame(
        [(0, FLUSH_SENTINEL_TS)], schema  # one sentinel: global shard
    ).coalesce(1).write.mode("append").parquet(str(d))
    run()

    batch = spark.createDataFrame(rows, schema)
    want = sorted(
        (r["day"], r["n_sessions"], r["peak_concurrent"])
        for r in peak_concurrency(
            batch, GAP, ts_col="__timestamp"
        ).collect()
    )
    assert sorted(got) == want and want


def test_window_funnel_flush_equals_batch_depths(spark, tmp_path):
    """Sentinel finalize (same-batch shape: data + sentinel in ONE
    availableNow batch — real rows process first, flush after): per-user
    max of emitted depths == ops.behavior.window_funnel_depth."""
    from timeseriesfuser_spark.ops.behavior import window_funnel_depth
    from timeseriesfuser_spark.streaming import window_funnel_stream

    schema = "user_id bigint, __timestamp bigint, event_type string"
    steps = ["A", "B", "C"]
    state = 5
    rows = []
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % 8
        state = (state * 1103515245 + 12345) % (1 << 31)
        t = state % 500_000
        state = (state * 1103515245 + 12345) % (1 << 31)
        rows.append((u, t, ["A", "B", "C", "X"][state % 4]))
    sent = [(u, FLUSH_SENTINEL_TS, "X") for u in {r[0] for r in rows}]
    d = tmp_path / "ff_in"
    spark.createDataFrame(rows + sent, schema).coalesce(1).write.parquet(
        str(d)
    )
    got = []

    def sink(bdf, _):
        got.extend(
            (r["user_id"], r["anchor_ts"], r["depth"]) for r in bdf.collect()
        )

    stream = spark.readStream.schema(schema).parquet(str(d))
    _avail_now(
        window_funnel_stream(stream, steps, 60_000, flush_on_close=True),
        str(tmp_path / "ck"), sink,
    )

    per_user = defaultdict(int)
    for u, a, dep in got:
        per_user[u] = max(per_user[u], dep)
    batch = spark.createDataFrame(rows, schema)
    want = {
        r["user_id"]: r["depth"]
        for r in window_funnel_depth(
            batch, steps, 60_000, ts_col="__timestamp"
        ).collect()
    }
    assert dict(per_user) == want and want
