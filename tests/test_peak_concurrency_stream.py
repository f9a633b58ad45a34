"""peak_concurrency_stream (VERDICT r9 item #7): the watermarked per-day
session counter on the session-boundary grain — batch-twin equality on
finalized days, the emission contract, shard isolation, and the
checkpoint kill + resume."""

from pyspark.sql import functions as F

DAY = 86_400_000
GAP = 1_800_000
SCHEMA = "user_id bigint, __timestamp bigint"


def _run(spark, d, ckpt, rows_out):
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    stream = spark.readStream.schema(SCHEMA).parquet(str(d))
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


def test_sweep_and_emission_contract(spark, tmp_path):
    """Day 0: three users — u1 (0..10m), u2 (5m..20m), u3 (2h..2h05) →
    peak 2, n_sessions 3. Day 1 holds only the stream-head session and a
    high-water-mark advancer; day 0 finalizes, day 1 never emits."""
    m = 60_000
    rows = [
        (1, 0), (1, 10 * m),
        (2, 5 * m), (2, 20 * m),
        (3, 120 * m), (3, 125 * m),
        # day 1: one session + events far enough to pass day 0's close
        (4, DAY + 10 * m), (4, DAY + 2 * 3600_000),
    ]
    d = tmp_path / "pc_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)
    assert got == [(0, 3, 2)]


def test_tie_order_minus_before_plus(spark, tmp_path):
    """A session ending at t and another starting exactly at t+1: the −1
    boundary sorts before the +1 at the same instant, so they never
    count as concurrent (the batch ORDER BY t, delta contract)."""
    rows = [
        (1, 0), (1, 1000),          # session [0, 1000] → −1 at 1001
        (2, 1001), (2, 2000),       # session [1001, 2000]
        (9, DAY + GAP + 10_000),    # advance wm past day 0 + gap
        (9, DAY + GAP + 20_000),
    ]
    d = tmp_path / "pt_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)
    assert got == [(0, 2, 1)]


def test_restart_resumes_state(spark, tmp_path):
    """Kill after batch 1 (which holds half of day 0, nothing final);
    resume with batch 2 (rest of day 0 + day 1 advancer): day 0 emits
    once, with sessions stitched ACROSS the restart — u1's two chunks
     20 minutes apart must remain ONE session."""
    m = 60_000
    d = tmp_path / "pr_in"
    ckpt = str(tmp_path / "ck")
    got = []
    batch1 = [(1, 0), (1, 10 * m), (2, 5 * m)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run(spark, d, ckpt, got)
    assert got == []  # nothing finalized yet
    batch2 = [
        (1, 30 * m),          # extends u1's session across the restart
        (2, 25 * m),          # extends u2's
        (9, DAY + GAP + 10 * m), (9, DAY + GAP + 11 * m),
    ]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    _run(spark, d, ckpt, got)
    # one session per user (not two for u1), both overlapping → peak 2
    assert got == [(0, 2, 2)]


def test_shard_isolation(spark, tmp_path):
    """shard_keys partitions the counter: per-shard peaks, no bleed."""
    from timeseriesfuser_spark.streaming import peak_concurrency_stream

    m = 60_000
    rows = [
        ("a", 1, 0), ("a", 1, 5 * m), ("a", 2, 2 * m), ("a", 2, 6 * m),
        ("b", 3, 0), ("b", 3, 3 * m),
        ("a", 9, DAY + GAP + m), ("a", 9, DAY + GAP + 2 * m),
        ("b", 9, DAY + GAP + m), ("b", 9, DAY + GAP + 2 * m),
    ]
    schema = "region string, user_id bigint, __timestamp bigint"
    d = tmp_path / "ps_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(schema).parquet(str(d))
    out = peak_concurrency_stream(stream, GAP, shard_keys=("region",))
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["region"], r["day"], r["n_sessions"], r["peak_concurrent"])
            for r in batch_df.collect()
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert sorted(got) == [("a", 0, 2, 2), ("b", 0, 1, 1)]


def test_matches_batch_on_finalized_days(spark, tmp_path):
    """Differential vs the batch sweep on a pseudo-random event log:
    streaming emissions equal peak_concurrency_daily rows restricted to
    the finalized-day set."""
    state = 99
    rows = []
    for _ in range(600):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % 12
        state = (state * 1103515245 + 12345) % (1 << 31)
        t = state % (4 * DAY)
        rows.append((u, t))
    d = tmp_path / "pd_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)

    # batch twin (the contract query's plan, inline on the same rows)
    from pyspark.sql.window import Window

    ev = spark.createDataFrame(rows, SCHEMA).select(
        F.col("__timestamp").alias("t"), "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("t")
    lag_t = F.lag("t").over(w)
    sess = ev.withColumn(
        "is_new", F.when(lag_t.isNull() | (F.col("t") - lag_t > GAP), 1).otherwise(0)
    ).withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    ).withColumn("day", F.expr("s DIV 86400000"))
    wm = max(t for _, t in rows)
    fin = {
        r["day"]
        for r in spans.groupBy("day")
        .agg(F.max("e").alias("me"))
        .filter((F.col("day") + 1) * DAY <= wm)
        .filter(F.col("me") + GAP < wm)
        .collect()
    }
    bounds = spans.select("day", F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        spans.select("day", (F.col("e") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = Window.partitionBy("day").orderBy("t", "delta")
    peaks = bounds.withColumn("cur", F.sum("delta").over(sweep)).groupBy("day").agg(
        F.max("cur").alias("peak")
    )
    counts = spans.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    want = sorted(
        (r["day"], r["n"], r["peak"])
        for r in counts.join(peaks, "day").collect()
        if r["day"] in fin
    )
    assert sorted(got) == want and want
