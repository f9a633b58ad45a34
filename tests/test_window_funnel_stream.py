"""window_funnel_stream: live ClickHouse-windowFunnel — emission
contract, strict-chain tie semantics, checkpoint restart with anchors
advanced ACROSS the kill, and a differential vs the batch per-anchor
chain."""

from pyspark.sql import functions as F

SCHEMA = "user_id bigint, __timestamp bigint, event_type string"
W = 1000  # within_ms for the unit tests
STEPS = ["A", "B", "C"]


def _run(spark, d, ckpt, rows_out):
    from timeseriesfuser_spark.streaming import window_funnel_stream

    stream = spark.readStream.schema(SCHEMA).parquet(str(d))
    out = window_funnel_stream(stream, STEPS, W)

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


def test_complete_and_expired_anchors(spark, tmp_path):
    rows = [
        # u1: full chain inside the window → depth 3, emits on completion
        (1, 0, "A"), (1, 100, "B"), (1, 200, "C"),
        # u2: A then B, then the window expires (event at 2000) → depth 2
        (2, 0, "A"), (2, 500, "B"), (2, 2000, "X"),
        # u3: trailing anchor (window still open at stream end) → no emit
        (3, 0, "A"),
    ]
    d = tmp_path / "wf_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)
    assert sorted(got) == [(1, 0, 3), (2, 0, 2)]


def test_strict_chain_same_instant_never_advances_twice(spark, tmp_path):
    rows = [
        (1, 0, "A"), (1, 100, "B"), (1, 100, "C"),  # C at B's instant: no
        (1, 5000, "X"),  # expire the anchor
    ]
    d = tmp_path / "wt_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)
    assert got == [(1, 0, 2)]


def test_anchor_at_every_step0_event(spark, tmp_path):
    """A stale first anchor must not block a fresh one (the re-signup
    case the batch docstring calls out)."""
    rows = [
        (1, 0, "A"),                      # goes stale
        (1, 5000, "A"), (1, 5100, "B"), (1, 5200, "C"),
        (1, 20000, "X"),
    ]
    d = tmp_path / "wa_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)
    assert sorted(got) == [(1, 0, 1), (1, 5000, 3)]


def test_restart_advances_pending_anchor(spark, tmp_path):
    d = tmp_path / "wr_in"
    ckpt = str(tmp_path / "ck")
    got = []
    spark.createDataFrame(
        [(1, 0, "A"), (1, 100, "B")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run(spark, d, ckpt, got)
    assert got == []  # anchor pending at depth 2 across the kill
    spark.createDataFrame(
        [(1, 300, "C")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(d))
    _run(spark, d, ckpt, got)
    assert got == [(1, 0, 3)]  # chain completed from restored state


def test_differential_vs_batch_chain(spark, tmp_path):
    """Pseudo-random event log vs a Python reference of the greedy
    per-anchor chain + the retirement filter."""
    state = 7
    rows = []
    for _ in range(500):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % 8
        state = (state * 1103515245 + 12345) % (1 << 31)
        t = state % 4000
        state = (state * 1103515245 + 12345) % (1 << 31)
        ty = "ABCX"[state % 4]
        rows.append((u, t, ty))
    d = tmp_path / "wd_in"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
    got = []
    _run(spark, d, str(tmp_path / "ck"), got)

    byu = {}
    for u, t, ty in rows:
        byu.setdefault(u, []).append((t, ty))
    want = []
    for u, evs in byu.items():
        umax = max(t for t, _ in evs)
        anchors = sorted({t for t, ty in evs if ty == "A"})
        for a in anchors:
            cur, depth = a, 1
            for step in STEPS[1:]:
                cand = [t for t, ty in evs
                        if ty == step and t > cur and t <= a + W]
                if not cand:
                    break
                cur = min(cand)
                depth += 1
            if depth == len(STEPS) or a + W < umax:
                want.append((u, a, depth))
    assert sorted(got) == sorted(want) and want
