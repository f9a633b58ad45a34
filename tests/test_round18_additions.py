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
    # r20: sentinels embed the key's close barrier (max event time)
    assert rows[0]["__timestamp"] == FLUSH_SENTINEL_TS + 20
    assert rows[1]["__timestamp"] == FLUSH_SENTINEL_TS + 30
    for r in rows:
        assert r["event_type"] is None and r["value"] is None


def test_close_stream_global_single_row(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "user_id bigint, __timestamp bigint"
    )
    rel = close_stream(df)  # keys=() → the single-state-group contract
    rows = rel.collect()
    assert len(rows) == 1
    assert rows[0]["__timestamp"] == FLUSH_SENTINEL_TS + 20  # global barrier
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
        back.filter(F.col("__timestamp") >= FLUSH_SENTINEL_TS).count() == 2
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


def _rand_rows(n, n_users, span_ms, seed=11):
    state = seed
    rows = []
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % n_users
        state = (state * 1103515245 + 12345) % (1 << 31)
        rows.append((u, state % span_ms))
    return rows


def test_session_spans_sharded_sweep_equals_batch_peak(spark, tmp_path):
    """VERDICT r11 #2 Done criterion in miniature: the hash-sharded
    span stage + the batch two-level sweep over its emissions equals
    the fully-batch peak_concurrency — including the trailing days the
    un-flushed twin holds back (per-user close_stream sentinels reach
    every populated shard)."""
    from timeseriesfuser_spark.ops.behavior import peak_concurrency, sweep_spans
    from timeseriesfuser_spark.streaming import close_stream, session_spans_stream

    schema = "user_id bigint, __timestamp bigint"
    rows = _rand_rows(600, 13, 3 * DAY)
    data = spark.createDataFrame(rows, schema)
    d = tmp_path / "sps_in"
    data.coalesce(1).write.mode("append").parquet(str(d))
    close_stream(data, keys=["user_id"], path=str(d))

    got = []

    def sink(bdf, _):
        got.extend(
            (r["day"], r["session_start"], r["session_end"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(schema).parquet(str(d))
    _avail_now(
        session_spans_stream(stream, GAP, n_shards=4, flush_on_close=True),
        str(tmp_path / "ck"),
        sink,
    )
    spans = spark.createDataFrame(got, "day long, s long, e long")
    swept = {
        (r["day"], r["n_sessions"], r["peak_concurrent"])
        for r in sweep_spans(spans).collect()
    }
    batch = {
        (r["day"], r["n_sessions"], r["peak_concurrent"])
        for r in peak_concurrency(
            data.withColumnRenamed("__timestamp", "ts")
        ).collect()
    }
    assert swept == batch and swept


def test_session_spans_stream_no_global_state_group(spark):
    """The state gate: grouping is the xxhash64 user shard, never one
    constant group — the plan must show the hash expression and the
    sharded stage must actually run >1 state partition's worth of
    distinct keys."""
    from timeseriesfuser_spark.streaming import session_spans_stream

    df = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "value AS __timestamp"
    )
    out = session_spans_stream(df, GAP, n_shards=16)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan and "pmod" in plan
    assert "FlatMapGroupsInPandasWithState" in plan or "flatMapGroups" in plan


def test_session_spans_emit_midstream_without_flush(spark, tmp_path):
    """A session gap-closed by a LATER event emits immediately (no
    sentinel needed); the user's open tail session stays in state."""
    from timeseriesfuser_spark.streaming import session_spans_stream

    schema = "user_id bigint, __timestamp bigint"
    rows = [(1, 1000), (1, 2000), (1, 2000 + GAP + 1), (2, 5000)]
    d = tmp_path / "mid_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    got = []

    def sink(bdf, _):
        got.extend(
            (r["day"], r["session_start"], r["session_end"])
            for r in bdf.collect()
        )

    stream = spark.readStream.schema(schema).parquet(str(d))
    _avail_now(
        session_spans_stream(stream, GAP, n_shards=4), str(tmp_path / "ck"), sink
    )
    # user 1's first session [1000, 2000] closed by the event at
    # 2000+GAP+1; the tail session and user 2's lone event stay open
    assert got == [(0, 1000, 2000)]


def test_suffix_filter_toggle_is_result_invariant(spark):
    """PPJoin+ suffix filter (VERDICT r11 #4): the pair-level
    c + min(sz − pa*, sz − pb*) overlap bound changes only verify-join
    volume, never the exact result — in all four toggle combinations
    (the suffix bound must stay lossless both on full shared-token rows
    and on the positional-filtered prefix of them)."""
    from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

    rows = []
    for i in range(40):
        toks = [f"w{(i * 3 + j) % 25}" for j in range(8)]
        rows.append((i, " ".join(toks)))
    # near-identical cluster (exercises high-overlap pairs) + singleton
    rows += [(100, "a b c d e f"), (101, "a b c d e g"), (102, "z y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(**kw):
        return {
            (r["id_a"], r["id_b"], r["intersection"], r["union_size"])
            for r in set_similarity_pairs(
                df, n=1, threshold=(2, 5), cache=False, **kw
            ).collect()
        }

    base = run(_positional_filter=False, _suffix_filter=False)
    assert base
    assert run(_positional_filter=True, _suffix_filter=False) == base
    assert run(_positional_filter=False, _suffix_filter=True) == base
    assert run(_positional_filter=True, _suffix_filter=True) == base
