"""Unit tests for the round-7 operator additions (beyond the oracle gate):
bar-rollup identity, drawdown, Donchian extrema, intra-doc line dedup,
blocked bitext mining, and plan shapes for the new TPC-H queries."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark import contract

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ops.timeseries round-7
# ---------------------------------------------------------------------------

def test_rollup_ohlc_identity(spark):
    """rollup(fine bars, coarse) == ohlc(events, coarse) — the
    materialized-view maintenance identity, on a hand-planted stream."""
    from timeseriesfuser_spark.ops.timeseries import ohlc_bars, rollup_ohlc

    rows = []
    # two keys, events across 3 hours of one day + 1 event next day
    for i, (k, h, v) in enumerate([
        ("a", 0, 10.0), ("a", 0, 12.0), ("a", 1, 8.0), ("a", 2, 11.0),
        ("b", 1, 5.0), ("b", 26, 7.0),
    ]):
        rows.append((k, h * 3_600_000 + i, i, v))
    df = spark.createDataFrame(rows, "event_type string, ts long, event_id long, value double")
    direct = {tuple(r) for r in ohlc_bars(df, "1d").collect()}
    rolled = {tuple(r) for r in rollup_ohlc(ohlc_bars(df, "1h"), "1d").collect()}
    assert direct == rolled


def test_drawdown_running_peak(spark):
    from timeseriesfuser_spark.ops.timeseries import drawdown

    rows = [(1, t, t, v) for t, v in
            enumerate([10.0, 12.0, 9.0, 11.0, 7.0, 13.0])]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    got = [(r["peak_cents"], r["drawdown_cents"])
           for r in drawdown(df).orderBy("ts").collect()]
    assert got == [(1000, 0), (1200, 0), (1200, 300), (1200, 100),
                   (1200, 500), (1300, 0)]


def test_rolling_extrema_window(spark):
    from timeseriesfuser_spark.ops.timeseries import rolling_extrema

    rows = [(1, t, t, v) for t, v in enumerate([3.0, 1.0, 4.0, 1.0, 5.0])]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    got = [(r["chan_lo"], r["chan_hi"]) for r in
           rolling_extrema(df, 3).orderBy("ts").collect()]
    assert got == [(300, 300), (100, 300), (100, 400), (100, 400), (100, 500)]
    with pytest.raises(ValueError):
        rolling_extrema(df, 0)


# ---------------------------------------------------------------------------
# intra-doc line dedup
# ---------------------------------------------------------------------------

def test_dedup_lines_within_doc(spark):
    from timeseriesfuser_spark.ops.text import dedup_lines_within_doc

    docs = [
        (1, "a\nb\na\nc\nb"),
        (2, "x"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_removed"], r["n_lines"])
           for r in dedup_lines_within_doc(df).collect()}
    assert got[1] == ("a\nb\nc", 2, 5)
    assert got[2] == ("x", 0, 1)
    assert got[3] == (None, None, None)  # SQL null semantics


# ---------------------------------------------------------------------------
# bitext mining
# ---------------------------------------------------------------------------

def test_bitext_mine_blocked_top1(spark):
    from timeseriesfuser_spark.ops.similarity import bitext_mine

    # block 1: q1 closest to m2; block 2: q2 only candidate m3;
    # m4 in block 3 has no query -> absent
    left = spark.createDataFrame(
        [(1, 1, [1.0, 0.0]), (2, 2, [0.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, 1, [0.9, 0.1]), (11, 1, [0.1, 0.9]),
         (12, 2, [0.2, 0.8]), (13, 3, [1.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r["query_id"]: (r["match_id"], r["block"], r["rank"])
           for r in bitext_mine(left, right, k=1).collect()}
    assert got == {1: (10, 1, 1), 2: (12, 2, 1)}
    # k=2 in block 1 returns both matches ranked
    two = sorted(
        (r["rank"], r["match_id"])
        for r in bitext_mine(left, right, k=2).collect() if r["query_id"] == 1
    )
    assert two == [(1, 10), (2, 11)]
    with pytest.raises(ValueError):
        bitext_mine(left, right, k=0)


# ---------------------------------------------------------------------------
# plan shapes for the new TPC-H queries
# ---------------------------------------------------------------------------

def _plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q5_broadcasts_dimensions_no_cartesian(spark):
    plan = _plan(contract.QUERIES["tpch_q5_local_volume"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q16_plans_anti_join(spark):
    plan = _plan(contract.QUERIES["tpch_q16_supplier_variety"](spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q19_single_join_with_disjunction(spark):
    plan = _plan(contract.QUERIES["tpch_q19_disjunctive"](spark, SF))
    # ONE equi-join on partkey with the disjunction as a filter — never
    # three unioned scans of lineitem, never a nested loop
    assert plan.count("Join") >= 1 and "Union" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_q22_anti_join_and_scalar_threshold(spark):
    plan = _plan(contract.QUERIES["tpch_q22_dormant_rich"](spark, SF))
    assert "LeftAnti" in plan


# ---------------------------------------------------------------------------
# sketches: Count-Min + HLL
# ---------------------------------------------------------------------------

def test_countmin_never_undercounts_and_merges(spark):
    from timeseriesfuser_spark.ops.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [(i % 7,) for i in range(200)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "k long")
    keys = df.distinct()
    sk = countmin_sketch(df, "k", depth=4, width=64)
    est = {r["key"]: r["cms_n"] for r in
           countmin_estimate(sk, keys, "k", depth=4, width=64).collect()}
    exact = {r["k"]: r["cnt"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)

    # mergeability: sketch(A) + sketch(B) == sketch(A union B), cell-wise
    a, b = df.filter("k < 5"), df.filter("k >= 5")
    merged = (
        countmin_sketch(a, "k", depth=4, width=64)
        .unionByName(countmin_sketch(b, "k", depth=4, width=64))
        .groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_sketch(df, "k", depth=4, width=64)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_hll_estimate_tracks_exact_distinct(spark):
    from timeseriesfuser_spark.ops.sketches import hll_estimate, hll_registers

    n = 3000
    df = spark.range(n).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k", p=8)
    est = hll_estimate(regs, p=8).collect()[0]
    # raw HLL at p=8: ~6.5% relative error envelope; allow 3 sigma
    assert abs(est["estimate"] - n) / n < 0.2
    # registers merge by max: two halves == whole
    m = (
        hll_registers(df.filter("k < 1500"), "k", p=8)
        .unionByName(hll_registers(df.filter("k >= 1500"), "k", p=8))
        .groupBy("bucket").agg(F.max("register").alias("register"))
    )
    assert {tuple(r) for r in m.collect()} == {
        tuple(r) for r in regs.collect()
    }


def test_sketch_parameter_validation(spark):
    from timeseriesfuser_spark.ops.sketches import countmin_sketch, hll_registers

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        countmin_sketch(df, "k", depth=0)
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=2)


# ---------------------------------------------------------------------------
# streaming sketch twins: batch parity across two chronological runs
# ---------------------------------------------------------------------------

def test_sketch_streams_match_batch(spark, tmp_path):
    from timeseriesfuser_spark.ops.sketches import (
        countmin_sketch,
        hll_registers,
    )
    from timeseriesfuser_spark.streaming import countmin_stream, hll_stream

    rows = [(i % 13,) for i in range(300)]
    schema = "k long"
    batch = spark.createDataFrame(rows, schema)
    d = tmp_path / "sk"
    d.mkdir()
    spark.createDataFrame(rows[:150], schema).coalesce(1).write.mode(
        "append").parquet(str(d))
    spark.createDataFrame(rows[150:], schema).coalesce(1).write.mode(
        "append").parquet(str(d))

    def run(make, name):
        stream = spark.readStream.schema(schema).parquet(str(d))
        q = (
            make(stream)
            .writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
        return {tuple(r) for r in spark.table(name).collect()}

    got_cms = run(lambda s: countmin_stream(s, "k", depth=3, width=32),
                  "cms_mem")
    want_cms = {tuple(r) for r in
                countmin_sketch(batch, "k", depth=3, width=32).collect()}
    assert got_cms == want_cms

    got_hll = run(lambda s: hll_stream(s, "k", p=6), "hll_mem")
    want_hll = {tuple(r) for r in hll_registers(batch, "k", p=6).collect()}
    assert got_hll == want_hll


def test_hll_corrected_estimate_accuracy(spark):
    """Small-range correction (linear counting) must bring the estimate
    within ~5% of truth where the raw estimate is wildly off, across two
    orders of magnitude of cardinality; merged-register estimates must
    equal whole-stream estimates."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.sketches import (
        hll_estimate_corrected,
        hll_merge,
        hll_registers,
    )

    for n in (20, 400, 3000):
        df = spark.createDataFrame([Row(k=f"key_{i}") for i in range(n)])
        est = hll_estimate_corrected(
            hll_registers(df, "k", p=8), p=8
        ).collect()[0]["estimate"]
        assert abs(est - n) / n < 0.15, f"n={n}: est={est}"

    # merge-then-estimate == estimate-of-whole (exactly: same registers)
    a = spark.createDataFrame([Row(k=f"key_{i}") for i in range(500)])
    b = spark.createDataFrame([Row(k=f"key_{i}") for i in range(300, 900)])
    whole = spark.createDataFrame([Row(k=f"key_{i}") for i in range(900)])
    em = hll_estimate_corrected(
        hll_merge(hll_registers(a, "k", p=8), hll_registers(b, "k", p=8)), p=8
    ).collect()[0]["estimate"]
    ew = hll_estimate_corrected(
        hll_registers(whole, "k", p=8), p=8
    ).collect()[0]["estimate"]
    assert em == ew


def test_decontaminate_spans_semantics(spark):
    """Hand-planted contamination: the overlapping-span union removes
    exactly the covered tokens; clean docs and NULL text pass through."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.text import decontaminate_spans

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="hello world this is clean text entirely"),
        Row(doc_id=3, text="quick brown fox"),     # fully contaminated
        Row(doc_id=4, text=None),
    ])
    bench = spark.createDataFrame([Row(text="quick brown fox")])
    got = {r["doc_id"]: r for r in decontaminate_spans(docs, bench, n=3).collect()}
    assert got[1]["clean_text"] == "the jumps over the lazy dog"
    assert (got[1]["n_tokens"], got[1]["n_removed"]) == (9, 3)
    assert got[2]["clean_text"] == "hello world this is clean text entirely"
    assert got[2]["n_removed"] == 0
    assert got[3]["clean_text"] == ""              # everything removed
    assert got[3]["n_removed"] == 3
    assert got[4]["clean_text"] is None
    assert (got[4]["n_tokens"], got[4]["n_removed"]) == (0, 0)


def test_decontaminate_overlapping_spans_union(spark):
    """Two overlapping contaminated 3-grams cover 4 tokens, not 6."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.text import decontaminate_spans

    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d e f")])
    bench = spark.createDataFrame([Row(text="b c d"), Row(text="c d e")])
    r = decontaminate_spans(docs, bench, n=3).collect()[0]
    assert r["clean_text"] == "a f"
    assert r["n_removed"] == 4
