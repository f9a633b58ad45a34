"""Round-8 additions: histogram sketch family (merge identity, quantile
accuracy vs exact percentiles), TPC-H decorrelation-shape regressions."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.sketches import (
    histogram_merge,
    histogram_quantiles,
    histogram_sketch,
)


def test_histogram_bins_and_overflow(spark):
    df = spark.createDataFrame(
        [Row(v=x) for x in [-5.0, 0.0, 1.0, 9.999, 10.0, 25.0, None]]
    )
    sk = {r["bin"]: r["cnt"] for r in
          histogram_sketch(df, "v", lo=0.0, hi=10.0, bins=10).collect()}
    # -5 underflow; 0.0->bin0; 1.0->bin1; 9.999->bin9; 10.0,25.0 overflow
    assert sk == {-1: 1, 0: 1, 1: 1, 9: 1, 10: 2}


def test_histogram_merge_equals_unsharded(spark):
    vals = [float(x % 97) for x in range(2000)]
    df = spark.createDataFrame([Row(v=x) for x in vals])
    a = df.filter(F.col("v") < 50)
    b = df.filter(F.col("v") >= 50)
    kw = {"lo": 0.0, "hi": 100.0, "bins": 32}
    whole = {r["bin"]: r["cnt"] for r in histogram_sketch(df, "v", **kw).collect()}
    merged = {r["bin"]: r["cnt"] for r in histogram_merge(
        histogram_sketch(a, "v", **kw), histogram_sketch(b, "v", **kw)
    ).collect()}
    assert merged == whole


def test_histogram_quantiles_vs_exact(spark):
    """Estimates must land within one bin width of the exact percentile."""
    vals = sorted(float((x * 7919) % 1000) for x in range(5000))
    df = spark.createDataFrame([Row(v=x) for x in vals])
    kw = {"lo": 0.0, "hi": 1000.0, "bins": 100}
    sk = histogram_sketch(df, "v", **kw)
    got = {r["q"]: r["estimate"] for r in
           histogram_quantiles(sk, [0.5, 0.9, 0.99], **kw).collect()}
    binw = 10.0
    for q in (0.5, 0.9, 0.99):
        exact = vals[min(int(q * len(vals)), len(vals) - 1)]
        assert abs(got[q] - exact) <= binw, (q, got[q], exact)


def test_histogram_quantiles_merged_equals_whole(spark):
    """Quantiles from merged shard sketches == quantiles from the whole
    sketch (exactly — same bins, same counters)."""
    vals = [float((x * 31) % 500) for x in range(3000)]
    df = spark.createDataFrame([Row(v=x) for x in vals])
    kw = {"lo": 0.0, "hi": 500.0, "bins": 64}
    shards = [
        histogram_sketch(df.filter(F.col("v") % 3 == i), "v", **kw)
        for i in range(3)
    ]
    em = {r["q"]: r["estimate"] for r in
          histogram_quantiles(histogram_merge(*shards), [0.5, 0.95], **kw).collect()}
    ew = {r["q"]: r["estimate"] for r in
          histogram_quantiles(histogram_sketch(df, "v", **kw), [0.5, 0.95], **kw).collect()}
    assert em == ew


def test_histogram_stream_counters_survive_restart(spark, tmp_path):
    """Streaming histogram: kill + resume continues the bin counters;
    final state equals the batch sketch over both runs' rows."""
    from timeseriesfuser_spark.streaming import histogram_stream

    d = tmp_path / "hist_in"
    ckpt = str(tmp_path / "ckpt_hist")
    schema = "v double"
    cells = {}

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = histogram_stream(stream, "v", lo=0.0, hi=100.0, bins=10)

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                cells[r["bin"]] = r["cnt"]

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    rows1 = [(float(x),) for x in [5, 15, 15, 95, -3, 150]]
    rows2 = [(float(x),) for x in [5, 25, 99.9, 150, None][:4]]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(d))
    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    run()

    whole = spark.createDataFrame(rows1 + rows2, schema)
    want = {r["bin"]: r["cnt"] for r in
            histogram_sketch(whole, "v", lo=0.0, hi=100.0, bins=10).collect()}
    assert cells == want


def test_bloom_prefilter_never_drops_true_match(spark):
    """One-sided guarantee under deliberate saturation (m=64 forces heavy
    false positives): every fact row whose key IS in the key set must
    pass; false positives are >= 0 extras, never replacements."""
    from timeseriesfuser_spark.ops.sketches import bloom_bits, bloom_prefilter

    keys = spark.createDataFrame([(i,) for i in range(0, 200, 3)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(400)], "f long")
    bits = bloom_bits(keys, "k", m_bits=64, k=3)
    assert bits.count() <= 64
    passed = {r["f"] for r in
              bloom_prefilter(fact, bits, "f", m_bits=64, k=3).collect()}
    true_set = {i for i in range(400) if i < 200 and i % 3 == 0}
    assert true_set <= passed                       # nothing true dropped
    assert passed <= set(range(400))


def test_bloom_prefilter_null_keys_never_pass(spark):
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.sketches import bloom_bits, bloom_prefilter

    keys = spark.createDataFrame([(1,), (2,)], "k long")
    fact = spark.createDataFrame([Row(f=1), Row(f=None), Row(f=99)])
    bits = bloom_bits(keys, "k", m_bits=1024, k=3)
    got = {r["f"] for r in
           bloom_prefilter(fact, bits, "f", m_bits=1024, k=3).collect()}
    assert None not in got and 1 in got


def test_bloom_prefilter_plan_broadcast_semi(spark):
    """The pre-filter must plan as broadcast left-semi joins — no shuffle
    of the fact side before the exact join."""
    from tests.test_plan_quality import formatted_plan
    from timeseriesfuser_spark import contract

    plan = formatted_plan(
        contract.QUERIES["bloom_join_prefilter"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_jsonl_sink_roundtrip(spark, tmp_path):
    """write_batched(fmt='json') emits JSONL shards (+gzip) that read
    back bit-equal through SourceConfig(fmt='json') with a declared
    schema — the interchange loop an LLM training pipeline runs."""
    from timeseriesfuser_spark.config import SourceConfig
    from timeseriesfuser_spark.sinks import write_batched
    from timeseriesfuser_spark.sources.readers import build_source_df

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 4) for i in range(100)],
        "doc_id long, text string, score double",
    )
    out = str(tmp_path / "jsonl_out")
    res = write_batched(
        df, out, fmt="json", rows_per_file=30, compress=True, count_rows=True
    )
    assert res.rows == 100
    import glob
    shards = glob.glob(f"{out}/batches/*.json.gz")
    assert len(shards) >= 4          # 100 rows / 30 per file

    src = SourceConfig(
        name="jsonl_back",
        path=f"{out}/batches",
        fmt="json",
        schema={"doc_id": int, "text": str, "score": float},
        ts_col="doc_id",
    )
    back = build_source_df(spark, src, 0)
    rows = back.collect()
    assert len(rows) == 100
    by_id = {r["__timestamp"]: r for r in rows}   # ts_col=doc_id -> epoch col
    assert by_id[42]["text"] == "doc 42"
    assert by_id[42]["score"] == 10.5


def test_orc_sink_roundtrip(spark, tmp_path):
    from timeseriesfuser_spark.config import SourceConfig
    from timeseriesfuser_spark.sinks import write_batched
    from timeseriesfuser_spark.sources.readers import build_source_df

    df = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(50)], "ts long, v double"
    )
    out = str(tmp_path / "orc_out")
    res = write_batched(df, out, fmt="orc", count_rows=True)
    assert res.rows == 50
    src = SourceConfig(
        name="orc_back", path=f"{out}/batches", fmt="orc",
        schema={"ts": int, "v": float}, ts_col="ts",
    )
    back = build_source_df(spark, src, 0)
    assert back.count() == 50


def test_export_training_shards(spark, tmp_path):
    """Shard export: size-bounded JSONL shards + verifiable manifest.
    Re-deriving the manifest from the written shards must reproduce the
    recorded per-shard doc counts, byte totals, and content sha256."""
    import glob
    import hashlib
    import json as _json

    from pyspark.sql import functions as F

    from timeseriesfuser_spark.sinks import export_training_shards

    docs = spark.createDataFrame(
        [(i, "x" * (50 + i % 37)) for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards_out")
    manifest = {r["shard"]: r for r in
                export_training_shards(
                    docs, out, shard_bytes=2000, compress=False
                ).collect()}
    assert len(manifest) >= 5                      # ~13KB total / 2KB shards
    assert sum(r["n_docs"] for r in manifest.values()) == 200

    for shard, row in manifest.items():
        rows = []
        for f in glob.glob(f"{out}/shards/shard={shard}/*.json"):
            with open(f) as fh:
                rows += [_json.loads(line) for line in fh if line.strip()]
        assert len(rows) == row["n_docs"]
        rows.sort(key=lambda r: r["doc_id"])
        assert sum(len(r["text"].encode()) for r in rows) == row["n_bytes"]
        digest = hashlib.sha256(
            "".join(
                hashlib.sha256(r["text"].encode()).hexdigest() for r in rows
            ).encode()
        ).hexdigest()
        assert digest == row["content_sha256"]


def test_check_expectations_semantics(spark):
    """Each rule type counts exactly its violations; NULL passes row
    rules except not_null; expression NULL = violation; unique counts
    rows in excess of one per key."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.expect import check_expectations

    df = spark.createDataFrame([
        Row(k=1, v=5.0,  s="A"),
        Row(k=1, v=-1.0, s="B"),     # dup key; v out of range; s bad
        Row(k=2, v=None, s=None),    # NULL v passes range, NULL s passes domain
        Row(k=3, v=200.0, s="A"),    # v out of range
    ])
    got = {r["rule"]: r for r in check_expectations(df, [
        {"name": "v_not_null", "type": "not_null", "col": "v"},
        {"name": "v_0_100", "type": "range", "col": "v", "lo": 0, "hi": 100},
        {"name": "s_domain", "type": "accepted_values", "col": "s",
         "values": ["A"]},
        {"name": "v_pos_expr", "type": "expression", "expr": "v >= 0"},
        {"name": "k_unique", "type": "unique", "cols": ["k"]},
    ]).collect()}
    assert got["v_not_null"]["n_violations"] == 1
    assert got["v_0_100"]["n_violations"] == 2          # -1 and 200
    assert got["s_domain"]["n_violations"] == 1         # "B"
    assert got["v_pos_expr"]["n_violations"] == 2       # -1 and NULL
    assert got["k_unique"]["n_violations"] == 1         # one extra k=1 row
    assert not got["k_unique"]["passed"]
    assert got["v_0_100"]["violation_ppm"] == 500000


def test_grouped_hll_corrected_accuracy(spark):
    """Per-group corrected estimates land within 15% of each group's
    exact distinct, and grouped merge == grouped whole."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.sketches import (
        hll_estimate_corrected,
        hll_merge,
        hll_registers,
    )

    rows = [Row(g="a", k=f"x{i}") for i in range(300)] + [
        Row(g="b", k=f"y{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    regs = hll_registers(df, "k", p=8, group_cols=["g"])
    est = {r["g"]: r["estimate"] for r in
           hll_estimate_corrected(regs, p=8, group_cols=["g"]).collect()}
    assert abs(est["a"] - 300) / 300 < 0.15
    assert abs(est["b"] - 40) / 40 < 0.15

    half1 = hll_registers(df.limit(170), "k", p=8, group_cols=["g"])
    # deterministic complement split by key suffix parity
    from pyspark.sql import functions as F
    a = df.filter(F.length("k") % 2 == 0)
    b = df.filter(F.length("k") % 2 == 1)
    merged = hll_merge(
        hll_registers(a, "k", p=8, group_cols=["g"]),
        hll_registers(b, "k", p=8, group_cols=["g"]),
    )
    want = {(r["g"], r["bucket"]): r["register"] for r in regs.collect()}
    got = {(r["g"], r["bucket"]): r["register"] for r in merged.collect()}
    assert got == want


def test_sketch_lake_pattern(spark, tmp_path):
    """The incremental-maintenance pattern the sketches exist for: keep
    per-day register/counter partitions on the lake, merge AT READ TIME —
    reading N day-partitions back and merging must equal the sketch of
    the whole history, for both HLL (max) and histogram (sum)."""
    from pyspark.sql import functions as F

    from timeseriesfuser_spark.ops.sketches import (
        histogram_merge,
        histogram_sketch,
        hll_merge,
        hll_registers,
    )

    ev = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("day"),
        (F.pmod(F.hash("id"), 700)).cast("string").alias("user"),
        (F.pmod(F.hash(F.col("id") + 1), 1000) / 10.0).alias("value"),
    )
    lake = str(tmp_path / "sketch_lake")
    for kind, build in (
        ("hll", lambda d: hll_registers(d, "user", p=6)),
        ("hist", lambda d: histogram_sketch(d, "value", lo=0.0, hi=100.0, bins=20)),
    ):
        for day in range(3):
            build(ev.filter(F.col("day") == day)).write.mode(
                "overwrite"
            ).parquet(f"{lake}/{kind}/day={day}")

    merged_hll = hll_merge(
        *[spark.read.parquet(f"{lake}/hll/day={d}") for d in range(3)]
    )
    whole_hll = hll_registers(ev, "user", p=6)
    assert {(r["bucket"], r["register"]) for r in merged_hll.collect()} == {
        (r["bucket"], r["register"]) for r in whole_hll.collect()
    }

    merged_h = histogram_merge(
        *[spark.read.parquet(f"{lake}/hist/day={d}") for d in range(3)]
    )
    whole_h = histogram_sketch(ev, "value", lo=0.0, hi=100.0, bins=20)
    assert {(r["bin"], r["cnt"]) for r in merged_h.collect()} == {
        (r["bin"], r["cnt"]) for r in whole_h.collect()
    }


def test_check_expectations_empty_relation(spark):
    """An empty input yields a clean all-pass report (0 rows, 0
    violations, 0 ppm) — not NULL counters from empty-aggregate sums."""
    from timeseriesfuser_spark.ops.expect import check_expectations

    df = spark.createDataFrame([], "a long, b string")
    got = {r["rule"]: r for r in check_expectations(df, [
        {"name": "a_not_null", "type": "not_null", "col": "a"},
        {"name": "ab_unique", "type": "unique", "cols": ["a", "b"]},
    ]).collect()}
    for r in got.values():
        assert (r["n_rows"], r["n_violations"], r["violation_ppm"]) == (0, 0, 0)
        assert r["passed"]


def test_grouped_streaming_sketch_batch_parity(spark, tmp_path):
    """Grouped streaming twins: after draining the stream, per-group
    cells equal the grouped batch sketch of the same rows."""
    from pyspark.sql import functions as F

    from timeseriesfuser_spark.ops.sketches import hll_registers
    from timeseriesfuser_spark.streaming import hll_stream

    d = tmp_path / "ghll_in"
    ckpt = str(tmp_path / "ckpt_ghll")
    schema = "g string, k string"
    rows = [("a", f"u{i}") for i in range(40)] + [
        ("b", f"u{i}") for i in range(25)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    regs = {}

    def sink(b, bid):
        for r in b.collect():
            regs[(r["g"], r["bucket"])] = r["register"]

    stream = spark.readStream.schema(schema).parquet(str(d))
    q = (
        hll_stream(stream, "k", p=4, group_cols=["g"])
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    want = {
        (r["g"], r["bucket"]): r["register"]
        for r in hll_registers(
            spark.createDataFrame(rows, schema), "k", p=4, group_cols=["g"]
        ).collect()
    }
    assert regs == want


def test_sketch_boundary_parameters(spark):
    """Degenerate-but-legal parameters behave: bins=1 (everything in bin
    0 + under/overflow), k=1 bloom (single hash), p=4 HLL floor, CMS
    width=1 (every key collides into one counter = total count)."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.sketches import (
        bloom_bits,
        bloom_prefilter,
        countmin_estimate,
        countmin_sketch,
        histogram_sketch,
        hll_registers,
    )

    df = spark.createDataFrame([Row(k=str(i), v=float(i)) for i in range(20)])

    h = {r["bin"]: r["cnt"] for r in
         histogram_sketch(df, "v", lo=5.0, hi=15.0, bins=1).collect()}
    assert h == {-1: 5, 0: 10, 1: 5}

    bits = bloom_bits(df.limit(3).select("k"), "k", m_bits=8, k=1)
    passed = bloom_prefilter(df, bits, "k", m_bits=8, k=1)
    assert {"0", "1", "2"} <= {r["k"] for r in passed.collect()}

    assert hll_registers(df, "k", p=4).count() <= 16

    sk = countmin_sketch(df, "k", depth=2, width=1)
    est = countmin_estimate(sk, df.select("k"), "k", depth=2, width=1)
    # one counter: every estimate equals the total row count
    assert {r["cms_n"] for r in est.collect()} == {20}


def test_sketch_invalid_parameters_raise(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.sketches import (
        bloom_bits,
        countmin_sketch,
        histogram_sketch,
        hll_registers,
    )

    df = spark.createDataFrame([Row(k="a", v=1.0)])
    with _pytest.raises(ValueError):
        histogram_sketch(df, "v", lo=1.0, hi=1.0, bins=4)
    with _pytest.raises(ValueError):
        histogram_sketch(df, "v", lo=0.0, hi=1.0, bins=0)
    with _pytest.raises(ValueError):
        hll_registers(df, "k", p=3)
    with _pytest.raises(ValueError):
        countmin_sketch(df, "k", depth=0)
    with _pytest.raises(ValueError):
        bloom_bits(df.select("k"), "k", m_bits=1)


def test_export_training_shards_edge_inputs(spark, tmp_path):
    """A doc larger than shard_bytes occupies its own shard (whole-doc
    rule); NULL text is a zero-byte member with the ''-sha."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.sinks import export_training_shards

    docs = spark.createDataFrame([
        Row(doc_id=1, text="x" * 5000),   # bigger than the shard budget
        Row(doc_id=2, text="small"),
        Row(doc_id=3, text=None),
    ])
    out = str(tmp_path / "edge_shards")
    m = {r["shard"]: r for r in
         export_training_shards(docs, out, shard_bytes=1000,
                                compress=False).collect()}
    assert sum(r["n_docs"] for r in m.values()) == 3
    assert m[0]["n_docs"] == 1 and m[0]["n_bytes"] == 5000  # giant doc alone
    # doc 2 + the NULL doc land after the giant one (start offsets 5000+)
    assert sum(r["n_bytes"] for r in m.values()) == 5005


def test_decontaminate_spans_edge_inputs(spark):
    """Docs shorter than n have no removable grams; an EMPTY benchmark
    removes nothing; n larger than every doc is a no-op."""
    from pyspark.sql import Row

    from timeseriesfuser_spark.ops.text import decontaminate_spans

    docs = spark.createDataFrame([
        Row(doc_id=1, text="one two"),
        Row(doc_id=2, text="a b c d"),
    ])
    empty_bench = spark.createDataFrame([], "text string")
    got = {r["doc_id"]: r for r in
           decontaminate_spans(docs, empty_bench, n=3).collect()}
    assert got[1]["clean_text"] == "one two" and got[1]["n_removed"] == 0
    assert got[2]["clean_text"] == "a b c d"

    big_n = {r["doc_id"]: r for r in
             decontaminate_spans(docs, docs, n=10).collect()}
    assert big_n[2]["clean_text"] == "a b c d"  # no 10-gram exists anywhere


def test_grouped_hll_stream_survives_restart(spark, tmp_path):
    """Grouped streaming registers continue across kill+resume and end
    identical to the grouped batch registers of the full stream."""
    from timeseriesfuser_spark.ops.sketches import hll_registers
    from timeseriesfuser_spark.streaming import hll_stream

    d = tmp_path / "ghll_rs_in"
    ckpt = str(tmp_path / "ckpt_ghll_rs")
    schema = "g string, k string"
    regs = {}

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = hll_stream(stream, "k", p=4, group_cols=["g"])

        def sink(b, bid):
            for r in b.collect():
                regs[(r["g"], r["bucket"])] = r["register"]

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    rows1 = [("a", f"u{i}") for i in range(30)] + [("b", "u1")]
    rows2 = [("a", f"u{i}") for i in range(20, 50)] + [("b", "u2")]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()

    want = {
        (r["g"], r["bucket"]): r["register"]
        for r in hll_registers(
            spark.createDataFrame(rows1 + rows2, schema), "k",
            p=4, group_cols=["g"],
        ).collect()
    }
    assert regs == want
