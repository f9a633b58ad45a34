"""Grouped streaming-sketch restart contracts (the NOTES r8 tail item):
the group_cols retrofit's state must survive a kill + resume PER GROUP —
grouped batch-parity existed, restart was only tested ungrouped."""

from pyspark.sql import functions as F


def test_grouped_countmin_stream_restart(spark, tmp_path):
    """Kill + resume with group_cols: every (group, cell) counter
    continues from the checkpoint; final values equal the grouped batch
    sketch over both runs' rows, and groups never bleed into each other."""
    from timeseriesfuser_spark.ops.sketches import countmin_sketch
    from timeseriesfuser_spark.streaming import countmin_stream

    d = tmp_path / "gcms_in"
    ckpt = str(tmp_path / "ckpt_gcms")
    schema = "g string, k string"
    cells = {}

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = countmin_stream(stream, "k", depth=3, width=16, group_cols=("g",))

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                cells[(r["g"], r["row_idx"], r["col_idx"])] = r["cnt"]

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    rows1 = [("x", "a"), ("x", "b"), ("y", "a"), ("x", "a")]
    rows2 = [("y", "a"), ("x", "c"), ("y", "d"), ("x", "a")]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()  # fresh query object, same checkpoint -> per-group state restored

    batch = countmin_sketch(
        spark.createDataFrame(rows1 + rows2, schema), "k",
        depth=3, width=16, group_cols=("g",),
    )
    want = {
        (r["g"], r["row_idx"], r["col_idx"]): r["cnt"] for r in batch.collect()
    }
    assert cells == want
    # group isolation: x saw 'a' 3 times, y saw it twice — a shared cell
    # would report 5 for both
    assert any(k[0] == "x" for k in cells) and any(k[0] == "y" for k in cells)


def test_grouped_hll_stream_restart(spark, tmp_path):
    """Same restart contract for the grouped HLL twin: per-group
    max-registers continue across the kill and end identical to the
    grouped batch registers of the full stream."""
    from timeseriesfuser_spark.ops.sketches import hll_registers
    from timeseriesfuser_spark.streaming import hll_stream

    d = tmp_path / "ghll_in"
    ckpt = str(tmp_path / "ckpt_ghll")
    schema = "g string, k string"
    regs = {}

    def run():
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = hll_stream(stream, "k", p=4, group_cols=("g",))

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
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

    rows1 = [("x", f"u{i}") for i in range(30)] + [("y", "u0")]
    rows2 = [("x", f"u{i}") for i in range(20, 50)] + [("y", f"v{i}") for i in range(5)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))
    run()

    batch = hll_registers(
        spark.createDataFrame(rows1 + rows2, schema), "k", p=4,
        group_cols=("g",),
    )
    want = {(r["g"], r["bucket"]): r["register"] for r in batch.collect()}
    assert regs == want
