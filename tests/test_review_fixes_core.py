"""Regressions for the core-operator review findings: null-key/null-value
join semantics, null-secondary dedup, empty-source handling, window-
consistent rename maps, and broadcast forbidding."""

import warnings

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.config import SourceConfig
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.rangejoin import interval_join
from timeseriesfuser_spark.operators.resample import resample_last_interval


# --------------------------------------------------------------------------- #
# fuse: drop_late_duplicates with a null-secondary source
# --------------------------------------------------------------------------- #


def test_drop_late_duplicates_keeps_null_secondary_rows(spark):
    # Source A has the sequence column (with one true duplicate); source B
    # lacks it (null-padded by the diagonal union). B's rows must all
    # survive — dropDuplicates would have collapsed them to one.
    a = spark.createDataFrame(
        [(100, 1, 1.0), (200, 2, 2.0), (200, 2, 2.0)], "ts long, sid long, pa double"
    )
    b = spark.createDataFrame(
        [(110, 10.0), (120, 20.0), (130, 30.0)], "ts long, pb double"
    )
    fuser = TimeSeriesFuser(
        [
            SourceConfig(name="A", df=a, ts_col="ts"),
            SourceConfig(name="B", df=b, ts_col="ts"),
        ],
        secondary_sort_col="sid",
        drop_late_duplicates=True,
    )
    rows = fuser.fused(spark).collect()
    assert len(rows) == 5  # 2 distinct A rows + all 3 B rows
    assert sum(1 for r in rows if r["pb"] is not None) == 3


def test_fuse_sort_uses_prefill_secondary(spark):
    # With forward_fill on, B's null sid must still order nulls-first at
    # its timestamp — not inherit A's filled sequence id for sorting.
    a = spark.createDataFrame([(100, 5, 1.0)], "ts long, sid long, pa double")
    b = spark.createDataFrame([(100, 2.0)], "ts long, pb double")
    fuser = TimeSeriesFuser(
        [
            SourceConfig(name="A", df=a, ts_col="ts"),
            SourceConfig(name="B", df=b, ts_col="ts"),
        ],
        secondary_sort_col="sid",
        forward_fill=True,
    )
    rows = fuser.fused(spark, sort=True).collect()
    # B (null sid pre-fill) sorts before A (sid 5) at the shared ts.
    assert rows[0]["pb"] == 2.0 and rows[1]["pa"] == 1.0


def test_rename_maps_matches_fused_after_window_drop(spark, tmp_path):
    import pandas as pd

    # 'price' collides only with source B, which the window drops
    # entirely; remap_keys must agree with the fused schema (no rename).
    pa_mod = pytest.importorskip("pyarrow")
    f_a, f_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    t0 = 1_700_000_000_000
    pd.DataFrame({"ts": [t0 + 9_000_000, t0 + 9_500_000],
                  "price": [1.0, 2.0]}).to_parquet(f_a)
    pd.DataFrame({"ts": [t0, t0 + 1_000], "price": [9.0, 9.5]}).to_parquet(f_b)
    fuser = TimeSeriesFuser(
        [
            SourceConfig(name="A", path=f_a, fmt="parquet", ts_col="ts"),
            SourceConfig(name="B", path=f_b, fmt="parquet", ts_col="ts"),
        ],
        procstart=t0 + 5_000_000,   # B falls wholly outside
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        keys = fuser.remap_keys(spark, ["price"])
        out = fuser.fused(spark)
    assert keys == ["price"]
    assert "price" in out.columns and "price||A" not in out.columns


def test_empty_source_is_skipped_with_warning(spark, tmp_path):
    import pandas as pd

    f_a = str(tmp_path / "a.parquet")
    f_e = str(tmp_path / "empty.parquet")
    pd.DataFrame({"ts": [1000, 2000], "v": [1.0, 2.0]}).to_parquet(f_a)
    pd.DataFrame({"ts": pd.Series([], dtype="int64"),
                  "v": pd.Series([], dtype="float64")}).to_parquet(f_e)
    fuser = TimeSeriesFuser(
        [
            SourceConfig(name="A", path=f_a, fmt="parquet", ts_col="ts"),
            SourceConfig(name="E", path=f_e, fmt="parquet", ts_col="ts"),
        ]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = fuser.fused(spark).collect()
    assert len(rows) == 2
    assert any("empty" in str(x.message).lower() for x in w)


# --------------------------------------------------------------------------- #
# interval_join: null-safe left remainder + broadcast forbid
# --------------------------------------------------------------------------- #


def _ij_frames(spark):
    pts = spark.createDataFrame(
        [(1, 100, None), (1, 100, 5.0), (1, 900, 7.0)],
        "user long, ts long, val double",
    )
    ivs = spark.createDataFrame(
        [(1, 50, 200, "w1")], "user long, start_ms long, end_ms long, tag string"
    )
    return pts, ivs


def test_interval_join_left_null_value_not_duplicated(spark):
    pts, ivs = _ij_frames(spark)
    out = interval_join(
        pts, ivs, point_ts="ts", keys=["user"], chunk_ms=1000, how="left"
    ).collect()
    # 3 input points -> exactly 3 output rows: the null-val matched point
    # must NOT also appear as an unmatched copy.
    assert len(out) == 3
    matched_null = [r for r in out if r["val"] is None]
    assert len(matched_null) == 1 and matched_null[0]["tag"] == "w1"
    unmatched = [r for r in out if r["tag"] is None]
    assert len(unmatched) == 1 and unmatched[0]["ts"] == 900


def test_interval_join_broadcast_false_forbids_broadcast(spark):
    pts, ivs = _ij_frames(spark)
    plan = interval_join(
        pts, ivs, point_ts="ts", keys=["user"], chunk_ms=1000,
        broadcast_intervals=False,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


# --------------------------------------------------------------------------- #
# resample: null-keyed groups survive the spine joins
# --------------------------------------------------------------------------- #


def test_keyed_resample_null_key_group(spark):
    df = spark.createDataFrame(
        [("a", 100, 1.0), (None, 100, 9.0), (None, 250, 9.5)],
        "sym string, ts long, px double",
    )
    out = resample_last_interval(
        df, "100l", ts_col="ts", keys=["sym"], value_cols=["px"],
        tiebreak_cols=[],
    ).collect()
    null_rows = [r for r in out if r["sym"] is None]
    # the null-key group resamples like any other: its events are present
    assert any(r["px"] == 9.0 for r in null_rows)
    assert any(r["px"] == 9.5 for r in null_rows)


def test_day_tz_resample_null_key_group(spark):
    df = spark.createDataFrame(
        [("a", 1_704_067_200_000, 1.0), (None, 1_704_067_200_000, 9.0)],
        "sym string, ts long, px double",
    )
    out = resample_last_interval(
        df, "1d", ts_col="ts", keys=["sym"], value_cols=["px"],
        tiebreak_cols=[], tz="UTC",
    ).collect()
    assert any(r["sym"] is None and r["px"] == 9.0 for r in out)


# --------------------------------------------------------------------------- #
# streaming: non-long keys
# --------------------------------------------------------------------------- #


def test_sessionize_stream_string_key(spark, tmp_path):
    import json
    import time

    from timeseriesfuser_spark import streaming as S

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    rows = [
        {"ts": 1000, "user": "alice"},
        {"ts": 2000, "user": "alice"},
        {"ts": 500_000, "user": "alice"},  # closes the first session
    ]
    with open(src_dir / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("ts long, user string")
        .json(str(src_dir))
    )
    out = S.sessionize_stream(stream, 60_000, keys=["user"], ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_str_key")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sess_str_key").collect()
    assert len(got) == 1
    assert got[0]["user"] == "alice"
    assert got[0]["n_events"] == 2


# --------------------------------------------------------------------------- #
# ops/ review findings (third sweep)
# --------------------------------------------------------------------------- #


def test_dedup_verdicts_includes_null_text_docs(spark):
    from timeseriesfuser_spark.ops.dedup import dedup_verdicts

    df = spark.createDataFrame(
        [(1, "some text"), (2, None), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_verdicts(df).collect()}
    assert set(out) == {1, 2, 3}  # NULL-text docs get verdicts too
    # the two NULL docs form one exact-dup family, lowest id survives
    assert out[2]["verdict"] == "keep" and out[2]["canonical_id"] == 2
    assert out[3]["verdict"] == "exact_dup" and out[3]["canonical_id"] == 2


def test_curation_verdicts_includes_null_text_docs(spark):
    from timeseriesfuser_spark.ops.lm import curation_verdicts

    df = spark.createDataFrame(
        [(1, "the of and to in it is a " * 8), (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation_verdicts(df).collect()}
    assert set(out) == {1, 2}


def test_connected_components_string_ids(spark):
    from timeseriesfuser_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c")], "id_a string, id_b string"
    )
    out = {
        r["id"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert out == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a"}


def test_pagerank_string_ids(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    edges = spark.createDataFrame([("u", "v")], "id_a string, id_b string")
    out = {r["id"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    assert set(out) == {"u", "v"} and out["u"] == out["v"]


def test_kmeans_fewer_rows_than_k(spark):
    from timeseriesfuser_spark.ops.similarity import kmeans_fit

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = kmeans_fit(emb, k=8, iters=2)
    assert len(cents) == 2  # clamped to row count, no IndexError
    with pytest.raises(ValueError):
        kmeans_fit(emb.filter("vec_id > 99"), k=4)


def test_pq_codes_empty_input_schema_matches(spark):
    from timeseriesfuser_spark.ops.similarity import pq_codes

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.5, 0.25])], "vec_id long, embedding array<float>"
    )
    full = pq_codes(emb, m=2, k=1)
    empty = pq_codes(emb.filter("vec_id > 99"), m=2, k=1)
    assert empty.columns == full.columns  # id column named vec_id both ways


def test_twap_and_interpolate_negative_timestamps(spark):
    from timeseriesfuser_spark.ops.timeseries import interpolate_grid, twap_bars

    df = spark.createDataFrame(
        [(1, -15000, 1, 100.0), (1, -3000, 2, 200.0)],
        "user_id long, ts long, event_id long, value double",
    )
    bars = {r["bar_ts"]: r for r in twap_bars(df, "10s").collect()}
    assert set(bars) == {-20000, -10000}
    assert all(r["dur_ms"] > 0 for r in bars.values())
    grid = {r["grid_ts"]: r["interp_cents"] for r in interpolate_grid(df, "10s").collect()}
    assert set(grid) == {-10000}  # in-segment point only, no extrapolated 0
    assert abs(grid[-10000] - (10000 + 10000 * 5 / 12)) < 1e-9


def test_rolling_anomalies_no_overflow_at_envelope(spark):
    from timeseriesfuser_spark.ops.timeseries import rolling_anomalies

    rows = [(1, i * 1000, i, 100000.0 if i % 2 else -100000.0) for i in range(60)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    out = rolling_anomalies(df, lookback=50, min_points=3, k=3)
    assert out.count() == 60  # no ARITHMETIC_OVERFLOW under ANSI


# --------------------------------------------------------------------------- #
# fourth sweep (handlers/intervals/config/sinks + remaining ops)
# --------------------------------------------------------------------------- #


def test_ts_epoch_ms_int32_seconds_column(spark):
    from timeseriesfuser_spark.timeutils import ts_epoch_ms_col

    df = spark.createDataFrame([(1_723_600_000,)], "ts int")  # int32 seconds
    (got,) = df.select(ts_epoch_ms_col(df, "ts").alias("ms")).first()
    assert got == 1_723_600_000_000  # widened BEFORE the *1000


def test_retention_cohorts_negative_timestamps(spark):
    from timeseriesfuser_spark.ops.behavior import retention_cohorts

    # user anchored at ts=-1 (period -1 under floor), active again at ts=1
    df = spark.createDataFrame(
        [(7, -1, 1), (7, 1, 2)], "user_id long, ts long, event_id long"
    )
    out = {(r["cohort_ts"], r["period_offset"]) for r in
           retention_cohorts(df, period_ms=10).collect()}
    assert out == {(-10, 0), (-10, 1)}  # truncating DIV gave offset 0 twice


def test_resize_images_null_meta_passthrough(spark):
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import encode_netpbm, resize_images

    blob = encode_netpbm(np.zeros((4, 4), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image", None)],
        "media_id long, content binary, media_type string, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    (row,) = resize_images(df, 2, 2).collect()
    assert row["meta"] is None  # NULL meta preserved, not fabricated
    assert row["content"] is not None


def test_salted_join_rejects_outer(spark):
    from timeseriesfuser_spark.ops.scale import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, va string")
    b = spark.createDataFrame([(1, "y")], "k long, vb string")
    with pytest.raises(ValueError):
        salted_join(a, b, ["k"], how="full_outer")
    assert salted_join(a, b, ["k"], salts=4).count() == 1


def test_zorder_rejects_zero_bits():
    from timeseriesfuser_spark.ops.scale import zorder_key, zorder_key_sql

    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=0)
    with pytest.raises(ValueError):
        zorder_key_sql([f"c{i}" for i in range(64)])  # 63//64 == 0


def test_stratified_sample_null_identity_rows_excluded(spark):
    from timeseriesfuser_spark.ops.sampling import stratified_sample

    df = spark.createDataFrame(
        [("A", 1), ("A", None), (None, 3)], "source string, doc_id long"
    )
    kept = stratified_sample(df, {"A": 1.0}, default_rate=1.0).collect()
    # rate 1.0 keeps every identifiable row; null-identity rows have no
    # hash and are consistently excluded (never block-kept/dropped)
    assert [(r["source"], r["doc_id"]) for r in kept] == [("A", 1)]


def test_connected_components_long_chain_converges(spark):
    # a 60-node path: min-label propagation alone needs ~60 rounds; the
    # pointer-doubling shortcut converges well inside max_iterations=25.
    from timeseriesfuser_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert set(out.values()) == {0} and len(out) == 61
