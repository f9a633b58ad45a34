"""Round-6 operators: SCD2 history, fuzzy entity resolution, Z-order keys,
leakage-safe splits, and the semi/anti-join contract shapes."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.behavior import scd2_history
from timeseriesfuser_spark.ops.entity import canonical_entities, fuzzy_match_pairs
from timeseriesfuser_spark.ops.sampling import leakage_safe_split
from timeseriesfuser_spark.ops.scale import zorder_key, zorder_key_sql, zorder_layout


# --------------------------------------------------------------------------- #
# scd2_history
# --------------------------------------------------------------------------- #


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double"
    )


def test_scd2_collapses_consecutive_duplicates(spark):
    df = _ev(
        spark,
        [
            (1, 10, 1, 5.0),
            (1, 20, 2, 5.0),   # same value: extends the open interval
            (1, 30, 3, 7.0),   # change
            (1, 40, 4, 5.0),   # back to 5.0: a NEW interval (consecutive rule)
        ],
    )
    out = sorted(scd2_history(df).collect(), key=lambda r: r["valid_from"])
    assert [(r["value"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out] == [
        (5.0, 10, 30, False),
        (7.0, 30, 40, False),
        (5.0, 40, None, True),
    ]


def test_scd2_null_values_are_tracked_null_safely(spark):
    df = _ev(
        spark,
        [
            (1, 10, 1, None),
            (1, 20, 2, None),   # null == null: no new interval
            (1, 30, 3, 1.0),
        ],
    )
    out = sorted(scd2_history(df).collect(), key=lambda r: r["valid_from"])
    assert len(out) == 2
    assert out[0]["value"] is None and out[0]["valid_to"] == 30
    assert out[1]["value"] == 1.0 and out[1]["is_current"]


def test_scd2_tie_broken_by_seq(spark):
    # Same ts: event_id orders the changes deterministically.
    df = _ev(spark, [(1, 10, 2, 9.0), (1, 10, 1, 3.0)])
    out = sorted(scd2_history(df).collect(), key=lambda r: r["value"])
    by_seq = {r["value"]: r for r in out}
    assert by_seq[3.0]["valid_to"] == 10 and not by_seq[3.0]["is_current"]
    assert by_seq[9.0]["is_current"]


def test_scd2_independent_per_key(spark):
    df = _ev(spark, [(1, 10, 1, 1.0), (2, 5, 2, 2.0)])
    out = scd2_history(df).collect()
    assert len(out) == 2 and all(r["is_current"] for r in out)


# --------------------------------------------------------------------------- #
# fuzzy_match_pairs / canonical_entities
# --------------------------------------------------------------------------- #


def _parts(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, blk string")


def test_fuzzy_pairs_block_and_threshold(spark):
    df = _parts(
        spark,
        [
            (1, "red bolt", "A"),
            (2, "red bolts", "A"),    # distance 1
            (3, "blue bolt", "A"),    # distance 3 from 'red bolt'
            (4, "red bolt", "B"),     # other block: never paired with 1
        ],
    )
    out = fuzzy_match_pairs(
        df, id_col="id", name_col="name", block_cols=("blk",), max_distance=2
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in out}
    assert pairs == {(1, 2): 1}


def test_fuzzy_pairs_emits_each_pair_once_ordered(spark):
    df = _parts(spark, [(7, "x", "A"), (3, "x", "A")])
    out = fuzzy_match_pairs(
        df, id_col="id", name_col="name", block_cols=("blk",), max_distance=0
    ).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in out] == [(3, 7, 0)]


def test_fuzzy_pairs_requires_blocking(spark):
    df = _parts(spark, [(1, "x", "A")])
    with pytest.raises(ValueError):
        fuzzy_match_pairs(df, id_col="id", name_col="name", block_cols=())


def test_canonical_entities_transitive_and_singletons(spark):
    df = _parts(
        spark,
        [
            (1, "aaaa", "A"),
            (2, "aaab", "A"),   # 1-2 match
            (3, "aabb", "A"),   # 2-3 match (dist 1), 1-3 dist 2 also matches
            (9, "zzzz", "A"),   # singleton
        ],
    )
    pairs = fuzzy_match_pairs(
        df, id_col="id", name_col="name", block_cols=("blk",), max_distance=1
    )
    out = {
        r["id"]: r["canonical_id"]
        for r in canonical_entities(pairs, df, id_col="id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}


def test_fuzzy_pairs_plan_is_equi_join_not_cartesian(spark):
    df = _parts(spark, [(1, "x", "A"), (2, "y", "B")])
    plan = fuzzy_match_pairs(
        df, id_col="id", name_col="name", block_cols=("blk",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------- #
# zorder
# --------------------------------------------------------------------------- #


def _z_ref(vals, bits):
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 54321), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key(["x", "y"], bits=16).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _z_ref([r["x"], r["y"]], 16), (r["x"], r["y"])


def test_zorder_key_sql_twin_agrees(spark):
    import duckdb

    rows = [(3, 5), (1023, 7), (99999, 123456)]  # last one exercises masking
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=16).alias("z")).collect()
    }
    con = duckdb.connect()
    sql = zorder_key_sql(["x", "y"], bits=16)
    for (x, y), z in got.items():
        (dz,) = con.execute(f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)").fetchone()
        assert dz == z


def test_zorder_key_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def test_zorder_layout_sorts_within_partitions(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    out = zorder_layout(df, ["x", "y"], n_partitions=4, bits=8)
    parts = out.select(F.spark_partition_id().alias("p"), "__zkey").collect()
    by_part = {}
    for r in parts:
        by_part.setdefault(r["p"], []).append(r["__zkey"])
    for ks in by_part.values():
        assert ks == sorted(ks)


# --------------------------------------------------------------------------- #
# leakage_safe_split
# --------------------------------------------------------------------------- #


def test_leakage_split_groups_stay_together(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    # 50 groups of 2: doc 2k and 2k+1 share a group.
    groups = spark.createDataFrame(
        [(i, i // 2) for i in range(100)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_split(docs, groups).collect()
    assert len(out) == 100
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())
    names = {r["split"] for r in out}
    assert names <= {"train", "val", "test"} and "train" in names


def test_leakage_split_singletons_for_missing_groups(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    groups = spark.createDataFrame([(1, 77)], "doc_id long, cluster_id long")
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, groups).collect()}
    assert out[1]["group_id"] == 77
    assert out[2]["group_id"] == 2  # falls back to its own id


def test_leakage_split_deterministic_and_seeded(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    groups = spark.createDataFrame(
        [(i, i) for i in range(50)], "doc_id long, cluster_id long"
    )
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, groups).collect()}
    b = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, groups).collect()}
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, groups, seed="split1").collect()
    }
    assert a != c  # a different epoch seed reshuffles assignments


def test_leakage_split_validates_fractions(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    groups = spark.createDataFrame([(1, 1)], "doc_id long, cluster_id long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, groups, splits=(("a", 0.5), ("b", 0.3)))


# --------------------------------------------------------------------------- #
# semi / anti join plan shapes (contract queries)
# --------------------------------------------------------------------------- #


def test_q4_plans_a_semi_join(spark):
    from timeseriesfuser_spark import contract

    plan = (
        contract.QUERIES["tpch_q4_late_orders"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_dormant_plans_an_anti_join(spark):
    from timeseriesfuser_spark import contract

    plan = (
        contract.QUERIES["dormant_customers"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------- #
# forward as-of join
# --------------------------------------------------------------------------- #


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 100, "c"), (1, 1000, "d")],
        "user long, __timestamp long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (1, 400, 40.0), (2, 90, 9.0)],
        "user long, __timestamp long, px double",
    )
    return left, right


def test_asof_forward_picks_next_at_or_after(spark):
    from timeseriesfuser_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {
        (r["user"], r["__timestamp"]): (r["__timestamp_right"], r["px"])
        for r in asof_join(
            left, right, keys=["user"], direction="forward"
        ).collect()
    }
    assert out[(1, 100)] == (100, 10.0)   # equal ts counts (at or after)
    assert out[(1, 200)] == (400, 40.0)   # next one strictly after
    assert out[(2, 100)] == (None, None)  # user 2 has nothing at/after 100
    assert out[(1, 1000)] == (None, None)


def test_asof_forward_tolerance(spark):
    from timeseriesfuser_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {
        (r["user"], r["__timestamp"]): r["px"]
        for r in asof_join(
            left, right, keys=["user"], direction="forward", tolerance_ms=100
        ).collect()
    }
    assert out[(1, 200)] is None  # next match at 400 is beyond ts+100
    assert out[(1, 100)] == 10.0


def test_asof_forward_keyless_uses_scalable_fill(spark):
    from timeseriesfuser_spark.operators.asof import asof_join

    left = spark.createDataFrame([(10,), (55,), (300,)], "__timestamp long")
    right = spark.createDataFrame(
        [(50, 1.0), (60, 2.0)], "__timestamp long, v double"
    )
    out = {
        r["__timestamp"]: r["v"]
        for r in asof_join(left, right, direction="forward").collect()
    }
    assert out == {10: 1.0, 55: 2.0, 300: None}


def test_asof_direction_validated(spark):
    from timeseriesfuser_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")


# --------------------------------------------------------------------------- #
# pagerank
# --------------------------------------------------------------------------- #


def test_pagerank_star_graph_center_highest(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    # Star: 0 — {1,2,3,4}. Center collects mass, leaves stay equal.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    r = {x["id"]: x["rank"] for x in pagerank(edges, iterations=3).collect()}
    assert r[0] > r[1]
    assert r[1] == r[2] == r[3] == r[4]


def test_pagerank_isolated_nodes_get_base_rank(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    ids = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    r = {
        x["id"]: x["rank"]
        for x in pagerank(edges, iterations=2, all_ids=ids).collect()
    }
    assert r[99] == 150_000          # 1e6 - damping
    assert r[1] == r[2] == 1_000_000  # two-cycle is a fixpoint of the update


def test_pagerank_matches_python_reference(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    edges_py = [(1, 2), (2, 3), (1, 3), (4, 1)]
    edges = spark.createDataFrame(edges_py, "id_a long, id_b long")
    got = {x["id"]: x["rank"] for x in pagerank(edges, iterations=3).collect()}

    # independent reimplementation (integer ppm arithmetic)
    sym = edges_py + [(b, a) for a, b in edges_py]
    nodes = sorted({n for e in sym for n in e})
    deg = {n: sum(1 for s, _ in sym if s == n) for n in nodes}
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        c = {n: 0 for n in nodes}
        for s, d in sym:
            c[d] += r[s] // deg[s]
        r = {n: 150_000 + (850_000 * c[n]) // 1_000_000 for n in nodes}
    assert got == r


def test_pagerank_validates_params(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        pagerank(edges, damping_ppm=2_000_000)
    with pytest.raises(ValueError):
        pagerank(edges, iterations=-1)


def test_zorder_layout_tightens_parquet_footers(spark, tmp_path):
    """The point of Z-ordering: after a range-partitioned write on the
    Morton key, each file's parquet min/max stats are tight on BOTH
    dimensions, so a predicate on either column can skip most files.
    Compare total stat-range coverage against the naive insertion-order
    layout: a selective filter on either dimension must touch strictly
    fewer files."""
    import pyarrow.parquet as pq
    import glob

    df = spark.range(0, 4096).select(
        F.pmod(F.hash("id"), 64).alias("x"),
        F.pmod(F.hash(F.col("id") + 1), 64).alias("y"),
    )
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(8).write.parquet(plain_dir)
    zorder_layout(df, ["x", "y"], n_partitions=8, bits=6).drop(
        "__zkey"
    ).write.parquet(z_dir)

    def files_hit(d, col, lo, hi):
        hit = 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None and not (fmax < lo or fmin > hi):
                hit += 1
        return hit

    # Narrow band on each dimension: an eighth of the value space.
    for col in ("x", "y"):
        plain_hits = files_hit(plain_dir, col, 0, 7)
        z_hits = files_hit(z_dir, col, 0, 7)
        assert z_hits < plain_hits, (col, z_hits, plain_hits)


# --------------------------------------------------------------------------- #
# time-partitioned sink
# --------------------------------------------------------------------------- #


def test_write_time_partitioned_layout_and_pruning(spark, tmp_path):
    from timeseriesfuser_spark.sinks import write_time_partitioned

    # two days of data, 2024-01-01 and 2024-01-02 (epoch ms, UTC)
    d1, d2 = 1_704_067_200_000, 1_704_153_600_000
    df = spark.createDataFrame(
        [(d1 + i * 3_600_000, i) for i in range(24)]
        + [(d2 + i * 3_600_000, 100 + i) for i in range(24)],
        "__timestamp long, v long",
    )
    out = str(tmp_path / "lake")
    res = write_time_partitioned(df, out, granularity="day")
    assert res.files == ["dt=2024-01-01", "dt=2024-01-02"]

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("dt") == "2024-01-01")
    # partition pruning: the physical plan carries the partition filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
    assert one_day.count() == 24
    assert back.count() == 48


def test_write_time_partitioned_hourly_and_validation(spark, tmp_path):
    from timeseriesfuser_spark.sinks import write_time_partitioned

    df = spark.createDataFrame(
        [(1_704_067_200_000, 1), (1_704_070_800_000, 2)], "__timestamp long, v long"
    )
    res = write_time_partitioned(
        df, str(tmp_path / "h"), granularity="hour"
    )
    assert res.files == ["dt=2024-01-01-00", "dt=2024-01-01-01"]
    with pytest.raises(ValueError):
        write_time_partitioned(df, str(tmp_path / "x"), granularity="month")


# --------------------------------------------------------------------------- #
# merge_upsert (batch MERGE INTO)
# --------------------------------------------------------------------------- #


def test_merge_upsert_semantics(spark):
    from timeseriesfuser_spark.ops.behavior import merge_upsert

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "user_id long, value double"
    )
    chg = spark.createDataFrame(
        [(2, 99.0, "upsert"),   # update
         (3, None, "delete"),   # delete
         (4, 40.0, "upsert")],  # insert
        "user_id long, value double, op string",
    )
    out = {r["user_id"]: r["value"] for r in merge_upsert(snap, chg).collect()}
    assert out == {1: 10.0, 2: 99.0, 4: 40.0}


def test_merge_upsert_rejects_unknown_columns(spark):
    from timeseriesfuser_spark.ops.behavior import merge_upsert

    snap = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    chg = spark.createDataFrame(
        [(1, 1.0, "x", "upsert")], "user_id long, value double, extra string, op string"
    )
    with pytest.raises(ValueError):
        merge_upsert(snap, chg)


# --------------------------------------------------------------------------- #
# small-file compaction
# --------------------------------------------------------------------------- #


def test_compact_small_files(spark, tmp_path):
    from timeseriesfuser_spark.ops.scale import compact_small_files

    src = str(tmp_path / "tiny")
    # 64 tiny files
    spark.range(0, 6400).repartition(64).write.parquet(src)
    rep = compact_small_files(spark, src, target_file_bytes=10**9)
    assert rep["input_files"] >= 64
    assert rep["output_files"] == 1  # everything fits one target-size file
    back = spark.read.parquet(rep["output_path"])
    assert back.count() == 6400
    assert set(back.columns) == {"id"}


# --------------------------------------------------------------------------- #
# netpbm codecs: the multimodal decode/resize/frame-sample path made real
# --------------------------------------------------------------------------- #


def _gradient_ppm(w, h):
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import encode_netpbm

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[..., 0] = (np.arange(w) * 255 // max(w - 1, 1))[None, :]
    arr[..., 1] = (np.arange(h) * 255 // max(h - 1, 1))[:, None]
    arr[..., 2] = 7
    return arr, encode_netpbm(arr)


def test_netpbm_roundtrip_and_comments():
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import decode_netpbm, encode_netpbm

    arr, blob = _gradient_ppm(6, 4)
    assert np.array_equal(decode_netpbm(blob), arr)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(decode_netpbm(encode_netpbm(gray)), gray)
    # header comments per spec
    commented = b"P5\n# a comment\n4 3\n# another\n255\n" + gray.tobytes()
    assert np.array_equal(decode_netpbm(commented), gray)
    with pytest.raises(ValueError):
        decode_netpbm(b"JFIF....")


def test_decode_image_real_for_netpbm():
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import decode_image

    arr, blob = _gradient_ppm(5, 5)
    out = decode_image(blob)  # no fake flag needed: netpbm is real
    assert out.shape == (5, 5, 3) and out.dtype == np.float32
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")


def test_resize_images_end_to_end(spark):
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import (
        decode_netpbm,
        resize_images,
        resize_nearest,
    )

    arr, blob = _gradient_ppm(8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image", (8, 8, None, None, "ppm")),
         (2, None, "image", (None, None, None, None, None))],
        "media_id long, content binary, media_type string, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    out = {r["media_id"]: r for r in resize_images(df, 4, 2).collect()}
    got = decode_netpbm(bytes(out[1]["content"]))
    assert np.array_equal(got, resize_nearest(arr, 4, 2))
    assert out[1]["meta"]["width"] == 4 and out[1]["meta"]["height"] == 2
    assert out[2]["content"] is None


def test_sample_frames_netpbm_sequence(spark):
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import decode_netpbm, sample_frames

    frames = [_gradient_ppm(4, 3)[1] for _ in range(5)]
    # make each frame distinct in the blue channel
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import encode_netpbm

    blobs = []
    for i in range(5):
        a = np.full((3, 4, 3), i * 10, dtype=np.uint8)
        blobs.append(encode_netpbm(a))
    video = b"".join(blobs)
    df = spark.createDataFrame(
        [(7, bytearray(video), "video", (4, 3, None, 5, "ppm-seq"))],
        "media_id long, content binary, media_type string, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    out = sorted(sample_frames(df, 2).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        a = decode_netpbm(bytes(r["content"]))
        assert a.shape == (3, 4, 3)
        assert int(a[0, 0, 0]) == r["frame_idx"] * 10
    with pytest.raises(ValueError):
        sample_frames(df, 0)


# --------------------------------------------------------------------------- #
# exact global rank / quantile bins
# --------------------------------------------------------------------------- #


def test_exact_global_rank_matches_window(spark):
    from timeseriesfuser_spark.ops.scale import exact_global_rank

    df = spark.range(0, 500).select(
        (F.pmod(F.hash("id"), 50)).alias("v"), F.col("id")
    )
    got = {
        r["id"]: r["global_rank"]
        for r in exact_global_rank(df, ["v", "id"], num_buckets=8).collect()
    }
    from pyspark.sql.window import Window

    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_quantile_bins_depth_balance(spark):
    from timeseriesfuser_spark.ops.scale import quantile_bins

    df = spark.range(0, 1000).select(F.pow(F.col("id"), 2).alias("v"), "id")
    out = quantile_bins(df, "v", 10, tiebreak_cols=["id"], num_buckets=8)
    sizes = {r["bin"]: r["c"] for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(sizes) == set(range(10))
    assert all(v == 100 for v in sizes.values())  # 1000/10 exactly
    with pytest.raises(ValueError):
        quantile_bins(df, "v", 0)


def test_equal_depth_bins_plan_has_no_single_partition(spark):
    from timeseriesfuser_spark import contract

    plan = (
        contract.QUERIES["value_equal_depth_bins"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_snapshot_diff_merge_roundtrip(spark):
    """Inverse-operation property: deriving a change set from
    snapshot_diff(old, new) and applying it with merge_upsert(old, ...)
    must reproduce new exactly — diff and merge are true inverses."""
    from timeseriesfuser_spark.ops.behavior import merge_upsert, snapshot_diff

    old = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 4.0)], "user_id long, value double"
    )
    new = spark.createDataFrame(
        [(1, 1.0), (2, 99.0), (3, 3.0), (5, 5.0)], "user_id long, value double"
    )
    d = snapshot_diff(old, new, key_cols=("user_id",), compare_col="value")
    changes = d.filter(F.col("change") != "unchanged").select(
        "user_id",
        F.col("new_value").alias("value"),
        F.when(F.col("change") == "removed", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    merged = merge_upsert(old, changes, key_cols=("user_id",), op_col="op")
    got = {r["user_id"]: r["value"] for r in merged.collect()}
    want = {r["user_id"]: r["value"] for r in new.collect()}
    assert got == want


def test_snapshot_diff_null_value_is_not_added_or_removed(spark):
    from timeseriesfuser_spark.ops.behavior import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, 2.0)], "user_id long, value double")
    new = spark.createDataFrame([(1, None), (2, None)], "user_id long, value double")
    out = {
        r["user_id"]: r["change"]
        for r in snapshot_diff(old, new, key_cols=("user_id",), compare_col="value").collect()
    }
    assert out == {1: "unchanged", 2: "changed"}


# --------------------------------------------------------------------------- #
# review-fix regressions
# --------------------------------------------------------------------------- #


def test_decode_image_fake_precedes_netpbm_sniff():
    """fake=True must return the sha-fake even for payloads that START
    with a netpbm magic (text like 'P5 is ...'): extract_features'
    oracle-checked derivation depends on it."""
    import numpy as np
    from timeseriesfuser_spark.ops.multimodal import decode_image

    tricky = b"P5 is a great chip"
    out = decode_image(tricky, fake=True)
    assert out.shape == (8, 8)  # sha-fake shape, not a netpbm decode
    # and a VALID 5x5 netpbm through the fake path is still the sha-fake
    from timeseriesfuser_spark.ops.multimodal import encode_netpbm

    real = encode_netpbm(np.zeros((5, 5, 3), dtype=np.uint8))
    assert decode_image(real, fake=True).shape == (8, 8)
    assert decode_image(real).shape == (5, 5, 3)  # real path still real


def test_pagerank_directed_includes_sink_nodes(spark):
    from timeseriesfuser_spark.ops.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (3, 2)], "id_a long, id_b long")
    r = {x["id"]: x["rank"] for x in pagerank(edges, directed=True, iterations=1).collect()}
    assert set(r) == {1, 2, 3}
    assert r[2] > r[1]  # the sink collects both nodes' mass


def test_leakage_split_string_ids(spark):
    from timeseriesfuser_spark.ops.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",)], "doc_id string"
    )
    groups = spark.createDataFrame(
        [("doc-a", "doc-a"), ("doc-b", "doc-a")], "doc_id string, cluster_id string"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, groups).collect()}
    assert out["doc-a"]["group_id"] == "doc-a"
    assert out["doc-b"]["group_id"] == "doc-a"
    assert out["doc-c"]["group_id"] == "doc-c"     # singleton keeps own id
    assert out["doc-a"]["split"] == out["doc-b"]["split"]  # same group
    assert None not in {r["group_id"] for r in out.values()}


def test_zorder_key_sql_validates_like_column_twin():
    from timeseriesfuser_spark.ops.scale import zorder_key_sql

    with pytest.raises(ValueError):
        zorder_key_sql(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zorder_key_sql([])


def test_distinctive_terms_keeps_null_stratum(spark):
    from timeseriesfuser_spark.ops.text import distinctive_terms

    rows = [(i, "alpha beta " * 3, None) for i in range(6)] + [
        (100 + i, "gamma delta " * 3, "s1") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = distinctive_terms(df, min_count=5, top_k=5).collect()
    strata = {r["source"] for r in out}
    assert None in strata and "s1" in strata


def test_write_time_partitioned_is_timezone_independent(spark, tmp_path):
    from timeseriesfuser_spark.sinks import write_time_partitioned

    d1 = 1_704_067_200_000  # 2024-01-01T00:00:00Z
    df = spark.createDataFrame([(d1, 1)], "__timestamp long, v long")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        res = write_time_partitioned(df, str(tmp_path / "tz"), granularity="hour")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # UTC day/hour regardless of session zone (NY would say 2023-12-31-19)
    assert res.files == ["dt=2024-01-01-00"]


# --------------------------------------------------------------------------- #
# containment dedup / fixed-N sampling
# --------------------------------------------------------------------------- #


def test_containment_catches_embedded_doc(spark):
    from timeseriesfuser_spark.ops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame([(1, small), (2, big)], "doc_id long, text string")
    cont = ngram_containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    # symmetric Jaccard misses the same pair at any usable threshold
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []


def test_fixed_n_sample_exact_budget_and_determinism(spark):
    from timeseriesfuser_spark.ops.sampling import stratified_fixed_n

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "tiny") for i in range(53)],
        "doc_id long, source string",
    )
    out = stratified_fixed_n(df, 5, strata_col="source", id_col="doc_id")
    sizes = {r["source"]: r["c"] for r in
             out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sizes == {"big": 5, "tiny": 3}  # min(n, |stratum|)
    again = stratified_fixed_n(df, 5, strata_col="source", id_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    other = stratified_fixed_n(df, 5, strata_col="source", id_col="doc_id", seed="s1")
    assert sorted(r["doc_id"] for r in other.filter("source='big'").collect()) != sorted(
        r["doc_id"] for r in out.filter("source='big'").collect()
    )
    with pytest.raises(ValueError):
        stratified_fixed_n(df, 0)
