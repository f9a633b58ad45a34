"""Regression tests for the round-3 ADVICE findings.

- latest_stream crashed per micro-batch for underscore-prefixed column
  names (pandas itertuples mangling) — i.e. for the framework default
  ts_col='__timestamp' — and on NULL ts/seq rows (int(NaN)).
- merge_upsert silently deleted keys for any op value outside
  {'upsert','delete'}.
- hourly_active_users bucketed with truncating DIV while the oracle
  floors — divergent for pre-1970 timestamps.
- pagerank's damped update now runs in decimal(38,0) (hub-node int64
  overflow envelope); parity on a normal graph must be unchanged.
"""

import pytest
from pyspark.sql import functions as F


def test_latest_stream_default_underscore_ts_and_null_keys(spark, tmp_path):
    """Default '__timestamp' ts column + NULL ts/seq rows: the stream must
    complete (no itertuples AttributeError, no int(NaN) ValueError) and
    null-ordering-key rows are skipped, not crashed on."""
    from timeseriesfuser_spark.streaming import latest_stream

    rows = [
        (1, 1000, 1, 10.0),
        (1, None, 2, 666.0),   # null ts: no place in the (ts, seq) order
        (2, 2000, None, 7.0),  # null seq: same
        (2, 2000, 3, 20.0),
        (1, 3000, 4, 30.0),
    ]
    schema = "user_id long, __timestamp long, event_id long, value double"
    d = tmp_path / "cdc_us"
    d.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))

    emitted = []
    stream = spark.readStream.schema(schema).parquet(str(d))
    out = latest_stream(
        stream, keys=["user_id"], ts_col="__timestamp",
        seq_col="event_id", value_cols=["value"],
    )
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _bid: emitted.extend(bdf.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_us"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    view = {r["user_id"]: (r["__timestamp"], r["event_id"], r["value"])
            for r in emitted}
    assert view == {1: (3000, 4, 30.0), 2: (2000, 3, 20.0)}


def test_merge_upsert_rejects_unknown_op(spark):
    from timeseriesfuser_spark.ops.behavior import merge_upsert

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "user_id long, value double"
    )
    chg = spark.createDataFrame(
        [(2, 25.0, "UPSERT")], "user_id long, value double, op string"
    )
    with pytest.raises(Exception, match="upsert.*delete|USER_RAISED"):
        merge_upsert(snap, chg).collect()
    # null op is equally invalid (would be misread as snapshot-only)
    chg_null = spark.createDataFrame(
        [(2, 25.0, None)], "user_id long, value double, op string"
    )
    with pytest.raises(Exception, match="upsert.*delete|USER_RAISED"):
        merge_upsert(snap, chg_null).collect()
    # valid ops still work
    ok = spark.createDataFrame(
        [(1, 11.0, "upsert"), (2, None, "delete")],
        "user_id long, value double, op string",
    )
    out = {r["user_id"]: r["value"] for r in merge_upsert(snap, ok).collect()}
    assert out == {1: 11.0}


def test_hour_bucket_floor_matches_duckdb_for_negative_ts(spark):
    """The pmod-floor hour bucket equals the oracle-side floor idiom for
    pre-1970 (negative) epochs. Note DuckDB BIGINT `//` TRUNCATES toward
    zero (unlike its DOUBLE `//`), so every ts-derived oracle bucket uses
    the `x - ((x % m) + m) % m` floor form (contract._ff) instead."""
    import duckdb

    from timeseriesfuser_spark.contract import _ff

    ts_vals = [-7_200_001, -3_600_000, -1, 0, 1, 3_599_999, 3_600_000]
    df = spark.createDataFrame([(t,) for t in ts_vals], "ts long")
    got = {
        r["ts"]: r["hour_ts"]
        for r in df.select(
            "ts",
            F.expr("ts - pmod(ts, 3600000)").cast("long").alias("hour_ts"),
        ).collect()
    }
    want = {
        int(t): int(h)
        for t, h in duckdb.sql(
            f"SELECT ts, {_ff('ts', 3_600_000)} AS h FROM (SELECT unnest("
            + str(ts_vals)
            + ") AS ts)"
        ).fetchall()
    }
    assert got == want
    # floor, not truncation: -7200001 belongs to the -3h bucket
    assert got[-7_200_001] == -10_800_000
    # and DuckDB BIGINT // really does truncate (the trap this guards)
    assert duckdb.sql("SELECT -7200001 // 3600000").fetchone()[0] == -2


def test_pagerank_decimal_update_unchanged(spark):
    """The decimal(38,0) damped update must produce the exact same integer
    ranks as the prior int64 path on an in-envelope graph (python ref)."""
    from timeseriesfuser_spark.ops.graph import PPM, pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(e, iterations=3, directed=True).collect()
    }

    # python integer reference (same truncating DIV semantics)
    from collections import defaultdict
    out_deg = defaultdict(int)
    in_edges = defaultdict(list)
    nodes = set()
    for s, d in edges:
        out_deg[s] += 1
        in_edges[d].append(s)
        nodes.update((s, d))
    damping = 850_000
    rank = {n: PPM for n in nodes}
    for _ in range(3):
        contrib = {
            n: sum(rank[s] // out_deg[s] for s in in_edges[n]) for n in nodes
        }
        rank = {
            n: (PPM - damping) + damping * contrib.get(n, 0) // PPM
            for n in nodes
        }
    assert got == rank


def test_ngram_jaccard_max_df_candidate_cutoff(spark):
    """max_df path: pairs sharing >= 1 rare shingle get their EXACT
    full-set jaccard (identical to the uncapped baseline); a pair whose
    overlap is exclusively corpus-hot shingles is the documented recall
    cut."""
    from timeseriesfuser_spark.ops.dedup import ngram_jaccard_pairs

    hot = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        # near-dup pair via rare shingles (and some hot overlap)
        (1, hot + " alpha beta gamma delta epsilon zeta"),
        (2, hot + " alpha beta gamma delta epsilon eta"),
        # pair overlapping ONLY on the hot prefix
        (3, hot + " one two three four five six seven"),
        (4, hot + " eight nine ten eleven twelve thirteen"),
    ] + [
        # make every shingle of `hot` corpus-hot (df > max_df=4)
        (100 + i, hot) for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    exact = {
        (r["id_a"], r["id_b"]): (r["intersection"], r["union_size"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): (r["intersection"], r["union_size"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_df=4).collect()
    }
    # (1,2) survives the cut and its jaccard is the exact full-set value
    assert (1, 2) in capped and capped[(1, 2)] == exact[(1, 2)]
    # every capped pair matches the exact baseline value
    assert all(capped[k] == exact[k] for k in capped)
    # pairs among the hot-only clones overlap exclusively on hot shingles:
    # present in the exact baseline, dropped by the candidate cutoff
    hot_only = [k for k in exact if k[0] >= 100 and k[1] >= 100]
    assert hot_only and all(k not in capped for k in hot_only)


# ---------------------------------------------------------------------------
# pluggable multimodal codec hooks
# ---------------------------------------------------------------------------

def _make_toy_codec():
    """Fake external codec pair, built as closures so cloudpickle ships
    them by value (a test-module top-level fn is unimportable on
    executors): 'format' = raw square grayscale bytes."""
    import numpy as np

    def dec(b):
        side = int(len(b) ** 0.5)
        return np.frombuffer(b[: side * side], dtype=np.uint8).reshape(side, side)

    def enc(arr):
        return bytes(arr.astype("uint8").reshape(-1))

    return dec, enc


def test_decode_image_decode_fn_hook():
    import numpy as np

    from timeseriesfuser_spark.ops.multimodal import decode_image

    _toy_decode, _ = _make_toy_codec()
    payload = bytes(range(16))  # 4x4 "image" in the toy format
    with pytest.raises(NotImplementedError):
        decode_image(payload)
    arr = decode_image(payload, decode_fn=_toy_decode)
    assert arr.shape == (4, 4) and arr.dtype == np.float32
    assert arr[0, 1] == 1.0
    # fake=True still takes precedence over the injected codec
    assert decode_image(payload, fake=True, decode_fn=_toy_decode).shape == (8, 8)


def test_resize_images_codec_pair_hook(spark):
    from timeseriesfuser_spark.ops.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rows = [
        (1, bytes(range(16)), "image",
         {"width": 4, "height": 4, "sample_rate": None, "n_frames": None,
          "codec": "toy"}),
        (2, None, "image", None),
    ]
    _toy_decode, _toy_encode = _make_toy_codec()
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           resize_images(df, 2, 2, decode_fn=_toy_decode,
                         encode_fn=_toy_encode).collect()}
    assert len(out[1]["content"]) == 4  # 2x2 toy re-encode
    assert out[1]["meta"]["width"] == 2 and out[1]["meta"]["height"] == 2
    assert out[2]["content"] is None and out[2]["meta"] is None
    # injecting only one half of the pair is an error
    with pytest.raises(ValueError, match="together"):
        resize_images(df, 2, 2, decode_fn=_toy_decode)


def test_extract_features_feature_fn_hook(spark):
    from timeseriesfuser_spark.ops.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = [(1, b"abc", "image", None), (2, None, "image", None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def feat(b):
        return [float(len(b))] * FEATURE_DIM

    got = {r["media_id"]: r["features"]
           for r in extract_features(df, feature_fn=feat).collect()}
    assert got[1] == [3.0] * FEATURE_DIM
    assert got[2] is None  # null passthrough wraps the user fn


def test_sample_frames_split_fn_hook(spark):
    from timeseriesfuser_spark.ops.multimodal import MEDIA_SCHEMA, sample_frames

    def demux(b):
        # toy container: consecutive 4-byte frames, 2x2
        for i in range(len(b) // 4):
            yield i, b[i * 4:(i + 1) * 4], 2, 2

    payload = bytes(range(20))  # 5 frames
    df = spark.createDataFrame(
        [(1, payload, "video", None)], MEDIA_SCHEMA
    )
    got = sorted(
        (r["frame_idx"], bytes(r["content"]))
        for r in sample_frames(df, 2, split_fn=demux).collect()
    )
    assert [i for i, _ in got] == [0, 2, 4]
    assert got[1][1] == payload[8:12]
