"""Unit tests for the round-5 operators: interval join, rolling z-score
anomalies, bigram LM scoring, hashed classifier, passage dedup, PQ codes,
length-bucketed batching."""

import pytest
from pyspark.sql import Row, functions as F

from timeseriesfuser_spark.operators.rangejoin import interval_join
from timeseriesfuser_spark.ops import dedup as D
from timeseriesfuser_spark.ops import lm as LM
from timeseriesfuser_spark.ops import packing as P
from timeseriesfuser_spark.ops import similarity as S
from timeseriesfuser_spark.ops import timeseries as TS


# --------------------------------------------------------------------------- #
# interval_join
# --------------------------------------------------------------------------- #


def _pts(spark):
    return spark.createDataFrame(
        [
            Row(k=1, pid=1, ts=100),
            Row(k=1, pid=2, ts=200),   # == start: inclusive
            Row(k=1, pid=3, ts=299),   # end-1: inclusive
            Row(k=1, pid=4, ts=300),   # == end: exclusive
            Row(k=2, pid=5, ts=250),   # right ts, wrong key
            Row(k=1, pid=6, ts=5000),  # matches nothing
        ]
    )


def _ivs(spark):
    return spark.createDataFrame(
        [
            Row(k=1, iid=10, s=200, e=300),
            Row(k=1, iid=11, s=0, e=1000),   # spans many chunks
            Row(k=1, iid=12, s=400, e=400),  # empty interval
            Row(k=2, iid=13, s=9000, e=9100),
        ]
    )


def test_interval_join_semantics(spark):
    out = interval_join(
        _pts(spark),
        _ivs(spark).withColumnRenamed("s", "start_ms").withColumnRenamed("e", "end_ms"),
        point_ts="ts",
        keys=["k"],
        chunk_ms=100,
    )
    got = {(r["iid"], r["pid"]) for r in out.collect()}
    assert got == {
        (10, 2), (10, 3),           # [200,300) contains 200, 299 — not 300
        (11, 1), (11, 2), (11, 3), (11, 4),  # [0,1000)
    }


def test_interval_join_left_keeps_unmatched(spark):
    out = interval_join(
        _pts(spark),
        _ivs(spark).withColumnRenamed("s", "start_ms").withColumnRenamed("e", "end_ms"),
        point_ts="ts",
        keys=["k"],
        chunk_ms=100,
        how="left",
    )
    rows = out.collect()
    unmatched = {r["pid"] for r in rows if r["iid"] is None}
    assert unmatched == {5, 6}
    assert len(rows) == 6 + 2  # 6 matches + 2 null-extended points


def test_interval_join_is_equi_join(spark):
    out = interval_join(
        _pts(spark),
        _ivs(spark).withColumnRenamed("s", "start_ms").withColumnRenamed("e", "end_ms"),
        point_ts="ts",
        keys=["k"],
        chunk_ms=100,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_rejects_column_overlap(spark):
    with pytest.raises(ValueError, match="both sides"):
        interval_join(
            _pts(spark),
            _pts(spark),
            point_ts="ts",
            keys=["k"],
        )


# --------------------------------------------------------------------------- #
# rolling_anomalies
# --------------------------------------------------------------------------- #


def test_rolling_anomalies_flags_spike(spark):
    rows = [Row(user_id=1, ts=i * 1000, event_id=i, value=10.0) for i in range(8)]
    rows.append(Row(user_id=1, ts=9000, event_id=9, value=500.0))  # spike
    df = spark.createDataFrame(rows)
    out = TS.rolling_anomalies(df, lookback=5, min_points=3, k=3).collect()
    by_id = {r["event_id"]: r for r in out}
    assert by_id[9]["is_anomaly"] is True
    # constant baseline, constant value → no anomaly
    assert all(not by_id[i]["is_anomaly"] for i in range(8))
    # fewer than min_points of history → never flagged
    assert by_id[0]["is_anomaly"] is False and by_id[2]["is_anomaly"] is False
    assert by_id[0]["mean_cents"] is None


def test_rolling_anomalies_zero_variance_spike(spark):
    # constant baseline then a jump: var==0 → zscore NULL but flag True
    rows = [Row(user_id=1, ts=i * 1000, event_id=i, value=5.0) for i in range(5)]
    rows.append(Row(user_id=1, ts=6000, event_id=6, value=6.0))
    df = spark.createDataFrame(rows)
    out = {r["event_id"]: r for r in
           TS.rolling_anomalies(df, lookback=5, min_points=3, k=3).collect()}
    assert out[6]["is_anomaly"] is True
    assert out[6]["zscore"] is None


# --------------------------------------------------------------------------- #
# bigram LM + hashed classifier
# --------------------------------------------------------------------------- #


def test_bigram_lm_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b"),
            Row(doc_id=2, text="a b c"),
            Row(doc_id=3, text="z"),  # no bigrams
        ]
    )
    out = {r["doc_id"]: r for r in LM.bigram_lm_score(df).collect()}
    # corpus bigrams: d1: (a b),(b a),(a b); d2: (a b),(b c)
    # c2: (a b)=3, (b a)=1, (b c)=1 ; c1: a=3, b=2
    # ppm: (a b) = 3e6 DIV 3 = 1_000_000; (b a) = 1e6 DIV 2 = 500_000;
    #      (b c) = 500_000
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_ppm"] == 1_000_000 + 500_000 + 1_000_000
    assert out[1]["min_ppm"] == 500_000
    assert out[2]["sum_ppm"] == 1_000_000 + 500_000
    assert out[3]["n_bigrams"] == 0 and out[3]["sum_ppm"] is None


def test_hashed_classifier_zero_shuffle(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world"),
                                Row(doc_id=2, text="")])
    out = LM.hashed_classifier_score(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[2]["n_tokens"] == 0 and rows[2]["sum_weight"] == 0
    assert rows[2]["logit"] is None and rows[2]["label_keep"] is False


def test_hashed_classifier_weight_range(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=f"tok{i}") for i in range(50)])
    rows = LM.hashed_classifier_score(df, span=100).collect()
    assert all(-100 <= r["sum_weight"] <= 100 for r in rows)


# --------------------------------------------------------------------------- #
# passage dedup
# --------------------------------------------------------------------------- #


def test_passage_dedup_planted(spark):
    common = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=common + " unique one here now"),
            Row(doc_id=2, text=common + " other tail entirely different"),
            Row(doc_id=3, text="completely fresh words nobody repeats"),
        ]
    )
    out = {r["doc_id"]: r for r in
           D.passage_dedup(df, passage_tokens=8, max_dup_ppm=400_000).collect()}
    # docs 1 and 2 share their first 8-token passage; doc 1 owns it
    assert out[1]["n_dup_passages"] == 0
    assert out[2]["n_dup_passages"] == 1 and out[2]["n_passages"] == 2
    assert out[2]["dup_ppm"] == 500_000 and out[2]["keep"] is False
    assert out[3]["n_dup_passages"] == 0 and out[3]["keep"] is True


# --------------------------------------------------------------------------- #
# PQ codes
# --------------------------------------------------------------------------- #


def test_pq_codes_seeds_self_code(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(i), float(-i), 2.0 * i, i + 0.5])
            for i in range(6)
        ]
    )
    out = {r["vec_id"]: r for r in S.pq_codes(df, m=2, k=4).collect()}
    # the 4 seed vectors quantize to themselves: zero error, own code
    for i in range(4):
        assert out[i]["sq_err"] == 0
        assert out[i]["pq"] == f"{i}-{i}"
    # non-seeds pick the nearest seed (vec 4 is closest to seed 3)
    assert out[4]["pq"] == "3-3" and out[4]["sq_err"] > 0


def test_pq_codes_dim_not_divisible(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0, 3.0])])
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_codes(df, m=2, k=1)


# --------------------------------------------------------------------------- #
# length-bucketed batches
# --------------------------------------------------------------------------- #


def test_length_batches_invariants(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (5 + i % 40))) for i in range(200)]
    )
    out = P.length_bucketed_batches(
        df, band_tokens=10, batch_size=8, n_shards=4
    ).collect()
    assert len(out) == 200
    for r in out:
        assert r["band"] == r["n_tokens"] // 10
        assert 0 <= r["shard"] < 4
        assert 0 <= r["pos_in_batch"] < 8
    # every batch except possibly the last per (band, shard) is full
    from collections import defaultdict

    sizes = defaultdict(int)
    maxb = {}
    for r in out:
        key = (r["band"], r["shard"])
        sizes[(key, r["batch_in_shard"])] += 1
        maxb[key] = max(maxb.get(key, -1), r["batch_in_shard"])
    for (key, b), n in sizes.items():
        if b < maxb[key]:
            assert n == 8, f"non-final batch {key}/{b} has {n} rows"
        else:
            assert 1 <= n <= 8


def test_length_batches_epoch_reshuffles(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * 20)) for i in range(64)]
    )
    e0 = {r["doc_id"]: (r["shard"], r["batch_in_shard"], r["pos_in_batch"])
          for r in P.length_bucketed_batches(df, epoch=0).collect()}
    e1 = {r["doc_id"]: (r["shard"], r["batch_in_shard"], r["pos_in_batch"])
          for r in P.length_bucketed_batches(df, epoch=1).collect()}
    assert e0 != e1  # different epoch → different permutation
    # determinism: same epoch twice is identical
    e0b = {r["doc_id"]: (r["shard"], r["batch_in_shard"], r["pos_in_batch"])
           for r in P.length_bucketed_batches(df, epoch=0).collect()}
    assert e0 == e0b


# --------------------------------------------------------------------------- #
# value_rates / interpolate_grid / key_skew_report
# --------------------------------------------------------------------------- #


def test_value_rates_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=0, event_id=1, value=1.00),
            Row(user_id=1, ts=2000, event_id=2, value=3.00),
            Row(user_id=1, ts=2000, event_id=3, value=5.00),  # zero gap
        ]
    )
    out = {r["event_id"]: r for r in TS.value_rates(df).collect()}
    assert 1 not in out  # first event has no predecessor
    assert out[2]["delta_cents"] == 200 and out[2]["delta_ms"] == 2000
    assert out[2]["rate_cps"] == 100.0  # 200 cents / 2 s
    assert out[3]["delta_ms"] == 0 and out[3]["rate_cps"] is None


def test_interpolate_grid_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=500, event_id=1, value=1.00),
            Row(user_id=1, ts=2500, event_id=2, value=3.00),
            Row(user_id=1, ts=3000, event_id=3, value=9.00),  # exact hit at 3000
        ]
    )
    out = {r["grid_ts"]: r for r in
           TS.interpolate_grid(df, "1s").collect()}
    # grid points: 1000, 2000 (interpolated), 3000 (exact)
    assert set(out) == {1000, 2000, 3000}
    # at 1000: 100 + (300-100)*(1000-500)/(2500-500) = 100 + 200*0.25 = 150
    assert out[1000]["interp_cents"] == 150.0 and not out[1000]["exact_hit"]
    assert out[2000]["interp_cents"] == 250.0
    assert out[3000]["interp_cents"] == 900.0 and out[3000]["exact_hit"]
    assert out[3000]["next_ts"] is None and out[1000]["prev_ts"] == 500


def test_interpolate_grid_no_global_window(spark):
    df = spark.createDataFrame(
        [Row(user_id=i % 3, ts=1000 * i, event_id=i, value=float(i))
         for i in range(30)]
    )
    plan = TS.interpolate_grid(df, "5s")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_key_skew_report_planted(spark):
    from timeseriesfuser_spark.ops.scale import key_skew_report

    rows = [Row(k="hot") for _ in range(80)] + [Row(k=f"c{i}") for i in range(20)]
    out = key_skew_report(spark.createDataFrame(rows), ["k"], top_n=3).collect()
    assert len(out) == 3
    top = out[0] if out[0]["rank"] == 1 else sorted(out, key=lambda r: r["rank"])[0]
    assert top["k"] == "hot" and top["cnt"] == 80
    assert top["share_ppm"] == 800_000
    assert all(r["cnt"] == 1 and r["rank"] == 2 for r in out if r["k"] != "hot")


# --------------------------------------------------------------------------- #
# twap_bars / ewma
# --------------------------------------------------------------------------- #


def test_twap_hand_computed(spark):
    # one user, horizon at 10_000: v=1.00 for [0,4000), v=3.00 for [4000,10000)
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=0, event_id=1, value=1.00),
            Row(user_id=1, ts=4000, event_id=2, value=3.00),
        ]
    )
    out = TS.twap_bars(df, "1s", horizon_ms=10_000).collect()
    by_ts = {r["bar_ts"]: r for r in out}
    assert len(by_ts) == 10
    assert by_ts[0]["twap_cents"] == 100.0
    assert by_ts[3000]["twap_cents"] == 100.0
    assert by_ts[4000]["twap_cents"] == 300.0
    assert by_ts[9000]["twap_cents"] == 300.0
    assert by_ts[0]["dur_ms"] == 1000 and by_ts[0]["tw_cents"] == 100_000


def test_twap_split_segment(spark):
    # event mid-bucket: bucket 0 averages 1.00 (500ms) and 2.00 (500ms)
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=0, event_id=1, value=1.00),
            Row(user_id=1, ts=500, event_id=2, value=2.00),
        ]
    )
    out = {r["bar_ts"]: r for r in TS.twap_bars(df, "1s", horizon_ms=2000).collect()}
    assert out[0]["twap_cents"] == 150.0
    assert out[1000]["twap_cents"] == 200.0


def test_ewma_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=0, event_id=1, value=1.00),
            Row(user_id=1, ts=1000, event_id=2, value=2.00),
            Row(user_id=1, ts=2000, event_id=3, value=3.00),
            Row(user_id=2, ts=0, event_id=4, value=8.00),
        ]
    )
    out = {r["event_id"]: r["ewma"] for r in TS.ewma(df, alpha=0.25).collect()}
    assert out[1] == 100.0
    assert out[2] == 0.25 * 200 + 0.75 * 100.0   # 125
    assert out[3] == 0.25 * 300 + 0.75 * 125.0   # 168.75
    assert out[4] == 800.0  # independent key


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([Row(user_id=1, ts=0, event_id=1, value=1.0)])
    with pytest.raises(ValueError, match="alpha"):
        TS.ewma(df, alpha=0.0)


# --------------------------------------------------------------------------- #
# pivot_features
# --------------------------------------------------------------------------- #


def test_pivot_features_static_schema_and_zeros(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, event_type="click", value=1.00),
            Row(user_id=1, event_type="click", value=2.00),
            Row(user_id=2, event_type="buy", value=5.00),
        ]
    )
    out = TS.pivot_features(df, pivot_values=("click", "buy", "view"))
    assert out.columns == [
        "user_id",
        "click_n", "click_cents",
        "buy_n", "buy_cents",
        "view_n", "view_cents",
    ]
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[1]["click_n"] == 2 and rows[1]["click_cents"] == 300
    assert rows[1]["buy_n"] == 0 and rows[1]["view_cents"] == 0
    assert rows[2]["buy_cents"] == 500
    # Spark pivots as two-level aggregation: pre-agg on (key, pivot_col),
    # then the pivot agg on key — exactly 2 exchanges, the second over the
    # already-reduced relation. No per-pivot-value shuffles.
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2


def test_pivot_features_requires_values(spark):
    df = spark.createDataFrame([Row(user_id=1, event_type="a", value=1.0)])
    with pytest.raises(ValueError, match="pivot_values"):
        TS.pivot_features(df)


# --------------------------------------------------------------------------- #
# byte_shards / curation_verdicts
# --------------------------------------------------------------------------- #


def test_byte_shards_first_byte_rule(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, n_bytes=40) for i in range(10)]  # 40B each, 100B shards
    )
    out = {r["doc_id"]: r for r in
           P.byte_shards(df, 100, bytes_col="n_bytes").collect()}
    # offsets 0,40,80,120,... → shards 0,0,0,1,1,2,2,2,3,3
    assert [out[i]["shard"] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert out[2]["shard_offset"] == 80  # overshoots by one object max
    assert out[3]["start_offset"] == 120


def test_curation_verdicts_stages(spark):
    good = ("the quick brown fox jumps over the lazy dog and it runs on "
            "through the green field while the sun sets in the west and "
            "evening comes to the quiet town where people rest after work "
            "and children play games in the yard near the old oak tree "
            "while birds sing their last songs of the long summer day")
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=good),        # exact dup of 1
            Row(doc_id=3, text="tiny"),      # fails gopher min_tokens
        ]
    )
    from timeseriesfuser_spark.ops.lm import curation_verdicts

    out = {r["doc_id"]: r for r in curation_verdicts(df).collect()}
    assert out[2]["verdict"] == "exact_dup" and out[2]["keep"] is False
    assert out[3]["verdict"].startswith("gopher:") and out[3]["keep"] is False
    assert out[1]["verdict"] in (
        "keep", "classifier", "low_lm_score"  # passes dup+gopher stages
    )


def test_profile_columns_exact_and_approx(spark):
    from timeseriesfuser_spark.ops.scale import profile_columns

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=2, b="y")]
    )
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert out["a"]["n_rows"] == 3 and out["a"]["n_nulls"] == 0
    assert out["a"]["n_distinct"] == 2
    assert out["b"]["n_nulls"] == 1 and out["b"]["n_distinct"] == 2
    # approx path returns the same shape (values within HLL error)
    approx = {r["col_name"]: r for r in
              profile_columns(df, exact_distinct=False).collect()}
    assert set(approx) == {"a", "b"}
    assert approx["a"]["n_distinct"] >= 1


# --------------------------------------------------------------------------- #
# behavior family: funnel / retention / latest snapshot / diff
# --------------------------------------------------------------------------- #


def test_funnel_strict_order(spark):
    from timeseriesfuser_spark.ops.behavior import funnel_counts

    rows = [
        # user 1 completes A→B→C in order
        Row(user_id=1, ts=10, event_type="A"),
        Row(user_id=1, ts=20, event_type="B"),
        Row(user_id=1, ts=30, event_type="C"),
        # user 2 does B BEFORE A → stops at A
        Row(user_id=2, ts=5, event_type="B"),
        Row(user_id=2, ts=10, event_type="A"),
        # user 3 only A, B
        Row(user_id=3, ts=1, event_type="A"),
        Row(user_id=3, ts=2, event_type="B"),
        # user 4 never does A → not in funnel
        Row(user_id=4, ts=1, event_type="C"),
    ]
    out = {r["step"]: r for r in
           funnel_counts(spark.createDataFrame(rows), ["A", "B", "C"]).collect()}
    assert out["A"]["n_users"] == 3 and out["A"]["conv_ppm"] == 1_000_000
    assert out["B"]["n_users"] == 2  # users 1 and 3 (user 2's B was early)
    assert out["C"]["n_users"] == 1
    assert out["C"]["conv_ppm"] == 1_000_000 // 3


def test_latest_snapshot_tie_breaks_by_seq(spark):
    from timeseriesfuser_spark.ops.behavior import latest_snapshot

    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=100, event_id=1, value=1.0),
            Row(user_id=1, ts=100, event_id=2, value=2.0),  # same ts, later seq
            Row(user_id=2, ts=50, event_id=3, value=3.0),
        ]
    )
    out = {r["user_id"]: r for r in latest_snapshot(df).collect()}
    assert out[1]["value"] == 2.0 and out[1]["event_id"] == 2
    assert out[2]["value"] == 3.0


def test_snapshot_diff_labels(spark):
    from timeseriesfuser_spark.ops.behavior import snapshot_diff

    old = spark.createDataFrame(
        [Row(user_id=1, value=1.0), Row(user_id=2, value=2.0),
         Row(user_id=3, value=3.0)]
    )
    new = spark.createDataFrame(
        [Row(user_id=1, value=1.0), Row(user_id=2, value=9.0),
         Row(user_id=4, value=4.0)]
    )
    out = {r["user_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_retention_cohorts_anchors(spark):
    from timeseriesfuser_spark.ops.behavior import retention_cohorts

    P = 100
    rows = [
        Row(user_id=1, ts=10),   # cohort 0
        Row(user_id=1, ts=110),  # active offset 1
        Row(user_id=1, ts=310),  # active offset 3
        Row(user_id=2, ts=50),   # cohort 0, never returns
        Row(user_id=3, ts=150),  # cohort 1
        Row(user_id=3, ts=250),  # offset 1
    ]
    out = {(r["cohort_ts"], r["period_offset"]): r
           for r in retention_cohorts(
               spark.createDataFrame(rows), period_ms=P).collect()}
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 1)]["n_active"] == 1
    assert out[(0, 1)]["retention_ppm"] == 500_000
    assert out[(0, 3)]["n_active"] == 1
    assert out[(100, 0)]["cohort_size"] == 1 and out[(100, 1)]["n_active"] == 1
