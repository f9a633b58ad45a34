"""Round-13 additions: Holt linear trend, Benford digit profile,
positional inverted index + phrase search."""

import math

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops import scale as SC
from timeseriesfuser_spark.ops import text as X
from timeseriesfuser_spark.ops import timeseries as TS


class TestHoltLinear:
    def _events(self, spark, vals):
        rows = [
            (1, 1000 + i * 10, i, float(v)) for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "value"]
        )

    def test_matches_python_reference(self, spark):
        vals = [10.0, 12.0, 15.0, 11.0, 20.0, 25.0]
        out = (
            TS.holt_linear(self._events(spark, vals))
            .orderBy("ts")
            .collect()
        )
        a = b = 0.25
        lv = tr = 0.0
        for i, r in enumerate(out):
            x = float(r.cents)
            if i == 0:
                lv, tr = x, 0.0
            else:
                prev = lv
                lv = a * x + (1.0 - a) * (lv + tr)
                tr = b * (lv - prev) + (1.0 - b) * tr
            assert r.level == lv and r.trend == tr
            assert r.forecast == lv + tr

    def test_trend_tracks_linear_series_better_than_ewma(self, spark):
        vals = [float(100 + 10 * i) for i in range(30)]
        df = self._events(spark, vals)
        holt = TS.holt_linear(df).orderBy("ts").collect()
        ew = TS.ewma(df).orderBy("ts").collect()
        true_next = (100 + 10 * 30) * 100  # cents
        holt_err = abs(holt[-1].forecast - true_next)
        ewma_err = abs(ew[-1].ewma - true_next)
        assert holt_err < ewma_err

    def test_null_value_poisons_tail_as_null(self, spark):
        rows = [
            (1, 1000, 0, 10.0),
            (1, 1010, 1, None),
            (1, 1020, 2, 12.0),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "value"]
        )
        out = TS.holt_linear(df).orderBy("ts").collect()
        assert out[0].level is not None
        assert out[1].level is None and out[1].forecast is None
        assert out[2].level is None  # NaN-poisoned, like the SQL NULL chain

    def test_bad_params(self, spark):
        df = self._events(spark, [1.0])
        with pytest.raises(ValueError):
            TS.holt_linear(df, alpha=0.0)
        with pytest.raises(ValueError):
            TS.holt_linear(df, beta=1.5)


class TestBenfordDigits:
    def test_digits_and_ppm(self, spark):
        rows = []
        # group "a": values 1.00-9.00 once each -> each digit n=1
        for d in range(1, 10):
            rows.append((0, "a", float(d)))
        # group "b": 5 values starting with digit 1
        for i in range(5):
            rows.append((0, "b", 1.0 + i * 0.001))
        df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
        out = SC.benford_digits(df).collect()
        a = {r.digit: r for r in out if r.event_type == "a"}
        b = {r.digit: r for r in out if r.event_type == "b"}
        assert len(a) == 9 and len(b) == 9
        assert all(a[d].n == 1 for d in range(1, 10))
        assert a[1].obs_ppm == 1_000_000 // 9
        assert b[1].n == 5 and b[1].obs_ppm == 1_000_000
        assert b[2].n == 0 and b[2].obs_ppm == 0
        for d in range(1, 10):
            assert a[d].exp_ppm == round(math.log10(1 + 1 / d) * 1_000_000)

    def test_zero_and_null_excluded(self, spark):
        df = spark.createDataFrame(
            [(0, "a", 0.0), (0, "a", None), (0, "a", 3.5)],
            ["ts", "event_type", "value"],
        )
        out = SC.benford_digits(df).collect()
        assert sum(r.n for r in out) == 1
        assert {r.digit for r in out if r.n > 0} == {3}

    def test_negative_values_use_abs(self, spark):
        df = spark.createDataFrame(
            [(0, "a", -7.2)], ["ts", "event_type", "value"]
        )
        out = {r.digit: r.n for r in SC.benford_digits(df).collect()}
        assert out[7] == 1

    def test_null_group_kept(self, spark):
        df = spark.createDataFrame(
            [(0, None, 5.0)], "ts long, event_type string, value double"
        )
        out = SC.benford_digits(df).collect()
        assert len(out) == 9
        assert sum(r.n for r in out) == 1


class TestPhraseSearch:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (2, "quick brown shoes and quick brown boots"),
                (3, "brown quick inverted order"),
                (4, "quick only here"),
                (5, None),
            ],
            ["doc_id", "text"],
        )

    def test_phrase_hits_and_positions(self, spark):
        idx = X.build_token_index(self._docs(spark))
        out = {
            r.id: (r.n_matches, r.first_pos)
            for r in X.phrase_search_indexed(idx, ["quick", "brown"]).collect()
        }
        assert out == {1: (1, 2), 2: (2, 1)}

    def test_single_token_phrase(self, spark):
        idx = X.build_token_index(self._docs(spark))
        out = {
            r.id: r.n_matches
            for r in X.phrase_search_indexed(idx, ["quick"]).collect()
        }
        assert out == {1: 1, 2: 2, 3: 1, 4: 1}

    def test_three_token_phrase(self, spark):
        idx = X.build_token_index(self._docs(spark))
        out = X.phrase_search_indexed(
            idx, ["quick", "brown", "fox"]
        ).collect()
        assert [(r.id, r.n_matches, r.first_pos) for r in out] == [(1, 1, 2)]

    def test_missing_phrase_empty(self, spark):
        idx = X.build_token_index(self._docs(spark))
        assert X.phrase_search_indexed(idx, ["purple", "fox"]).count() == 0

    def test_empty_phrase_raises(self, spark):
        idx = X.build_token_index(self._docs(spark))
        with pytest.raises(ValueError):
            X.phrase_search_indexed(idx, [])

    def test_index_positions_one_based(self, spark):
        idx = X.build_token_index(self._docs(spark))
        rows = idx.filter(F.col("id") == 1).orderBy("pos").collect()
        assert [(r.token, r.pos) for r in rows] == [
            ("the", 1), ("quick", 2), ("brown", 3), ("fox", 4)
        ]


class TestRound13PlanGates:
    def _plan(self, df):
        spark = df.sparkSession
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)

    def test_benford_single_input_pass(self, spark):
        import re

        from timeseriesfuser_spark.contract import QUERIES

        df = QUERIES["benford_value_digits"](spark, "/root/testdata/sf0.001")
        plan = self._plan(df)
        # counts is checkpointed after ONE input scan; the final plan
        # must not rescan the events parquet per branch
        scans = len(set(re.findall(r"\(\d+\) Scan parquet", plan)))
        assert scans == 0, plan
        assert "CartesianProduct" not in plan

    def test_phrase_search_no_cartesian_and_pos_joins(self, spark):
        from timeseriesfuser_spark.contract import QUERIES

        df = QUERIES["phrase_search"](spark, "/root/testdata/sf0.001")
        plan = self._plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestJoinViewDelta:
    def test_ivm_identity_random_split(self, spark):
        import random

        rng = random.Random(7)
        a_rows = [(i % 20, f"a{i}") for i in range(100)]
        b_rows = [(i % 25, i * 10) for i in range(120)]
        a_split = [rng.random() < 0.6 for _ in a_rows]
        b_split = [rng.random() < 0.6 for _ in b_rows]
        from timeseriesfuser_spark.ops.behavior import join_view_delta

        A = spark.createDataFrame(
            [r for r, s in zip(a_rows, a_split) if s], ["k", "av"]
        )
        dA = spark.createDataFrame(
            [r for r, s in zip(a_rows, a_split) if not s], ["k", "av"]
        )
        B = spark.createDataFrame(
            [r for r, s in zip(b_rows, b_split) if s], ["k", "bv"]
        )
        dB = spark.createDataFrame(
            [r for r, s in zip(b_rows, b_split) if not s], ["k", "bv"]
        )
        delta = join_view_delta(A, dA, B, dB, on="k").collect()
        base = A.join(B, "k").collect()
        full = A.unionByName(dA).join(B.unionByName(dB), "k").collect()
        combined = sorted(map(tuple, base)) + sorted(map(tuple, delta))
        assert sorted(combined) == sorted(map(tuple, full))

    def test_outer_rejected(self, spark):
        from timeseriesfuser_spark.ops.behavior import join_view_delta

        df = spark.createDataFrame([(1, 1)], ["k", "v"])
        with pytest.raises(ValueError):
            join_view_delta(df, df, df, df, on="k", how="left")


class TestKcorePeel:
    def _brute_kcore(self, edges, k, rounds):
        # symmetrized adjacency peeling, Python reference
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        nodes = set(adj)
        for _ in range(rounds):
            drop = {n for n in nodes if len(adj[n] & nodes) < k}
            if not drop:
                break
            nodes -= drop
        return {n: len(adj[n] & nodes) for n in nodes}

    def test_matches_brute_force(self, spark):
        import random

        rng = random.Random(11)
        edges = list({
            tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)
        })
        from timeseriesfuser_spark.ops.graph import kcore_peel

        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        for k in (2, 3, 4):
            got = {
                r.id: r.degree
                for r in kcore_peel(df, k, rounds=10).collect()
            }
            assert got == self._brute_kcore(edges, k, rounds=10), k

    def test_clique_survives_star_peels(self, spark):
        from timeseriesfuser_spark.ops.graph import kcore_peel

        # K4 clique + star leaves hanging off node 0
        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        edges += [(0, 100 + i) for i in range(5)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r.id: r.degree for r in kcore_peel(df, 3, rounds=5).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_validates(self, spark):
        from timeseriesfuser_spark.ops.graph import kcore_peel

        df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        with pytest.raises(ValueError):
            kcore_peel(df, 0)


class TestLatenessStats:
    def test_profile(self, spark):
        # arrival order = event_id; ts stream with two late rows
        rows = [
            ("a", 1, 1000), ("a", 2, 2000), ("a", 3, 1500),  # late by 500
            ("a", 4, 3000), ("a", 5, 2900),                  # late by 100
            ("b", 6, 100), ("b", 7, 200),                    # in order
        ]
        df = spark.createDataFrame(rows, ["event_type", "event_id", "ts"])
        from timeseriesfuser_spark.ops.timeseries import lateness_stats

        out = {r.event_type: r for r in lateness_stats(df).collect()}
        a = out["a"]
        assert (a.n, a.n_late, a.max_late_ms, a.sum_late_ms) == (5, 2, 500, 600)
        assert a.late_ppm == 2 * 1_000_000 // 5
        b = out["b"]
        assert (b.n, b.n_late, b.max_late_ms, b.sum_late_ms) == (2, 0, 0, 0)

    def test_null_ts_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1000), ("a", 2, None), ("a", 3, 900)],
            "event_type string, event_id long, ts long",
        )
        from timeseriesfuser_spark.ops.timeseries import lateness_stats

        out = lateness_stats(df).collect()[0]
        assert out.n == 2 and out.n_late == 1 and out.max_late_ms == 100


class TestRrfFuse:
    def test_fusion_scores_and_ranks(self, spark):
        from timeseriesfuser_spark.ops.similarity import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            ["query_id", "neighbor_id", "rank"],
        )
        r2 = spark.createDataFrame(
            [(1, 11, 1), (1, 10, 2), (1, 13, 3)],
            ["query_id", "neighbor_id", "rank"],
        )
        out = {r.item_id: r for r in rrf_fuse([r1, r2], k=60).collect()}
        s = lambda rk: 10**9 // (60 + rk)
        assert out[10].rrf_score == s(1) + s(2)
        assert out[11].rrf_score == s(2) + s(1)
        assert out[10].n_lists == 2 and out[12].n_lists == 1
        # 10 and 11 tie exactly -> lower item id first
        assert out[10].rank == 1 and out[11].rank == 2
        assert out[12].rank == 3 and out[13].rank == 4  # tie -> lower id

    def test_top_n_and_validation(self, spark):
        from timeseriesfuser_spark.ops.similarity import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, i, i) for i in range(1, 6)],
            ["query_id", "neighbor_id", "rank"],
        )
        assert rrf_fuse([r1], top_n=2).count() == 2
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([r1], k=0)


class TestTpcdsNewShapes:
    def _plan(self, df):
        spark = df.sparkSession
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)

    def test_q59_single_pipeline_pass_no_cartesian(self, spark):
        import re

        from timeseriesfuser_spark.contract import QUERIES

        df = QUERIES["tpcds_q59_weekly_yoy"](spark, "/root/testdata/sf0.001")
        plan = self._plan(df)
        # wss is checkpointed: the self-join must not re-run the fact join
        assert len(set(re.findall(r"\(\d+\) Scan parquet", plan))) == 0, plan
        assert "CartesianProduct" not in plan

    def test_q49_two_scans_no_cartesian(self, spark):
        import re

        from timeseriesfuser_spark.contract import QUERIES

        df = QUERIES["tpcds_q49_return_ratios"](
            spark, "/root/testdata/sf0.001"
        )
        plan = self._plan(df)
        assert len(set(re.findall(r"\(\d+\) Scan parquet", plan))) <= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPhraseSearchDfOrdering:
    def test_df_ordered_identical_results(self, spark):
        docs = spark.createDataFrame(
            [(i, "the common word " + ("rare " if i == 7 else "filler ")
              + "the common tail") for i in range(50)],
            ["doc_id", "text"],
        )
        idx = X.build_token_index(docs).cache()
        try:
            idx.count()
            for phrase in (["the", "common", "word"], ["rare", "the"],
                           ["common", "word"]):
                a = sorted(map(tuple, X.phrase_search_indexed(
                    idx, phrase, df_ordered=True).collect()))
                b = sorted(map(tuple, X.phrase_search_indexed(
                    idx, phrase, df_ordered=False).collect()))
                assert a == b, phrase
        finally:
            idx.unpersist()

    def test_absent_token_short_circuits(self, spark):
        docs = spark.createDataFrame(
            [(1, "the the the the")], ["doc_id", "text"]
        )
        idx = X.build_token_index(docs)
        assert X.phrase_search_indexed(idx, ["the", "missing"]).count() == 0


class TestWindowFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts long, event_type string"
        )

    def test_any_anchor_semantics(self, spark):
        from timeseriesfuser_spark.ops.behavior import window_funnel

        rows = [
            # user 1: first signup goes stale, SECOND signup converts
            (1, 0, "signup"), (1, 1000, "signup"),
            (1, 1100, "view"), (1, 1200, "purchase"),
            # user 2: chain exceeds the window (purchase too late)
            (2, 0, "signup"), (2, 100, "view"), (2, 5000, "purchase"),
            # user 3: wrong order
            (3, 0, "view"), (3, 100, "signup"),
        ]
        out = {
            r.step_idx: r
            for r in window_funnel(
                self._ev(spark, rows),
                ["signup", "view", "purchase"], 500,
            ).collect()
        }
        assert out[0].n_users == 3
        assert out[1].n_users == 2  # users 1 (2nd anchor) and 2
        assert out[2].n_users == 1  # only user 1
        assert out[2].conv_ppm == 1_000_000 // 3

    def test_strict_order_within_anchor(self, spark):
        from timeseriesfuser_spark.ops.behavior import window_funnel

        rows = [(1, 100, "signup"), (1, 100, "view")]  # same ts: not after
        out = {
            r.step_idx: r.n_users
            for r in window_funnel(
                self._ev(spark, rows), ["signup", "view"], 10_000
            ).collect()
        }
        assert out == {0: 1, 1: 0}

    def test_validates(self, spark):
        import pytest as _pytest

        from timeseriesfuser_spark.ops.behavior import window_funnel

        df = self._ev(spark, [(1, 0, "signup")])
        with _pytest.raises(ValueError):
            window_funnel(df, [], 100)
        with _pytest.raises(ValueError):
            window_funnel(df, ["signup"], 0)
