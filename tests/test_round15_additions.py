"""Round-15 session additions: log-free integer BM25 ranked retrieval,
the exact prefix-filtered set-similarity join (AllPairs/PPJoin),
sequence_match with negation, Theil-Sen robust trend, RFM segmentation
and the k-anonymity/l-diversity audit."""

import random

import pyspark.sql.functions as F
import pytest


def _py_bm25(docs: dict, terms, k1=(6, 5), b=(3, 4)):
    """Independent reference of ops.text.bm25_topk's integer formula."""
    tok = {i: (t or "").lower().split() for i, t in docs.items()}
    dl = {i: len(ts) for i, ts in tok.items()}
    D, T = len(docs), sum(dl.values())
    k1n, k1d = k1
    bn, bd = b
    out = {}
    for term in sorted(set(terms)):
        hits = {i: ts.count(term) for i, ts in tok.items() if term in ts}
        if not hits:
            continue
        dft = len(hits)
        idf = (D * 1_000_000) // dft
        for i, tf in hits.items():
            num = idf * (k1n + k1d) * bd * T * tf
            den = k1d * bd * T * tf + k1n * (bd - bn) * T + k1n * bn * dl[i] * D
            s, n = out.get(i, (0, 0))
            out[i] = (s + num // den, n + 1)
    return out


class TestBM25:
    def _docs(self):
        return {
            1: "apple banana apple cherry",
            2: "apple apple apple apple apple apple apple apple apple apple",
            3: "banana cherry durian elderberry fig grape honeydew",
            4: "apple",
            5: "kiwi lime mango",
        }

    def _run(self, spark, terms, **kw):
        from timeseriesfuser_spark.ops.text import bm25_topk

        docs = self._docs()
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        )
        got = {
            r["id"]: (r["bm25_u"], r["n_terms"])
            for r in bm25_topk(df, terms, **kw).collect()
        }
        return got, _py_bm25(docs, terms)

    def test_matches_python_reference(self, spark):
        got, want = self._run(spark, ["apple", "banana"])
        assert got == want

    def test_tf_saturation(self, spark):
        """BM25's whole point: 10x the tf is far less than 10x the score."""
        got, _ = self._run(spark, ["apple"])
        # doc 2: tf=10 in a length-10 doc; doc 4: tf=1 in a length-1 doc
        assert got[2][0] < 10 * got[4][0]

    def test_length_normalization(self, spark):
        """Same tf=1: the shorter doc scores higher."""
        got, _ = self._run(spark, ["banana"])
        assert got[1][0] > got[3][0]  # len 4 vs len 7

    def test_top_k_and_ties(self, spark):
        got, want = self._run(spark, ["apple"], k=2)
        ranked = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:2]
        assert set(got) == {i for i, _ in ranked}

    def test_empty_terms_raises(self, spark):
        from timeseriesfuser_spark.ops.text import bm25_topk

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_topk(df, [])

    def test_null_text_and_absent_term(self, spark):
        from timeseriesfuser_spark.ops.text import bm25_topk

        df = spark.createDataFrame(
            [(1, "apple pie"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        rows = bm25_topk(df, ["apple", "zzz"]).collect()
        assert [r["id"] for r in rows] == [1]
        assert rows[0]["n_terms"] == 1


def _py_set_pairs(docs: dict, n: int, tn: int, td: int):
    """Brute-force exact bigram-set jaccard pairs (integer threshold)."""
    sets = {}
    for i, t in docs.items():
        toks = (t or "").lower().split()
        sets[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            union = len(a | b)
            if union and inter * td >= tn * union:
                out.add((ids[x], ids[y], inter, union))
    return out


class TestSetSimilarityPairs:
    def test_brute_force_differential(self, spark):
        """Random corpus from a small vocab: the prefix-filtered join must
        return EXACTLY the brute-force pair set (losslessness)."""
        from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

        rng = random.Random(42)
        vocab = [f"w{j}" for j in range(12)]
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
            for i in range(40)
        }
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        )
        for tn, td in [(2, 5), (1, 2), (4, 5)]:
            got = {
                (r["id_a"], r["id_b"], r["intersection"], r["union_size"])
                for r in set_similarity_pairs(
                    df, n=2, threshold=(tn, td), cache=False
                ).collect()
            }
            assert got == _py_set_pairs(docs, 2, tn, td), (tn, td)

    def test_boundary_jaccard_included(self, spark):
        """A pair at EXACTLY the threshold must be kept (>= semantics,
        integer cross-product test — no float epsilon)."""
        from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

        # bigram sets: {a b, b c} vs {a b, b d} -> inter 1, union 3
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
        )
        rows = set_similarity_pairs(df, n=2, threshold=(1, 3), cache=False).collect()
        assert len(rows) == 1 and rows[0]["intersection"] == 1
        assert rows[0]["union_size"] == 3
        rows = set_similarity_pairs(df, n=2, threshold=(34, 100), cache=False).collect()
        assert rows == []

    def test_null_and_empty_text(self, spark):
        from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "x y z"), (4, "x y z")],
            "doc_id long, text string",
        )
        rows = set_similarity_pairs(df, n=2, threshold=(1, 2), cache=False).collect()
        assert [(r["id_a"], r["id_b"]) for r in rows] == [(3, 4)]

    def test_bad_threshold_raises(self, spark):
        from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        for t in [(0, 5), (6, 5), (-1, 2)]:
            with pytest.raises(ValueError):
                set_similarity_pairs(df, threshold=t)

    def test_no_cartesian_in_plan(self, spark):
        from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

        df = spark.createDataFrame(
            [(i, f"t{i} t{i+1} t{i+2}") for i in range(30)],
            "doc_id long, text string",
        )
        plan = set_similarity_pairs(df, cache=False)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def _py_seq_match(events, within=None):
    """Brute force: per user, exists (A at ta, B at tb), ta < tb,
    no C strictly between, tb - ta <= within."""
    import collections

    by_user = collections.defaultdict(list)
    for u, ty, t in events:
        if t is not None:
            by_user[u].append((t, ty))
    out = {}
    for u, evs in by_user.items():
        a_ts = sorted(t for t, ty in evs if ty == "A")
        if not a_ts:
            continue
        b_ts = sorted(t for t, ty in evs if ty == "B")
        c_ts = sorted(t for t, ty in evs if ty == "C")
        good = set()
        for ta in a_ts:
            for tb in b_ts:
                if tb <= ta or (within is not None and tb - ta > within):
                    continue
                if not any(ta < tc < tb for tc in c_ts):
                    good.add(ta)
                    break
        out[u] = (
            1 if good else 0,
            sum(1 for ta in a_ts if ta in good),
            min(good) if good else None,
        )
    return out


class TestSequenceMatch:
    def _run(self, spark, rows, **kw):
        from timeseriesfuser_spark.ops.behavior import sequence_match

        df = spark.createDataFrame(
            rows, "user_id string, event_type string, ts long"
        )
        got = {
            r["user_id"]: (r["matched"], r["n_matches"], r["first_anchor_ts"])
            for r in sequence_match(df, "A", "B", not_between="C", **kw).collect()
        }
        return got

    def test_brute_force_differential(self, spark):
        rng = random.Random(7)
        rows = [
            (f"u{rng.randint(0, 15)}", rng.choice("AABBC"), rng.randint(0, 50))
            for _ in range(400)
        ]
        for within in [None, 10, 3]:
            got = self._run(spark, rows, within_ms=within)
            assert got == _py_seq_match(rows, within), within

    def test_blocker_at_closing_ts_not_between(self, spark):
        # C at exactly B's ts is NOT strictly between -> match
        got = self._run(spark, [("u", "A", 0), ("u", "B", 5), ("u", "C", 5)])
        assert got["u"] == (1, 1, 0)

    def test_blocker_strictly_between(self, spark):
        got = self._run(
            spark, [("u", "A", 0), ("u", "C", 3), ("u", "B", 5)]
        )
        assert got["u"] == (0, 0, None)

    def test_later_clean_pair_recovers(self, spark):
        # first A blocked, second A clean
        got = self._run(
            spark,
            [("u", "A", 0), ("u", "C", 1), ("u", "A", 2), ("u", "B", 4)],
        )
        assert got["u"] == (1, 1, 2)

    def test_window_boundary(self, spark):
        rows = [("u", "A", 0), ("u", "B", 10)]
        assert self._run(spark, rows, within_ms=10)["u"] == (1, 1, 0)
        assert self._run(spark, rows, within_ms=9)["u"] == (0, 0, None)

    def test_population_is_anchor_users(self, spark):
        got = self._run(spark, [("u1", "A", 0), ("u2", "B", 1)])
        assert set(got) == {"u1"} and got["u1"] == (0, 0, None)


class TestTheilSen:
    def test_python_reference(self, spark):
        from timeseriesfuser_spark.ops.timeseries import theil_sen_trend

        days = [0, 1, 2, 3, 10]
        vals = [1.00, 2.00, 3.50, 2.75, 11.00]
        rows = [
            ("k", i, d * 86_400_000 + 7, v)
            for i, (d, v) in enumerate(zip(days, vals))
        ]
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long, value double"
        )
        out = theil_sen_trend(df, "1d", cache=False).collect()[0]
        cents = [round(v * 100) for v in vals]
        slopes = sorted(
            (cents[j] - cents[i]) * 1_000_000 // (days[j] - days[i])
            if (cents[j] - cents[i]) * 1_000_000 % (days[j] - days[i]) == 0
            or (cents[j] - cents[i]) >= 0
            else -((-(cents[j] - cents[i]) * 1_000_000) // (days[j] - days[i]))
            for i in range(5)
            for j in range(i + 1, 5)
        )
        n = len(slopes)
        want = slopes[(n - 1) // 2] + slopes[n // 2]
        assert out["n_bars"] == 5 and out["n_pairs"] == 10
        assert out["slope_x2_u"] == want

    def test_outlier_immunity(self, spark):
        from timeseriesfuser_spark.ops.timeseries import theil_sen_trend

        # perfect slope 1 cent/day with one wild outlier bar
        rows = [("k", i, d * 86_400_000, d / 100.0) for i, d in enumerate(range(9))]
        rows.append(("k", 99, 9 * 86_400_000, 1e6))
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long, value double"
        )
        out = theil_sen_trend(df, "1d", cache=False).collect()[0]
        # 45 clean pairs of slope exactly 1e6, 9 outlier pairs; median
        # of 54 values = doubled middle stats, still 2e6 (= 2 x 1 cent/day)
        assert out["slope_x2_u"] == 2_000_000

    def test_single_bar_key(self, spark):
        from timeseriesfuser_spark.ops.timeseries import theil_sen_trend

        df = spark.createDataFrame(
            [("k", 1, 5, 1.0)],
            "event_type string, event_id long, ts long, value double",
        )
        out = theil_sen_trend(df, "1d", cache=False).collect()[0]
        assert out["n_bars"] == 1 and out["n_pairs"] == 0
        assert out["slope_x2_u"] is None

    def test_last_value_wins_within_bar(self, spark):
        from timeseriesfuser_spark.ops.timeseries import theil_sen_trend

        rows = [
            ("k", 1, 0, 5.0), ("k", 2, 10, 1.0),      # day 0 close = 1.0
            ("k", 3, 86_400_000, 2.0),                 # day 1 close = 2.0
        ]
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long, value double"
        )
        out = theil_sen_trend(df, "1d", cache=False).collect()[0]
        assert out["slope_x2_u"] == 2 * 100 * 1_000_000 // 1  # 100 cents/day x2


class TestRFMAndKAnon:
    def test_rfm_bins_hand_check(self, spark):
        from timeseriesfuser_spark.ops.behavior import rfm_segments

        # 5 users, clearly ordered on each axis
        rows = []
        for u in range(5):
            for j in range(u + 1):  # frequency = u+1
                rows.append((u, (u * 10 + j) * 86_400_000, float(u + 1)))
        df = spark.createDataFrame(
            rows, "o_custkey long, __ms long, o_totalprice double"
        ).select(
            "o_custkey",
            F.timestamp_millis(F.col("__ms")).alias("o_orderdate"),
            "o_totalprice",
        )
        out = {r["o_custkey"]: r for r in rfm_segments(df).collect()}
        assert [out[u]["f_bin"] for u in range(5)] == [0, 1, 2, 3, 4]
        assert [out[u]["m_bin"] for u in range(5)] == [0, 1, 2, 3, 4]
        # user 4 is most recent -> r_bin 0; user 0 least recent -> r_bin 4
        assert out[4]["r_bin"] == 0 and out[0]["r_bin"] == 4
        assert out[4]["recency_days"] == 0

    def test_k_anonymity(self, spark):
        from timeseriesfuser_spark.ops.expect import k_anonymity

        rows = [
            ("us", "a", 1.0), ("us", "a", 1.0), ("us", "a", 2.0),
            ("us", "b", None), ("fr", "a", 3.0),
        ]
        df = spark.createDataFrame(rows, "nat string, seg string, bal double")
        out = {
            (r["nat"], r["seg"]): (r["n"], r["l_distinct"], r["at_risk"])
            for r in k_anonymity(df, ["nat", "seg"], 2, sensitive_col="bal").collect()
        }
        assert out[("us", "a")] == (3, 2, 0)
        assert out[("us", "b")] == (1, 1, 1)   # NULL counts as one value
        assert out[("fr", "a")] == (1, 1, 1)

    def test_k_anonymity_validation(self, spark):
        from timeseriesfuser_spark.ops.expect import k_anonymity

        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError):
            k_anonymity(df, [], 2)
        with pytest.raises(ValueError):
            k_anonymity(df, ["a"], 0)


class TestTextQualityOps:
    def test_script_profile_mixture(self, spark):
        from timeseriesfuser_spark.ops.text import script_profile

        df = spark.createDataFrame(
            [(1, "Hello, 世界 Мир 42 done!"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in script_profile(df).collect()}
        r = out[1]
        assert (r["n_chars"], r["n_latin"], r["n_han"], r["n_cyrillic"]) == (
            22, 9, 2, 3,
        )
        assert (r["n_digit"], r["n_space"]) == (2, 4)
        # remaining: ',' and '!' -> other
        assert r["n_other"] == 2
        assert r["latin_ppm"] == 9 * 1_000_000 // 22
        for i in (2, 3):
            assert out[i]["n_chars"] == 0 and out[i]["latin_ppm"] == 0

    def test_readability_hand_check(self, spark):
        from timeseriesfuser_spark.ops.text import readability_scores

        # "See spot run. See spot!" -> 5 words, 2 sentences,
        # syllables: ee|o|u|ee|o -> 5
        df = spark.createDataFrame(
            [(1, "See spot run. See spot!"), (2, None), (3, "no end mark")],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in readability_scores(df).collect()}
        r = out[1]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
        assert r["flesch_milli"] == 206835 - 1015 * 5 // 2 - 84600 * 5 // 5
        assert out[2]["n_words"] == 0 and out[2]["flesch_milli"] is None
        assert out[3]["n_sentences"] == 1  # min-1 rule


class TestHITS:
    def test_star_graph(self, spark):
        """Star: hub u0 points at v1..v3; one lone edge u1->v1.
        u0 is the top hub, v1 the top authority."""
        from timeseriesfuser_spark.ops.graph import hits_scores

        edges = spark.createDataFrame(
            [("u0", "v1"), ("u0", "v2"), ("u0", "v3"), ("u1", "v1")],
            "id_a string, id_b string",
        )
        out = {
            (r["role"], r["id"]): r["score_ppm"]
            for r in hits_scores(edges, checkpoint=False).collect()
        }
        assert out[("hub", "u0")] == 1_000_000
        assert out[("hub", "u1")] < 1_000_000
        assert out[("authority", "v1")] == 1_000_000
        assert out[("authority", "v2")] == out[("authority", "v3")]
        assert out[("authority", "v2")] < 1_000_000

    def test_python_reference(self, spark):
        """Exact integer iterate reproduced independently."""
        from timeseriesfuser_spark.ops.graph import hits_scores
        import collections

        rng = random.Random(3)
        edges = sorted({(rng.randint(0, 9), rng.randint(10, 19)) for _ in range(40)})
        a = {d: 1_000_000 for _, d in edges}
        h = {}
        for _ in range(2):
            hr = collections.Counter()
            for s, d in edges:
                hr[s] += a[d]
            m = max(hr.values())
            h = {k: v * 1_000_000 // m for k, v in hr.items()}
            ar = collections.Counter()
            for s, d in edges:
                ar[d] += h[s]
            m = max(ar.values())
            a = {k: v * 1_000_000 // m for k, v in ar.items()}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            (r["role"], r["id"]): r["score_ppm"]
            for r in hits_scores(df, checkpoint=False).collect()
        }
        want = {("hub", k): v for k, v in h.items()}
        want.update({("authority", k): v for k, v in a.items()})
        assert got == want

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.graph import hits_scores

        df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError):
            hits_scores(df, iterations=0)


class TestSimHistogram:
    def test_python_reference(self, spark):
        """Exact reproduction on a small corpus: same md5 blocks, same
        quantized cosine, same binning."""
        from timeseriesfuser_spark.ops.similarity import embedding_sim_histogram
        import hashlib
        import math
        import collections

        rng = random.Random(11)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(60)}
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
        )
        got = {
            r["bin"]: (r["n_pairs"], r["share_ppm"])
            for r in embedding_sim_histogram(df, cache=False).collect()
        }

        def blk(i):
            return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 8

        q = {
            i: [round(float(__import__("numpy").float32(x)) * 1000) for x in v]
            for i, v in vecs.items()
        }
        cnt = collections.Counter()
        for i in q:
            for j in q:
                if i < j and blk(i) == blk(j):
                    na = sum(x * x for x in q[i])
                    nb = sum(x * x for x in q[j])
                    if na > 0 and nb > 0:
                        c = sum(a * b for a, b in zip(q[i], q[j])) / (
                            math.sqrt(na) * math.sqrt(nb)
                        )
                        c = round(c, 6)
                    else:
                        c = 0.0
                    cnt[math.floor(c * 20)] += 1
        tot = sum(cnt.values())
        want = {b: (n, n * 1_000_000 // tot) for b, n in cnt.items()}
        assert got == want

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.similarity import embedding_sim_histogram

        df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            embedding_sim_histogram(df, sample_buckets=0)
        with pytest.raises(ValueError):
            embedding_sim_histogram(df, bins=0)


class TestClusteringJourneyHtml:
    def test_clustering_hand_check(self, spark):
        """Triangle 1-2-3 plus pendant 4: cc(1)=cc(2)=1.0 for the pure
        triangle nodes... wait, 3 also bonds to 4. Hand-derived:
        deg(1)=2 tri(1)=1 cc=1e6; deg(3)=3 tri(3)=1 cc=2*1e6//6."""
        from timeseriesfuser_spark.ops.graph import clustering_coefficients

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "id_a long, id_b long"
        )
        out = {
            r["id"]: (r["degree"], r["n_triangles"], r["cc_ppm"])
            for r in clustering_coefficients(edges, cache=False).collect()
        }
        assert out[1] == (2, 1, 1_000_000)
        assert out[2] == (2, 1, 1_000_000)
        assert out[3] == (3, 1, 2 * 1_000_000 // 6)
        assert out[4] == (1, 0, 0)

    def test_clustering_python_reference(self, spark):
        from timeseriesfuser_spark.ops.graph import clustering_coefficients
        import itertools

        rng = random.Random(5)
        edges = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)})
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for v, nb in adj.items():
            d = len(nb)
            t = sum(
                1 for x, y in itertools.combinations(sorted(nb), 2)
                if y in adj.get(x, ())
            )
            want[v] = (d, t, 2 * t * 1_000_000 // (d * (d - 1)) if d >= 2 else 0)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: (r["degree"], r["n_triangles"], r["cc_ppm"])
            for r in clustering_coefficients(df, cache=False).collect()
        }
        assert got == want

    def test_journey_paths(self, spark):
        from timeseriesfuser_spark.ops.behavior import journey_paths

        rows = [
            ("u1", "a", 1, 1), ("u1", "b", 2, 2), ("u1", "c", 3, 3),
            ("u1", "d", 4, 4),                     # beyond depth
            ("u2", "a", 1, 1), ("u2", "b", 2, 2), ("u2", "c", 3, 3),
            ("u3", "a", 5, 1), ("u3", None, 5, 2),  # tie on ts -> seq; NULL type
            ("u4", "x", None, 1),                   # NULL ts excluded
        ]
        df = spark.createDataFrame(
            rows, "user_id string, event_type string, ts long, event_id long"
        )
        out = {
            r["path"]: (r["n_steps"], r["n_users"])
            for r in journey_paths(df, depth=3, top=10).collect()
        }
        assert out["a>b>c"] == (3, 2)
        assert out["a>"] == (2, 1)  # NULL type renders '' at its position
        assert "x" not in out

    def test_html_extract(self, spark):
        from timeseriesfuser_spark.ops.text import html_text_extract

        html = (
            '<html><head><style>p{x}</style></head><body>'
            "<h1>Hi &amp; bye</h1><!-- c --><p>a &lt;b&gt;  c</p>"
            '<script>if(1<2){var x="&amp;";}</script></body></html>'
        )
        df = spark.createDataFrame(
            [(1, html), (2, None)], "doc_id long, text string"
        )
        out = {r["id"]: r for r in html_text_extract(df).collect()}
        assert out[1]["clean_text"] == "Hi & bye a <b> c"
        assert out[2]["clean_text"] is None
        assert out[2]["n_chars_raw"] == 0

    def test_html_double_encoded_one_level(self, spark):
        from timeseriesfuser_spark.ops.text import html_text_extract

        df = spark.createDataFrame(
            [(1, "<p>&amp;lt;tag&amp;gt;</p>")], "doc_id long, text string"
        )
        r = html_text_extract(df).collect()[0]
        # one decode level: &amp;lt; -> &lt; (NOT <)
        assert r["clean_text"] == "&lt;tag&gt;"


class TestIntervalOverlapJoin:
    def _join(self, spark, a_rows, b_rows, chunk=10, keys=()):
        from timeseriesfuser_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        a = spark.createDataFrame(
            a_rows, ("k string, " if keys else "") + "aid long, s1 long, e1 long"
        )
        b = spark.createDataFrame(
            b_rows, ("k string, " if keys else "") + "bid long, s2 long, e2 long"
        )
        return interval_overlap_join(
            a, b, left_start="s1", left_end="e1",
            right_start="s2", right_end="e2", chunk_ms=chunk, keys=keys,
        )

    def test_brute_force_differential(self, spark):
        rng = random.Random(9)
        a_rows = [
            (i, s, s + rng.randint(0, 40))
            for i, s in enumerate(rng.randint(-50, 150) for _ in range(60))
        ]
        b_rows = [
            (i, s, s + rng.randint(0, 25))
            for i, s in enumerate(rng.randint(-50, 150) for _ in range(40))
        ]
        got = {
            (r["aid"], r["bid"])
            for r in self._join(spark, a_rows, b_rows, chunk=7).collect()
        }
        want = {
            (ai, bi)
            for ai, s1, e1 in a_rows
            for bi, s2, e2 in b_rows
            if max(s1, s2) < min(e1, e2)
        }
        assert got == want
        # each pair exactly once (no chunk duplicates)
        rows = self._join(spark, a_rows, b_rows, chunk=7).collect()
        assert len(rows) == len(got)

    def test_touching_endpoints_do_not_overlap(self, spark):
        rows = self._join(
            spark, [(1, 0, 10)], [(1, 10, 20)], chunk=4
        ).collect()
        assert rows == []
        rows = self._join(spark, [(1, 0, 11)], [(1, 10, 20)], chunk=4).collect()
        assert len(rows) == 1

    def test_empty_interval_matches_nothing(self, spark):
        assert self._join(spark, [(1, 5, 5)], [(1, 0, 100)]).collect() == []

    def test_keys_isolate(self, spark):
        rows = self._join(
            spark,
            [("x", 1, 0, 10), ("y", 2, 0, 10)],
            [("x", 1, 5, 15)],
            keys=["k"],
        ).collect()
        assert [(r["aid"], r["bid"]) for r in rows] == [(1, 1)]

    def test_validation(self, spark):
        from timeseriesfuser_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        a = spark.createDataFrame([(1, 0, 1)], "x long, s1 long, e1 long")
        b = spark.createDataFrame([(1, 0, 1)], "x long, s2 long, e2 long")
        with pytest.raises(ValueError):  # non-key column collision
            interval_overlap_join(
                a, b, left_start="s1", left_end="e1",
                right_start="s2", right_end="e2",
            )
        with pytest.raises(ValueError):
            interval_overlap_join(
                a.withColumnRenamed("x", "y"), b,
                left_start="s1", left_end="e1",
                right_start="s2", right_end="e2", chunk_ms=0,
            )


class TestPositionAttribution:
    def test_u_shape_credits(self, spark):
        from timeseriesfuser_spark.ops.behavior import attribute_conversions

        touches = spark.createDataFrame(
            [("u", i, i * 10) for i in range(1, 6)],
            "user_id string, touch_id long, touch_ts long",
        )
        convs = spark.createDataFrame(
            [("u", 100, 60)], "user_id string, conv_id long, conv_ts long"
        )
        rows = attribute_conversions(
            touches, convs, lookback_ms=1000, model="position_based",
            include_unattributed=False, cache=False,
        ).collect()
        credits = {r["touch_id"]: r["credit_ppm"] for r in rows}
        # 5 touches: first 400k, last 400k + remainder, middles 200000//3
        mid = 200_000 // 3
        assert credits[1] == 400_000
        assert credits[2] == credits[3] == mid
        assert credits[5] == 400_000 + 200_000 - mid * 3
        assert sum(credits.values()) == 1_000_000

    def test_small_n(self, spark):
        from timeseriesfuser_spark.ops.behavior import attribute_conversions

        touches = spark.createDataFrame(
            [("u", 1, 10), ("v", 1, 10), ("v", 2, 20)],
            "user_id string, touch_id long, touch_ts long",
        )
        convs = spark.createDataFrame(
            [("u", 9, 50), ("v", 9, 50)],
            "user_id string, conv_id long, conv_ts long",
        )
        rows = attribute_conversions(
            touches, convs, lookback_ms=1000, model="position_based",
            include_unattributed=False, cache=False,
        ).collect()
        got = {(r["user_id"], r["touch_id"]): r["credit_ppm"] for r in rows}
        assert got[("u", 1)] == 1_000_000
        assert got[("v", 1)] == got[("v", 2)] == 500_000


class TestWinsorizedStats:
    def test_python_reference(self, spark):
        from timeseriesfuser_spark.ops.timeseries import winsorized_stats

        rng = random.Random(13)
        vals = [round(rng.uniform(-50, 50), 2) for _ in range(97)] + [1e4, -1e4, 9e3]
        rows = [("k", v) for v in vals]
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = winsorized_stats(df, cache=False).collect()[0]

        cents = sorted(round(v * 100) for v in vals)
        n = len(cents)

        def q_xden(num, den):
            lo = num * (n - 1) // den
            fr = num * (n - 1) % den
            return cents[lo] * (den - fr) + cents[lo + 1] * fr if fr else cents[lo] * den

        p10 = q_xden(1, 10) * 10   # shared D = 100
        p90 = q_xden(9, 10) * 10
        s = sum(max(p10, min(p90, c * 100)) for c in cents)
        assert out["n"] == n
        assert out["p_lo_xD"] == p10 and out["p_hi_xD"] == p90
        assert out["winsorized_sum_xD"] == s
        # truncation toward zero (Spark DIV semantics), sign-aware
        q = abs(s) * 1000 // (n * 100)
        assert out["winsorized_mean_milli"] == (q if s >= 0 else -q)

    def test_outlier_clamped(self, spark):
        from timeseriesfuser_spark.ops.timeseries import winsorized_stats

        rows = [("k", float(i)) for i in range(1, 100)] + [("k", 1e9)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = winsorized_stats(df, cache=False).collect()[0]
        # the 1e9 whale is clamped to p90 — mean stays near 50.5
        # (mean_milli is in the quantized unit: milli-CENTS here)
        assert out["winsorized_mean_milli"] < 6_000_000

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.timeseries import winsorized_stats

        df = spark.createDataFrame([("k", 1.0)], "event_type string, value double")
        with pytest.raises(ValueError):
            winsorized_stats(df, lo=(9, 10), hi=(1, 10))
        with pytest.raises(ValueError):
            winsorized_stats(df, lo=(11, 10))


class TestImageAHash:
    def test_ahash_bits(self, spark):
        from timeseriesfuser_spark.ops.multimodal import image_ahash

        rows = [
            (1, [1.0] * 8 + [3.0] * 8),   # mean 2.0 -> high half set
            (2, [5.0] * 16),              # all equal -> no bit above mean
            (3, None),
        ]
        df = spark.createDataFrame(
            rows, "media_id long, features array<float>"
        )
        out = {r["id"]: (r["ahash"], r["n_bits"]) for r in image_ahash(df).collect()}
        assert out[1] == (0xFF00, 8)
        assert out[2] == (0, 0)
        assert out[3] == (None, None)

    def test_duplicate_content_same_hash(self, spark):
        from timeseriesfuser_spark.ops.multimodal import (
            extract_features,
            image_ahash,
            text_to_media,
        )

        docs = spark.createDataFrame(
            [(1, "same payload"), (2, "same payload"), (3, "different")],
            "doc_id long, text string",
        )
        h = image_ahash(extract_features(text_to_media(docs, "doc_id", "text")))
        got = {r["id"]: r["ahash"] for r in h.collect()}
        assert got[1] == got[2] != got[3]


class TestSequenceMatchStream:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Pending-anchor state must survive the query restart: anchors
        arrive in run 1, the closing/killing events in run 2; aggregated
        emissions == batch sequence_match matched rows."""
        from pyspark.sql import functions as F

        from timeseriesfuser_spark.ops.behavior import sequence_match
        from timeseriesfuser_spark.streaming import sequence_match_stream

        rows = [
            # u1: anchor then clean close (split across runs)
            ("u1", "A", 10), ("u1", "B", 110),
            # u2: anchor then blocker then B -> dead
            ("u2", "A", 10), ("u2", "C", 50), ("u2", "B", 120),
            # u3: anchor, B at same ts as C -> match (not strictly between)
            ("u3", "A", 20), ("u3", "B", 130), ("u3", "C", 130),
            # u4: anchor expires before its B (within=200)
            ("u4", "A", 5), ("u4", "B", 300),
            # u5: two anchors, one B closes both
            ("u5", "A", 30), ("u5", "A", 90), ("u5", "B", 150),
        ]
        schema = "user_id string, event_type string, ts long"
        batch_df = spark.createDataFrame(rows, schema)
        want = {
            r["user_id"]: (r["n_matches"], r["first_anchor_ts"])
            for r in sequence_match(
                batch_df, "A", "B", not_between="C", within_ms=200
            ).collect()
            if r["matched"] == 1
        }
        assert set(want) == {"u1", "u3", "u5"}
        assert want["u5"] == (2, 30)

        d = tmp_path / "seq"
        ckpt = str(tmp_path / "ckpt_seq")
        got = []

        def run():
            stream = spark.readStream.schema(schema).parquet(str(d))
            out = sequence_match_stream(
                stream, "A", "B", not_between="C", within_ms=200,
                keys=["user_id"], ts_col="ts",
            )

            def sink(bdf, bid):
                got.extend(bdf.collect())

            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert q.exception() is None

        first = [r for r in rows if r[2] < 100]
        second = [r for r in rows if r[2] >= 100]
        spark.createDataFrame(first, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        run()
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        run()

        agg = {}
        for r in got:
            n, fa = agg.get(r["user_id"], (0, None))
            agg[r["user_id"]] = (
                n + r["n_anchor_events"],
                r["anchor_ts"] if fa is None else min(fa, r["anchor_ts"]),
            )
        assert agg == want


class TestSortedNeighborhood:
    def test_brute_force_differential(self, spark):
        from timeseriesfuser_spark.ops.entity import sorted_neighborhood_pairs

        rng = random.Random(21)
        names = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(50)
        ]
        rows = [(i, nm) for i, nm in enumerate(names)]
        df = spark.createDataFrame(rows, "id long, name string")
        for w in (1, 3, 7):
            got = {
                (r["id_a"], r["id_b"], r["rank_a"], r["rank_b"])
                for r in sorted_neighborhood_pairs(df, window=w).collect()
            }
            ranked = sorted(rows, key=lambda r: (r[1], r[0]))
            want = {
                (ranked[i][0], ranked[j][0], i + 1, j + 1)
                for i in range(len(ranked))
                for j in range(i + 1, min(i + w + 1, len(ranked)))
            }
            assert got == want, w

    def test_edit_verify_and_nulls(self, spark):
        from timeseriesfuser_spark.ops.entity import sorted_neighborhood_pairs

        rows = [(1, "acme corp"), (2, "acme corpx"), (3, "zzz"), (4, None)]
        df = spark.createDataFrame(rows, "id long, name string")
        got = sorted_neighborhood_pairs(
            df, window=3, max_edits=1
        ).collect()
        assert [(r["id_a"], r["id_b"], r["edit_distance"]) for r in got] == [
            (1, 2, 1)
        ]

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.entity import sorted_neighborhood_pairs

        df = spark.createDataFrame([(1, "a")], "id long, name string")
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, window=0)


class TestCollocations:
    def test_lift_hand_check(self, spark):
        from timeseriesfuser_spark.ops.text import collocations_top

        # "new york" always adjacent; "the cat" adjacent but 'the' common
        docs = ["new york " * 6 + "the cat the dog the fish the bird the cow"]
        df = spark.createDataFrame([(1, docs[0])], "doc_id long, text string")
        out = {
            (r["token_a"], r["token_b"]): r
            for r in collocations_top(df, min_count=5, top_k=10).collect()
        }
        toks = docs[0].split()
        T = len(toks)
        c = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
        ny = out[("new", "york")]
        assert ny["n_pair"] == 6 and ny["n_a"] == 6 and ny["n_b"] == 6
        assert ny["lift_ppm"] == 6 * T * 1_000_000 // (6 * 6)
        # 'the X' pairs exist but each unique pair has count 1 < min_count
        assert ("the", "cat") not in out

    def test_null_and_short_docs(self, spark):
        from timeseriesfuser_spark.ops.text import collocations_top

        df = spark.createDataFrame(
            [(1, None), (2, "one"), (3, "")] + [(i, "a b") for i in range(4, 10)],
            "doc_id long, text string",
        )
        rows = collocations_top(df, min_count=5, top_k=5).collect()
        assert [(r["token_a"], r["token_b"], r["n_pair"]) for r in rows] == [
            ("a", "b", 6)
        ]


class TestHilbertKey:
    def _xy2d(self, x, y, b):
        d = 0
        s = 1 << (b - 1)
        while s:
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    def test_matches_reference_and_bijective(self, spark):
        from timeseriesfuser_spark.ops.scale import hilbert_key

        b, n = 4, 16
        df = spark.range(n * n).selectExpr(f"id % {n} AS x", f"id DIV {n} AS y")
        rows = df.select("x", "y", hilbert_key("x", "y", bits=b).alias("h")).collect()
        assert all(r["h"] == self._xy2d(r["x"], r["y"], b) for r in rows)
        assert sorted(r["h"] for r in rows) == list(range(n * n))

    def test_locality_beats_morton_jumps(self, spark):
        """Consecutive Hilbert positions are always grid-adjacent; Morton
        makes diagonal jumps. Verify the defining property on 8x8."""
        from timeseriesfuser_spark.ops.scale import hilbert_key

        b, n = 3, 8
        df = spark.range(n * n).selectExpr(f"id % {n} AS x", f"id DIV {n} AS y")
        rows = df.select("x", "y", hilbert_key("x", "y", bits=b).alias("h")).collect()
        pos = {r["h"]: (r["x"], r["y"]) for r in rows}
        for h in range(n * n - 1):
            (x1, y1), (x2, y2) = pos[h], pos[h + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, h

    def test_validation_and_masking(self, spark):
        from timeseriesfuser_spark.ops.scale import hilbert_key

        with pytest.raises(ValueError):
            hilbert_key("x", "y", bits=0)
        df = spark.createDataFrame([(17, 1)], "x long, y long")  # 17 & 15 = 1
        a = df.select(hilbert_key("x", "y", bits=4).alias("h")).collect()[0]["h"]
        assert a == self._xy2d(1, 1, 4)


class TestTableChecksum:
    def test_order_and_partitioning_independent(self, spark):
        from timeseriesfuser_spark.ops.scale import table_checksum

        rows = [(i, f"v{i % 7}", float(i)) for i in range(200)]
        a = spark.createDataFrame(rows, "id long, s string, v double")
        b = spark.createDataFrame(list(reversed(rows)), "id long, s string, v double").repartition(13)
        ca = table_checksum(a).collect()[0]
        cb = table_checksum(b).collect()[0]
        assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])

    def test_single_cell_change_detected(self, spark):
        from timeseriesfuser_spark.ops.scale import table_checksum

        rows = [(i, "x") for i in range(50)]
        a = spark.createDataFrame(rows, "id long, s string")
        rows2 = list(rows)
        rows2[17] = (17, "y")
        b = spark.createDataFrame(rows2, "id long, s string")
        assert (
            table_checksum(a).collect()[0]["checksum"]
            != table_checksum(b).collect()[0]["checksum"]
        )

    def test_null_vs_literal_tag_distinct(self, spark):
        from timeseriesfuser_spark.ops.scale import table_checksum

        a = spark.createDataFrame([(1, None)], "id long, s string")
        b = spark.createDataFrame([(1, "\x00")], "id long, s string")
        # NULL and the raw tag char hash identically by design (the tag IS
        # chr(0)); what must differ is NULL vs empty string
        c = spark.createDataFrame([(1, "")], "id long, s string")
        assert (
            table_checksum(a).collect()[0]["checksum"]
            != table_checksum(c).collect()[0]["checksum"]
        )

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.scale import table_checksum

        df = spark.createDataFrame([(1,)], "g long")
        with pytest.raises(ValueError):
            table_checksum(df, group_cols=["g"])


class TestFDViolations:
    def test_majority_and_violations(self, spark):
        from timeseriesfuser_spark.ops.expect import fd_violations

        rows = [
            ("s1", "en"), ("s1", "en"), ("s1", "fr"),
            ("s2", "de"),
            ("s3", "en"), ("s3", "fr"),      # tie -> 'en' (value asc)
            ("s4", None), ("s4", None), ("s4", "en"),
        ]
        df = spark.createDataFrame(rows, "source string, lang string")
        out = {
            r["source"]: (
                r["n_rows"], r["n_distinct"], r["majority_value"],
                r["n_violations"], r["violation_ppm"],
            )
            for r in fd_violations(df, ["source"], "lang").collect()
        }
        assert out["s1"] == (3, 2, "en", 1, 333_333)
        assert out["s2"] == (1, 1, "de", 0, 0)
        assert out["s3"] == (2, 2, "en", 1, 500_000)
        # NULL is a real value class and here the majority
        assert out["s4"] == (3, 2, "\x00", 1, 333_333)

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.expect import fd_violations

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError):
            fd_violations(df, [], "b")


class TestBurstFlags:
    def test_hysteresis_hand_check(self, spark):
        from timeseriesfuser_spark.ops.timeseries import burst_flags

        # counts per hour: 2(dead) 6(enter) 3(hold) 1(exit) 6(enter) 0-gap 2(dead->holds 0? no: after exit)...
        counts = [2, 6, 3, 1, 6, 2, 1, 7]
        rows = []
        eid = 0
        for h, c in enumerate(counts):
            for _ in range(c):
                rows.append(("k", h * 3_600_000 + 5, eid)); eid += 1
        df = spark.createDataFrame(rows, "event_type string, ts long, event_id long")
        out = sorted(
            burst_flags(df, "1h", hi=5, lo=1).collect(),
            key=lambda r: r["bar_start"],
        )
        assert [r["n_events"] for r in out] == counts
        assert [r["in_burst"] for r in out] == [0, 1, 1, 0, 1, 1, 0, 1]
        assert [r["entered"] for r in out] == [0, 1, 0, 0, 1, 0, 0, 1]
        assert [r["burst_id"] for r in out] == [None, 1, 1, None, 2, 2, None, 3]

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.timeseries import burst_flags

        df = spark.createDataFrame([("k", 1, 1)], "event_type string, ts long, event_id long")
        with pytest.raises(ValueError):
            burst_flags(df, hi=2, lo=2)


class TestInterarrival:
    def test_python_reference(self, spark):
        from timeseriesfuser_spark.ops.timeseries import interarrival_stats

        rng = random.Random(31)
        rows = [
            ("k", rng.randint(0, 10_000), i) for i in range(41)
        ] + [("solo", 5, 99)]  # single event -> no gaps -> no row
        df = spark.createDataFrame(rows, "event_type string, ts long, event_id long")
        out = {r["event_type"]: r for r in interarrival_stats(df, cache=False).collect()}
        assert "solo" not in out
        ts = sorted((t, q) for k, t, q in rows if k == "k")
        gaps = sorted(ts[i + 1][0] - ts[i][0] for i in range(len(ts) - 1))
        n = len(gaps)

        def q_xden(num, den):
            lo = num * (n - 1) // den
            fr = num * (n - 1) % den
            return gaps[lo] * den if fr == 0 else gaps[lo] * (den - fr) + gaps[lo + 1] * fr

        r = out["k"]
        assert r["n_gaps"] == n
        assert r["sum_gap_ms"] == sum(gaps) and r["max_gap_ms"] == max(gaps)
        assert r["p50_x2"] == q_xden(1, 2)
        assert r["p90_x10"] == q_xden(9, 10)


class TestBalancedSample:
    def test_rates_and_balance(self, spark):
        from timeseriesfuser_spark.ops.sampling import balanced_sample

        rows = (
            [(i, "big") for i in range(600)]
            + [(1000 + i, "mid") for i in range(200)]
            + [(2000 + i, "small") for i in range(100)]
            + [(9000, None), (None, "big")]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = balanced_sample(df, keep_only=False)
        rates = {
            r["source"]: r["rate_ppm"]
            for r in out.select("source", "rate_ppm").distinct().collect()
        }
        assert rates == {
            "big": 100 * 1_000_000 // 600,
            "mid": 500_000,
            "small": 1_000_000,
        }
        kept = out.filter("keep").groupBy("source").count().collect()
        by = {r["source"]: r["count"] for r in kept}
        # minority kept whole; majorities near 100 in expectation
        assert by["small"] == 100
        assert 60 <= by["big"] <= 140 and 60 <= by["mid"] <= 140
        # NULL stratum / NULL id rows excluded entirely
        assert out.count() == 900

    def test_nested_subset_property(self, spark):
        """The md5 rule is nested: the balanced sample is a subset of
        any higher-rate stratified sample of the same strata."""
        from timeseriesfuser_spark.ops.sampling import (
            balanced_sample,
            stratified_sample,
        )

        rows = [(i, "a") for i in range(300)] + [(500 + i, "b") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        bal = {r["doc_id"] for r in balanced_sample(df).collect()}
        full = {
            r["doc_id"]
            for r in stratified_sample(df, {"a": 0.5, "b": 1.0}).collect()
        }
        # rate('a') = 50/300 < 0.5 -> balanced 'a' rows ⊂ the 0.5 sample
        assert {d for d in bal if d < 500} <= {d for d in full if d < 500}


class TestSpearman:
    def test_scipy_free_reference(self, spark):
        from timeseriesfuser_spark.ops.timeseries import spearman_corr

        rng = random.Random(17)
        rows = []
        for d in range(40):
            rows.append(("A", 1000 + d, d * 86_400_000, float(rng.randint(0, 20))))
            rows.append(("B", 2000 + d, d * 86_400_000, float(rng.randint(0, 20))))
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long, value double"
        )
        out = spearman_corr(df, "A", "B", "1d").collect()[0]

        va = [round(v * 100) for k, _, _, v in rows if k == "A"]
        vb = [round(v * 100) for k, _, _, v in rows if k == "B"]

        def dranks(vals):
            order = sorted(vals)
            return [
                2 * (order.index(v) + 1) + order.count(v) - 1 for v in vals
            ]

        ra, rb = dranks(va), dranks(vb)
        n = len(ra)
        sx, sy = sum(ra), sum(rb)
        sxy = sum(a * b for a, b in zip(ra, rb))
        sxx = sum(a * a for a in ra)
        syy = sum(b * b for b in rb)
        import math

        want = round(
            (n * sxy - sx * sy)
            / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)),
            6,
        )
        assert out["n_pairs"] == n and out["rho"] == want

    def test_monotone_is_one_and_constant_is_null(self, spark):
        from timeseriesfuser_spark.ops.timeseries import spearman_corr

        rows = []
        for d in range(10):
            rows.append(("A", d, d * 86_400_000, float(d)))
            rows.append(("B", 100 + d, d * 86_400_000, float(d * d)))
            rows.append(("C", 200 + d, d * 86_400_000, 5.0))
        df = spark.createDataFrame(
            rows, "event_type string, event_id long, ts long, value double"
        )
        r = spearman_corr(df, "A", "B", "1d").collect()[0]
        assert abs(r["rho"] - 1.0) < 2e-6  # perfectly monotone (nonlinear!)
        r = spearman_corr(df, "A", "C", "1d").collect()[0]
        assert r["rho"] is None  # constant side -> undefined


class TestEmbeddingDrift:
    def test_identical_slices_cosine_one(self, spark):
        from timeseriesfuser_spark.ops.similarity import embedding_drift

        rng = random.Random(23)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        r = embedding_drift(df, df).collect()[0]
        assert r["n_a"] == r["n_b"] == 30 and r["dim"] == 8
        assert abs(r["cosine"] - 1.0) < 2e-6

    def test_opposite_slices_cosine_minus_one(self, spark):
        from timeseriesfuser_spark.ops.similarity import embedding_drift

        a = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0]), (2, [2.0, 4.0, 6.0])],
            "vec_id long, embedding array<float>",
        )
        b = spark.createDataFrame(
            [(9, [-1.0, -2.0, -3.0])], "vec_id long, embedding array<float>"
        )
        r = embedding_drift(a, b).collect()[0]
        assert r["cosine"] == -1.0 and (r["n_a"], r["n_b"]) == (2, 1)

    def test_empty_side_null(self, spark):
        from timeseriesfuser_spark.ops.similarity import embedding_drift

        a = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        b = spark.createDataFrame([], "vec_id long, embedding array<float>")
        r = embedding_drift(a, b).collect()[0]
        assert r["cosine"] is None and r["n_b"] == 0


class TestFunnelStepLags:
    def test_greedy_chain_lags(self, spark):
        from timeseriesfuser_spark.ops.behavior import funnel_step_lags

        rows = [
            # u1: A@0, B@10 (greedy, ignores B@50), C@25
            ("u1", "A", 0), ("u1", "B", 10), ("u1", "B", 50), ("u1", "C", 25),
            # u2: A@0, B@30, no C
            ("u2", "A", 0), ("u2", "B", 30),
            # u3: B before A -> never converts step 1
            ("u3", "B", 5), ("u3", "A", 9),
        ]
        df = spark.createDataFrame(rows, "user_id string, event_type string, ts long")
        out = {r["step_idx"]: r for r in funnel_step_lags(df, ["A", "B", "C"]).collect()}
        r1 = out[1]
        assert (r1["from_step"], r1["to_step"], r1["n_users"]) == ("A", "B", 2)
        lags1 = sorted([10, 30])
        assert r1["p50_x2"] == lags1[0] + lags1[1]
        assert r1["max_lag_ms"] == 30
        r2 = out[2]
        assert (r2["n_users"], r2["p50_x2"], r2["max_lag_ms"]) == (1, 30, 15)

    def test_validation(self, spark):
        from timeseriesfuser_spark.ops.behavior import funnel_step_lags

        df = spark.createDataFrame([("u", "A", 1)], "user_id string, event_type string, ts long")
        with pytest.raises(ValueError):
            funnel_step_lags(df, ["A"])


class TestCohortLTV:
    def test_triangle_hand_check(self, spark):
        from timeseriesfuser_spark.ops.behavior import cohort_ltv

        W = 7 * 86_400_000
        rows = [
            # u1 cohort week 0: orders in weeks 0, 0, 2
            (1, 0, 10.0), (1, 3 * 86_400_000, 5.0), (1, 2 * W, 20.0),
            # u2 cohort week 1: order in week 1 only (NULL amount -> 0)
            (2, W + 5, None),
        ]
        df = spark.createDataFrame(
            rows, "o_custkey long, __ms long, o_totalprice double"
        ).select(
            "o_custkey",
            F.timestamp_millis(F.col("__ms")).alias("o_orderdate"),
            "o_totalprice",
        )
        out = {
            (r["cohort_period"], r["periods_since"]): (
                r["n_orders"], r["revenue_cents"], r["cum_revenue_cents"]
            )
            for r in cohort_ltv(df).collect()
        }
        assert out[(0, 0)] == (2, 1500, 1500)
        assert out[(0, 2)] == (1, 2000, 3500)
        assert out[(1, 0)] == (1, 0, 0)
        assert (0, 1) not in out  # no orders that week -> no cell


class TestAssortativity:
    def test_star_is_disassortative(self, spark):
        from timeseriesfuser_spark.ops.graph import degree_assortativity

        # star: hub degree 5, leaves degree 1 -> rho = -1
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "id_a long, id_b long"
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_edges"] == 5 and r["rho"] == -1.0

    def test_regular_graph_null(self, spark):
        from timeseriesfuser_spark.ops.graph import degree_assortativity

        # cycle: every degree 2 -> zero variance -> NULL
        edges = spark.createDataFrame(
            [(i, (i + 1) % 6) for i in range(6)], "id_a long, id_b long"
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_edges"] == 6 and r["rho"] is None

    def test_python_reference(self, spark):
        from timeseriesfuser_spark.ops.graph import degree_assortativity
        import math

        rng = random.Random(29)
        edges = sorted({tuple(sorted(rng.sample(range(15), 2))) for _ in range(35)})
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        pairs = [(deg[a], deg[b]) for a, b in edges] + [
            (deg[b], deg[a]) for a, b in edges
        ]
        m = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
        want = round(
            (m * sxy - sx * sy)
            / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)),
            6,
        )
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        r = degree_assortativity(df).collect()[0]
        assert r["n_edges"] == len(edges) and r["rho"] == want


class TestBurstFlagsStream:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from timeseriesfuser_spark.ops.timeseries import burst_flags
        from timeseriesfuser_spark.streaming import burst_flags_stream

        counts = [2, 6, 3, 1, 6, 2, 1, 7]
        rows = []
        eid = 0
        for h, c in enumerate(counts):
            for j in range(c):
                rows.append(("k", h * 100 + j, eid)); eid += 1
        schema = "event_type string, ts long, event_id long"
        batch_df = spark.createDataFrame(rows, schema)
        want_all = {
            r["bar_start"]: (r["n_events"], r["in_burst"], r["entered"], r["burst_id"])
            for r in burst_flags(batch_df, "100l", hi=5, lo=1).collect()
        }
        last_bar = max(want_all)
        want = {k: v for k, v in want_all.items() if k < last_bar}

        d = tmp_path / "bf"
        ckpt = str(tmp_path / "ckpt_bf")
        got = []

        def run():
            stream = spark.readStream.schema(schema).parquet(str(d))
            out = burst_flags_stream(
                stream, 100, hi=5, lo=1, keys=["event_type"], ts_col="ts"
            )

            def sink(bdf, bid):
                got.extend(bdf.collect())

            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert q.exception() is None

        # split mid-bar: the open bar's count must carry across restarts
        first = [r for r in rows if r[1] < 450]
        second = [r for r in rows if r[1] >= 450]
        spark.createDataFrame(first, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        run()
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        run()
        agg = {
            r["bar_start"]: (r["n_events"], r["in_burst"], r["entered"], r["burst_id"])
            for r in got
        }
        assert agg == want
