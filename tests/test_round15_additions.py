"""Round-15 session additions: log-free integer BM25 ranked retrieval
and the exact prefix-filtered set-similarity join (AllPairs/PPJoin)."""

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
