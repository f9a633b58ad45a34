"""Round-12 additions: IVF-PQ asymmetric-distance search + recall audit."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark import contract
from timeseriesfuser_spark.ops import similarity as S

SF = "/root/testdata/sf0.001"


def formatted_plan(df):
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _brute_force_adc(vecs, queries, k, n_centroids, nprobe, m, pq_k):
    """Independent Python reimplementation of IVF-ADC on quantized ints."""
    import math

    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    dim = len(next(iter(q.values())))
    dsub = dim // m
    ids = sorted(q)
    cents = {c: q[c] for c in ids[:n_centroids]}
    seeds = ids[:pq_k]

    def cos(a, b):
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(na) * math.sqrt(nb)
        )

    def route(v, keep):
        ranked = sorted(cents, key=lambda c: (-cos(v, cents[c]), c))
        return ranked[:keep]

    def sub(v, j):
        return v[j * dsub : (j + 1) * dsub]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    codes = {}
    lists = {}
    for i in ids:
        lists[i] = route(q[i], 1)[0]
        codes[i] = [
            min(
                range(len(seeds)),
                key=lambda c: (d2(sub(q[i], j), sub(q[seeds[c]], j)), c),
            )
            for j in range(m)
        ]
    out = {}
    for qi in queries:
        probed = set(route(q[qi], nprobe))
        cand = []
        for i in ids:
            if i == qi or lists[i] not in probed:
                continue
            adc = sum(
                d2(sub(q[qi], j), sub(q[seeds[codes[i][j]]], j))
                for j in range(m)
            )
            cand.append((adc, i))
        cand.sort()
        out[qi] = [(i, adc, r + 1) for r, (adc, i) in enumerate(cand[:k])]
    return out


def test_ivf_pq_matches_python_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_d2"], r["rank"])
        for r in S.ivf_pq_topk(
            emb, queries, k=4, n_centroids=8, nprobe=3, m=4, pq_k=8
        ).collect()
    }
    want = _brute_force_adc(
        vecs, [0, 1, 2], k=4, n_centroids=8, nprobe=3, m=4, pq_k=8
    )
    expect = {
        (qi, i): (adc, r) for qi, rows in want.items() for i, adc, r in rows
    }
    assert got == expect


def test_ivf_pq_validates_args(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="positive"):
        S.ivf_pq_topk(emb, emb.limit(1), k=0)
    with pytest.raises(ValueError, match="not divisible"):
        S.ivf_pq_topk(emb, emb.limit(1), m=7)


def test_ivf_pq_empty_inputs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    none = emb.filter(F.lit(False))
    assert S.ivf_pq_topk(none, none).count() == 0
    # empty query set over a non-empty corpus: schema intact, zero rows
    out = S.ivf_pq_topk(emb, none)
    assert out.columns == ["query_id", "neighbor_id", "adc_d2", "rank"]
    assert out.count() == 0


def test_ivf_pq_plan_gate(spark):
    """The 100 TB posture: every join on the corpus path is broadcast
    (codebook, probe map, ADC tables), never a data-keyed shuffle join;
    no CartesianProduct; the final top-k is rank-limit pushed
    (WindowGroupLimit)."""
    plan = formatted_plan(contract.QUERIES["ivf_pq_search"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_recall_bounds(spark):
    rows = contract.QUERIES["pq_recall"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_exact"] == 5
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // 5
