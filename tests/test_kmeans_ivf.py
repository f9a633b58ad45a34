"""Trained IVF: deterministic k-means fit + recall against brute force."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_deterministic(spark, emb):
    a = kmeans_fit(emb, k=4, iters=2)
    b = kmeans_fit(emb, k=4, iters=2)
    assert a == b
    assert len(a) == 4 and len(a[0]) == 64


def recall(got_df, want_df):
    got = {(r["query_id"], r["neighbor_id"]) for r in got_df.collect()}
    want = {(r["query_id"], r["neighbor_id"]) for r in want_df.collect()}
    return len(got & want) / len(want)


def test_trained_ivf_recall_properties(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    cents = kmeans_fit(emb, k=8, iters=4)
    partial = ivf_cosine_topk(emb, queries, k=5, nprobe=2, centroids=cents)
    # partial probing trades recall for ~nprobe/k of the work
    assert recall(partial, exact) > 0.4
    # probing ALL lists degenerates to exact search: recall must be 1.0
    full = ivf_cosine_topk(emb, queries, k=5, nprobe=8, centroids=cents)
    assert recall(full, exact) == 1.0


def test_assign_nearest_tiebreak_lowest_index(spark):
    from timeseriesfuser_spark.ops.similarity import _assign_nearest, _sq_norm

    # two identical centroids: ties must resolve to the lower index
    q = spark.createDataFrame(
        [(1, [3, 4]), (2, [4, 3])], "id long, v array<long>"
    ).withColumn("n", _sq_norm(F.col("v")))
    got = {r["id"]: r["c"] for r in
           _assign_nearest(q, [[3.0, 4.0], [3.0, 4.0], [4.0, 3.0]]).collect()}
    assert got[1] == 0  # exact match exists twice -> index 0 wins
    assert got[2] == 2


def test_kmeans_larger_k_dim(spark):
    # k x dim well past where literal-centroid codegen would blow up:
    # the broadcast-join assignment must stay linear in plan size.
    vecs = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(2000))
                       - 1000).cast("float") / 1000.0,
        ).alias("embedding"),
    )
    cents = kmeans_fit(vecs, k=32, iters=2)
    assert len(cents) == 32 and len(cents[0]) == 64
    out = ivf_cosine_topk(
        vecs, vecs.limit(5), k=3, nprobe=4, centroids=cents
    )
    assert out.count() == 15


def test_srp_neardup_planted(spark):
    import math

    from timeseriesfuser_spark.ops.similarity import (
        srp_neardup_pairs,
        srp_signatures,
    )

    base = [math.sin(i * 0.7) for i in range(16)]
    near = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    far = [math.cos(i * 1.3) for i in range(16)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, [-x for x in base])],
        "vec_id long, embedding array<float>",
    )
    got = srp_neardup_pairs(emb, threshold=0.9, planes=16, max_hamming=2)
    rows = got.collect()
    # only the planted near-pair survives; the negated vector (cos = -1)
    # and the unrelated one are excluded
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["cosine"] > 0.999
    assert rows[0]["hamming"] == 0  # identical sign pattern

    # signatures deterministic across invocations (md5-derived planes)
    s1 = {r["id"]: r["sh"] for r in srp_signatures(emb).collect()}
    s2 = {r["id"]: r["sh"] for r in srp_signatures(emb).collect()}
    assert s1 == s2
    assert s1[1] == s1[2]  # near-dup -> same 16-bit signature


def test_rp_project_matches_manual_dot(spark):
    from timeseriesfuser_spark.ops.similarity import rp_project, srp_plane_component
    import pyspark.sql.functions as F

    vecs = spark.createDataFrame(
        [(1, [0.5, -0.25, 1.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["id"]: r["proj"] for r in rp_project(vecs, out_dim=4).collect()}
    # plane components recomputed driver-side via the same Column expr
    comps = spark.range(1).select(
        *[
            srp_plane_component(F.lit(p), F.lit(i)).alias(f"c_{p}_{i}")
            for p in range(4)
            for i in range(3)
        ]
    ).first()
    q1 = [500, -250, 1000]
    want1 = [sum(q1[i] * comps[f"c_{p}_{i}"] for i in range(3)) for p in range(4)]
    assert out[1] == want1
    assert out[2] == [0, 0, 0, 0]
    assert all(len(v) == 4 for v in out.values())
