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
