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
