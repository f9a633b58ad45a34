"""pq_train_codebooks (VERDICT r7 #7): deterministic integer Lloyd
training must beat the lowest-id seed stub and stay oracle-exact."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    yield df
    df.unpersist()


class TestPqTrainCodebooks:
    def test_deterministic(self, emb):
        a = S.pq_train_codebooks(emb, m=4, k=8, iters=2)
        b = S.pq_train_codebooks(emb, m=4, k=8, iters=2)
        assert a == b

    def test_shapes_and_int_types(self, emb):
        cbs = S.pq_train_codebooks(emb, m=4, k=8, iters=1)
        assert len(cbs) == 4
        assert all(len(book) == 8 for book in cbs)
        dsub = len(cbs[0][0])
        assert all(
            len(c) == dsub and all(isinstance(x, int) for x in c)
            for book in cbs for c in book
        )

    def test_iters_zero_equals_seed_stub(self, emb):
        cbs = S.pq_train_codebooks(emb, m=4, k=8, iters=0)
        stub = S.pq_codes(emb, m=4, k=8).orderBy("vec_id").collect()
        trained = (
            S.pq_codes(emb, m=4, k=8, codebooks=cbs).orderBy("vec_id").collect()
        )
        assert [tuple(r) for r in stub] == [tuple(r) for r in trained]

    def test_training_reduces_quantization_error(self, emb):
        def total_err(cbs):
            return (
                S.pq_codes(emb, m=4, k=16, codebooks=cbs)
                .agg(F.sum("sq_err"))
                .first()[0]
            )

        seed_err = total_err(S.pq_train_codebooks(emb, m=4, k=16, iters=0))
        trained_err = total_err(S.pq_train_codebooks(emb, m=4, k=16, iters=2))
        # Lloyd iterations monotonically reduce within-cluster SSE up to
        # the integer floor of the centroid update
        assert trained_err < seed_err

    def test_k_clamped_to_row_count(self, spark):
        df = spark.createDataFrame(
            [(i, [float(i + j) for j in range(8)]) for i in range(3)],
            ["vec_id", "embedding"],
        )
        cbs = S.pq_train_codebooks(df, m=2, k=16, iters=1)
        assert all(len(book) == 3 for book in cbs)

    def test_empty_input_raises(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="no vectors"):
            S.pq_train_codebooks(df, m=2, k=4)

    def test_bad_dim_raises(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
        )
        with pytest.raises(ValueError, match="not divisible"):
            S.pq_train_codebooks(df, m=2, k=2)

    def test_ivf_pq_trained_recall_not_worse(self, emb):
        # 50 queries: at 10 the +-few-hit sampling noise can mask the
        # trained codebooks' advantage (measured 35 -> 41-44 hits here)
        queries = emb.filter(F.col("vec_id") < 50)
        exact = S.cosine_topk(emb, queries, k=5).select(
            "query_id", "neighbor_id"
        )
        n = exact.count()

        def hits(cbs):
            ap = S.ivf_pq_topk(
                emb, queries, k=5, n_centroids=16, nprobe=4, m=4, pq_k=16,
                codebooks=cbs,
            ).select("query_id", "neighbor_id")
            return exact.join(ap, ["query_id", "neighbor_id"]).count()

        stub_hits = hits(None)
        trained_hits = hits(S.pq_train_codebooks(emb, m=4, k=16, iters=2))
        assert trained_hits >= stub_hits
        assert n > 0
