"""Edge semantics for the round-4 dedup/similarity additions:
ngram_novelty, dedup_verdicts, semantic_dedup_pairs, quantize_int8."""

import pytest
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops import dedup as D
from timeseriesfuser_spark.ops import similarity as S


def test_ngram_novelty_ownership_and_empty(spark):
    # doc 1 owns its shingle; doc 2 repeats doc 1 entirely (zero novel);
    # doc 3 has fewer than 3 tokens -> no shingles -> NULL novelty.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.ngram_novelty(df).collect()}
    assert out[1].n_shingles == 2 and out[1].n_novel == 2
    assert out[1].novelty == 1.0
    assert out[2].n_shingles == 1 and out[2].n_novel == 0
    assert out[2].novelty == 0.0
    assert out[3].n_shingles == 0 and out[3].novelty is None


def test_dedup_verdicts_reasons(spark):
    # 1 & 4: byte-identical -> 4 is exact_dup of 1.
    # 5: near-dup of 1 (high shingle overlap, different bytes).
    # 9: unique -> keep.
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (4, base),
            (5, base + " tail"),
            (9, "completely different content with many unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.dedup_verdicts(df, threshold=0.5).collect()}
    assert out[1].verdict == "keep" and out[1].keep and out[1].canonical_id == 1
    assert out[4].verdict == "exact_dup" and not out[4].keep
    assert out[4].canonical_id == 1
    assert out[5].verdict == "near_dup" and out[5].canonical_id == 1
    assert out[9].verdict == "keep" and out[9].canonical_id == 9


def test_quantize_int8_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in S.quantize_int8(df).collect()}
    r = out[1]
    # quantized = [1000, -500, 250, 0]; amax 1000 -> q8 = [127, -64, 32, 0]
    # (round(-63.5) HALF_UP = -64, round(31.75) = 32)
    assert r.amax_q == 1000 and r.n_dims == 4
    assert r.q8_csv == "127,-64,32,0"
    assert r.sum_q8 == 127 - 64 + 32
    assert r.sum_sq_q8 == 127**2 + 64**2 + 32**2
    assert r.n_saturated == 1
    z = out[2]
    assert z.amax_q == 0 and z.q8_csv == "0,0,0,0" and z.n_saturated == 0


def test_semantic_dedup_blocks_by_cluster(spark):
    # Two tight pairs near distinct centroids; cross-cluster similarity is
    # high for (3,4) vs (1,2)? No: clusters block the pairing, so only
    # in-cluster pairs can surface, whatever their cosine.
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.01]),
            (3, [0.0, 1.0]),
            (4, [0.01, 0.99]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = df.filter(F.col("vec_id").isin(1, 3))
    out = S.semantic_dedup_pairs(df, cents, threshold=0.9).collect()
    pairs = {(r.keep_id, r.drop_id) for r in out}
    assert pairs == {(1, 2), (3, 4)}
    for r in out:
        assert r.cosine >= 0.99
        assert r.keep_id < r.drop_id


def test_quantize_plan_no_shuffle(spark):
    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>").alias("embedding"),
    )
    plan = S.quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
