"""Unit tests for the dataset-mixing / packing pipeline ops:
token_rarity, stratified_sample, mixing_weights, token_offsets,
sequence_pack."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.packing import sequence_pack, token_offsets
from timeseriesfuser_spark.ops.sampling import mixing_weights, stratified_sample
from timeseriesfuser_spark.ops.similarity import assign_to_centroids
from timeseriesfuser_spark.ops.text import line_dedup, token_rarity


def test_token_rarity_counts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat the dog"),
            Row(doc_id=2, text="the zyzzyva"),
            Row(doc_id=3, text=""),
        ]
    )
    # corpus tf: the=3, cat=1, dog=1, zyzzyva=1
    out = {r["doc_id"]: r for r in token_rarity(df, rare_threshold=1).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["sum_corpus_tf"] == 3 + 1 + 3 + 1
    assert r1["n_rare"] == 2  # cat, dog
    assert r1["rare_frac"] == 0.5
    r2 = out[2]
    assert r2["sum_corpus_tf"] == 3 + 1 and r2["n_rare"] == 1
    r3 = out[3]
    assert r3["n_tokens"] == 0 and r3["mean_token_tf"] == 0.0


def test_token_rarity_external_vocab_missing_tokens_are_rare(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="alpha beta")])
    vocab = spark.createDataFrame([Row(token="alpha", term_freq=100)])
    r = token_rarity(df, freq=vocab, rare_threshold=2).collect()[0]
    assert r["sum_corpus_tf"] == 100
    assert r["n_rare"] == 1  # beta absent -> tf 0 -> rare


def test_stratified_sample_extremes_and_nesting(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i % 2 else "b") for i in range(200)]
    )
    assert stratified_sample(df, {"a": 1.0, "b": 1.0}).count() == 200
    assert stratified_sample(df, {"a": 0.0, "b": 0.0}).count() == 0
    lo = {r["doc_id"] for r in stratified_sample(df, {"a": 0.3, "b": 0.3}).collect()}
    hi = {r["doc_id"] for r in stratified_sample(df, {"a": 0.6, "b": 0.6}).collect()}
    assert lo <= hi  # nested samples: same hash, higher cutoff
    # deterministic across invocations
    again = {r["doc_id"] for r in stratified_sample(df, {"a": 0.3, "b": 0.3}).collect()}
    assert lo == again
    # roughly the requested rate (hash uniformity; wide tolerance)
    assert 0.15 < len(lo) / 200 < 0.45


def test_stratified_sample_default_rate_drops_unlisted(spark):
    df = spark.createDataFrame([Row(doc_id=1, source="x"), Row(doc_id=2, source="y")])
    out = stratified_sample(df, {"x": 1.0})
    assert [r["source"] for r in out.collect()] == ["x"]


def test_mixing_weights_two_sources(spark):
    # a: 4 tokens share 1; b: 12 tokens share 1 -> K=2,
    # capacity a = 4*2/1 = 8, b = 24 -> tstar = 8
    # rate a = 1*8/(2*4) = 1.0 (binding), b = 8/24 = 1/3
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="one two three four"),
            Row(doc_id=2, source="b", text=" ".join(["tok"] * 12)),
        ]
    )
    out = {r["source"]: r for r in mixing_weights(df, {"a": 1, "b": 1}).collect()}
    assert out["a"]["total_tokens"] == 4 and out["b"]["total_tokens"] == 12
    assert out["a"]["sample_rate"] == 1.0
    assert out["b"]["sample_rate"] == pytest.approx(1 / 3)
    assert out["a"]["target_weight"] == 0.5
    assert out["b"]["expected_tokens"] == pytest.approx(4.0)


def test_mixing_weights_zero_share(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="one two"),
            Row(doc_id=2, source="junk", text="x " * 1000),
        ]
    )
    out = {r["source"]: r for r in mixing_weights(df, {"a": 1}).collect()}
    # junk has share 0: rate 0, and it must not bound tstar
    assert out["junk"]["sample_rate"] == 0.0
    assert out["a"]["sample_rate"] == 1.0


def test_token_offsets_matches_serial_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [Row(doc_id=i, n=rng.randrange(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows)
    out = (
        token_offsets(df, count_col="n", num_buckets=7)
        .orderBy("doc_id")
        .collect()
    )
    run = 0
    for r, src in zip(out, rows):
        assert r["start_offset"] == run, r
        run += src.n
        assert r["end_offset"] == run


def test_sequence_pack_spans(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, n=5),
            Row(doc_id=2, n=10),   # crosses the 8-token boundary
            Row(doc_id=3, n=0),    # empty doc
            Row(doc_id=4, n=8),    # offsets 15..23: tail of bin 1 + into bin 2
        ]
    )
    out = {
        r["doc_id"]: r
        for r in sequence_pack(df, budget=8, count_col="n", num_buckets=2).collect()
    }
    assert (out[1]["bin_first"], out[1]["bin_last"], out[1]["n_bins"]) == (0, 0, 1)
    assert (out[2]["bin_first"], out[2]["bin_last"], out[2]["n_bins"]) == (0, 1, 2)
    assert out[2]["offset_in_bin"] == 5
    assert (out[3]["n_bins"], out[3]["bin_first"]) == (0, 1)
    assert (out[4]["bin_first"], out[4]["bin_last"], out[4]["n_bins"]) == (1, 2, 2)


def test_line_dedup_strips_boilerplate(spark):
    footer = "all rights reserved"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique one\n{footer}\nunique two"),
            Row(doc_id=2, text=f"other text\n{footer}"),
            Row(doc_id=3, text=f"{footer}"),
            Row(doc_id=4, text="nothing shared here"),
        ]
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_count=3).collect()}
    assert out[1]["text_dedup"] == "unique one\nunique two"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["text_dedup"] == "other text"
    assert out[3]["text_dedup"] == ""  # doc entirely boilerplate
    assert out[4]["text_dedup"] == "nothing shared here"


def test_line_dedup_threshold_counts_distinct_docs(spark):
    # A line repeated 5x inside ONE doc has doc frequency 1 — not dropped.
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="\n".join(["echo"] * 5)),
            Row(doc_id=2, text="solo"),
        ]
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_count=2).collect()}
    assert out[1]["n_kept"] == 5


def test_assign_to_centroids_exact_and_tiebreak(spark):
    cents = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.0, 0.0]), Row(vec_id=1, embedding=[2.0, 0.0])]
    )
    vecs = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[0.1, 0.0]),   # -> 0
            Row(vec_id=11, embedding=[1.9, 0.1]),   # -> 1
            Row(vec_id=12, embedding=[1.0, 0.0]),   # equidistant -> lowest id 0
        ]
    )
    out = {r["id"]: r for r in assign_to_centroids(vecs, cents).collect()}
    assert out[10]["cluster_id"] == 0 and out[10]["d2"] == 100 * 100
    assert out[11]["cluster_id"] == 1
    assert out[12]["cluster_id"] == 0 and out[12]["d2"] == 1000 * 1000


def test_sequence_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([Row(doc_id=1, n=1)])
    with pytest.raises(ValueError):
        sequence_pack(df, budget=0, count_col="n")


def test_sequence_pack_no_global_order_window(spark):
    """The packing plan must not contain a single-partition global-order
    window (the unscalable spelling)."""
    df = spark.createDataFrame([Row(doc_id=i, n=i % 5) for i in range(100)])
    plan = (
        sequence_pack(df, budget=8, count_col="n", num_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_chunk_documents_windows_and_overlap(spark):
    from timeseriesfuser_spark.ops.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6,9 → windows of 4,4,4,1 tokens
    got = sorted((r["chunk_start"], r["n_tokens"], r["chunk_text"]) for r in by_doc[1])
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (3, 4, "t3 t4 t5 t6"),
        (6, 4, "t6 t7 t8 t9"),
        (9, 1, "t9"),
    ]
    assert [(r["chunk_start"], r["chunk_text"]) for r in by_doc[2]] == [(0, "solo")]
    assert 3 not in by_doc  # token-less docs emit nothing
