"""Band-batched LSH staging (VERDICT r13 #2): results identical to the
single-pass plan while each batch's band self-join touches only its own
bands. The 100 TB property it buys — peak shuffle disk ∝ 1/B — is
measured in tools/oom_cell.py (SCALE.md); here we pin EXACTNESS."""

import pytest
from pyspark.sql import functions as F


def _corpus(spark):
    # disjoint-word docs + planted twins (identical → share ALL bands,
    # must emit exactly once, at band 0 in batch 0) + a near-pair whose
    # first shared band can land anywhere in [0, 8)
    base = spark.range(3_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), (F.col("id") * 9 + j).cast("string"))
                for j in range(6)
            ],
        ).alias("text"),
    )
    extra = spark.createDataFrame(
        [
            (1_000_001, "p q r s t u"),
            (1_000_002, "p q r s t u"),
            (1_000_003, "p q r s t zz"),  # jaccard 5/7 with the twins
        ],
        "doc_id long, text string",
    )
    return base.unionByName(extra)


@pytest.mark.parametrize("bb", [2, 3, 8])
def test_band_batches_identical_pairs(spark, bb):
    from timeseriesfuser_spark.ops.dedup import minhash_lsh_pairs

    docs = _corpus(spark)
    single = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            docs, n=1, threshold=0.5, cache=False
        ).collect()
    }
    assert (1_000_001, 1_000_002, 1.0) in single
    batched = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            docs, n=1, threshold=0.5, cache=False, band_batches=bb
        ).collect()
    }
    assert batched == single


def test_band_batches_candidates_no_dupes(spark):
    """verify=False surface: each candidate pair appears exactly once
    across batches (the global first-shared-band rule holds through the
    batching)."""
    from timeseriesfuser_spark.ops.dedup import minhash_lsh_pairs

    docs = _corpus(spark)
    cand = minhash_lsh_pairs(
        docs, n=1, threshold=0.5, cache=False, verify=False, band_batches=4
    )
    rows = [(r["id_a"], r["id_b"]) for r in cand.collect()]
    assert len(rows) == len(set(rows))
    single = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, n=1, threshold=0.5, cache=False, verify=False
        ).collect()
    ]
    assert set(rows) == set(single) and len(single) == len(set(single))


def test_band_batches_validation(spark):
    from timeseriesfuser_spark.ops.dedup import minhash_lsh_pairs

    docs = _corpus(spark).limit(10)
    with pytest.raises(ValueError, match="band_batches"):
        minhash_lsh_pairs(docs, n=1, band_batches=9)  # > bands=8
    # < 1 is a caller typo, not a silent single-pass (ADVICE r14)
    with pytest.raises(ValueError, match="must be >= 1"):
        minhash_lsh_pairs(docs, n=1, band_batches=0)
    with pytest.raises(ValueError, match="must be >= 1"):
        minhash_lsh_pairs(docs, n=1, band_batches=-4)
    # B=1 / None are the lazy single-pass plan (no eager jobs)
    lazy = minhash_lsh_pairs(docs, n=1, cache=False, band_batches=1)
    assert lazy.columns == ["id_a", "id_b", "jaccard"]
