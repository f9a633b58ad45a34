"""Round-9 session additions: grouped Bloom filters."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.sketches import (
    bloom_bits,
    bloom_merge,
    bloom_prefilter,
)

_M, _K = 4096, 3


def _keys(spark):
    # group 'a' owns keys 0..4, 'b' owns 5..9, NULL group owns 10..12
    rows = (
        [Row(grp="a", k=i) for i in range(5)]
        + [Row(grp="b", k=i) for i in range(5, 10)]
        + [Row(grp=None, k=i) for i in range(10, 13)]
    )
    return spark.createDataFrame(rows, "grp string, k long")


def test_grouped_union_equals_ungrouped_bits(spark):
    """The hash covers only the key, so dropping the group column from
    the grouped bit relation and deduping reproduces the ungrouped
    relation over the same input exactly."""
    keys = _keys(spark)
    grouped = bloom_bits(keys, "k", m_bits=_M, k=_K, group_cols=["grp"])
    ungrouped = bloom_bits(keys, "k", m_bits=_M, k=_K)
    a = {r["bit"] for r in grouped.select("bit").distinct().collect()}
    b = {r["bit"] for r in ungrouped.collect()}
    assert a == b and len(b) > 0


def test_grouped_prefilter_one_sided_and_isolated(spark):
    """Every true (group, key) member passes its own group's filter;
    membership in ANOTHER group's key set does not leak through (with
    deterministic hashes and m=4096 the cross-group probes are not
    false positives, asserted exactly)."""
    keys = _keys(spark)
    bits = bloom_bits(keys, "k", m_bits=_M, k=_K, group_cols=["grp"])
    fact_rows = (
        # true members, incl. the NULL group
        [Row(grp="a", k=0), Row(grp="b", k=7), Row(grp=None, k=11)]
        # cross-group probes: key exists, but in the OTHER group
        + [Row(grp="a", k=7), Row(grp="b", k=0), Row(grp=None, k=0),
           Row(grp="a", k=11)]
        # a key in no group at all; a NULL key (never passes)
        + [Row(grp="a", k=999), Row(grp="a", k=None)]
    )
    fact = spark.createDataFrame(fact_rows, "grp string, k long")
    got = {(r["grp"], r["k"]) for r in
           bloom_prefilter(fact, bits, "k", m_bits=_M, k=_K,
                           group_cols=["grp"]).collect()}
    assert {("a", 0), ("b", 7), (None, 11)} <= got      # one-sided: all true
    assert got == {("a", 0), ("b", 7), (None, 11)}      # no leaks, no fp


def test_bloom_merge_equals_whole(spark):
    """Shard-wise bits merged by union == bits over the concatenated
    input, grouped and ungrouped (bit-OR is the merge)."""
    keys = _keys(spark)
    s1 = keys.filter(F.col("k") < 6)
    s2 = keys.filter((F.col("k") >= 6) | F.col("k").isNull())
    for g in ([], ["grp"]):
        whole = bloom_bits(keys, "k", m_bits=_M, k=_K, group_cols=g)
        merged = bloom_merge(
            bloom_bits(s1, "k", m_bits=_M, k=_K, group_cols=g),
            bloom_bits(s2, "k", m_bits=_M, k=_K, group_cols=g),
        )
        cols = g + ["bit"]
        a = {tuple(r[c] for c in cols) for r in whole.collect()}
        b = {tuple(r[c] for c in cols) for r in merged.collect()}
        assert a == b and len(a) > 0


def test_bloom_merge_empty_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        bloom_merge()


def test_grouped_prefilter_plan_broadcast_semi(spark):
    """The grouped probe stays k BROADCAST left-semi joins — no shuffle
    of the fact side, no cartesian."""
    keys = _keys(spark)
    bits = bloom_bits(keys, "k", m_bits=_M, k=_K, group_cols=["grp"])
    fact = spark.createDataFrame([Row(grp="a", k=1)], "grp string, k long")
    plan = bloom_prefilter(
        fact, bits, "k", m_bits=_M, k=_K, group_cols=["grp"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= _K
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
