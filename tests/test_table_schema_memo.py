"""The contract table reader memoizes INFERRED SCHEMAS (metadata only) keyed
on file identity: same results as fresh inference, re-inference on rewrite."""

import os
import shutil

from timeseriesfuser_spark.contract import _base

SF = "/root/testdata/sf0.001"


def test_memoized_read_matches_fresh_inference(spark):
    _base._SCHEMA_MEMO.clear()
    first = _base._t(spark, SF, "events")          # populates the memo
    again = _base._t(spark, SF, "events")          # served from the memo
    fresh = spark.read.parquet(f"{SF}/events.parquet")
    assert again.schema == fresh.schema
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, fresh.collect()))
    assert first.schema == fresh.schema
    # exactly one memo entry per table read
    assert sum("events.parquet" in k[0] for k in _base._SCHEMA_MEMO) == 1


def test_rewritten_file_reinfers(tmp_path, spark):
    # A rewritten file (new mtime/size) must get a fresh inference pass,
    # never a stale schema of different data.
    d = tmp_path / "sfX"
    d.mkdir()
    shutil.copy(f"{SF}/nation.parquet", d / "t.parquet")
    _base._SCHEMA_MEMO.clear()
    df1 = _base._t(spark, str(d), "t")
    assert len(_base._SCHEMA_MEMO) == 1
    shutil.copy(f"{SF}/events.parquet", d / "t.parquet")
    os.utime(d / "t.parquet")                      # force a new mtime_ns
    df2 = _base._t(spark, str(d), "t")
    assert len(_base._SCHEMA_MEMO) == 2            # new key, re-inferred
    assert df2.schema == spark.read.parquet(f"{SF}/events.parquet").schema
    assert df1.schema != df2.schema
