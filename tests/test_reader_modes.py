"""CSV reader error modes: PERMISSIVE null-through is the parity default
(the reference's cast semantics null unparseable cells — its goldens
depend on it); FAILFAST is the opt-in strict mode."""

import pytest

from timeseriesfuser_spark.config import SourceConfig
from timeseriesfuser_spark.sources.readers import build_source_df


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("Timestamp,Price\n1700000000000,1.5\n1700000000001,oops\n")
    return str(p)


def test_permissive_default_nulls_malformed(spark, bad_csv):
    src = SourceConfig(name="bad", path=bad_csv, fmt="csv", schema=[int, float])
    rows = build_source_df(spark, src, 0).orderBy("__timestamp").collect()
    assert len(rows) == 2
    assert rows[0]["Price"] == 1.5
    assert rows[1]["Price"] is None  # unparseable cell nulled (ref parity)


def test_failfast_opt_in(spark, bad_csv):
    src = SourceConfig(
        name="bad",
        path=bad_csv,
        fmt="csv",
        schema=[int, float],
        csv_options={"mode": "FAILFAST"},
    )
    df = build_source_df(spark, src, 0)
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_jsonl_source_reads_and_normalizes(spark, tmp_path):
    """JSONL sources (plain + gzip in separate dirs): declared schema,
    epoch-ms ts axis, fuse-ready."""
    import gzip
    import json as _json

    from timeseriesfuser_spark.sources.readers import TS_COL, build_source_df

    d1 = tmp_path / "plain"; d1.mkdir()
    rows = [{"ts": 1_700_000_000_000 + i * 1000, "price": float(i)} for i in range(5)]
    (d1 / "part-1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))

    d2 = tmp_path / "gz"; d2.mkdir()
    rows2 = [{"ts": 1_700_000_000_500 + i * 1000, "price": 100.0 + i} for i in range(5)]
    with gzip.open(d2 / "part-1.jsonl.gz", "wt") as f:
        f.write("\n".join(_json.dumps(r) for r in rows2))

    for d, want_first in [(d1, 0.0), (d2, 100.0)]:
        src = SourceConfig(
            name="j", path=str(d), fmt="json",
            schema={"ts": int, "price": float}, ts_col="ts",
        )
        df = build_source_df(spark, src, 0)
        got = df.orderBy(TS_COL).collect()
        assert len(got) == 5
        assert got[0]["price"] == want_first
        assert isinstance(got[0][TS_COL], int)


def test_jsonl_declared_schema_nulls_malformed(spark, tmp_path):
    from timeseriesfuser_spark.sources.readers import build_source_df

    d = tmp_path / "bad"; d.mkdir()
    (d / "x.jsonl").write_text(
        '{"ts": 1700000000000, "price": 1.5}\n'
        '{"ts": 1700000001000, "price": "not-a-number"}\n'
    )
    src = SourceConfig(
        name="j", path=str(d), fmt="json",
        schema={"ts": int, "price": float}, ts_col="ts",
    )
    vals = [r["price"] for r in build_source_df(spark, src, 0).orderBy("__timestamp").collect()]
    assert vals == [1.5, None]
