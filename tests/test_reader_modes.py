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
