"""Driver-style oracle parity: run every contract query on Spark AND its
DuckDB oracle SQL on the same parquet tables, compare row count, column
names, and values (order-insensitive, exact) — a local replica of the
driver's CORRECTNESS gate."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_parity(sdf: pd.DataFrame, ddf: pd.DataFrame, name: str):
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} != {len(ddf)}"
    s, d = canon(sdf), canon(ddf)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                ok = b is None or (isinstance(b, float) and math.isnan(b))
            elif isinstance(a, float):
                ok = a == b  # exact: the contract promises bit-identity
            else:
                ok = a == b
            assert ok, f"{name}: col {c} row {i}: spark={a!r} duckdb={b!r}"
            # Driver's value-hash is type-sensitive: 99111 != 99111.0 there.
            # Mirror it so int-vs-float drift (DuckDB HUGEINT -> float64)
            # fails locally too, not just in CORRECTNESS_r{N}.
            if a is not None and b is not None and not (
                isinstance(a, float) and math.isnan(a)
            ):
                assert type(a) is type(b), (
                    f"{name}: col {c} row {i}: dtype drift "
                    f"spark={type(a).__name__}({a!r}) "
                    f"duckdb={type(b).__name__}({b!r})"
                )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    missing = [k for k in QUERIES if k not in ORACLES]
    # Non-SQL-expressible ops may omit oracles; keep the list explicit.
    # (Currently every registered query has one — multimodal_features
    # gained a sha256-replicating oracle in round 3.)
    assert missing == [], f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check, like the driver's
        return
    ddf = ddb.sql(ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result — weak test, tune parameters"
    assert_parity(sdf, ddf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "__timestamp" in df.columns
