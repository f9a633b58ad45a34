"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``timeseriesfuser_spark.contract`` so each
query sits next to its oracle and its scale notes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Defensive: make the package importable regardless of the caller's cwd.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseriesfuser_spark import contract  # noqa: E402

# The driver checks a fixed-size prefix of the registry each round, so we
# rotate: every not-yet-driver-verified query goes FIRST; already-green ones
# (still guarded by tests/test_entry_oracle.py) follow, ordered so the
# STALEST certification is re-checked soonest. The verified set is read
# dynamically from the CORRECTNESS files committed in the repo root — a
# name counts as verified only if rows+schema+hash all matched — and each
# name carries the round of its NEWEST green row; with no fresh names, a
# 50-query driver round recertifies the 50 longest-unchecked queries, so
# the whole registry re-greens on a rolling cadence instead of the same
# prefix forever.


def _driver_verified() -> dict[str, int]:
    """{name: newest round with a green row} across CORRECTNESS_r*.json."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                green[name] = max(green.get(name, 0), rnd)
    return green


def _ordered(names: list[str]) -> list[str]:
    """Not-yet-driver-verified queries first; then driver-green ones,
    oldest newest-green-round first (registry order breaks ties)."""
    verified = _driver_verified()
    fresh = [n for n in names if n not in verified]
    pos = {n: i for i, n in enumerate(names)}
    seen = sorted(
        (n for n in names if n in verified),
        key=lambda n: (verified[n], pos[n]),
    )
    return fresh + seen


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: contract.QUERIES[n] for n in _ordered(list(contract.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column names)."""
    return {n: contract.ORACLES[n] for n in _ordered(list(contract.QUERIES)) if n in contract.ORACLES}
