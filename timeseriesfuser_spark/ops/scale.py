"""Scale utilities: skew salting and bucketed storage for co-located joins.

These are the knobs a 100 TB deployment turns when AQE's automatic skew
handling isn't enough (a single hot key inside one logical partition) or
when the same join runs repeatedly (pre-bucketed tables eliminate the
shuffle entirely).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted(df: DataFrame, salts: int, *, deterministic_by: Optional[str] = None) -> DataFrame:
    """Add a salt column in [0, salts) to break up a hot key.

    ``deterministic_by``: derive the salt from an existing (high-cardinality)
    column instead of rand() — reproducible runs, same spreading effect.
    """
    if deterministic_by is not None:
        salt = F.pmod(F.hash(F.col(deterministic_by)), F.lit(salts))
    else:
        salt = F.floor(F.rand() * salts).cast("int")
    return df.withColumn(SALT_COL, salt.cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salts: int = 8,
    how: str = "inner",
    deterministic_by: Optional[str] = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    once per salt value, join on (keys + salt).

    A key holding p% of the big side spreads over ``salts`` tasks instead
    of one. Cost: the small side is duplicated ``salts`` times — use only
    when the small side is genuinely small (it usually broadcasts anyway;
    this helper targets the case where it is too big to broadcast but far
    smaller than the big side).
    """
    on = list(on)
    b = salted(big, salts, deterministic_by=deterministic_by)
    s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = b.join(s, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    *,
    sort_cols: Optional[Sequence[str]] = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) table so future joins and
    aggregations on ``bucket_cols`` run shuffle-free (Spark reads each
    bucket as a pre-partitioned split; sort-merge joins skip the exchange
    and, with ``sort_cols``, the sort).

    Bucketed tables require the session catalog (saveAsTable) — path-only
    writes cannot carry bucket metadata.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
