"""Scalable forward fill (last observation carried forward) over a global
time order.

Semantics ≈ reference ``_forward_fill_dataframe`` + its cross-chunk seeding
(/root/reference/timeseriesfuser/core.py:1034-1072): every null takes the
most recent non-null value of its column in ``order_by`` order, across the
whole stream.

The naive Spark spelling — ``F.last(c, ignorenulls=True)`` over
``Window.orderBy(ts)`` with no partitionBy — funnels ALL rows through one
task and cannot scale. This module implements the standard two-pass
range-bucketed scheme (SURVEY.md §4.3.1):

  1. assign each row a *data-derived* range-bucket id (quantile boundaries
     of the leading order column, computed once driver-side and embedded as
     literals); LOCF *within* each bucket via a window partitioned on the
     bucket id (parallel across buckets);
  2. per bucket, the last non-null value of each column (one tiny row per
     bucket — the distributed analogue of the reference's ``last_row_vals``
     carry at core.py:1043-1071); a prefix scan over this bucket-count-sized
     table yields each bucket's carry-in, broadcast-joined back to patch
     leading nulls.

The bucket id is a pure function of the row (NOT ``spark_partition_id``
after a repartition, which is evaluated independently per plan branch and
can disagree under AQE coalescing — observed as a wrong-carry bug). Pass 2's
window runs over #buckets rows, not data rows, so no single-task stage is
proportional to input size — safe at 100 TB.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_PID = "__ff_bucket"


def _lit_of(value, dtype: T.DataType) -> Column:
    """Typed literal for a collected value (atomics + nested structs)."""
    if value is None:
        return F.lit(None).cast(dtype)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                _lit_of(value[f.name], f.dataType).alias(f.name)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return F.array(
            *[_lit_of(v, dtype.elementType) for v in value]
        ).cast(dtype)
    return F.lit(value).cast(dtype)


def _bucket_col(first_order_col: str, bounds: List[float]) -> Column:
    """#{b in bounds : b <= x} — a deterministic range-bucket id.

    O(len(bounds)) per row but JVM-side and codegen'd; bounds is at most a
    few hundred entries.
    """
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    x = F.col(first_order_col).cast("double")
    return F.aggregate(
        arr, F.lit(0), lambda acc, b: acc + F.when(x >= b, 1).otherwise(0)
    )


def forward_fill(
    df: DataFrame,
    order_by: Sequence[str],
    cols: Sequence[str],
    num_partitions: Optional[int] = None,
    bounds: Optional[List[float]] = None,
) -> DataFrame:
    """LOCF-fill ``cols`` in global ``order_by`` order.

    ``order_by`` should be a total order (include tiebreakers, e.g.
    ``["__timestamp", "__src_id", "__seq"]``). Range buckets split on the
    *first* order column only; rows tied on it stay in one bucket, where the
    within-bucket window applies the full tuple order.

    ``bounds``: precomputed range-bucket boundaries on ``order_by[0]``. A
    caller that already knows the distribution (resample's uniform spine)
    passes them to skip the quantile pass — the boundaries only control
    task balance, not correctness, so any monotone cut list is valid.
    """
    cols = [c for c in cols if c in df.columns]
    if not cols:
        return df
    order_cols = [F.col(c) for c in order_by]
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))

    # Two-to-three actions read ``df`` (optional quantile sketch,
    # per-bucket seed collect, the caller's final plan). Deliberately NOT
    # persisted here: for a cheap input (a parquet scan, a generated
    # range) re-scanning beats paying cache serialization on the full
    # relation — measured 21 s vs 90 s at 30M rows. A caller whose input
    # is an EXPENSIVE subplan (e.g. resample's spine join) persists it
    # before calling (see operators.resample._gap_fill_tail).

    # Driver-side quantile sketch → bucket boundaries (one pass, embedded as
    # literals so every plan branch sees identical bucket assignment).
    if bounds is not None:
        bounds = sorted(set(float(b) for b in bounds))
    elif n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(order_by[0], qs, 1.0 / (4 * n))))
    else:
        bounds = []
    part = df.withColumn(_PID, _bucket_col(order_by[0], bounds) if bounds else F.lit(0))

    # Pass 1: within-bucket LOCF (parallel; partitionBy bounds each task).
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = part.select(
        *[c for c in part.columns if c not in cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in cols],
    )

    # Per-bucket last non-null of each col: max_by over rows where the col
    # is non-null (null ordering key ⇒ row ignored by max_by). This is a
    # separate tiny job (#buckets result rows); its prefix scan —
    # carry(pid) = last non-null among buckets strictly before pid — runs
    # driver-side in plain Python, the exact distributed analogue of the
    # reference's last_row_vals carry dict (core.py:1043-1071). Collecting
    # also severs plan lineage: the carry joins back as a LocalRelation,
    # keeping the final plan a single chain (a window-over-shared-subplan
    # formulation tripped an optimizer ATTRIBUTE_NOT_FOUND bug).
    order_struct = F.struct(*order_cols)
    seeds = part.groupBy(_PID).agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), order_struct)).alias(c)
            for c in cols
        ]
    )
    seed_rows = sorted(seeds.collect(), key=lambda r: r[_PID])
    # carry[pid][c] = last non-null of c among buckets strictly before pid.
    running = {c: None for c in cols}
    carry: dict = {}
    for r in seed_rows:
        carry[r[_PID]] = dict(running)
        for c in cols:
            if r[c] is not None:
                running[c] = r[c]

    # Patch leading nulls via a literal lookup array indexed by bucket id —
    # a pure projection: no join, no broadcast, no shared subplan. Bucket
    # ids are contiguous 0..len(bounds), so the array has at most
    # #buckets+1 entries.
    n_buckets = len(bounds) + 1
    out_cols = []
    for c in df.columns:
        if c not in cols:
            out_cols.append(F.col(c))
            continue
        dtype = df.schema[c].dataType
        lut = F.array(
            *[
                _lit_of(carry.get(pid, {}).get(c), dtype)
                for pid in range(n_buckets)
            ]
        )
        out_cols.append(
            F.coalesce(F.col(c), F.element_at(lut, F.col(_PID) + 1)).alias(c)
        )
    return filled.select(*out_cols)
