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


def _sql_lit(value, dtype: T.DataType) -> Optional[str]:
    """SQL literal text for a collected value, or ``None`` when the type
    has no safe textual rendering (caller falls back to :func:`_lit_of`).

    Exactness notes: doubles/floats go through ``CAST('<repr>' AS ...)`` —
    Python ``repr`` emits the shortest decimal that round-trips, and
    Spark's string→double parse is correctly rounded, so the value is
    bit-identical to the collected one. Strings are rendered only when
    they contain no characters that interact with the SQL lexer's escape
    handling (which itself depends on a session config)."""
    if value is None:
        return f"CAST(NULL AS {dtype.simpleString()})"
    if isinstance(dtype, T.StructType):
        parts = []
        for f in dtype.fields:
            if not f.name.replace("_", "").isalnum():
                return None
            s = _sql_lit(value[f.name], f.dataType)
            if s is None:
                return None
            parts.append(f"'{f.name}', {s}")
        return "named_struct(" + ", ".join(parts) + ")"
    if isinstance(dtype, T.ArrayType):
        items = [_sql_lit(v, dtype.elementType) for v in value]
        if any(i is None for i in items):
            return None
        return f"CAST(array({', '.join(items)}) AS {dtype.simpleString()})"
    if isinstance(dtype, T.BooleanType):
        return "true" if value else "false"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return f"CAST({int(value)} AS {dtype.simpleString()})"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        ty = dtype.simpleString()
        if value != value:
            return f"CAST('NaN' AS {ty})"
        if value == float("inf"):
            return f"CAST('Infinity' AS {ty})"
        if value == float("-inf"):
            return f"CAST('-Infinity' AS {ty})"
        return f"CAST('{value!r}' AS {ty})"
    if isinstance(dtype, T.StringType):
        if all(32 <= ord(ch) < 127 and ch not in "'\\" for ch in value):
            return f"'{value}'"
        return None
    return None


def _bucket_sql(first_order_col: str, bounds: List[float]) -> str:
    """#{b in bounds : b <= x} as a binary-search CASE tree, one parsed
    SQL expression.

    Replaces the ``aggregate(array(<bounds>), ...)`` higher-order-function
    formulation (r15): HOFs are interpreted per element — O(#bounds)
    lambda evaluations per row, plus ~300 py4j round-trips to build the
    Column tree — while the CASE tree is whole-stage-codegen'd at
    O(log #bounds) comparisons per row and parses JVM-side in one call.
    With thousands of bounds on a real cluster the per-row gap is ~100×.

    NULL ordering values descend the ELSE branch at every level and land
    in bucket 0, exactly like the old per-element ``when(x >= b, 1)``
    (a NULL comparison contributes 0); NaN compares greater than every
    bound in both formulations (Spark's NaN ordering), landing in the
    last bucket."""
    col_q = first_order_col.replace("`", "``")
    x = f"CAST(`{col_q}` AS DOUBLE)"

    def tree(lo: int, hi: int) -> str:
        # counts bounds with index in [lo, hi) that are <= x
        if lo >= hi:
            return "0"
        if hi - lo == 1:
            return f"(CASE WHEN {x} >= CAST('{bounds[lo]!r}' AS DOUBLE) THEN 1 ELSE 0 END)"
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {x} >= CAST('{bounds[mid]!r}' AS DOUBLE) "
            f"THEN {mid - lo + 1} + {tree(mid + 1, hi)} "
            f"ELSE {tree(lo, mid)} END)"
        )

    return tree(0, len(bounds))


def _bucket_col(first_order_col: str, bounds: List[float]) -> Column:
    """Column form of :func:`_bucket_sql` (shared by the range-bucketed
    schemes in ops.timeseries / ops.packing / ops.scale)."""
    return F.expr(_bucket_sql(first_order_col, bounds))


def forward_fill(
    df: DataFrame,
    order_by: Sequence[str],
    cols: Sequence[str],
    num_partitions: Optional[int] = None,
    bounds: Optional[List[float]] = None,
    bucket_col: Optional[Column] = None,
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

    ``bucket_col``: fully in-plan alternative to ``bounds`` — a Column
    computing a non-negative bucket id that is MONOTONE in ``order_by[0]``
    (rows tied on the first order column must map to one bucket). With it
    this operator runs ZERO driver-side jobs at construction: no quantile
    sketch, and the cross-bucket carry below is in-plan too. Used by
    resample's uniform spine, whose bucket id is plain arithmetic over the
    already-computed bounds relation.
    """
    cols = [c for c in cols if c in df.columns]
    if not cols:
        return df
    order_cols = [F.col(c) for c in order_by]
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))

    # At most ONE action reads ``df`` at construction (the optional
    # quantile sketch); the per-bucket carry is in-plan, so the caller's
    # final action evaluates ``df`` twice (fill branch + seeds branch) in
    # one job. Deliberately NOT persisted here: for a cheap input (a
    # parquet scan, a generated range) re-scanning beats paying cache
    # serialization on the full relation — measured 21 s vs 90 s at 30M
    # rows. A caller whose input is an EXPENSIVE subplan (e.g. resample's
    # spine join) persists it before calling (see
    # operators.resample._gap_fill_tail) — both branches then share the
    # cache build within the action.
    if bucket_col is not None:
        part = df.withColumn(_PID, bucket_col.cast("long"))
    else:
        # Driver-side quantile sketch → bucket boundaries (one pass,
        # embedded as literals so every plan branch sees identical bucket
        # assignment).
        if bounds is not None:
            bounds = sorted(set(float(b) for b in bounds))
        elif n > 1:
            qs = [i / n for i in range(1, n)]
            bounds = sorted(set(df.stat.approxQuantile(order_by[0], qs, 1.0 / (4 * n))))
        else:
            bounds = []
        part = df.withColumn(
            _PID, F.expr(_bucket_sql(order_by[0], bounds)) if bounds else F.lit(0)
        )

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

    # Pass 2, fully in-plan (r15 — replaces a driver-side seeds.collect()
    # + literal-LUT projection that cost one serial job of pure latency
    # per call): per-bucket last non-null of each col via max_by (null
    # ordering key ⇒ row ignored), then carry(pid) = last non-null among
    # buckets strictly BEFORE pid as a prefix window over the
    # bucket-count-sized seeds relation (single-partition by design —
    # #buckets ≈ shuffle partitions rows, the distributed analogue of the
    # reference's last_row_vals carry dict, core.py:1043-1071), broadcast-
    # joined back to patch leading nulls. Carry columns get fresh names so
    # the seeds branch cannot alias-collide with the fill branch (the
    # historic window-over-shared-subplan ATTRIBUTE_NOT_FOUND hazard).
    order_struct = F.struct(*order_cols)
    seeds = part.groupBy(_PID).agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), order_struct)).alias(c)
            for c in cols
        ]
    )
    wc = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seeds.select(
        F.col(_PID),
        *[
            F.last(F.col(c), ignorenulls=True).over(wc).alias(f"__ff_carry__{c}")
            for c in cols
        ],
    )
    joined = filled.join(F.broadcast(carry), _PID, "left")
    out_cols = []
    for c in df.columns:
        if c not in cols:
            out_cols.append(F.col(c))
        else:
            out_cols.append(
                F.coalesce(F.col(c), F.col(f"__ff_carry__{c}")).alias(c)
            )
    return joined.select(*out_cols)
