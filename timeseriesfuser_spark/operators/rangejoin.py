"""Interval (range) join: attach point events to the time intervals that
contain them — without a cartesian/broadcast-nested-loop plan.

The reference's window predicate surface (procstart/procend filtering,
core.py:353-420) restricts ONE stream to ONE global interval; the natural
generalization a clickstream/market-data user needs is the relational form:
a whole table of intervals (sessions, promotions, maintenance windows,
trading halts) joined to a stream of points by containment
``start <= ts < end`` plus optional equi-keys.

Spark-first scale design
------------------------

A naive ``points JOIN intervals ON ts BETWEEN start AND end`` has no
equi-condition, so Catalyst plans BroadcastNestedLoopJoin (or a cartesian)
— O(|points|·|intervals|) and a non-starter at 100 TB. The classical fix
(epoch chunking, as in Flink/interval-join and DuckDB's IEJoin literature)
turns it into an equi-join:

1. every interval is exploded to the fixed-width epoch chunks it overlaps
   (fan-out = ceil(len/chunk) + 1 — bounded by the interval length, NOT by
   the data size; pick ``chunk_ms`` ≈ the typical interval length so the
   fan-out is ~2);
2. every point computes its single containing chunk (zero fan-out);
3. join on (keys…, chunk) — a plain shuffled/broadcast EQUI-join Catalyst
   can hash — then apply the exact containment predicate as a post-filter.

Each (interval, point) pair meets in exactly one chunk (the point's), so no
dedup pass is needed. The physical plan is gated cartesian-free by
tests/test_plan_quality.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNK = "__rj_chunk"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    keys: Sequence[str] = (),
    chunk_ms: int = 3_600_000,
    how: str = "inner",
    broadcast_intervals: Optional[bool] = None,
) -> DataFrame:
    """Join each point to every interval with ``start <= ts < end``.

    ``points`` and ``intervals`` must have disjoint column names apart from
    ``keys`` (equi-join columns present on both sides). Timestamps are
    epoch-ms longs (the engine's canonical time axis). Intervals are
    half-open ``[start, end)``; empty/negative intervals match nothing.

    ``how``: ``inner`` or ``left`` (left = keep points with no interval;
    implemented as the inner equi-join plus an anti-joined remainder so the
    left side still never meets a nested-loop join).

    ``broadcast_intervals``: force/forbid broadcasting the exploded
    interval side; default (None) lets AQE decide from its size. Broadcast
    is the right physical plan when the interval table is a small dimension
    (maintenance windows, campaign calendars); shuffle hash join when both
    sides are big (per-user sessions).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    if chunk_ms <= 0:
        raise ValueError(f"chunk_ms must be positive: {chunk_ms}")
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}"
        )

    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    c = F.lit(int(chunk_ms))
    # floor-div that is negative-safe: pmod-based floor, same idiom as
    # sliding_counts. Intervals: all chunks from floor(start) to
    # floor(end-1) inclusive; end <= start → empty sequence → row drops out.
    lo = (s - F.pmod(s, c)) / c
    hi = ((e - 1) - F.pmod(e - 1, c)) / c
    iv = intervals.withColumn(
        _CHUNK,
        F.explode(
            F.when(
                e > s, F.sequence(lo.cast("long"), hi.cast("long"))
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    elif broadcast_intervals is False:
        # Forbid broadcasting (AQE would still auto-broadcast a small
        # estimated side without the explicit join-strategy hint).
        iv = iv.hint("shuffle_hash")

    t = F.col(point_ts).cast("long")
    pt = points.withColumn(_CHUNK, ((t - F.pmod(t, c)) / c).cast("long"))

    on = [*keys, _CHUNK]
    joined = (
        pt.join(iv, on=on, how="inner")
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop(_CHUNK)
    )
    if how == "inner":
        return joined

    # LEFT: points that matched no interval come back with null interval
    # columns. The anti side reuses the same equi-join shape (no nested
    # loop); the union is by name with null fill. The anti condition must
    # be NULL-SAFE per column — plain equality would classify any matched
    # row containing a null as unmatched too and emit it twice. (Exact
    # duplicate point rows are safe either way: identical rows share the
    # same chunk/ts, so they match or miss together.)
    matched_keys = joined.select(*points.columns)
    cond = None
    for col in points.columns:
        term = points[col].eqNullSafe(matched_keys[col])
        cond = term if cond is None else cond & term
    unmatched = points.join(matched_keys, on=cond, how="left_anti")
    return joined.unionByName(unmatched, allowMissingColumns=True)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start_ms",
    left_end: str = "end_ms",
    right_start: str = "r_start_ms",
    right_end: str = "r_end_ms",
    keys: Sequence[str] = (),
    chunk_ms: int = 3_600_000,
    broadcast_right: Optional[bool] = None,
) -> DataFrame:
    """Join two INTERVAL relations on overlap: every (left, right) pair
    with ``max(starts) < min(ends)`` (half-open ``[start, end)``
    semantics — touching endpoints do NOT overlap). The sibling of
    :func:`interval_join` for interval×interval workloads: sessions ×
    outage windows, campaigns × incidents, validity ranges × validity
    ranges.

    Scale design: both sides explode to fixed-width epoch chunks and
    equi-join on (keys, chunk) — never a nested-loop range join — then
    the exact overlap predicate filters. Each overlapping pair shares
    every chunk the overlap region covers, so ONE of them is elected
    representative WITHOUT a distinct shuffle: the pair is kept only in
    the chunk containing the overlap's first instant (``chunk ==
    floor(max(starts)/chunk_ms)`` — guaranteed covered by both sides;
    the simhash first-agreeing-chunk idiom). Fan-out per row is
    span/chunk_ms: size ``chunk_ms`` near the typical interval length.

    Column contract: the two sides must have disjoint column names
    apart from ``keys`` (equi-join columns on both). Empty/negative
    intervals match nothing. ``broadcast_right`` as in
    :func:`interval_join`.
    """
    if chunk_ms <= 0:
        raise ValueError(f"chunk_ms must be positive: {chunk_ms}")
    overlap_cols = set(left.columns) & set(right.columns) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap_cols)}"
        )
    c = F.lit(int(chunk_ms))

    def chunked(df: DataFrame, s_col: str, e_col: str) -> DataFrame:
        s, e = F.col(s_col).cast("long"), F.col(e_col).cast("long")
        lo = (s - F.pmod(s, c)) / c
        hi = ((e - 1) - F.pmod(e - 1, c)) / c
        return df.withColumn(
            _CHUNK,
            F.explode(
                F.when(
                    e > s, F.sequence(lo.cast("long"), hi.cast("long"))
                ).otherwise(F.array().cast("array<long>"))
            ),
        )

    lv = chunked(left, left_start, left_end)
    rv = chunked(right, right_start, right_end)
    if broadcast_right:
        rv = F.broadcast(rv)
    elif broadcast_right is False:
        rv = rv.hint("shuffle_hash")
    ostart = F.greatest(
        F.col(left_start).cast("long"), F.col(right_start).cast("long")
    )
    oend = F.least(
        F.col(left_end).cast("long"), F.col(right_end).cast("long")
    )
    return (
        lv.join(rv, on=[*keys, _CHUNK], how="inner")
        .filter(ostart < oend)
        # representative election: only the overlap-start chunk emits
        .filter(F.col(_CHUNK) == ((ostart - F.pmod(ostart, c)) / c).cast("long"))
        .drop(_CHUNK)
    )
