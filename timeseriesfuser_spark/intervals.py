"""Interval string parsing and integer epoch-ms boundary math.

Semantics match the reference's interval helpers
(/root/reference/timeseriesfuser/classes.py:708-801):

- interval strings are ``<int><unit>`` with units ``l`` (milliseconds),
  ``s``, ``m``, ``h``, ``d``;
- the *next boundary* of a timestamp is the smallest grid point strictly
  greater than it: ``(ts // step) * step + step`` — a timestamp exactly on a
  boundary advances a full interval (classes.py:798-800);
- ``'1d'`` boundaries align to midnight in a target timezone
  (classes.py:787-795).

All math here is integer milliseconds (LongType on the Spark side) — we never
round-trip through float seconds, so the reference's floating-point tolerance
workaround (classes.py:760-763) is unnecessary.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone, tzinfo
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_MS = {
    "l": 1,
    "s": 1_000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
}

_INTERVAL_RE = re.compile(r"^\s*(\d+)\s*([lsmhd])\s*$")

MS_PER_DAY = _UNIT_MS["d"]


def interval_to_ms(interval: str) -> int:
    """Parse ``'100l' | '10s' | '5m' | '2h' | '1d'`` to milliseconds.

    Reference: interval_string_to_milliseconds, classes.py:708-730.
    """
    m = _INTERVAL_RE.match(interval)
    if not m:
        raise ValueError(f"Invalid interval string: {interval!r}")
    value, unit = int(m.group(1)), m.group(2)
    if value <= 0:
        raise ValueError(f"Interval must be positive: {interval!r}")
    return value * _UNIT_MS[unit]


# Back-compat alias mirroring the reference's public name.
interval_string_to_milliseconds = interval_to_ms


def _coerce_tz(tz: str | tzinfo | None) -> tzinfo:
    if tz is None:
        return timezone.utc
    if isinstance(tz, str):
        return ZoneInfo(tz)
    return tz


def floor_boundary_ms(ts_ms: int, step_ms: int, offset_ms: int = 0) -> int:
    """Largest grid point <= ts. Grid = {offset + k*step}. Floor division
    (Python ``//``) handles negative (pre-1970) timestamps correctly."""
    return ((ts_ms - offset_ms) // step_ms) * step_ms + offset_ms


def next_boundary_ms(ts_ms: int, interval: str | int, *, tz: str | tzinfo | None = None) -> int:
    """Smallest grid point strictly greater than ``ts_ms``.

    ``interval`` is an interval string or a step in milliseconds. For day
    intervals with a non-UTC ``tz``, boundaries are local midnights in that
    timezone (DST-correct, computed via zoneinfo rather than a fixed offset).

    Reference: get_next_interval(..., initialize=True), classes.py:733-801.
    (Deviation: the reference derives the calendar date via the *system*
    local timezone before anchoring midnight in ``to_timezone``; we use the
    target timezone for both, which is the documented intent.)

    Anchoring note for multi-day grids (N > 1): ``tz=None`` floors on the
    epoch-anchored N-day grid, while ANY explicit ``tz`` — including
    ``'UTC'`` — anchors at the ts's local midnight (reference parity,
    classes.py:787-795). So ``tz='UTC'`` and ``tz=None`` agree for '1d'
    but intentionally differ for '2d'+: passing a timezone requests the
    midnight-anchored calendar semantics, not just an offset.
    """
    if isinstance(interval, int):
        step = interval
        unit = None
    else:
        step = interval_to_ms(interval)
        unit = interval.strip()[-1]

    tzi = _coerce_tz(tz)
    if unit == "d" and tzi != timezone.utc:
        days = step // MS_PER_DAY
        dt = datetime.fromtimestamp(ts_ms / 1000.0, tz=tzi)
        midnight = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        nxt = (midnight + timedelta(days=days)).astimezone(timezone.utc)
        nxt_ms = int(nxt.timestamp() * 1000)
        if nxt_ms <= ts_ms:  # DST edge: local day shorter than `days`
            nxt = (midnight + timedelta(days=days + 1)).astimezone(timezone.utc)
            nxt_ms = int(nxt.timestamp() * 1000)
        return nxt_ms
    return floor_boundary_ms(ts_ms, step) + step


def step_boundary_ms(ts_ms: int, interval: str | int) -> int:
    """Next interval WITHOUT alignment: ts + step.

    Reference: get_next_interval(..., initialize=False), classes.py:733-801.
    """
    step = interval if isinstance(interval, int) else interval_to_ms(interval)
    return ts_ms + step


def boundary_label_col(ts_col: Column, step_ms: int, offset_ms: int = 0) -> Column:
    """Columnar boundary label: the grid point each event is *emitted at*.

    label(ts) = floor((ts - off)/step)*step + step + off — the next boundary
    strictly after ts; an event exactly on a boundary belongs to the next
    interval (reference classes.py:589-625 'strictly before boundary wins').

    Uses ``pmod`` so negative epoch values (pre-1970) floor correctly.
    JVM-side integer arithmetic — stays inside whole-stage codegen.
    """
    shifted = ts_col - F.lit(offset_ms)
    return (shifted - F.pmod(shifted, F.lit(step_ms)) + F.lit(step_ms) + F.lit(offset_ms)).cast(
        "long"
    )


def floor_boundary_col(ts_col: Column, step_ms: int, offset_ms: int = 0) -> Column:
    """Columnar floor boundary (largest grid point <= ts)."""
    shifted = ts_col - F.lit(offset_ms)
    return (shifted - F.pmod(shifted, F.lit(step_ms)) + F.lit(offset_ms)).cast("long")


def day_boundary_label_col(ts_ms_col: Column, days: int, tz: str) -> Column:
    """Boundary label for '<N>d' intervals anchored at local midnight in ``tz``.

    DST-correct: uses Spark's timezone-aware date functions rather than a
    fixed offset. Returns epoch-ms LongType of the next local midnight grid
    point strictly after ts. Reference: classes.py:787-795.
    """
    local = F.from_utc_timestamp(F.timestamp_millis(ts_ms_col), tz)
    next_mid_local = F.date_trunc("DAY", local) + F.make_dt_interval(F.lit(days))
    # make_dt_interval adds fixed 24h*days; re-truncate to local midnight to
    # absorb DST shifts, then bump if we landed at/before ts.
    next_mid_local = F.date_trunc("DAY", next_mid_local)
    cand = F.unix_millis(F.to_utc_timestamp(next_mid_local, tz))
    bumped = F.unix_millis(
        F.to_utc_timestamp(F.date_trunc("DAY", next_mid_local + F.make_dt_interval(F.lit(1))), tz)
    )
    return F.when(cand > ts_ms_col, cand).otherwise(bumped).cast("long")
