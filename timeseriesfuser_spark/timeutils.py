"""Polymorphic time coercion and formatting helpers (driver-side).

Re-implements the reference's helper semantics
(/root/reference/timeseriesfuser/helpers/helpers.py:35-128):

- ``coerce_to_epoch_ms`` accepts int/float/str/datetime/numpy ints and
  returns unix epoch **milliseconds**;
- bare numerics use the digit-count heuristic: 10 digits = seconds (x1000),
  13 digits = already milliseconds, anything else is an error;
- ISO-8601 strings (incl. trailing 'Z') are parsed; naive datetimes are
  assumed UTC (with a warning, matching the reference).
"""

from __future__ import annotations

import warnings
from datetime import date, datetime, timezone


def _digits(n: int) -> int:
    return len(str(abs(int(n))))


def coerce_to_epoch_ms(value) -> int:
    """Coerce int/float/str/datetime → epoch milliseconds.

    Reference: convert_time_obj_to_epoch_format, helpers/helpers.py:52-95;
    digit-count heuristic helpers/helpers.py:35-49.
    """
    if value is None:
        raise ValueError("Cannot coerce None to epoch milliseconds")
    if isinstance(value, bool):
        raise TypeError("bool is not a timestamp")
    if isinstance(value, datetime):
        if value.tzinfo is None:
            warnings.warn(
                "Naive datetime passed as timestamp; assuming UTC.", UserWarning, stacklevel=2
            )
            value = value.replace(tzinfo=timezone.utc)
        return int(value.timestamp() * 1000)
    if isinstance(value, date):
        return int(
            datetime(value.year, value.month, value.day, tzinfo=timezone.utc).timestamp() * 1000
        )
    if isinstance(value, str):
        s = value.strip()
        # numeric strings go through the digit heuristic
        try:
            return coerce_to_epoch_ms(int(s))
        except ValueError:
            pass
        iso = s.replace("Z", "+00:00") if s.endswith("Z") else s
        try:
            return coerce_to_epoch_ms(datetime.fromisoformat(iso))
        except ValueError as exc:
            raise ValueError(f"Unparseable timestamp string: {value!r}") from exc
    # numpy integers / floats quack like int/float
    try:
        ivalue = int(value)
    except (TypeError, ValueError) as exc:
        raise TypeError(f"Unsupported timestamp type: {type(value)!r}") from exc
    nd = _digits(ivalue)
    if nd == 13:
        return ivalue
    if nd == 10:
        return ivalue * 1000
    raise ValueError(
        f"Ambiguous epoch value {value!r}: expected 10 digits (seconds) or 13 (milliseconds)"
    )


def ts_epoch_ms_col(df, col: str, *, int_epoch: str = "heuristic"):
    """Spark Column normalizing ``df[col]`` to epoch-milliseconds long.

    The column twin of :func:`coerce_to_epoch_ms`, tolerant of every dtype
    the testdata has shipped across rounds:

    - ``timestamp`` (LTZ) → ``unix_millis``;
    - ``timestamp_ntz`` → cast to TIMESTAMP first (callers pin the session
      TZ to UTC, so the wall-clock is interpreted as UTC — matching DuckDB's
      ``epoch_ms`` on the same naive value), then ``unix_millis``; this is
      the ONE branch that still depends on the session timezone;
    - ``date`` → midnight UTC via ``unix_date`` (days-since-epoch ×
      86 400 000 — session-timezone INDEPENDENT, unlike a cast to
      TIMESTAMP which lands on local midnight);
    - integer epochs: with ``int_epoch="heuristic"``, a per-row magnitude
      CASE picks the unit — ≥1e17 nanoseconds, ≥1e14 microseconds, ≥1e11
      milliseconds, else seconds (each band spans years 1973–5138). All
      divisions are integer ``DIV`` (epoch-nanos exceed 2^53; a double
      round-trip would corrupt low bits). With ``int_epoch="ms"`` integers
      pass through unchanged (the source-reader contract: numeric ts
      columns are already milliseconds unless a ts_converter says else).
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype == "timestamp":
        return F.unix_millis(c).cast("long")
    if dtype == "date":
        return (F.unix_date(c).cast("long") * F.lit(86400000)).cast("long")
    if dtype == "timestamp_ntz":
        return F.unix_millis(c.cast("timestamp")).cast("long")
    if int_epoch == "ms":
        return c.cast("long")
    # Widen BEFORE the arithmetic: an int32 epoch-seconds column would
    # wrap at `int * 1000` (32-bit multiply) before any outer cast.
    q = f"CAST(`{col}` AS BIGINT)"
    return F.expr(
        f"CASE WHEN abs({q}) >= 100000000000000000 THEN {q} DIV 1000000 "
        f"WHEN abs({q}) >= 100000000000000 THEN {q} DIV 1000 "
        f"WHEN abs({q}) >= 100000000000 THEN {q} "
        f"ELSE {q} * 1000 END"
    ).cast("long")


def iso_utc(epoch_ms: int | None) -> str | None:
    """Epoch ms → ISO-8601 UTC string; None-safe.

    Reference: toutcisotime, helpers/helpers.py:98-128.
    """
    if epoch_ms is None:
        return None
    return datetime.fromtimestamp(epoch_ms / 1000.0, tz=timezone.utc).isoformat()


def parse_size_bytes(size: str) -> int:
    """``'1.5MB'`` → bytes. Reference: helpers/helpers.py:131-151."""
    units = {"B": 1, "KB": 1024, "MB": 1024**2, "GB": 1024**3, "TB": 1024**4}
    s = size.strip().upper()
    for suffix in sorted(units, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)].strip()) * units[suffix])
    raise ValueError(f"Unparseable size string: {size!r}")
