"""As-of join: for each left row, the most recent right row at or before
its timestamp (optionally within a tolerance, optionally per key).

The reference computes its merged wide stream as union + forward-fill
(SURVEY.md §2.3: "what a financial user would often build with an as-of
join"); this operator is the direct join formulation, offered as an
extension because pipelines frequently want it stand-alone (trade →
prevailing quote, event → latest model snapshot, etc.).

Physical strategy — the union trick, not a range join:

    tag left rows (side=1) and right rows (side=0) → one diagonal union →
    per-key window ordered by (ts, side, seq): last non-null right-payload
    carried forward → keep left rows.

This is a single shuffle on (keys) + a window — the same cost class as the
engine's forward fill, and it reuses the scalable two-pass LOCF when no
partition keys are given (a keyless global as-of join). A naive
`left.join(right, right.ts <= left.ts).groupBy(max)` is a range join that
explodes quadratically; Spark has no native as-of join operator.

Determinism: ties (right.ts == left.ts) resolve to the right row — "at or
before" — via the side ordering; equal right timestamps resolve by the
right row's arrival sequence (last wins), matching the engine's
last-observation convention.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.operators.fill import forward_fill

_SIDE = "__asof_side"
_SEQ = "__asof_seq"
_PAYLOAD = "__asof_payload"
_ORD = "__asof_ord"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    ts_col: str = "__timestamp",
    keys: Sequence[str] = (),
    right_cols: Optional[Sequence[str]] = None,
    tolerance_ms: Optional[int] = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join on ``ts_col`` (and equality on ``keys``).

    ``direction='backward'`` (default): every left row gains the latest
    right row with ``right.ts <= left.ts`` (same key); ``tolerance_ms``
    drops matches older than ``left.ts - tolerance_ms``.

    ``direction='forward'``: the EARLIEST right row with
    ``right.ts >= left.ts`` — the "label join" of a training pipeline
    (event → next outcome); ``tolerance_ms`` drops matches beyond
    ``left.ts + tolerance_ms``. Among equal right timestamps the
    last-arriving row wins in both directions.

    ``direction='nearest'``: the right row minimizing
    ``abs(right.ts - left.ts)`` — both carry scans over the SAME
    union/shuffle (one Exchange, two Sorts), then a per-row distance
    pick. Equal distances resolve BACKWARD (the at-or-before row), the
    ``pandas.merge_asof`` convention; ``tolerance_ms`` bounds the
    distance on both sides.

    Right columns that collide with left ones are suffixed. The right
    row's timestamp is exposed as ``{ts_col}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction!r}"
        )
    keys = list(keys)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != ts_col and c not in keys]
    right_cols = list(right_cols)

    # Payload struct: the right row's values + its ts (for tolerance +
    # exposure). Null payload on left-side rows; window carries it forward.
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        F.monotonically_increasing_id().alias(_SEQ),
        F.struct(
            F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        F.monotonically_increasing_id().alias(_SEQ),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Forward = the same carry-forward scan over the REVERSED time axis:
    # order by -ts and "last right at or before" becomes "first right at
    # or after". The negated order column keeps the keyless path on the
    # two-pass LOCF (whose range buckets split on the first order column).
    # Nearest = BOTH scans, then a per-row distance pick below.
    order_b = [ts_col, _SIDE, _SEQ]
    unioned = unioned.withColumn(_ORD, -F.col(ts_col))
    order_f = [_ORD, _SIDE, _SEQ]
    scans = {"backward": [order_b], "forward": [order_f]}.get(
        direction, [order_b, order_f]
    )
    pay_cols = (
        [_PAYLOAD]
        if direction != "nearest"
        else [_PAYLOAD + "_b", _PAYLOAD + "_f"]
    )
    if direction == "nearest":
        unioned = unioned.withColumn(pay_cols[0], F.col(_PAYLOAD)).withColumn(
            pay_cols[1], F.col(_PAYLOAD)
        )
    filled = unioned
    for pcol, order in zip(pay_cols, scans):
        if keys:
            w = (
                Window.partitionBy(*keys)
                .orderBy(*[F.col(c) for c in order])
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            filled = filled.withColumn(
                pcol, F.last(pcol, ignorenulls=True).over(w)
            )
        else:
            # Keyless global as-of join → scalable two-pass LOCF, no
            # single-task window.
            filled = forward_fill(filled, order, [pcol])

    out = filled.filter(F.col(_SIDE) == 1)
    if direction == "nearest":
        pb, pf = F.col(pay_cols[0]), F.col(pay_cols[1])
        if tolerance_ms is not None:
            tol = F.lit(tolerance_ms)
            pb = F.when(pb["__rts"] >= F.col(ts_col) - tol, pb)
            pf = F.when(pf["__rts"] <= F.col(ts_col) + tol, pf)
        dist_b = F.col(ts_col) - pb["__rts"]
        dist_f = pf["__rts"] - F.col(ts_col)
        # ties (dist_b == dist_f) take the backward row — merge_asof's rule
        payload = F.when(
            pb.isNotNull() & (pf.isNull() | (dist_b <= dist_f)), pb
        ).otherwise(pf)
    else:
        payload = F.col(_PAYLOAD)
        if tolerance_ms is not None:
            if direction == "forward":
                payload = F.when(
                    payload["__rts"] <= F.col(ts_col) + F.lit(tolerance_ms),
                    payload,
                )
            else:
                payload = F.when(
                    payload["__rts"] >= F.col(ts_col) - F.lit(tolerance_ms),
                    payload,
                )
    left_names = set(left.columns)
    proj = [F.col(c) for c in left.columns]
    proj.append(payload["__rts"].alias(f"{ts_col}{suffix}"))
    for c in right_cols:
        name = f"{c}{suffix}" if c in left_names else c
        proj.append(payload[c].alias(name))
    return out.select(*proj)
