"""Row-level ordered replay: the reference's Handler surface.

≈ reference BaseHandler / handler.process(ts, msg) loop
(classes.py:245-316, core.py:483-513): every merged row is delivered, in global
chronological order, as ``(ts, {col: value})`` to a pluggable handler —
the surface event-driven trading systems plug into.

Spark-first stance (SURVEY.md §1.1): this row-at-a-time emission is a
deliberately *optional sink*, not the engine's spine. The pipeline stays
vectorized end-to-end; ``replay()`` streams the final ordered DataFrame
through ``toLocalIterator`` (one partition in flight at a time — bounded
memory), and ``foreach_batch`` offers the vectorized alternative where the
"handler" consumes whole Arrow batches.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.util import track_persist

from timeseriesfuser_spark.sources.readers import SEQ_COL, SRC_ID_COL, TS_COL


class BaseHandler(ABC):
    """≈ reference BaseHandler (classes.py:245-316)."""

    @abstractmethod
    def process(self, ts: int, msg: Dict[str, Any]) -> None:
        """Receive one event (epoch-ms ts, {col: value})."""

    def finalize(self) -> None:  # classes.py:627-637 analogue
        pass

    def get_results(self) -> Any:  # classes.py:639-646 analogue
        return None


class CollectHandler(BaseHandler):
    """Accumulates every message — the test/debug handler."""

    def __init__(self) -> None:
        self.rows: List[Dict[str, Any]] = []

    def process(self, ts: int, msg: Dict[str, Any]) -> None:
        self.rows.append({TS_COL: ts, **msg})

    def get_results(self) -> List[Dict[str, Any]]:
        return self.rows


class CallbackHandler(BaseHandler):
    """Wraps a plain ``f(ts, msg)`` callable."""

    def __init__(self, fn: Callable[[int, Dict[str, Any]], None]) -> None:
        self.fn = fn

    def process(self, ts: int, msg: Dict[str, Any]) -> None:
        self.fn(ts, msg)


class RoutingHandler(BaseHandler):
    """Fan one replayed stream out to several handlers.

    ≈ the reference's ``distribute_to_event_handlers`` override point
    (classes.py:279-286) and the per-event ``_process_func`` dispatch the
    Fuser drives it through (core.py:1083-1098): a consumer with one
    handler per instrument/source plugs the same multi-handler setup in
    here.

    ``routes`` maps a routing key to a handler. The key is taken from
    ``msg[key_col]`` (default: the ``__src_id`` source tag — replay with
    ``remove_internal_cols=False`` to keep it) or computed by a custom
    ``key(ts, msg)``. Unrouted events go to ``default`` (dropped when
    None). ``finalize``/``get_results`` fan out to every route (results
    keyed like ``routes``).
    """

    def __init__(
        self,
        routes: Dict[Any, BaseHandler],
        *,
        key_col: str = SRC_ID_COL,
        key: Optional[Callable[[int, Dict[str, Any]], Any]] = None,
        default: Optional[BaseHandler] = None,
        drop_key_col: bool = False,
    ) -> None:
        self.routes = dict(routes)
        self.key_col = key_col
        self.key = key
        self.default = default
        self.drop_key_col = drop_key_col

    def process(self, ts: int, msg: Dict[str, Any]) -> None:
        k = self.key(ts, msg) if self.key is not None else msg.get(self.key_col)
        handler = self.routes.get(k, self.default)
        if handler is None:
            return
        if self.drop_key_col and self.key is None:
            msg = {c: v for c, v in msg.items() if c != self.key_col}
        handler.process(ts, msg)

    def finalize(self) -> None:
        for handler in self.routes.values():
            handler.finalize()
        if self.default is not None:
            self.default.finalize()

    def get_results(self) -> Dict[Any, Any]:
        return {k: h.get_results() for k, h in self.routes.items()}


@dataclass
class ReplayStatus:
    """≈ ReplayStatusObj (classes.py:690-705)."""

    status: str  # 'COMPLETED' | 'FORCESTOP'
    start_ts: Optional[int] = None
    end_ts: Optional[int] = None
    rows: int = 0
    elapsed_sec: float = 0.0


class StopFlag:
    """Cooperative cancellation ≈ stop_tsf (core.py:123-132): checked per
    row; :func:`replay` runs its jobs in a dedicated Spark job group and
    cancels it on stop, so prefetched partition jobs are killed rather than
    left running. ``handler.finalize()`` IS still invoked on a stop — the
    reference's ``stop_tsf`` does exactly that (core.py:131) before the
    loop observes the flag and returns FORCESTOP."""

    def __init__(self) -> None:
        self._stop = False

    def stop(self) -> None:
        self._stop = True

    def __bool__(self) -> bool:
        return self._stop


def replay(
    df: DataFrame,
    handler: BaseHandler,
    *,
    ts_col: str = TS_COL,
    order_cols: Optional[Sequence[str]] = None,
    remove_internal_cols: bool = True,
    stop: Optional[StopFlag] = None,
) -> ReplayStatus:
    """Deliver every row of ``df`` to ``handler.process`` in global
    chronological order (≈ core.py:483-513 emission loop).

    The sort is distributed (range-partitioned exchange); only the ordered
    iteration is driver-side, pulling one partition at a time.
    """
    if order_cols is None:
        order_cols = [ts_col] + [c for c in (SRC_ID_COL, SEQ_COL) if c in df.columns]
    ordered = df.orderBy(*order_cols)
    drop_cols = {SRC_ID_COL, SEQ_COL} if remove_internal_cols else set()
    out_cols = [c for c in ordered.columns if c not in drop_cols]
    ordered = ordered.select(*out_cols)

    t0 = time.perf_counter()
    status = ReplayStatus(status="COMPLETED")
    n = 0
    first_ts = last_ts = None
    # Dedicated job group so a stop can cancel the iterator's prefetched
    # partition jobs (no stragglers), matching the "exit cleanly" intent of
    # stop_tsf (core.py:123-132). Thread-local: concurrent replays on other
    # threads keep their own groups.
    sc = df.sparkSession.sparkContext
    group = f"tsf-replay-{time.monotonic_ns():x}"
    sc.setJobGroup(group, "timeseriesfuser_spark replay", interruptOnCancel=True)
    it = ordered.toLocalIterator(prefetchPartitions=True)
    try:
        for row in it:
            if stop:
                status.status = "FORCESTOP"
                break
            msg = row.asDict()
            ts = msg.pop(ts_col)
            if first_ts is None:
                first_ts = ts
            last_ts = ts
            handler.process(ts, msg)
            n += 1
    finally:
        it.close()
        if status.status == "FORCESTOP":
            sc.cancelJobGroup(group)
        if hasattr(sc, "clearJobGroup"):
            sc.clearJobGroup()
        else:  # pragma: no cover - older pyspark
            sc.setLocalProperty("spark.jobGroup.id", None)
    # Reference stop_tsf finalizes on stop too (core.py:131).
    handler.finalize()
    status.start_ts, status.end_ts = first_ts, last_ts
    status.rows = n
    status.elapsed_sec = time.perf_counter() - t0
    return status


def foreach_batch(
    df: DataFrame,
    fn: Callable[[Iterable], None],
    *,
    ts_col: str = TS_COL,
    batch_size: int = 1_000_000,
) -> int:
    """Vectorized replay: deliver Arrow record batches, in order, to ``fn``.

    ≈ the reference's 1M-row emission chunks (core.py:364) without the
    per-row dict conversion — each chunk crosses the JVM↔Python boundary
    once as Arrow. Returns total rows delivered.

    Driver memory is bounded by ~``batch_size`` rows: when the input
    exceeds one batch, the time axis is cut into quantile ranges (a
    sketch pass — no global-window stage), and each range is pulled as
    Arrow independently; equal timestamps never straddle a cut, so
    ordering is preserved across chunks. One pathological timestamp
    carrying most of the data can still oversize a single range — the
    same caveat as any value-range chunking.
    """
    import math

    from pyspark import StorageLevel

    src = track_persist(df.persist(StorageLevel.MEMORY_AND_DISK))
    total = 0
    try:
        n = src.count()
        nchunks = max(1, math.ceil(n / batch_size))
        if nchunks == 1:
            for batch in src.orderBy(ts_col).toArrow().to_batches(
                max_chunksize=batch_size
            ):
                fn(batch)
                total += batch.num_rows
            return total
        qs = [i / nchunks for i in range(1, nchunks)]
        cuts = sorted(set(src.approxQuantile(ts_col, qs, 0.001)))
        edges = [None, *cuts, None]
        ts = F.col(ts_col)
        for lo, hi in zip(edges, edges[1:]):
            if lo is None:
                # first range also carries any null ts (they sort first)
                cond = ts.isNull() | (ts <= F.lit(int(hi)))
            elif hi is None:
                cond = ts > F.lit(int(lo))
            else:
                cond = (ts > F.lit(int(lo))) & (ts <= F.lit(int(hi)))
            chunk = src.filter(cond).orderBy(ts_col)
            for batch in chunk.toArrow().to_batches(max_chunksize=batch_size):
                fn(batch)
                total += batch.num_rows
        return total
    finally:
        src.unpersist()
