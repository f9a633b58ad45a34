"""timeseriesfuser_spark — a PySpark-native time-series fusion & analytics engine.

A from-scratch, Spark-first implementation of the capabilities of
klovanone/timeseriesfuser (reference: /root/reference, v0.5.2): chronological
multi-source merge (sorted diagonal union), forward fill (LOCF), interval
resampling with gap fill, batched sinks and row-level replay — plus
large-scale data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing).

Design stance (see SURVEY.md §7): everything is declared with the public
DataFrame API so Catalyst/AQE pick the physical plan; Python UDFs only where
built-ins cannot express the semantics (and then Arrow-batched).
"""

from timeseriesfuser_spark.config import SourceConfig, FuserConfig
from timeseriesfuser_spark.intervals import (
    interval_to_ms,
    next_boundary_ms,
    boundary_label_col,
)
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.resample import resample_last_interval

TS_COL = "__timestamp"
SRC_ID_COL = "__src_id"
SEQ_COL = "__seq"

__all__ = [
    "SourceConfig",
    "FuserConfig",
    "TimeSeriesFuser",
    "interval_to_ms",
    "next_boundary_ms",
    "boundary_label_col",
    "forward_fill",
    "resample_last_interval",
    "TS_COL",
    "SRC_ID_COL",
    "SEQ_COL",
]

__version__ = "0.1.0"
