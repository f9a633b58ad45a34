"""Configuration layer: SourceConfig (≈ reference DataInfo) and FuserConfig
(≈ reference TimeSeriesFuser kwargs).

Reference: /root/reference/timeseriesfuser/classes.py:26-242 (DataInfo),
core.py:32-96 (TimeSeriesFuser ctor). The reference's imperative file
machinery (file_sort_regex, chunked loading) is intentionally absent — Spark
reads a directory glob as one DataFrame and a global ``orderBy`` supersedes
filename ordering (SURVEY.md §2.1 S7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

# Reference type table, classes.py:95-100 → Spark types (SURVEY.md §1.2).
PY_TO_SPARK: Mapping[type, T.DataType] = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
}


def normalize_schema(
    schema: Union[T.StructType, Mapping[str, object], Sequence[object], None],
    columns: Optional[Sequence[str]] = None,
) -> Optional[T.StructType]:
    """Accept the reference's three schema shapes (classes.py:133-171):

    - a ``StructType`` (native) — returned as-is;
    - a dict ``{col: type}`` with Spark DataTypes or Python primitives;
    - a positional list of types, zipped with ``columns``;
    - ``None`` → None (reader falls back to inference, with the same caveat
      the reference documents).
    """
    if schema is None:
        return None
    if isinstance(schema, T.StructType):
        return schema

    def to_dtype(t: object) -> T.DataType:
        if isinstance(t, T.DataType):
            return t
        if isinstance(t, type) and t in PY_TO_SPARK:
            return PY_TO_SPARK[t]
        if t is __import__("datetime").datetime:
            return T.TimestampType()
        raise TypeError(f"Unsupported declared type: {t!r}")

    if isinstance(schema, Mapping):
        return T.StructType([T.StructField(c, to_dtype(t), True) for c, t in schema.items()])
    if columns is None:
        raise ValueError("Positional type list requires column names")
    if len(schema) != len(columns):
        raise ValueError(
            f"Declared {len(schema)} types for {len(columns)} columns: {list(columns)}"
        )
    return T.StructType(
        [T.StructField(c, to_dtype(t), True) for c, t in zip(columns, schema)]
    )


@dataclass
class SourceConfig:
    """One data source: a directory (or file, or prebuilt DataFrame) of
    same-schema records with a timestamp column.

    Mirrors reference DataInfo (classes.py:26-242):
    - ``name`` ≈ descriptor (used for collision-rename suffixing);
    - ``ts_col`` ≈ timestamp_col_name;
    - ``ts_converter`` ≈ convert_timestamp_function — a ``Column -> Column``
      function producing epoch-ms LongType; the original column is preserved
      as ``__{ts_col}`` (core.py:942-946);
    - ``remove_cols`` ≈ remove_cols;
    - ``schema`` accepts StructType / dict / positional list / None.
    """

    name: str
    path: Optional[str] = None
    fmt: str = "parquet"  # 'parquet' | 'csv' | 'json' (JSONL) | 'orc'
    schema: object = None
    columns: Optional[Sequence[str]] = None  # names for positional schema lists
    ts_col: str = "Timestamp"
    ts_converter: Optional[Callable[[Column], Column]] = None
    remove_cols: Sequence[str] = field(default_factory=tuple)
    df: Optional[DataFrame] = None  # direct DataFrame source (extension point ≈ Src ABC)
    header: bool = True
    csv_options: Mapping[str, str] = field(default_factory=dict)
    # File chronological ordering (reference FilesSrc.sort_data,
    # datasources.py:189-212): numeric key extracted from the filename.
    # Only used for the window *probe* (first row of first file / last row of
    # last file) — the merge itself is a global sort, indifferent to files.
    file_sort_regex: str = r"\d+"
    file_sort_idx: int = -1
    # P6 malformed-file guards (reference _check_transform_headers_on_load,
    # core.py:949-989): before reading, assert every local CSV file's header
    # contains the declared columns, has the declared column count, and is in
    # the declared order — naming the offending file. Driver-side one-line
    # reads, O(#files); disable for very large file counts.
    validate_headers: bool = True

    def __post_init__(self) -> None:
        if self.path is None and self.df is None:
            raise ValueError(f"Source {self.name!r}: need path or df")
        if self.fmt not in ("parquet", "csv", "json", "orc"):
            raise ValueError(f"Source {self.name!r}: unsupported fmt {self.fmt!r}")
        if not self.header and self.fmt == "csv":
            # Reference parity: headerless CSV is explicitly unsupported
            # (core.py:270-271, classes.py:240-241).
            raise NotImplementedError("Headerless CSV sources are not supported")


@dataclass
class FuserConfig:
    """Merge-level knobs ≈ TimeSeriesFuser ctor (core.py:32-96)."""

    procstart: object = None  # coerced via timeutils.coerce_to_epoch_ms
    procend: object = None
    secondary_sort_col: Optional[str] = None
    # P5 (reference core.py:446-459): when one source's files overlap
    # slightly, rows already emitted are dropped on replay via the
    # secondary-sort sequence id. The batch equivalent: keep one row per
    # (source, secondary_sort_col) value. Requires secondary_sort_col.
    drop_late_duplicates: bool = False
    forward_fill: bool = False
    rename_identical: bool = True  # core.py:43 rename_identi_cols
    merge_cols: Sequence[str] = field(default_factory=tuple)  # core.py:44 merge_col_names
    separator: str = "||"  # core.py:45
    remove_internal_cols: bool = False  # strip __src_id/__seq from output
    # Derive the processing window from the data (reference
    # core.py:145-213): per source [first-file-first-row ts,
    # last-file-last-row ts], clamped by procstart/procend; sources fully
    # outside are dropped; the merged stream is filtered to the global
    # [min(start), max(end)]. Set False to filter on the user bounds only
    # (skips the probe reads).
    derive_window: bool = True
