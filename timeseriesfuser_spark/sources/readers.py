"""Source readers: CSV (plain/gzip) and Parquet directories → normalized
DataFrames with a canonical ``__timestamp`` epoch-ms axis.

Replaces the reference's imperative per-file machinery
(/root/reference/timeseriesfuser/datasources.py:97-440): Spark reads a whole
directory glob in one scan (mixed .csv/.csv.gz handled natively, so the
compression autodetect at datasources.py:320-337 is unnecessary), schema is
enforced by the reader, and global ordering comes from the engine's sort —
filename sort keys (datasources.py:189-212) are irrelevant.

Normalization per source (reference core.py:320-351, 942-970):
  1. drop ``remove_cols``;
  2. convert the timestamp column to epoch-ms LongType ``__timestamp``
     (user ``ts_converter`` Column->Column if given, preserving the original
     as ``__{ts_col}``; native TimestampType via ``unix_millis``; numerics
     cast to long);
  3. tag ``__src_id`` (≈ exsym_lookup, core.py:134-143,340) and a
     per-source arrival sequence ``__seq`` for deterministic tie-breaking
     (SURVEY.md §4.3: Spark's sort is not stable).
"""

from __future__ import annotations

import os
import re
from dataclasses import replace
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timeseriesfuser_spark.config import SourceConfig, normalize_schema
from timeseriesfuser_spark.timeutils import ts_epoch_ms_col

TS_COL = "__timestamp"
SRC_ID_COL = "__src_id"
SEQ_COL = "__seq"
INTERNAL_COLS = (TS_COL, SRC_ID_COL, SEQ_COL)


def _cast_to_declared(df: DataFrame, declared: T.StructType) -> DataFrame:
    """Cast-through semantics ≈ ParquetSrc force_schema
    (datasources.py:369-396)."""
    by_name = {f.name: f.dataType for f in declared.fields}
    return df.select(
        *[
            F.col(c).cast(by_name[c]).alias(c) if c in by_name else F.col(c)
            for c in df.columns
        ]
    )


def _read_parquet_schema_groups(
    spark: SparkSession, src: SourceConfig, declared: T.StructType
) -> DataFrame:
    """Parquet read that survives *mixed physical schemas* within one
    directory (e.g. a column stored as DOUBLE in one file and INT64 in the
    next — present in the reference's own fixtures): group files by footer
    schema (driver-side pyarrow metadata reads, no data IO), one vectorized
    Spark scan per group, cast each group to the declared schema, union.

    A homogeneous directory (the normal case at scale) yields exactly one
    group — identical plan to a plain directory scan."""
    files = list_source_files(src) if os.path.isdir(src.path) else [src.path]
    if not files:
        # No top-level .parquet files — a Hive-partitioned/nested layout.
        # Delegate to Spark's own directory scan (which discovers
        # partition directories and their columns) and cast through the
        # declared schema, instead of crashing on an empty group list.
        return _cast_to_declared(spark.read.parquet(src.path), declared)
    try:
        import pyarrow.parquet as pq

        groups: dict = {}
        for f in files:
            key = tuple(str(t) for t in pq.read_schema(f).types)
            groups.setdefault(key, []).append(f)
    except Exception:  # non-local paths etc. — fall back to one scan
        groups = {"all": files}
    frames = [
        _cast_to_declared(spark.read.parquet(*fs), declared)
        for fs in groups.values()
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr, allowMissingColumns=True)
    return out


def _read_raw(spark: SparkSession, src: SourceConfig) -> DataFrame:
    if src.df is not None:
        return src.df
    if src.fmt == "parquet":
        declared = normalize_schema(src.schema, src.columns)
        if declared is None and src.schema is not None:
            # positional list: resolve names against one footer
            declared = normalize_schema(
                src.schema, spark.read.parquet(src.path).columns
            )
        if declared is not None:
            return _read_parquet_schema_groups(spark, src, declared)
        return spark.read.parquet(src.path)
    if src.fmt == "orc":
        # ORC: same columnar stance as parquet (vectorized scan, footer
        # stats pushdown). Declared schemas use cast-through semantics
        # (≈ ParquetSrc force_schema); mixed-physical-schema directories
        # are not special-cased — ORC readers resolve by name.
        files = (
            list_source_files(src)
            if os.path.exists(src.path) and os.path.isdir(src.path)
            else [src.path]
        )
        if not files:
            raise FileNotFoundError(
                f"Source {src.name!r}: no .orc files found in {src.path}"
            )
        # format().load(list): pyspark 4's read.orc(*paths) varargs form
        # rejects a second positional path (parses it as an option)
        df = spark.read.format("orc").load(files)
        declared = normalize_schema(src.schema, src.columns or df.columns)
        if declared is not None:
            return _cast_to_declared(df, declared)
        return df
    if src.fmt == "json":
        # JSONL (one object per line, Spark's default JSON mode; .gz
        # transparently decompressed). Same PERMISSIVE-with-declared-schema
        # stance as CSV: mistyped fields null out, opt into FAILFAST via
        # csv_options. Schema inference only when no schema is declared —
        # at scale the inference pass is a full extra read; declare one.
        reader = spark.read
        for k, v in src.csv_options.items():
            reader = reader.option(k, v)
        local = os.path.exists(src.path)
        files = list_source_files(src) if local else [src.path]
        if local and not files:
            raise FileNotFoundError(
                f"Source {src.name!r}: no .json(l)[.gz] files found in {src.path}"
            )
        declared = normalize_schema(src.schema, src.columns)
        target = files if local else src.path
        if declared is not None:
            return reader.schema(declared).json(target)
        return reader.json(target)
    # CSV: resolve positional schemas against the header and read with the
    # declared StructType. PERMISSIVE (cells that do not parse as the
    # declared type become null) is the parity-correct default: the
    # reference's own fixtures carry unparseable cells that its cast
    # semantics null out (e.g. the all-null TradeID in the golden outputs).
    # Pass csv_options={"mode": "FAILFAST"} to fail loudly instead.
    reader = spark.read.option("header", "true")
    for k, v in src.csv_options.items():
        reader = reader.option(k, v)
    sep = str(src.csv_options.get("sep", src.csv_options.get("delimiter", ",")))

    # Local paths: resolve the EXPLICIT file list (chronological order) so a
    # stray file in the directory is never silently parsed, and zip archives
    # get the decompressing reader (Spark's CSV codec path has no zip).
    local = os.path.exists(src.path)
    files = list_source_files(src) if local else [src.path]
    if local and not files:
        raise FileNotFoundError(
            f"Source {src.name!r}: no csv, csv.gz, or zip files found in {src.path}"
        )
    zipped = local and any(f.endswith(".zip") for f in files)

    columns = src.columns
    if columns is None and src.schema is not None and not hasattr(src.schema, "fields"):
        if not hasattr(src.schema, "items"):  # positional list: sniff header
            columns = (
                _csv_header(files[0], sep) if local else reader.csv(src.path).columns
            )
    declared = normalize_schema(src.schema, columns)
    if local and src.validate_headers and declared is not None:
        validate_csv_headers(files, [f.name for f in declared.fields], sep=sep)
    if zipped:
        if declared is None:
            raise ValueError(
                f"Source {src.name!r}: .zip CSV sources need a declared "
                "schema (Spark cannot infer through the archive reader)"
            )
        return _read_csv_zip(spark, files, declared, src.csv_options)
    target = files if local else src.path
    if declared is not None:
        return reader.schema(declared).csv(target)
    return reader.option("inferSchema", "true").csv(target)


def _csv_header(path: str, sep: str = ",") -> List[str]:
    """Driver-side read of one header line (plain / .gz / .zip member)."""
    import csv as _csv
    import gzip
    import io
    import zipfile

    if path.endswith(".gz"):
        with gzip.open(path, "rt", encoding="utf-8", newline="") as fh:
            return next(_csv.reader(fh, delimiter=sep))
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            member = next(
                (n for n in zf.namelist() if n.lower().endswith(".csv")), None
            )
            if member is None:
                raise RuntimeError(f"source [{path}]: no .csv member in archive")
            with zf.open(member) as raw:
                fh = io.TextIOWrapper(raw, encoding="utf-8", newline="")
                return next(_csv.reader(fh, delimiter=sep))
    with open(path, "rt", encoding="utf-8", newline="") as fh:
        return next(_csv.reader(fh, delimiter=sep))


def validate_csv_headers(
    files: List[str], expected: List[str], *, sep: str = ","
) -> None:
    """P6 malformed-file guard ≈ reference _check_transform_headers_on_load
    + _check_column_order (core.py:949-989): every file's header must
    contain the declared columns (superset), match the declared column
    count, and be in the declared order — the order check matters here
    because Spark's CSV reader binds a user schema POSITIONALLY
    (enforceSchema), so a reordered file would misparse silently."""
    for f in files:
        hdr = _csv_header(f, sep)
        if len(hdr) != len(expected):
            raise RuntimeError(
                f"source [{f}] seems to be in the wrong format. Number of "
                f"columns does not match: expected {len(expected)} "
                f"{expected}, found {len(hdr)} {hdr}"
            )
        if not all(c in hdr for c in expected):
            raise RuntimeError(
                f"source [{f}] seems to be in the wrong format. Headers do "
                f"not match\n...should contain: {expected}\n"
                f"...instead contains: {hdr}"
            )
        if hdr != list(expected):
            raise ValueError(
                f"source [{f}]: column order is incorrect. "
                f"Expected: {list(expected)}, got: {hdr}"
            )


def _read_csv_zip(
    spark: SparkSession, files: List[str], declared: T.StructType, csv_options
) -> DataFrame:
    """Zipped CSV sources (reference reads these natively,
    datasources.py:273,328-337). Spark's CSV datasource decompresses gzip
    codecs but not zip archives, so: one ``binaryFile`` row per archive →
    members decompressed and split into data lines inside an Arrow-batched
    ``mapInPandas`` (bounded batches, headers skipped) → ``from_csv`` does
    the actual parsing JVM-side with the SAME parser/options semantics as
    the plain path. Parallelism = #archives; archive bytes never reach the
    driver."""
    import pandas as pd  # noqa: F401 (executor-side)

    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in declared.fields
    )
    opts = {k: str(v) for k, v in csv_options.items() if k != "header"}

    def _lines(it):
        import io
        import zipfile

        import pandas as pd

        for pdf in it:
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for m in zf.namelist():
                        if not m.lower().endswith(".csv"):
                            continue
                        with zf.open(m) as raw:
                            txt = io.TextIOWrapper(
                                raw, encoding="utf-8", newline=""
                            )
                            buf: List[str] = []
                            for i, line in enumerate(txt):
                                if i == 0:
                                    continue  # header (validated upstream)
                                line = line.rstrip("\r\n")
                                if line:
                                    buf.append(line)
                                if len(buf) >= 10_000:
                                    yield pd.DataFrame({"__line": buf})
                                    buf = []
                            if buf:
                                yield pd.DataFrame({"__line": buf})

    bin_df = spark.read.format("binaryFile").load(files).select("content")
    lines = bin_df.mapInPandas(_lines, schema="__line string")
    return lines.select(F.from_csv("__line", ddl, opts).alias("__r")).select("__r.*")


def build_source_df(spark: SparkSession, src: SourceConfig, src_id: int) -> DataFrame:
    """Read + normalize one source (see module docstring)."""
    df = _read_raw(spark, src)
    drop = [c for c in src.remove_cols if c in df.columns]
    if drop:
        df = df.drop(*drop)
    if src.ts_col not in df.columns:
        raise ValueError(
            f"Source {src.name!r}: timestamp column {src.ts_col!r} not in {df.columns}"
        )

    ts = F.col(src.ts_col)
    if src.ts_converter is not None:
        # Preserve the original column as __{ts_col} (core.py:942-946).
        df = df.withColumn(f"__{src.ts_col}", ts)
        ts_ms = src.ts_converter(ts).cast(T.LongType())
    else:
        ts_ms = ts_epoch_ms_col(df, src.ts_col, int_epoch="ms")
    df = df.withColumn(TS_COL, ts_ms)
    if src.ts_col != TS_COL:
        df = df.drop(src.ts_col)

    # __seq: arrival order within the source (file listing order × row order)
    # — monotonically_increasing_id is deterministic for a fixed file layout
    # and never collides across partitions; used only as a sort tiebreaker.
    return df.withColumn(SRC_ID_COL, F.lit(src_id).cast("int")).withColumn(
        SEQ_COL, F.monotonically_increasing_id()
    )


_EXTS = {
    "csv": (".csv", ".csv.gz", ".zip"),
    "parquet": (".parquet",),
    "json": (".json", ".jsonl", ".json.gz", ".jsonl.gz"),
    "orc": (".orc",),
}


def list_source_files(src: SourceConfig) -> List[str]:
    """Chronologically ordered file list (reference FilesSrc.sort_data,
    datasources.py:189-212): sort by ``int(re.findall(regex, name)[idx])``,
    falling back to lexicographic when the key doesn't parse.

    CSV directories must be compression-homogeneous (reference
    _check_compression, datasources.py:320-337): mixing .csv / .csv.gz /
    .zip in one source is rejected loudly."""
    if os.path.isfile(src.path):
        return [src.path]
    names = [n for n in os.listdir(src.path) if n.endswith(_EXTS[src.fmt])]
    if src.fmt == "csv":
        kinds = {
            ".zip" if n.endswith(".zip") else ".csv.gz" if n.endswith(".gz") else ".csv"
            for n in names
        }
        if len(kinds) > 1:
            raise RuntimeError(
                f"More than one compression file type found in {src.path}: "
                f"{sorted(kinds)}"
            )

    def key(n: str):
        try:
            return (0, int(re.findall(src.file_sort_regex, n)[src.file_sort_idx]), n)
        except (IndexError, ValueError):
            return (1, 0, n)

    return [os.path.join(src.path, n) for n in sorted(names, key=key)]


def probe_source_window(spark: SparkSession, src: SourceConfig) -> Tuple[int, int]:
    """Per-source processing window: (first row of the chronologically first
    file, last row of the last file), in epoch ms after ts normalization.

    ≈ reference _get_global_proc_start_end_from_files (core.py:738-872,
    datasources.py:266-292): deliberately row-position-based, NOT min/max —
    out-of-order rows before the first row / after the last row fall outside
    the window and are dropped, matching the reference's replay semantics.

    Cost: two single-file scans with limit/tail — negligible at any scale.
    For prebuilt-DataFrame or non-local sources there is no file order, so
    min/max of the timestamp axis is used instead.
    """
    if src.df is not None or not os.path.exists(src.path):
        df = build_source_df(spark, src, 0)
        row = df.agg(F.min(TS_COL).alias("a"), F.max(TS_COL).alias("b")).head()
        return row["a"], row["b"]
    files = list_source_files(src)
    if not files:
        raise FileNotFoundError(f"Source {src.name!r}: no {src.fmt} files in {src.path}")
    first_df = build_source_df(spark, replace(src, path=files[0]), 0)
    head = first_df.select(TS_COL).head(1)
    last_df = (
        first_df
        if len(files) == 1
        else build_source_df(spark, replace(src, path=files[-1]), 0)
    )
    tail = last_df.select(TS_COL).tail(1)
    # Empty first/last file (e.g. header-only CSV) → (None, None): the
    # fuser warns and skips the source instead of crashing on [0][0].
    if not head or not tail:
        return None, None
    return head[0][0], tail[0][0]


def iso_string_to_epoch_ms(col):
    """Canonical ts_converter: ISO-8601 string → epoch ms.

    ≈ the reference's canonical convert_timestamp_function example
    (examples/demo_spread_trades_memecoin.py:21-27:
    str.strptime(Datetime).dt.epoch('ms'))."""
    return F.unix_millis(F.to_timestamp(col))


def parquet_footer_cuts(
    path: str, col: str, n: int, *, to_ms: bool = False
) -> Optional[List[float]]:
    """Range-bucket cut points for ``col`` interpolated from parquet FOOTER
    row-group ``(min, max, rows)`` statistics — a metadata-only read, no
    data pass. Replaces a driver-side ``approxQuantile`` job when the input
    is a parquet table on disk: at 100 TB the quantile sketch is a full
    input scan serialized on the driver before the real job starts, while
    footers are O(#files) kilobyte reads the scan planner touches anyway.

    Each row group's rows are modeled as uniform on ``[min, max]`` and the
    returned cuts are the ``n``-quantile points of that mixture. Cuts feed
    :func:`operators.fill.forward_fill`'s ``bounds`` parameter, which by
    contract controls TASK BALANCE only, never results — so the uniform
    model being approximate is harmless, and for time-ordered event data it
    is a close proxy for the true quantiles.

    ``to_ms=True`` converts timestamp columns to epoch-ms floats (matching
    ``ts_epoch_ms_col``; naive timestamps are interpreted as UTC, same as
    the UTC-pinned session). Returns ``None`` when the path has no local
    parquet files, the column is absent or lacks stats in every row group,
    or pyarrow is unavailable — callers then fall back to the sketch.
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as patypes
    except ImportError:
        return None
    if os.path.isfile(path):
        files = [path]
    elif os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    else:
        return None
    if not files or n < 2:
        return None

    segments: List[Tuple[float, float, int]] = []  # (lo, hi, rows)
    divisor = 1.0
    try:
        for fp in files:
            pf = pq.ParquetFile(fp)
            names = pf.metadata.schema.names
            if col not in names:
                return None
            field_type = pf.schema_arrow.field(col).type
            if patypes.is_timestamp(field_type):
                divisor = {"s": 1e-3, "ms": 1.0, "us": 1e3, "ns": 1e6}[
                    field_type.unit
                ]
            elif not (
                patypes.is_integer(field_type) or patypes.is_floating(field_type)
            ):
                return None
            idx = names.index(col)
            md = pf.metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                st = rg.column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = float(st.min_raw) / divisor
                hi = float(st.max_raw) / divisor
                if hi < lo:
                    lo, hi = hi, lo
                segments.append((lo, hi, rg.num_rows))
    except (OSError, ValueError, KeyError):
        return None
    if not segments:
        return None

    segments.sort()
    total = sum(rows for _, _, rows in segments)
    if total <= 0:
        return None
    cuts: List[float] = []
    seg_i, cum = 0, 0.0
    for k in range(1, n):
        target = total * k / n
        while seg_i < len(segments) and cum + segments[seg_i][2] < target:
            cum += segments[seg_i][2]
            seg_i += 1
        if seg_i >= len(segments):
            break
        lo, hi, rows = segments[seg_i]
        frac = (target - cum) / rows if rows else 0.0
        cuts.append(lo + (hi - lo) * frac)
    return sorted(set(cuts)) or None
