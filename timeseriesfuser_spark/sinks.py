"""Batched file sinks + results surface.

≈ reference BatchHandler file output (classes.py:454-534): rolling
``output-N`` files every ``save_every_n_batch`` rows, optional accumulated
FULLDATA file at finalize, csv / csv.gz / parquet formats, and a results
dict (classes.py:434-441, core.py:874-914).

Spark-first: the rolling-file behavior is ``maxRecordsPerFile`` on a single
distributed write — no driver-side buffering, any number of executors write
in parallel. The reference's per-row append loop exists because it streams
on one node; here the "batching" is a property of the committed files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame


@dataclass
class SinkResult:
    """≈ BatchHandler.get_results() (classes.py:434-441)."""

    output_path: Optional[str] = None
    fulldata_path: Optional[str] = None
    rows: Optional[int] = None
    files: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "output_path": self.output_path,
            "fulldata_path": self.fulldata_path,
            "rows": self.rows,
            "files": list(self.files),
        }


def _writer(df: DataFrame, fmt: str, compress: bool):
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
        if compress:
            w = w.option("compression", "gzip")
    elif fmt == "json":
        # JSONL (one object per line) — the interchange format LLM
        # training pipelines consume; .gz per-file compression.
        if compress:
            w = w.option("compression", "gzip")
    elif fmt == "parquet":
        # snappy default matches the reference's parquet output
        # (classes.py:529-534).
        pass
    elif fmt == "orc":
        pass  # zlib default; columnar like parquet
    else:
        raise ValueError(f"Unsupported sink format: {fmt!r}")
    return w


def write_batched(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    rows_per_file: Optional[int] = None,
    compress: bool = False,
    fulldata: bool = False,
    fulldata_name: str = "FULLDATA",
    count_rows: bool = False,
) -> SinkResult:
    """Write ``df`` as rolling batch files (+ optional single FULLDATA file).

    ``rows_per_file`` ≈ save_every_n_batch (classes.py:480-490): each
    committed file holds at most that many rows. ``fulldata=True`` also
    writes one consolidated file set under ``<path>/<fulldata_name>``
    (classes.py:516-527 accumulates and writes FULLDATA at finalize).
    """
    out_dir = os.path.join(path, "batches")
    w = _writer(df, fmt, compress)
    if rows_per_file:
        w = w.option("maxRecordsPerFile", rows_per_file)
    getattr(w, fmt)(out_dir)

    result = SinkResult(output_path=out_dir)
    if fulldata:
        fd_dir = os.path.join(path, fulldata_name)
        # coalesce(1) mirrors the reference's single accumulated file; for
        # huge outputs prefer fulldata=False and treat the batch dir as the
        # dataset (single-file consolidation is inherently one task).
        getattr(_writer(df.coalesce(1), fmt, compress), fmt)(fd_dir)
        result.fulldata_path = fd_dir
    if count_rows:
        result.rows = df.count()
    ext = {"parquet": ".parquet", "csv": ".csv", "json": ".json", "orc": ".orc"}[fmt]
    # Local convenience listing only: on s3a://hdfs:// the write above
    # already succeeded — never fail the call over an os-level listdir.
    result.files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith((ext, ext + ".gz"))
    ) if os.path.isdir(out_dir) else []
    return result


def write_time_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "__timestamp",
    granularity: str = "day",
    fmt: str = "parquet",
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> SinkResult:
    """Hive-layout time-partitioned write: ``path/dt=YYYY-MM-DD/…`` (or
    ``dt=YYYY-MM-DD-HH`` with granularity='hour') derived from the
    epoch-ms ``ts_col``.

    This is the standard lake layout that makes the engine's own
    time-window predicates (P4) partition-PRUNING at read time: a
    ``filter(ts between …)`` on ``spark.read.parquet(path)`` with the
    matching ``dt`` predicate touches only the in-window directories, so
    a day query over a year of data reads 1/365th of the files. Writers
    scale out per partition; ``max_records_per_file`` bounds file sizes
    inside each partition (S8's rolling-file behavior, per partition).
    """
    from pyspark.sql import functions as F

    if granularity not in ("day", "hour"):
        raise ValueError(f"granularity must be day|hour: {granularity!r}")
    # Integer epoch arithmetic, NOT date_format(timestamp_millis(...)):
    # the latter renders in spark.sql.session.timeZone, so a non-UTC
    # session would silently shift rows across partition boundaries.
    # floor (not DIV) keeps pre-1970 timestamps on the correct day.
    ts = F.col(ts_col).cast("long")
    day = F.date_add(
        F.to_date(F.lit("1970-01-01")),
        F.floor(ts / F.lit(86_400_000.0)).cast("int"),
    )
    dt = day.cast("string")
    if granularity == "hour":
        hour = F.pmod(F.floor(ts / F.lit(3_600_000.0)), F.lit(24)).cast("int")
        dt = F.concat(dt, F.lit("-"), F.lpad(hour.cast("string"), 2, "0"))
    out = df.withColumn("dt", dt)
    w = out.write.mode(mode).partitionBy("dt")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)
    parts = sorted(
        d for d in os.listdir(path) if d.startswith("dt=")
    ) if os.path.isdir(path) else []
    return SinkResult(output_path=path, files=parts)


def export_training_shards(
    df: DataFrame,
    path: str,
    *,
    shard_bytes: int = 64_000_000,
    order_col: str = "doc_id",
    text_col: str = "text",
    compress: bool = True,
) -> "DataFrame":
    """Export a document corpus as size-bounded JSONL training shards +
    a manifest — the hand-off format LLM data loaders consume.

    Shard assignment is :func:`ops.packing.byte_shards` (deterministic
    prefix-sum layout in ``order_col`` order, whole docs, ~``shard_bytes``
    per shard); each shard lands under ``path/shards/shard=N/`` as JSONL
    (.gz with ``compress``), and ``path/_manifest`` holds one JSON row per
    shard: ``shard``, ``n_docs``, ``n_bytes``, ``content_sha256`` (sha256
    over the per-doc sha256 hex digests in ``order_col`` order — an
    order-sensitive, engine-reproducible shard fingerprint a consumer
    can verify without re-reading the corpus in one task).

    Returns the manifest DataFrame. Scale: the byte prefix sum is the
    two-pass range-bucketed scheme (no global window); the write scales
    out per shard partition; per-shard manifest state is bounded by docs
    per shard (~shard_bytes / avg doc size).
    """
    from pyspark.sql import functions as F

    from timeseriesfuser_spark.ops.packing import byte_shards

    work = df.withColumn(
        "__nb", F.coalesce(F.octet_length(F.col(text_col)), F.lit(0)).cast("long")
    )
    assign = byte_shards(
        work.select(order_col, F.col("__nb").alias("n_bytes")),
        shard_bytes,
        order_col=order_col,
        bytes_col="n_bytes",
        id_cols=[order_col],
    ).select(order_col, "shard", "shard_offset")
    sharded = work.join(assign, order_col).drop("__nb")
    # Spark's JSON writer OMITS null fields — a NULL-text doc would land
    # with no 'text' key while the manifest fingerprints it as sha256('').
    # Write the same convention the digest uses: NULL text -> '' (ADVICE r5).
    sharded = sharded.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )

    w = sharded.write.mode("overwrite").partitionBy("shard")
    if compress:
        w = w.option("compression", "gzip")
    w.json(os.path.join(path, "shards"))

    from timeseriesfuser_spark.ops.packing import shard_manifest

    manifest = shard_manifest(
        df, shard_bytes, order_col=order_col, text_col=text_col
    )
    manifest.coalesce(1).write.mode("overwrite").json(
        os.path.join(path, "_manifest")
    )
    return manifest
