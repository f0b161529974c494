"""CDC change-feed sources.

The feed is a directory of immutable parquet "log segments" — the
binlog/WAL-tail abstraction. Spark's file stream source tracks consumed
files in the checkpoint, giving resumable, exactly-once *reads*;
the merge kernel's ledger makes the *writes* idempotent, so the
end-to-end pipeline is exactly-once.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cdc_schema(include_tool: bool = True) -> T.StructType:
    fields = [
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("commit_lsn", T.LongType()),
    ]
    if not include_tool:
        fields = [f for f in fields if f.name != "tool"]
    return T.StructType(fields)


def cdc_file_stream(
    spark: SparkSession,
    log_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Tail a directory of parquet log segments as a stream."""
    reader = spark.readStream.schema(schema or cdc_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(log_dir)


def write_log_segments(
    log: DataFrame,
    log_dir: str,
    *,
    segment_col: str = "lsn",
    n_segments: int = 8,
) -> list[str]:
    """Materialize a change log as ordered parquet segments (test/bench
    helper — a real deployment tails an actual binlog landing zone).
    Segments are written one directory each so a file stream picks them
    up in deterministic units."""
    import glob
    import shutil
    import uuid

    os.makedirs(log_dir, exist_ok=True)
    bounds = log.agg(F.min(segment_col), F.max(segment_col)).collect()[0]
    lo, hi = int(bounds[0]), int(bounds[1]) + 1
    step = max(1, (hi - lo + n_segments - 1) // n_segments)
    paths = []
    staging = os.path.join(log_dir, f"_staging_{uuid.uuid4().hex}")
    for i in range(n_segments):
        a, b = lo + i * step, min(lo + (i + 1) * step, hi)
        if a >= b:
            break
        log.filter((F.col(segment_col) >= a) & (F.col(segment_col) < b)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        # the file stream source lists flat files, so segments must be
        # plain parquet files, not spark output directories
        seg = os.path.join(log_dir, f"segment_{uuid.uuid4().hex[:8]}_{i:05d}.parquet")
        shutil.move(part, seg)
        paths.append(seg)
    # strictly increasing mtimes: FileStreamSource orders by modification
    # time, and same-instant writes would make segment (≈ watermark
    # advance) order nondeterministic
    base_t = time.time() - len(paths)
    for j, seg in enumerate(paths):
        os.utime(seg, (base_t + j, base_t + j))
    shutil.rmtree(staging, ignore_errors=True)
    return paths


def cdc_json_stream(
    spark: SparkSession,
    wire_dir: str,
    *,
    row_schema: "T.StructType | None" = None,
    max_files_per_trigger: int | None = None,
    codec: str = "debezium",
) -> DataFrame:
    """Tail a directory of JSON change-envelope files (newline-
    delimited — the raw binlog/WAL wire format) as a change-event
    stream. ``text`` source + ``from_json`` decode: same checkpointed
    exactly-once file tracking as :func:`cdc_file_stream`, with the
    envelope decode fused into the first map stage (codegen'd Jackson —
    no per-row Python).

    ``codec`` selects the wire format: ``debezium`` (default),
    ``maxwell``, ``canal``, or ``wal2json`` — the four formats a
    WAL/binlog tail commonly lands in; all four decode to the identical
    engine change-event shape, so the downstream apply is
    format-agnostic."""
    from ..sources import canal, debezium, maxwell, wal2json

    codecs = {
        "debezium": debezium,
        "maxwell": maxwell,
        "canal": canal,
        "wal2json": wal2json,
    }
    if codec not in codecs:
        raise ValueError(f"unknown wire codec {codec!r}; choose from {sorted(codecs)}")
    if row_schema is None:
        row_schema = T.StructType(
            [f for f in cdc_schema().fields if f.name not in ("op", "lsn", "commit_lsn")]
        )
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(wire_dir)
    return codecs[codec].decode_envelopes(raw, row_schema)
