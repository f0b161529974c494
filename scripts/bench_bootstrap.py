"""Snapshot-bootstrap artifact: initial load of an existing source
table interleaved with the live CDC tail (streaming/bootstrap.py — the
DBLog / Debezium-incremental-snapshot shape).

Scenario: a source table holding the LWW state of a 16M-event change-
log prefix must be loaded into a fresh lake table while the 8M-event
live tail keeps applying. Three runs on identical inputs:

- sequential: all snapshot chunks, THEN the tail stream (the naive
  "pause CDC for the snapshot" deployment);
- interleaved: ``bootstrap_stream`` — chunks race the checkpointed
  tail micro-batches through the commit CAS (the DBLog deployment);
- full-history reference: the ENTIRE 24M-event log applied through the
  kernel — the truth the bootstrap must converge to.

All three final states must be digest-equal on the business columns
(lsn excluded by design: keys whose winner predates the snapshot point
carry the sentinel). The feed is split-consistent (``ooo_window_s=1``)
so unversioned full-history equivalence is exact — the bounded-
disorder precondition documented in streaming/bootstrap.py.

Env: BOOT_PREFIX_EVENTS (default 16*10^6), BOOT_TAIL_EVENTS (default
8*10^6), BOOT_CPUS (default all), BOOT_CHUNKS (default 32),
BOOT_SEGMENTS (default 16), BOOT_RETRIES (default 50), BOOT_REF
(default 1 — set 0 to skip the full-history reference run),
BENCH_CALM_MAX_WAIT_S. Output: bench_runs/BOOTSTRAP_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/bench_boot", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_boot"

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from bench import _steal_seconds, wait_calm_window  # noqa: E402
from digital_analytics_data_platform_spark import datagen  # noqa: E402
from digital_analytics_data_platform_spark.lake import LakeTable  # noqa: E402
from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402
from digital_analytics_data_platform_spark.streaming import apply_stream  # noqa: E402
from digital_analytics_data_platform_spark.streaming.bootstrap import (  # noqa: E402
    apply_snapshot_chunks,
    bootstrap_stream,
)

SCHEMA = T.StructType(
    [
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
)
BUSINESS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def digest(spark, tbl) -> dict:
    hashed = tbl.read(spark).select(
        F.xxhash64(*[F.col(c).cast("string") for c in BUSINESS]).alias("h")
    )
    row = hashed.agg(F.count(F.lit(1)).alias("rows"), F.expr("bit_xor(h)").alias("xor")).collect()[0]
    return {"rows": int(row["rows"]), "xor": int(row["xor"])}


def make_table(path: str) -> LakeTable:
    business = T.StructType([f for f in SCHEMA.fields if f.name not in ("op", "commit_lsn")])
    return LakeTable.create(path, business, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=64)


def main() -> None:
    n_prefix = int(os.environ.get("BOOT_PREFIX_EVENTS", str(16 * 10**6)))
    n_tail = int(os.environ.get("BOOT_TAIL_EVENTS", str(8 * 10**6)))
    cpus = int(os.environ.get("BOOT_CPUS", str(os.cpu_count() or 32)))
    chunks = int(os.environ.get("BOOT_CHUNKS", "32"))
    n_seg = int(os.environ.get("BOOT_SEGMENTS", "16"))
    retries = int(os.environ.get("BOOT_RETRIES", "50"))
    run_ref = os.environ.get("BOOT_REF", "1") not in ("0", "")
    calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
    n = n_prefix + n_tail
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "boot-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 4, extra_conf=extra
    )
    # split-consistent feed: ooo_window_s=1 → zero jitter (see module doc)
    gen_kw = dict(
        n_convs=max(1000, n // 1000), turns_per_conv=50, hot_key_frac=0.15, ooo_window_s=1
    )
    root = tempfile.mkdtemp(prefix="boot_bench_")

    # ---- untimed setup: source snapshot parquet + tail segments --------
    prefix = datagen.change_log(spark, n, id_range=(0, n_prefix), **gen_kw)
    valid = (
        F.col("conv_id").isNotNull() & (F.col("turn_idx") >= 0) & F.col("lsn").isNotNull()
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("ts"), F.desc("lsn"))
    snap_path = os.path.join(root, "source_snapshot")
    (
        prefix.filter(valid)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("op") != "D")
        .drop("rn", "op", "commit_lsn", "lsn")  # unversioned: payload + ts only
        .write.mode("overwrite")
        .parquet(snap_path)
    )
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    bounds = [
        (n_prefix + i * n_tail // n_seg, n_prefix + (i + 1) * n_tail // n_seg)
        for i in range(n_seg)
    ]
    for i, (lo, hi) in enumerate(bounds):
        datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw).write.mode(
            "overwrite"
        ).parquet(os.path.join(feed, f"seg_{i:04d}"))
    os.sync()
    snapshot_df = spark.read.parquet(snap_path)
    snapshot_rows = snapshot_df.count()

    def source():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 2 * cpus)
            .parquet(os.path.join(feed, "seg_*"))
        )

    # ---- sequential: chunks first, then the tail -----------------------
    if calm_max > 0:
        wait_calm_window(calm_max)
    t_seq = make_table(os.path.join(root, "seq"))
    s0, t0 = _steal_seconds(), time.monotonic()
    apply_snapshot_chunks(
        spark, t_seq, snapshot_df, snapshot_lsn=n_prefix, chunks=chunks,
        conflict_retries=retries,
    )
    wall_seq_chunks = time.monotonic() - t0
    t1 = time.monotonic()
    _, m_seq = apply_stream(
        spark, source(), t_seq.path, os.path.join(root, "ckpt_seq"),
        pipeline_id="seq", available_now=True, strategy="mor",
        conflict_retries=retries,
    )
    wall_seq_tail = time.monotonic() - t1
    wall_seq = time.monotonic() - t0
    steal_seq = _steal_seconds() - s0
    d_seq = digest(spark, t_seq)

    # ---- interleaved: chunks race the live tail ------------------------
    if calm_max > 0:
        wait_calm_window(calm_max)
    t_ilv = make_table(os.path.join(root, "ilv"))
    s0, t0 = _steal_seconds(), time.monotonic()
    _, m_ilv, chunk_results = bootstrap_stream(
        spark, snapshot_df, source(), t_ilv.path, os.path.join(root, "ckpt_ilv"),
        snapshot_lsn=n_prefix, chunks=chunks, strategy="mor",
        conflict_retries=retries, available_now=True,
    )
    wall_ilv = time.monotonic() - t0
    steal_ilv = _steal_seconds() - s0
    d_ilv = digest(spark, t_ilv)

    # ---- full-history reference (the truth) ----------------------------
    d_ref = None
    wall_ref = None
    if run_ref:
        from digital_analytics_data_platform_spark.lake.merge import merge_changes

        t_ref = make_table(os.path.join(root, "ref"))
        t0 = time.monotonic()
        step = max(1, n // 8)
        for i in range(0, n, step):
            merge_changes(
                spark,
                t_ref,
                datagen.change_log(spark, n, id_range=(i, min(i + step, n)), **gen_kw),
                batch_key=f"ref:{i}",
                strategy="mor",
            )
        wall_ref = time.monotonic() - t0
        d_ref = digest(spark, t_ref)

    report = {
        "snapshot_rows": snapshot_rows,
        "prefix_events": n_prefix,
        "tail_events": n_tail,
        "cpus": cpus,
        "chunks": chunks,
        "segments": n_seg,
        "sequential_wall_s": round(wall_seq, 2),
        "sequential_chunks_wall_s": round(wall_seq_chunks, 2),
        "sequential_tail_wall_s": round(wall_seq_tail, 2),
        "sequential_steal_cpu_s": round(steal_seq, 2),
        "interleaved_wall_s": round(wall_ilv, 2),
        "interleaved_steal_cpu_s": round(steal_ilv, 2),
        "interleaved_over_sequential_ratio": round(wall_seq / wall_ilv, 3),
        "interleaved_tail_batches": m_ilv.batches,
        "chunk_commits": len([r for r in chunk_results if not r.skipped]),
        "events_per_sec_interleaved": round((n_tail + snapshot_rows) / wall_ilv, 1),
        "state_digest_seq_eq_interleaved": d_seq == d_ilv,
        "state_digest_eq_full_history": (d_ref == d_ilv) if d_ref is not None else None,
        "full_history_wall_s": round(wall_ref, 2) if wall_ref is not None else None,
        "state_rows": d_ilv["rows"],
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
