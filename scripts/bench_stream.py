"""Structured-Streaming-path throughput + resume artifact at 10^8
events — the deployment shape the north star names (readStream over a
binlog landing zone → checkpointed foreachBatch MERGE), measured
end-to-end rather than by driving merge_changes directly.

Three phases, one JSON report:

1. **Stream apply**: 10^8 events landed as parquet segments (untimed,
   the landing zone), then ``apply_stream`` (availableNow +
   maxFilesPerTrigger micro-batching, MOR strategy) replays them
   through the checkpointed foreachBatch apply. Reported ev/s includes
   ALL streaming overhead: checkpoint commits, ledger writes,
   per-batch metrics files.
2. **Checkpoint resume**: more segments land; the SAME query restarts
   from the checkpoint and applies only the new ones (offsets prove
   resumability; replayed batch keys are ledger-skipped).
3. **Batch-path equality**: the identical log applied via plain
   ``merge_changes`` batches must produce a byte-identical final state
   (order-insensitive xxhash64 digests) — the streaming machinery adds
   zero semantic drift.

Env: STREAM_EVENTS (default 10^8), STREAM_CPUS (default all),
STREAM_SEGMENTS (default 16), STREAM_FILES_PER_TRIGGER (default 2).
Output: bench_runs/STREAM_r*.json.
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
    os.makedirs("/dev/shm/bench_stream", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_stream"

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from digital_analytics_data_platform_spark import datagen  # noqa: E402
from digital_analytics_data_platform_spark.lake import (  # noqa: E402
    LakeTable,
    compact,
    merge_changes,
)
from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402
from digital_analytics_data_platform_spark.streaming import apply_stream  # noqa: E402

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
BUSINESS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]


def digest(spark, tbl) -> dict:
    hashed = tbl.read(spark).select(
        F.xxhash64(*[F.col(c).cast("string") for c in BUSINESS]).alias("h")
    )
    row = hashed.agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr("bit_xor(h)").alias("xor"),
    ).collect()[0]
    return {"rows": int(row["rows"]), "xor": int(row["xor"])}


def make_table(path: str) -> LakeTable:
    business = T.StructType([f for f in SCHEMA.fields if f.name not in ("op", "commit_lsn")])
    return LakeTable.create(path, business, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=64)


def main() -> None:
    n = int(os.environ.get("STREAM_EVENTS", str(10**8)))
    cpus = int(os.environ.get("STREAM_CPUS", str(os.cpu_count() or 32)))
    n_seg = int(os.environ.get("STREAM_SEGMENTS", "16"))
    fpt = int(os.environ.get("STREAM_FILES_PER_TRIGGER", "2"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "stream-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 4, extra_conf=extra
    )
    gen_kw = dict(n_convs=max(1000, n // 1000), turns_per_conv=50, hot_key_frac=0.15)
    root = tempfile.mkdtemp(prefix="stream_bench_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)

    # ---- land the first 3/4 of the log as segment dirs (untimed) ------
    first = (3 * n_seg) // 4
    seg_bounds = [(i * n // n_seg, (i + 1) * n // n_seg) for i in range(n_seg)]
    for i, (lo, hi) in enumerate(seg_bounds[:first]):
        datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"seg_{i:04d}"))
    os.sync()

    tbl = make_table(os.path.join(root, "bronze"))
    ckpt = os.path.join(root, "ckpt")

    def source():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", fpt * cpus)  # ~fpt segments/trigger
            .parquet(os.path.join(landing, "seg_*"))
        )

    # ---- phase 1: stream the landed segments --------------------------
    t0 = time.monotonic()
    _, m1 = apply_stream(
        spark, source(), tbl.path, ckpt,
        pipeline_id="bench", available_now=True, strategy="mor",
    )
    wall1 = time.monotonic() - t0
    ev1 = m1.events

    # ---- phase 2: late segments land; resume from checkpoint ----------
    for i, (lo, hi) in enumerate(seg_bounds[first:], start=first):
        datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"seg_{i:04d}"))
    os.sync()
    t1 = time.monotonic()
    _, m2 = apply_stream(
        spark, source(), tbl.path, ckpt,
        pipeline_id="bench", available_now=True, strategy="mor",
    )
    wall2 = time.monotonic() - t1
    compact(spark, tbl)
    stream_digest = digest(spark, tbl)

    # ---- phase 3: identical log through the plain batch path ----------
    t2 = time.monotonic()
    tbl_b = make_table(os.path.join(root, "bronze_batch"))
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        merge_changes(
            spark, tbl_b,
            datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw),
            batch_key=f"batch:{i}", strategy="mor",
        )
    compact(spark, tbl_b)
    batch_digest = digest(spark, tbl_b)
    wall3 = time.monotonic() - t2

    equal = stream_digest == batch_digest
    report = {
        "events": n,
        "cpus": cpus,
        "segments": n_seg,
        "files_per_trigger": fpt * cpus,
        "stream_phase1": {
            "events": ev1,
            "micro_batches": m1.batches,
            "wall_s": round(wall1, 1),
            "events_per_sec": round(ev1 / wall1, 1),
        },
        "resume_phase2": {
            "events": m2.events,
            "micro_batches": m2.batches,
            "skipped_batches": m2.skipped_batches,
            "wall_s": round(wall2, 1),
            "resumed_from_checkpoint": m2.events == n - ev1,
        },
        "stream_total_events": ev1 + m2.events,
        "batch_path_wall_s": round(wall3, 1),
        "stream_state": stream_digest,
        "batch_state": batch_digest,
        "stream_equals_batch": equal,
    }
    print(json.dumps(report, indent=2))
    spark.stop()
    sys.exit(0 if equal and (ev1 + m2.events) == n else 1)


if __name__ == "__main__":
    main()
