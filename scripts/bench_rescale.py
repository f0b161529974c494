"""Bucket-rescale maintenance-op artifact: build a table with MOR
applies, then `rescale_buckets` it to 4x the bucket count and measure
the rewrite. Records wall seconds and rows/sec for the one O(table)
operation the engine schedules (partition-spec evolution), plus a
before/after state-hash equality check so the artifact carries its own
correctness evidence — the rewrite must be a pure re-layout.

Env: RESCALE_EVENTS (default 16M), RESCALE_CPUS (32), RESCALE_FROM (32),
RESCALE_TO (128), RESCALE_BATCHES (4), BENCH_CALM_MAX_WAIT_S.
Output: one JSON report (committed as bench_runs/RESCALE_r*.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, "{repo}")
import tempfile
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/bench_rescale", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_rescale"
from pyspark.sql import functions as F
from digital_analytics_data_platform_spark.session import get_spark
from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes, rescale_buckets
from digital_analytics_data_platform_spark.lake.table import DELETED_COL
from bench import wait_calm_window, _steal_seconds

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
from_b = int(sys.argv[4]); to_b = int(sys.argv[5])
calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
if calm_max > 0:
    wait_calm_window(calm_max)
extra = {{}}
if os.path.isdir("/dev/shm"):
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark("rescale-bench", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4, extra_conf=extra)
spark.range(1).count()

tdir = tempfile.mkdtemp(prefix="rescale_tbl_")
log = datagen.change_log(spark, n_events, n_convs=max(1000, n_events // 400), turns_per_conv=40)
schema = log.drop("op", "lsn").schema
tbl = LakeTable.create(os.path.join(tdir, "t"), schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=from_b)
per = n_events // n_batches
for i in range(n_batches):
    b = log.filter((F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per))
    merge_changes(spark, tbl, b, batch_key=f"b{{i}}", strategy="mor", write_salt=2)

def state_hash():
    df = tbl.read(spark, include_deleted=True)
    return df.select(
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, text, cast(" + DELETED_COL + " as string)))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]

before = state_hash()
s0 = _steal_seconds()
t0 = time.monotonic()
rows = rescale_buckets(spark, tbl, to_b, write_salt=2)
wall = time.monotonic() - t0
steal = _steal_seconds() - s0
after = state_hash()
snap = tbl.snapshot()
print("RESULT " + json.dumps({{
    "events_applied": n_events,
    "rows_rewritten": rows,
    "rescale_wall_s": round(wall, 3),
    "rescale_rows_per_sec": round(rows / wall, 1),
    "steal_cpu_s": round(steal, 2),
    "from_buckets": from_b,
    "to_buckets": snap.n_buckets,
    "state_hash_equal": (before["h"] == after["h"] and before["n"] == after["n"]),
    "state_rows": int(after["n"]),
}}))
spark.stop()
"""


def main() -> None:
    n_events = int(os.environ.get("RESCALE_EVENTS", "16000000"))
    n_batches = int(os.environ.get("RESCALE_BATCHES", "4"))
    cpus = int(os.environ.get("RESCALE_CPUS", "32"))
    from_b = int(os.environ.get("RESCALE_FROM", "32"))
    to_b = int(os.environ.get("RESCALE_TO", "128"))
    code = RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_events), str(n_batches), str(from_b), str(to_b)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    stats = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            stats = json.loads(line[len("RESULT ") :])
    if stats is None:
        raise RuntimeError(f"no RESULT:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
    print(json.dumps({"cpus": cpus, "batches": n_batches, **stats}, indent=2))


if __name__ == "__main__":
    main()
