"""Clustered-compaction payoff artifact: build a MOR table, compact it
unclustered, measure a narrow `ts BETWEEN` window read (files/rows/bytes
scanned + wall), then re-compact with `cluster_by=["ts"]` and measure
the same read. The artifact carries its own correctness evidence: both
reads must return identical row counts, and the clustered rewrite must
preserve the table state hash.

This is the consumption-time half of the 100 TB story: bucket pruning
serves the keyed write path, range clustering serves the dashboard/
backfill window reads — without it every window read scans every file
of every bucket.

Env: CLUSTER_EVENTS (default 16M), CLUSTER_CPUS (32), CLUSTER_BATCHES
(2), CLUSTER_BUCKETS (32), CLUSTER_SALT (8, splits/bucket when
clustering), CLUSTER_WINDOW_FRAC (0.02), BENCH_CALM_MAX_WAIT_S.
Output: one JSON report (committed as bench_runs/CLUSTER_r*.json).
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
    os.makedirs("/dev/shm/bench_cluster", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_cluster"
from datetime import datetime, timezone
from pyspark.sql import functions as F
from digital_analytics_data_platform_spark.session import get_spark
from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.datagen import BASE_EPOCH
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes, compact
from digital_analytics_data_platform_spark.lake.table import DELETED_COL
from bench import wait_calm_window, _steal_seconds

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
n_buckets = int(sys.argv[4]); salt = int(sys.argv[5]); frac = float(sys.argv[6])
calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
if calm_max > 0:
    wait_calm_window(calm_max)
extra = {{}}
if os.path.isdir("/dev/shm"):
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark("cluster-bench", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4, extra_conf=extra)
spark.range(1).count()

tdir = tempfile.mkdtemp(prefix="cluster_tbl_")
log = datagen.change_log(spark, n_events, n_convs=max(1000, n_events // 400), turns_per_conv=40)
schema = log.drop("op", "lsn").schema
tbl = LakeTable.create(os.path.join(tdir, "t"), schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=n_buckets)
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

# the window: the central `frac` of the LIVE rows by ts quantile (LWW
# keeps each key's latest version, so the live ts distribution is
# narrower than the raw event span — quantiles make the window
# guaranteed-nonempty and exactly `frac` of rows)
def iso(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None).isoformat()

def window_read():
    s0 = _steal_seconds(); t0 = time.monotonic()
    pruned = tbl.read(spark, stats_range={{"ts": (lo, hi)}})
    got = pruned.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(conv_id, turn_idx))").alias("h")
    ).collect()[0]
    wall = time.monotonic() - t0
    steal = _steal_seconds() - s0
    scanned = pruned.inputFiles()
    snap = tbl.snapshot()
    sizes = {{os.path.join(tbl.path, f["path"]): f["rows"] for f in snap.files}}
    rows_scanned = 0
    bytes_scanned = 0
    for uri in scanned:
        from urllib.parse import unquote, urlparse
        p = unquote(urlparse(uri).path)
        rows_scanned += sizes.get(p, 0)
        bytes_scanned += os.path.getsize(p) if os.path.exists(p) else 0
    return {{
        "files_total": len(snap.files),
        "files_scanned": len(scanned),
        "rows_scanned": int(rows_scanned),
        "bytes_scanned": int(bytes_scanned),
        "window_rows": int(got["n"]),
        "window_hash": int(got["h"] or 0),
        "read_wall_s": round(wall, 3),
        "steal_cpu_s": round(steal, 2),
    }}

compact(spark, tbl, all_buckets=True)
h0 = state_hash()
qlo, qhi = tbl.read(spark).select(F.unix_timestamp("ts").cast("double").alias("t")).approxQuantile(
    "t", [0.5 - frac / 2, 0.5 + frac / 2], 0.0001
)
lo, hi = iso(qlo), iso(qhi)
before = window_read()

s0 = _steal_seconds(); t0 = time.monotonic()
compact(spark, tbl, all_buckets=True, write_salt=salt, cluster_by=["ts"])
cluster_wall = time.monotonic() - t0
cluster_steal = _steal_seconds() - s0
h1 = state_hash()
after = window_read()

print("RESULT " + json.dumps({{
    "events_applied": n_events,
    "n_buckets": n_buckets,
    "cluster_salt": salt,
    "window_frac": frac,
    "unclustered": before,
    "clustered": after,
    "cluster_rewrite_wall_s": round(cluster_wall, 3),
    "cluster_rewrite_steal_cpu_s": round(cluster_steal, 2),
    "read_speedup": round(before["read_wall_s"] / after["read_wall_s"], 2),
    "rows_scanned_ratio": round(after["rows_scanned"] / max(before["rows_scanned"], 1), 4),
    "window_rows_equal": before["window_rows"] == after["window_rows"],
    "window_hash_equal": before["window_hash"] == after["window_hash"],
    "state_hash_equal": (h0["h"] == h1["h"] and h0["n"] == h1["n"]),
    "state_rows": int(h1["n"]),
}}))
spark.stop()
"""


def main() -> None:
    n_events = int(os.environ.get("CLUSTER_EVENTS", "16000000"))
    n_batches = int(os.environ.get("CLUSTER_BATCHES", "2"))
    cpus = int(os.environ.get("CLUSTER_CPUS", "32"))
    n_buckets = int(os.environ.get("CLUSTER_BUCKETS", "32"))
    salt = int(os.environ.get("CLUSTER_SALT", "8"))
    frac = float(os.environ.get("CLUSTER_WINDOW_FRAC", "0.02"))
    code = RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_events), str(n_batches),
         str(n_buckets), str(salt), str(frac)],
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
