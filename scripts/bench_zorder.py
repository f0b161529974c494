"""Z-order clustering payoff artifact: build a MOR table, compact it
twice — lexicographic `cluster_by=["ts","turn_idx"]` vs z-order on the
same columns — and measure two reads on each layout:

- a TRAILING-dimension read (`turn_idx <= k` over the full ts range):
  the case lexicographic clustering cannot prune (every file spans
  turn_idx) and z-order prunes by construction;
- a 2-D box (`ts BETWEEN … AND turn_idx <= k`): both layouts prune on
  ts; z-order also prunes on turn_idx inside the ts sliver.

Correctness rides along: all reads must return identical row counts +
hashes, and both rewrites must preserve the table state hash.

Env: ZORDER_EVENTS (default 16M), ZORDER_CPUS (32), ZORDER_BATCHES (2),
ZORDER_BUCKETS (32), ZORDER_SALT (8), ZORDER_TS_FRAC (0.05),
ZORDER_TURN_MAX (3), BENCH_CALM_MAX_WAIT_S.
Output: one JSON report (committed as bench_runs/ZORDER_r*.json).
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
    os.makedirs("/dev/shm/bench_zorder", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_zorder"
from datetime import datetime, timezone
from pyspark.sql import functions as F
from digital_analytics_data_platform_spark.session import get_spark
from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes, compact
from digital_analytics_data_platform_spark.lake.table import DELETED_COL
from bench import wait_calm_window, _steal_seconds

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
n_buckets = int(sys.argv[4]); salt = int(sys.argv[5]); ts_frac = float(sys.argv[6])
turn_max = int(sys.argv[7])
calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
if calm_max > 0:
    wait_calm_window(calm_max)
extra = {{}}
if os.path.isdir("/dev/shm"):
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark("zorder-bench", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4, extra_conf=extra)
spark.range(1).count()

tdir = tempfile.mkdtemp(prefix="zorder_tbl_")
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

def iso(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None).isoformat()

def measured_read(stats_range, predicate):
    s0 = _steal_seconds(); t0 = time.monotonic()
    pruned = tbl.read(spark, stats_range=stats_range)
    got = pruned.filter(predicate).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(conv_id, turn_idx))").alias("h")
    ).collect()[0]
    wall = time.monotonic() - t0
    steal = _steal_seconds() - s0
    scanned = pruned.inputFiles()
    snap = tbl.snapshot()
    sizes = {{os.path.join(tbl.path, f["path"]): f["rows"] for f in snap.files}}
    rows_scanned = 0
    for uri in scanned:
        from urllib.parse import unquote, urlparse
        rows_scanned += sizes.get(unquote(urlparse(uri).path), 0)
    return {{
        "files_total": len(snap.files),
        "files_scanned": len(scanned),
        "rows_scanned": int(rows_scanned),
        "result_rows": int(got["n"]),
        "result_hash": int(got["h"] or 0),
        "read_wall_s": round(wall, 3),
        "steal_cpu_s": round(steal, 2),
    }}

h0 = state_hash()
qlo, qhi = tbl.read(spark).select(F.unix_timestamp("ts").cast("double").alias("t")).approxQuantile(
    "t", [0.5 - ts_frac / 2, 0.5 + ts_frac / 2], 0.0001
)
lo, hi = iso(qlo), iso(qhi)
trailing_pred = F.col("turn_idx") <= turn_max
box_pred = (F.col("ts") >= lo) & (F.col("ts") <= hi) & (F.col("turn_idx") <= turn_max)

def both_reads():
    return {{
        "trailing_dim": measured_read({{"turn_idx": (0, turn_max)}}, trailing_pred),
        "box_2d": measured_read({{"ts": (lo, hi), "turn_idx": (0, turn_max)}}, box_pred),
    }}

out = {{"events_applied": n_events, "n_buckets": n_buckets, "cluster_salt": salt,
        "ts_frac": ts_frac, "turn_max": turn_max}}
walls = {{}}
for mode in ("range", "zorder"):
    s0 = _steal_seconds(); t0 = time.monotonic()
    compact(spark, tbl, all_buckets=True, write_salt=salt,
            cluster_by=["ts", "turn_idx"], cluster_mode=mode)
    walls[mode] = {{"rewrite_wall_s": round(time.monotonic() - t0, 3),
                   "rewrite_steal_cpu_s": round(_steal_seconds() - s0, 2)}}
    assert state_hash() == h0, f"{{mode}} rewrite changed table state"
    out[mode] = both_reads()
out["rewrites"] = walls
for read in ("trailing_dim", "box_2d"):
    r, z = out["range"][read], out["zorder"][read]
    assert r["result_rows"] == z["result_rows"] and r["result_hash"] == z["result_hash"], read
    out[f"{{read}}_files_ratio_zorder_vs_range"] = round(z["files_scanned"] / max(r["files_scanned"], 1), 4)
    out[f"{{read}}_rows_ratio_zorder_vs_range"] = round(z["rows_scanned"] / max(r["rows_scanned"], 1), 4)
out["state_hash_equal"] = True
out["results_equal"] = True
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_events = int(os.environ.get("ZORDER_EVENTS", "16000000"))
    n_batches = int(os.environ.get("ZORDER_BATCHES", "2"))
    cpus = int(os.environ.get("ZORDER_CPUS", "32"))
    n_buckets = int(os.environ.get("ZORDER_BUCKETS", "32"))
    salt = int(os.environ.get("ZORDER_SALT", "8"))
    ts_frac = float(os.environ.get("ZORDER_TS_FRAC", "0.05"))
    turn_max = int(os.environ.get("ZORDER_TURN_MAX", "3"))
    code = RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_events), str(n_batches),
         str(n_buckets), str(salt), str(ts_frac), str(turn_max)],
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
