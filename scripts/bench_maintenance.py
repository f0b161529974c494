"""Measure the scheduled-maintenance payoff: the same MOR apply loop
(periodic compact) run twice over an identical feed — once with
snapshot expiry + GC on a cadence (`expire_snapshots(keep_last=…)`,
what `apply_stream(expire_every=…)` schedules), once without. Reports
manifest count, metadata bytes, live/total data bytes, snapshot-load
wall, and the state-hash equality of the two final tables. The claim
this artifact pins: without expiry a long-lived stream's metadata
footprint grows O(commits × files) and replaced pre-compaction files
are never reclaimed; with it both stay bounded and the table state is
bit-identical. Writes one JSON line; artifact:
bench_runs/MAINT_r04.json.

Env knobs: MAINT_EVENTS (default 8_000_000), MAINT_BATCHES (24),
MAINT_CPUS (8), MAINT_BUCKETS (16), MAINT_COMPACT_EVERY (6),
MAINT_EXPIRE_EVERY (4), MAINT_KEEP_LAST (2).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import LakeTable, compact, merge_changes
from digital_analytics_data_platform_spark.session import get_spark


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(dirpath, n))
    return total


def _state_hash(spark, tbl) -> int:
    return (
        tbl.read(spark)
        .select(
            F.xxhash64(
                "conv_id", "turn_idx", F.coalesce("text", F.lit("")), F.coalesce("role", F.lit(""))
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("x"))
        .first()["x"]
    )


def main() -> dict:
    events = int(os.environ.get("MAINT_EVENTS", "8000000"))
    batches = int(os.environ.get("MAINT_BATCHES", "24"))
    cpus = int(os.environ.get("MAINT_CPUS", "8"))
    buckets = int(os.environ.get("MAINT_BUCKETS", "16"))
    compact_every = int(os.environ.get("MAINT_COMPACT_EVERY", "6"))
    expire_every = int(os.environ.get("MAINT_EXPIRE_EVERY", "4"))
    keep_last = int(os.environ.get("MAINT_KEEP_LAST", "2"))
    spark = get_spark("bench-maint", master=f"local[{cpus}]", shuffle_partitions=cpus)

    log = datagen.change_log(spark, events, n_convs=max(1000, events // 40), turns_per_conv=8)
    log = log.withColumn("_b", F.pmod(F.col("lsn"), F.lit(batches))).cache()
    log.count()

    d = tempfile.mkdtemp(prefix="maintlake_")
    runs: dict[str, dict] = {}
    for name, maintained in (("control", False), ("maintained", True)):
        tbl = LakeTable.create(
            os.path.join(d, name),
            log.drop("_b", "op", "commit_lsn").schema,
            ["conv_id", "turn_idx"],
            ["ts", "lsn"],
            n_buckets=buckets,
        )
        t0 = time.monotonic()
        expired = gc_files = 0
        for b in range(batches):
            merge_changes(
                spark, tbl, log.filter(F.col("_b") == b).drop("_b"), batch_key=f"b{b}", strategy="mor"
            )
            if compact_every and (b + 1) % compact_every == 0:
                compact(spark, tbl)
            if maintained and expire_every and (b + 1) % expire_every == 0:
                r = tbl.expire_snapshots(keep_last=keep_last)
                expired += r["expired_snapshots"]
                gc_files += r["deleted_files"]
        wall = time.monotonic() - t0

        t1 = time.monotonic()
        reloaded = LakeTable.load(tbl.path)
        snap = reloaded.snapshot()
        load_wall = time.monotonic() - t1
        runs[name] = {
            "apply_wall_s": round(wall, 1),
            "manifests": len(reloaded.list_snapshots()),
            "metadata_bytes": _dir_bytes(os.path.join(tbl.path, "snapshots")),
            "data_bytes_on_disk": _dir_bytes(os.path.join(tbl.path, "data")),
            "live_files": len(snap.files),
            "live_rows": sum(int(f.get("rows") or 0) for f in snap.files),
            "snapshot_load_wall_s": round(load_wall, 3),
            "expired_snapshots": expired,
            "gc_deleted_files": gc_files,
            "state_hash": _state_hash(spark, reloaded),
        }

    c, m = runs["control"], runs["maintained"]
    out = {
        "metric": "scheduled snapshot-expiry/GC payoff (MOR apply + periodic compact)",
        "events": events,
        "batches": batches,
        "cpus": cpus,
        "buckets": buckets,
        "compact_every": compact_every,
        "expire_every": expire_every,
        "keep_last": keep_last,
        "control": c,
        "maintained": m,
        "state_identical": c["state_hash"] == m["state_hash"],
        "metadata_bytes_ratio": round(c["metadata_bytes"] / max(m["metadata_bytes"], 1), 2),
        "disk_bytes_ratio": round(c["data_bytes_on_disk"] / max(m["data_bytes_on_disk"], 1), 2),
        "manifest_ratio": round(c["manifests"] / max(m["manifests"], 1), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
