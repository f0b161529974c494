"""Endurance replay: apply a 10^9-event CDC log in 100M-event MOR
batches and show the per-batch wall stays FLAT as the table grows —
the property that makes the 10^10-event design point a linear
extrapolation instead of a hope.

The MOR apply is O(batch): each batch appends its LWW winners as
bucketed delta files and never rereads table state (``lake/merge.py``
``strategy='mor'``), so batch 10 (table ~400M delta rows) must cost
the same as batch 2 (table ~40M). A drifting wall here would mean a
hidden O(table) step — the classic scale-killer this artifact guards
against. The final compact (read-time-LWW fold) is timed separately:
at the 10^10 design point compaction is a scheduled background job,
not part of the ingest path.

Defaults need ~20 GB of /dev/shm for the lake and ~15 min on 32
cores. Env knobs: ENDURANCE_EVENTS (default 10^9), ENDURANCE_BATCHES
(default 10), ENDURANCE_CPUS (default all), BENCH_CALM_MAX_WAIT_S.

Output: one JSON report on stdout (committed as
``bench_runs/ENDURANCE_r*.json``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/bench_endurance", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_endurance"

from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402
from bench import run_apply_bench, wait_calm_window  # noqa: E402


def main() -> None:
    n_events = int(os.environ.get("ENDURANCE_EVENTS", str(10**9)))
    n_batches = int(os.environ.get("ENDURANCE_BATCHES", "10"))
    cpus = int(os.environ.get("ENDURANCE_CPUS", str(os.cpu_count() or 32)))
    calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "600"))
    if calm_max > 0:
        print("CALM " + json.dumps(wait_calm_window(calm_max)), file=sys.stderr, flush=True)
    extra = {
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(32 * 1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "endurance", master=f"local[{cpus}]", shuffle_partitions=cpus * 4, extra_conf=extra
    )
    spark.range(1).count()
    stats = run_apply_bench(
        spark,
        n_events,
        n_batches,
        64,
        strategy="mor",
        feed="generate",
        # untimed batches until the wall stabilizes — per-batch walls
        # below are post-JIT steady state (ENDURANCE_WARMUP=N to pin)
        warmup=os.environ.get("ENDURANCE_WARMUP", "auto"),
        steal_retry=2,
    )
    walls = stats["apply_batch_walls_s"]
    half = len(walls) // 2
    first_half = sorted(walls[:half])[half // 2]
    second_half = sorted(walls[half:])[(len(walls) - half) // 2]
    report = {
        "events": n_events,
        "batches": n_batches,
        "cpus": cpus,
        "feed": "generate",
        "strategy": "mor",
        "tmpfs": os.path.isdir("/dev/shm"),
        "events_per_sec_sustained": stats["apply_events_per_sec_total"],
        "events_per_sec_median_batch": stats["apply_events_per_sec_median"],
        "batch_walls_s": walls,
        "batch_steal_cpu_s": stats["apply_batch_steal_cpu_s"],
        "warmup_walls_s": stats["apply_warmup_walls_s"],
        "batch_retries": stats["apply_batch_retries"],
        "steal_valid": stats["apply_steal_valid"],
        # flatness: median wall of the last half of batches (table large)
        # over the first half (table small) — O(batch) ingest holds at 1.0
        "flatness_second_half_over_first": round(second_half / first_half, 3),
        "final_rows_after_compact": stats["apply_final_rows"],
        "compact_wall_s": stats["apply_compact_wall_s"],
        "compact_steal_cpu_s": stats["apply_compact_steal_cpu_s"],
        "batch_phase_walls_s": stats["apply_batch_phase_walls_s"],
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
