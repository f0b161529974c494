"""Skew-stress artifact: the same MOR apply at increasing hot-key
concentration. ``hot_key_frac`` of all events hit ONE conversation
(``datagen.change_log``); a skew-fragile plan (window sort per key, or
a write stage keyed only on the hot bucket) would collapse as the
fraction grows, because one task inherits hot_frac of the batch.

The engine's apply is skew-safe by construction — batch LWW is a
hash agg with map-side combine over (conv_id, turn_idx) (the hot conv
spreads over turns_per_conv keys and partial-aggregates before the
shuffle), and the bucketed write salts within buckets
(``LakeTable.write_files`` write_salt) — so the measured events/sec
must stay roughly FLAT across the sweep. This artifact records that,
instead of asking the reader to trust the plan assertions in
tests/test_plan_properties.py.

Env: SKEW_EVENTS (default 48M total per level), SKEW_BATCHES (3),
SKEW_CPUS (16), SKEW_FRACS ("0.15,0.5,0.9"), BENCH_CALM_MAX_WAIT_S.
Output: one JSON report (committed as bench_runs/SKEW_r*.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, os, sys
sys.path.insert(0, "{repo}")
import tempfile
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/bench_skew", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_skew"
from digital_analytics_data_platform_spark.session import get_spark
from bench import run_apply_bench, wait_calm_window

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
hot = float(sys.argv[4])
calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
if calm_max > 0:
    wait_calm_window(calm_max)
extra = {{
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 * 1024 * 1024),
}}
if os.path.isdir("/dev/shm"):
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark("skew-bench", master=f"local[{{cpus}}]", shuffle_partitions=cpus * 4, extra_conf=extra)
spark.range(1).count()
stats = run_apply_bench(
    spark, n_events, n_batches, 64, strategy="mor", feed="generate",
    warmup="auto", steal_retry=n_batches, gen_overrides={{"hot_key_frac": hot}},
)
print("RESULT " + json.dumps(stats))
spark.stop()
"""


def main() -> None:
    n_events = int(os.environ.get("SKEW_EVENTS", "48000000"))
    n_batches = int(os.environ.get("SKEW_BATCHES", "3"))
    cpus = int(os.environ.get("SKEW_CPUS", "16"))
    fracs = [float(x) for x in os.environ.get("SKEW_FRACS", "0.15,0.5,0.9").split(",")]
    levels = {}
    for hot in fracs:
        code = RUNNER.format(repo=str(REPO))
        out = subprocess.run(
            [sys.executable, "-c", code, str(cpus), str(n_events), str(n_batches), str(hot)],
            capture_output=True, text=True, timeout=3600, cwd=str(REPO),
        )
        stats = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                stats = json.loads(line[len("RESULT "):])
        if stats is None:
            raise RuntimeError(f"no RESULT for hot={hot}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
        levels[str(hot)] = {
            "events_per_sec_median": stats["apply_events_per_sec_median"],
            "batch_walls_s": stats["apply_batch_walls_s"],
            "batch_steal_cpu_s": stats["apply_batch_steal_cpu_s"],
            "warmup_walls_s": stats["apply_warmup_walls_s"],
            "steal_valid": stats["apply_steal_valid"],
            "final_rows": stats["apply_final_rows"],
        }
    base = levels[str(fracs[0])]["events_per_sec_median"]
    report = {
        "events_per_level": n_events,
        "batches": n_batches,
        "cpus": cpus,
        "strategy": "mor",
        "feed": "generate",
        "hot_key_fracs": fracs,
        "levels": levels,
        # <1.0 means throughput FELL as skew rose; flat ≈ 1.0 is the pass
        "worst_over_base_ratio": round(
            min(v["events_per_sec_median"] for v in levels.values()) / base, 3
        ),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
