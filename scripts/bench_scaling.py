"""Scaling-efficiency evidence: run the identical CDC apply at two
parallelism levels (N vs 4N cores — the sandbox stand-in for N vs 4N
executors per BASELINE.md) on the same deterministic input and report
events/sec at both plus efficiency = (tps_big / tps_small) / (cores_big / cores_small).

Runs each level in a fresh subprocess (one JVM per master) for clean
measurements. Writes BENCH/BASELINE.md section content to stdout.

Defaults (each env-overridable) encode what this sandbox can honestly
measure — see BASELINE.md "Scaling measurement config" for the full
rationale:

- ``BENCH_SMALL_CPUS=4`` / ``BENCH_BIG_CPUS=16``: a pure-CPU spin probe
  shows the host hypervisor delivers 4→16 vCPUs at ~0.96 efficiency but
  only ~25 effective cores at 32 threads (overcommit steal) — 8→32
  cannot demonstrate compute scaling on hardware that doesn't have 32
  real cores to give.
- ``BENCH_FEED=generate``: the apply consumes the column-expression
  generator directly (CPU-rich transform-dominated configuration). The
  default parquet feed is ALSO reported in BENCH_r*.json — on this
  sandbox's single shared virtio disk it is IO-bound at ≥4 cores
  (~750k events/s flat at any core count), which measures the disk, not
  the engine; on a real cluster IO bandwidth scales with executors.
- ``BENCH_TMPFS=1``: spark.local.dir (shuffle spill) and the bench lake
  live on /dev/shm so the single shared disk doesn't serialize the
  measurement.
- 16 MB file-split / AQE advisory sizes: at 8M-event batches the
  defaults (128/64 MB) leave only ~4 map splits and coalesce reduce
  stages below the core count — the partition-sizing discipline the
  100 TB deployment would apply per batch size.
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
if os.environ.get("BENCH_TMPFS", "1") == "1":
    os.makedirs("/dev/shm/bench", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench"
from digital_analytics_data_platform_spark.session import get_spark
from bench import run_apply_bench, wait_calm_window

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
# calm-gate each level like bench.py's apply (r4: an ungated scaling run
# caught a steal storm — 1185 cpu-s in one 16-core batch — and recorded
# a meaningless 0.36 efficiency for a job whose clean batches scaled fine)
calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "600"))
if calm_max > 0:
    print("CALM " + json.dumps(wait_calm_window(calm_max)), flush=True)
strategy = os.environ.get("BENCH_STRATEGY", "mor")
feed = os.environ.get("BENCH_FEED", "generate")
extra = {{
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 * 1024 * 1024),
}}
if os.environ.get("BENCH_TMPFS", "1") == "1":
    extra["spark.local.dir"] = "/dev/shm/spark-local"
# 4 waves per reduce stage: at N cores a 1-wave shuffle (partitions ==
# cores) is straggler-bound — the slowest task sets the stage wall —
# while ≥4 waves let fast cores absorb the tail (classic partition-
# sizing discipline; same reason the 100 TB deployment over-partitions)
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus * 4, 16), extra_conf=extra)
spark.range(1).count()
# warmup="auto": untimed batches until the wall stabilizes (<10%
# improvement) — a fresh JVM spends its first ~40-60s in C2
# compilation, which contaminates proportionally more of the level
# whose per-batch wall is 4x shorter (the r4 raw-0.66 artifact);
# steal_retry: replay steal-stormed batches under fresh keys
stats = run_apply_bench(
    spark, n_events, n_batches, 64, strategy=strategy, feed=feed,
    warmup="auto", steal_retry=n_batches,
)
print("RESULT " + json.dumps(stats))
spark.stop()
"""


def run_level(cpus: int, n_events: int, n_batches: int) -> dict:
    code = RUNNER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_events), str(n_batches)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line for local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n_events = int(os.environ.get("BENCH_EVENTS", "48000000"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "6"))
    small_cpus = int(os.environ.get("BENCH_SMALL_CPUS", "4"))
    big_cpus = int(os.environ.get("BENCH_BIG_CPUS", "16"))
    # BENCH_ROUNDS > 1 INTERLEAVES the levels (small, big, small, big…)
    # so both sample the same host-noise window — this VM shows ±15%
    # run-to-run wall variance from neighbors that per-level steal
    # counters do not capture (CPU steal ≠ memory-bandwidth / LLC
    # contention), and back-to-back level runs inherit DIFFERENT noise.
    # Per-level medians are then taken across all rounds' steady batches.
    rounds = int(os.environ.get("BENCH_ROUNDS", "1"))

    def merged(levels: list[dict]) -> dict:
        out = dict(levels[0])
        for key in (
            "apply_batch_walls_s",
            "apply_batch_steal_cpu_s",
            "apply_batch_phase_walls_s",
            "apply_warmup_walls_s",
        ):
            vals = []
            for lv in levels:
                # every timed batch is steady: the runner does explicit
                # JIT warm-up (warmup="auto") before the timed loop
                vals.extend(lv.get(key) or [])
            out[key] = vals
        out["apply_batch_retries"] = sum(lv.get("apply_batch_retries", 0) for lv in levels)
        return out

    small_runs, big_runs = [], []
    for _ in range(rounds):
        small_runs.append(run_level(small_cpus, n_events, n_batches))
        big_runs.append(run_level(big_cpus, n_events, n_batches))
    small, big = merged(small_runs), merged(big_runs)
    per_batch = n_events / n_batches

    def median_tps(level, cpus, adjust: bool):
        walls = level["apply_batch_walls_s"]
        steals = level.get("apply_batch_steal_cpu_s") or [0.0] * len(walls)
        if adjust:
            walls = [max(w - s / cpus, 0.05 * w) for w, s in zip(walls, steals)]
        med = sorted(walls)[len(walls) // 2]
        return per_batch / med

    # median-based: robust to this VM's sporadic host stalls (see bench.py)
    tps_s = median_tps(small, small_cpus, adjust=False)
    tps_b = median_tps(big, big_cpus, adjust=False)
    eff = (tps_b / tps_s) / (big_cpus / small_cpus)

    # steal-adjusted: subtract hypervisor-stolen CPU time (converted to
    # wall at the run's parallelism) from each batch wall, then take the
    # median — the throughput this hardware would sustain without host
    # contention. Raw numbers are reported alongside.
    atps_s = median_tps(small, small_cpus, adjust=True)
    atps_b = median_tps(big, big_cpus, adjust=True)
    adj_eff = (atps_b / atps_s) / (big_cpus / small_cpus)
    report = {
        "events": n_events,
        "batches": n_batches,
        "rounds": rounds,
        "interleaved": rounds > 1,
        "strategy": small.get("apply_strategy"),
        "feed": small.get("apply_feed"),
        "tmpfs": os.environ.get("BENCH_TMPFS", "1") == "1",
        f"local[{small_cpus}]_events_per_sec": tps_s,
        f"local[{big_cpus}]_events_per_sec": tps_b,
        f"local[{small_cpus}]_events_per_sec_incl_compact": small.get("apply_events_per_sec_incl_compact"),
        f"local[{big_cpus}]_events_per_sec_incl_compact": big.get("apply_events_per_sec_incl_compact"),
        "speedup": round(tps_b / tps_s, 3),
        "cores_ratio": big_cpus / small_cpus,
        "scaling_efficiency": round(eff, 3),
        f"local[{small_cpus}]_events_per_sec_steal_adjusted": round(atps_s, 1),
        f"local[{big_cpus}]_events_per_sec_steal_adjusted": round(atps_b, 1),
        "scaling_efficiency_steal_adjusted": round(adj_eff, 3),
        "small_batch_walls_s": small["apply_batch_walls_s"],
        "big_batch_walls_s": big["apply_batch_walls_s"],
        "small_batch_steal_cpu_s": small.get("apply_batch_steal_cpu_s"),
        "big_batch_steal_cpu_s": big.get("apply_batch_steal_cpu_s"),
        "small_batch_phase_walls_s": small.get("apply_batch_phase_walls_s"),
        "big_batch_phase_walls_s": big.get("apply_batch_phase_walls_s"),
        "small_compact_wall_s": small.get("apply_compact_wall_s"),
        "big_compact_wall_s": big.get("apply_compact_wall_s"),
        "small_warmup_walls_s": small.get("apply_warmup_walls_s"),
        "big_warmup_walls_s": big.get("apply_warmup_walls_s"),
        "small_batch_retries": small.get("apply_batch_retries"),
        "big_batch_retries": big.get("apply_batch_retries"),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
