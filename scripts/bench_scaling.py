"""Scaling-efficiency evidence: run the identical CDC apply at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for
N vs 4N executors per BASELINE.md) on the same input and report
events/sec at both plus efficiency = (T_small_wall / T_big_wall) / 4
... precisely: eff = (throughput_big / throughput_small) / (cores_big / cores_small).

Runs each level in a fresh subprocess (one JVM per master) for clean
measurements. Writes BENCH/BASELINE.md section content to stdout.
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
from digital_analytics_data_platform_spark.session import get_spark
from bench import run_apply_bench

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
strategy = os.environ.get("BENCH_STRATEGY", "mor")
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.range(1).count()
stats = run_apply_bench(spark, n_events, n_batches, 64, strategy=strategy)
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
    n_events = int(os.environ.get("BENCH_EVENTS", "4000000"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "5"))
    small_cpus = int(os.environ.get("BENCH_SMALL_CPUS", "8"))
    big_cpus = int(os.environ.get("BENCH_BIG_CPUS", "32"))

    small = run_level(small_cpus, n_events, n_batches)
    big = run_level(big_cpus, n_events, n_batches)
    # median-based: robust to this VM's sporadic host stalls (see bench.py)
    tps_s = small["apply_events_per_sec_median"]
    tps_b = big["apply_events_per_sec_median"]
    eff = (tps_b / tps_s) / (big_cpus / small_cpus)

    # steal-adjusted: subtract hypervisor-stolen CPU time (converted to
    # wall at the run's parallelism) from each batch wall, then take the
    # median — the throughput this hardware would sustain without host
    # contention. Raw numbers are reported alongside.
    def adj_median_tps(level, cpus):
        walls = level["apply_batch_walls_s"][1:]
        steals = level.get("apply_batch_steal_cpu_s", [0.0] * len(level["apply_batch_walls_s"]))[1:]
        adj = [max(w - s / cpus, 0.05 * w) for w, s in zip(walls, steals)]
        med = sorted(adj)[len(adj) // 2]
        return (n_events / n_batches) / med

    atps_s = adj_median_tps(small, small_cpus)
    atps_b = adj_median_tps(big, big_cpus)
    adj_eff = (atps_b / atps_s) / (big_cpus / small_cpus)
    report = {
        "events": n_events,
        "batches": n_batches,
        "strategy": small.get("apply_strategy"),
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
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
