"""Host-capability probe: how does this VM's MEMORY BANDWIDTH scale
with thread count, versus pure CPU?

Why this exists: the round-4 JIT fix (``-XX:-DontCompileHugeMethods``,
session.py) made the CDC apply kernel ~3.3x faster per core, which
moved its bottleneck from instruction dispatch to DRAM traffic. A
memory-bound kernel can only scale as far as the host's bandwidth
scales — and on a single-box VM, 4 threads may already draw a large
fraction of the socket's bandwidth, so 4->16 threads cannot show 4x
even for perfectly parallel work. A real cluster adds a memory
controller with every node; this box does not. This probe separates
"the engine stops scaling" from "the host has no more bandwidth to
give" by measuring both ceilings with trivial kernels:

- ``copy``: per-process numpy copy of a 128 MB buffer (far beyond LLC)
  -> aggregate GB/s at 1/2/4/8/16 processes. Pure DRAM streaming.
- ``spin``: per-process in-L1 numpy arithmetic on an 8 KB array ->
  aggregate op/s. Pure CPU, near-zero DRAM traffic.

Reading the output: if spin scales ~linearly where copy plateaus, a
memory-bound job's efficiency ceiling at that thread count is the
copy ratio, not 1.0 — quote it next to any scaling-efficiency number
measured on this host (BASELINE.md does).

Usage: ``python scripts/probe_membw.py [counts...]`` (default
1 2 4 8 16). Prints one JSON object.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

COPY_MB = 128
SPIN_KB = 8
SECONDS = 8.0


def _copy_worker(start_at: float, dur: float, out):
    import numpy as np

    src = np.random.default_rng(0).random(COPY_MB * 1024 * 1024 // 8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault dst's pages BEFORE the timed window
    while time.monotonic() < start_at:
        pass
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < dur:
        np.copyto(dst, src)
        n += 1
    wall = time.monotonic() - t0
    # read + write = 2x the buffer per copy
    out.put(2 * src.nbytes * n / wall / 1e9)


def _spin_worker(start_at: float, dur: float, out):
    import numpy as np

    a = np.random.default_rng(0).random(SPIN_KB * 1024 // 8)
    while time.monotonic() < start_at:
        pass
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < dur:
        a = np.sin(a) + 1.0  # in-L1, compute-dominated
        n += 1
    wall = time.monotonic() - t0
    out.put(n * a.size / wall / 1e6)  # Mop/s


def run_level(worker, nproc: int) -> float:
    q = mp.Queue()
    # barrier AFTER per-process numpy import + 128 MB alloc + warmup
    # copy (~1s each, staggered by spawn) — a start time already in the
    # past would skew the aggregate window
    start_at = time.monotonic() + 3.0 + 0.3 * nproc
    ps = [mp.Process(target=worker, args=(start_at, SECONDS, q)) for _ in range(nproc)]
    for p in ps:
        p.start()
    vals = [q.get(timeout=120) for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main():
    counts = [int(c) for c in sys.argv[1:]] or [1, 2, 4, 8, 16]
    report: dict = {"counts": counts, "copy_gbps": {}, "spin_mops": {}}
    for kind, worker, key in (("copy", _copy_worker, "copy_gbps"), ("spin", _spin_worker, "spin_mops")):
        for c in counts:
            report[key][str(c)] = round(run_level(worker, c), 2)
    base = str(counts[0])
    for key, scaled in (("copy_gbps", "copy_scaling"), ("spin_mops", "spin_scaling")):
        report[scaled] = {
            str(c): round(report[key][str(c)] / report[key][base] / (c / counts[0]), 3)
            for c in counts
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
