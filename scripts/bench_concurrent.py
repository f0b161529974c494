"""Concurrent-writers throughput artifact: the SAME change log applied
to one table by ONE streaming pipeline (baseline) and by TWO live
pipelines racing on disjoint segment sets (optimistic concurrency, the
round-4 commit-CAS + conflict-retry path). Reports both walls, the
combined events/sec, the dual/single throughput ratio, and the final
state digests — which must be EQUAL (LWW over the full log is
apply-order invariant, so two racing writers must land the identical
table).

What this pins: the cost of optimistic concurrency under real
contention. Every micro-batch commit of each pipeline can lose the CAS
to the other and re-run; the ratio shows what that retry traffic costs
end-to-end. At cluster scale the same protocol serializes the apply
loop against compactors/backfills — this artifact is the honest local
measurement of that overhead.

Env: CONC_EVENTS (default 4*10^7 total), CONC_CPUS (default all),
CONC_SEGMENTS (default 16, split alternately between the two feeds),
CONC_RETRIES (default 50), BENCH_CALM_MAX_WAIT_S.
Output: bench_runs/CONCURRENT_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/bench_conc", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/bench_conc"

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from bench import _steal_seconds, wait_calm_window  # noqa: E402
from digital_analytics_data_platform_spark import datagen  # noqa: E402
from digital_analytics_data_platform_spark.lake import LakeTable  # noqa: E402
from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402
from digital_analytics_data_platform_spark.streaming import apply_stream  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("commit_lsn", T.LongType()),
    ]
)
BUSINESS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]


def digest(spark, tbl) -> dict:
    hashed = tbl.read(spark).select(
        F.xxhash64(*[F.col(c).cast("string") for c in BUSINESS]).alias("h")
    )
    row = hashed.agg(F.count(F.lit(1)).alias("rows"), F.expr("bit_xor(h)").alias("xor")).collect()[0]
    return {"rows": int(row["rows"]), "xor": int(row["xor"])}


def make_table(path: str) -> LakeTable:
    business = T.StructType([f for f in SCHEMA.fields if f.name not in ("op", "commit_lsn")])
    return LakeTable.create(path, business, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=64)


def main() -> None:
    n = int(os.environ.get("CONC_EVENTS", str(4 * 10**7)))
    cpus = int(os.environ.get("CONC_CPUS", str(os.cpu_count() or 32)))
    n_seg = int(os.environ.get("CONC_SEGMENTS", "16"))
    retries = int(os.environ.get("CONC_RETRIES", "50"))
    calm_max = float(os.environ.get("BENCH_CALM_MAX_WAIT_S", "300"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "conc-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 4, extra_conf=extra
    )
    gen_kw = dict(n_convs=max(1000, n // 1000), turns_per_conv=50, hot_key_frac=0.15)
    root = tempfile.mkdtemp(prefix="conc_bench_")

    # land segments; even-indexed feed A, odd-indexed feed B (untimed)
    feeds = [os.path.join(root, "feed_a"), os.path.join(root, "feed_b")]
    for d in feeds:
        os.makedirs(d)
    bounds = [(i * n // n_seg, (i + 1) * n // n_seg) for i in range(n_seg)]
    for i, (lo, hi) in enumerate(bounds):
        datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw).write.mode("overwrite").parquet(
            os.path.join(feeds[i % 2], f"seg_{i:04d}")
        )
    os.sync()

    def source(feed_dir):
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 2 * cpus)
            .parquet(os.path.join(feed_dir, "seg_*"))
        )

    # ---- baseline: one pipeline consumes both feeds sequentially ------
    if calm_max > 0:
        wait_calm_window(calm_max)
    t_single = make_table(os.path.join(root, "single"))
    s0 = _steal_seconds()
    t0 = time.monotonic()
    ev_single = 0
    for pid, feed in (("a", feeds[0]), ("b", feeds[1])):
        _, m = apply_stream(
            spark, source(feed), t_single.path, os.path.join(root, f"ckpt_single_{pid}"),
            pipeline_id=f"single_{pid}", available_now=True, strategy="mor",
        )
        ev_single += m.events
    wall_single = time.monotonic() - t0
    steal_single = _steal_seconds() - s0
    d_single = digest(spark, t_single)

    # ---- dual: two live pipelines race on one table --------------------
    if calm_max > 0:
        wait_calm_window(calm_max)
    t_dual = make_table(os.path.join(root, "dual"))
    s0 = _steal_seconds()
    t0 = time.monotonic()
    q1, m1 = apply_stream(
        spark, source(feeds[0]), t_dual.path, os.path.join(root, "ckpt_dual_a"),
        pipeline_id="dual_a", available_now=True, strategy="mor",
        conflict_retries=retries, await_termination=False,
    )
    q2, m2 = apply_stream(
        spark, source(feeds[1]), t_dual.path, os.path.join(root, "ckpt_dual_b"),
        pipeline_id="dual_b", available_now=True, strategy="mor",
        conflict_retries=retries, await_termination=False,
    )
    q1.awaitTermination()
    q2.awaitTermination()
    wall_dual = time.monotonic() - t0
    steal_dual = _steal_seconds() - s0
    assert q1.exception() is None and q2.exception() is None
    d_dual = digest(spark, t_dual)

    report = {
        "events_total": n,
        "cpus": cpus,
        "segments": n_seg,
        "conflict_retries_budget": retries,
        "single_wall_s": round(wall_single, 2),
        "single_events_per_sec": round(ev_single / wall_single, 1),
        "single_steal_cpu_s": round(steal_single, 2),
        "dual_wall_s": round(wall_dual, 2),
        "dual_events_per_sec": round(n / wall_dual, 1),
        "dual_steal_cpu_s": round(steal_dual, 2),
        "dual_over_single_ratio": round(wall_single / wall_dual, 3),
        "dual_batches": m1.batches + m2.batches,
        "state_digest_equal": d_single == d_dual,
        "state_rows": d_dual["rows"],
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
