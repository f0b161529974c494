"""Measure the metadata-first retention payoff: the same feed applied
to two identical MOR tables, one compacted `cluster_by=["ts"]` and one
compacted unclustered, then the same TTL sweep
(`retention_truncate(older_than=mid)`) run on both. On the ts-clustered
layout almost every expired file's max-ts stat is under the cutoff, so
it leaves the manifest UNREAD (metadata-only delete); the unclustered
layout's files all straddle the cutoff and must be read-filtered-
rewritten. Reports files dropped vs rewritten, sweep walls, and the
equality of the two swept states. Writes one JSON line; artifact:
bench_runs/RETENTION_r04.json.

Env knobs: RET_EVENTS (default 16_000_000), RET_BATCHES (8), RET_CPUS
(8), RET_BUCKETS (16), RET_SALT (4).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import (
    LakeTable,
    compact,
    merge_changes,
    retention_truncate,
)
from digital_analytics_data_platform_spark.session import get_spark


def _state_hash(spark, tbl) -> int:
    return (
        tbl.read(spark)
        .select(
            F.xxhash64(
                "conv_id", "turn_idx", F.coalesce("text", F.lit("")), F.col("ts").cast("string")
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("x"))
        .first()["x"]
    )


def main() -> dict:
    events = int(os.environ.get("RET_EVENTS", "16000000"))
    batches = int(os.environ.get("RET_BATCHES", "8"))
    cpus = int(os.environ.get("RET_CPUS", "8"))
    buckets = int(os.environ.get("RET_BUCKETS", "16"))
    salt = int(os.environ.get("RET_SALT", "4"))
    spark = get_spark("bench-retention", master=f"local[{cpus}]", shuffle_partitions=cpus)

    log = datagen.change_log(spark, events, n_convs=max(1000, events // 40), turns_per_conv=8)
    log = log.withColumn("_b", F.pmod(F.col("lsn"), F.lit(batches))).cache()
    log.count()
    # cutoff at the LIVE state's median ts (per-key max under LWW), not
    # the raw log's — a retention policy expires half the surviving
    # table, which is the representative sweep
    mid = (
        log.groupBy("conv_id", "turn_idx")
        .agg(F.max("ts").alias("ts"))
        .agg(F.expr("percentile_approx(ts, 0.5)"))
        .first()[0]
    )

    d = tempfile.mkdtemp(prefix="retlake_")
    runs: dict[str, dict] = {}
    for name, cluster in (("ts_clustered", ["ts"]), ("unclustered", None)):
        tbl = LakeTable.create(
            os.path.join(d, name),
            log.drop("_b", "op", "commit_lsn").schema,
            ["conv_id", "turn_idx"],
            ["ts", "lsn"],
            n_buckets=buckets,
        )
        for b in range(batches):
            merge_changes(
                spark, tbl, log.filter(F.col("_b") == b).drop("_b"), batch_key=f"b{b}", strategy="mor"
            )
        compact(spark, tbl, all_buckets=True, cluster_by=cluster, write_salt=salt)
        files_before = len(tbl.snapshot().files)
        t0 = time.monotonic()
        stats = retention_truncate(spark, tbl, mid, write_salt=salt)
        sweep_wall = time.monotonic() - t0
        runs[name] = {
            "files_before": files_before,
            **{k: v for k, v in stats.items() if k != "version"},
            "metadata_only_pct": round(
                100 * stats["files_dropped"] / max(stats["files_dropped"] + stats["files_rewritten"], 1), 1
            ),
            "sweep_wall_s": round(sweep_wall, 2),
            "rows_after": tbl.read(spark).count(),
            "state_hash": _state_hash(spark, tbl),
        }

    c, u = runs["ts_clustered"], runs["unclustered"]
    out = {
        "metric": "metadata-first retention sweep payoff (ts-clustered vs unclustered layout)",
        "events": events,
        "batches": batches,
        "cpus": cpus,
        "buckets": buckets,
        "cutoff": str(mid),
        "ts_clustered": c,
        "unclustered": u,
        "state_identical": c["state_hash"] == u["state_hash"] and c["rows_after"] == u["rows_after"],
        "sweep_speedup": round(u["sweep_wall_s"] / max(c["sweep_wall_s"], 1e-9), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
