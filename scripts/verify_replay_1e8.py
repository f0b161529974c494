"""Replay-shape invariance at 10^8 events: the same CDC log applied
through two structurally different replays must produce the identical
final table.

Replay A: 4 × 25M-event MOR batches, in log order, one final compact.
Replay B: 8 × 12.5M-event batches applied in a SHUFFLED global order,
  with (a) one batch re-delivered under a fresh batch key (duplicate
  delivery beyond the ledger — read-time LWW must absorb it), (b) a
  mid-way compact (fold point must not change semantics), and (c) the
  first half of the log applied with the ``tool`` column physically
  absent (mid-stream schema evolution: the column appears only when
  the later batches arrive).

Equality is asserted on (row count, order-insensitive bit_xor of the
full-row xxhash64, decimal sum of the same hash) over the normalized
business columns — the same per-turn-text-under-stable-order contract
the small-scale DuckDB oracle verifies exactly
(tests/test_replay_equivalence.py); this artifact extends the
engine-side invariances (batch order, duplicate delivery, compaction
point, schema evolution) to 10^8 scale where a pandas oracle cannot
hold the log.

Env: REPLAY_EVENTS (default 10^8), REPLAY_CPUS (default all).
Output: one JSON report (committed as bench_runs/REPLAY_EQUIV_r*.json).
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
    os.makedirs("/dev/shm/replay_equiv", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    tempfile.tempdir = "/dev/shm/replay_equiv"

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from digital_analytics_data_platform_spark import datagen  # noqa: E402
from digital_analytics_data_platform_spark.lake import (  # noqa: E402
    LakeTable,
    compact,
    merge_changes,
)
from digital_analytics_data_platform_spark.session import get_spark  # noqa: E402

SCHEMA = T.StructType(
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
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]


def state_digest(spark, tbl) -> dict:
    df = tbl.read(spark)
    hashed = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in COLS]).alias("h")
    )
    row = hashed.agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr("bit_xor(h)").alias("xor"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("sum"),
    ).collect()[0]
    return {"rows": int(row["rows"]), "xor": int(row["xor"]), "sum": str(row["sum"])}


def main() -> None:
    n = int(os.environ.get("REPLAY_EVENTS", str(10**8)))
    cpus = int(os.environ.get("REPLAY_CPUS", str(os.cpu_count() or 32)))
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "replay-equiv", master=f"local[{cpus}]", shuffle_partitions=cpus * 4, extra_conf=extra
    )
    gen_kw = dict(n_convs=max(1000, n // 1000), turns_per_conv=50, hot_key_frac=0.15)

    def slice_(lo: int, hi: int, drop_tool: bool):
        df = datagen.change_log(spark, n, id_range=(lo, hi), **gen_kw)
        # physically absent column: the pre-evolution feed never had it
        return df.drop("tool") if drop_tool else df

    t0 = time.monotonic()
    # ---- replay A: 4 in-order batches, final compact ------------------
    tmp_a = tempfile.mkdtemp(prefix="replay_a_")
    tbl_a = LakeTable.create(
        f"{tmp_a}/t", SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=64
    )
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        merge_changes(spark, tbl_a, slice_(lo, hi, drop_tool=False),
                      batch_key=f"a:{i}", strategy="mor")
    compact(spark, tbl_a)
    wall_a = time.monotonic() - t0

    # ---- replay B: 8 shuffled batches, dup delivery, midway compact,
    # first-half batches with `tool` physically absent ------------------
    t1 = time.monotonic()
    tmp_b = tempfile.mkdtemp(prefix="replay_b_")
    tbl_b = LakeTable.create(
        f"{tmp_b}/t",
        T.StructType([f for f in SCHEMA.fields if f.name != "tool"]),
        ["conv_id", "turn_idx"],
        ["ts", "lsn"],
        n_buckets=64,
    )
    order = [5, 0, 7, 2, 4, 1, 6, 3]  # fixed shuffle of the 8 batches
    for step, i in enumerate(order):
        lo, hi = i * n // 8, (i + 1) * n // 8
        # tool is generated only for id >= 0.5n (tool_from_frac), so
        # dropping it from the first-half slices changes no values —
        # only the physical schema the batch arrives with
        merge_changes(spark, tbl_b, slice_(lo, hi, drop_tool=hi <= n // 2),
                      batch_key=f"b:{i}", strategy="mor")
        if step == 3:
            compact(spark, tbl_b)
            # duplicate delivery of an already-applied batch under a
            # FRESH key: the ledger can't dedupe it, read-time LWW must
            lo2, hi2 = order[1] * n // 8, (order[1] + 1) * n // 8
            merge_changes(spark, tbl_b, slice_(lo2, hi2, drop_tool=hi2 <= n // 2),
                          batch_key="b:dup", strategy="mor")
    compact(spark, tbl_b)
    wall_b = time.monotonic() - t1

    dig_a = state_digest(spark, tbl_a)
    dig_b = state_digest(spark, tbl_b)
    equal = dig_a == dig_b
    report = {
        "events": n,
        "cpus": cpus,
        "replay_a": {"batches": 4, "order": "in-order", "wall_s": round(wall_a, 1), **dig_a},
        "replay_b": {
            "batches": 8,
            "order": order,
            "dup_delivered_batch": order[1],
            "midway_compact_after_step": 3,
            "schema_evolution": "tool column physically absent in first-half batches",
            "wall_s": round(wall_b, 1),
            **dig_b,
        },
        "final_state_identical": equal,
    }
    print(json.dumps(report, indent=2))
    spark.stop()
    sys.exit(0 if equal else 1)


if __name__ == "__main__":
    main()
