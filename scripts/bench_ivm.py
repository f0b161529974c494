"""Measure incremental view maintenance's O(changed-groups) claim.

A per-conversation rollup mart (group by conv_id: turn count + sums) is
kept exact by `IncrementalRollup.sync` after every applied batch. The
workload is the realistic CDC shape: a large seed load over SEED_CONVS
conversations, then small incremental batches that each touch a
CONSTANT window of conversations (half updates to existing seed convs,
half brand-new convs) while the source table keeps growing. If sync
cost scaled with SOURCE or MART size rather than delta size, later
ticks would be slowest; the artifact records per-tick sync wall vs a
full-recompute wall (scan source + re-aggregate — the lower bound of
any lookback/recompute mart refresh, which is how the reference
maintains its gold rollups, e.g. the 120-day weekly MERGE). Every tick
also hash-verifies mart == recompute, so the speed claim is never
decoupled from exactness.

Env knobs: IVM_SEED_EVENTS (default 16_000_000), IVM_BATCH_EVENTS
(400_000), IVM_BATCHES (8), IVM_CPUS (8), IVM_BUCKETS (16),
IVM_SEED_CONVS (100_000), IVM_WINDOW_CONVS (2_000).
IVM_DISTINCT=1 swaps the mart for the two-level exact
COUNT(DISTINCT role)-per-conversation rollup (DistinctCountRollup) and
the recompute/exactness oracle for
`groupBy(conv_id).countDistinct(role)` — a high-cardinality outer mart
(one row per conversation) whose recompute pays a full distinct-agg
shuffle producing seed_convs rows every refresh, while the sync pays
O(changed pairs + changed groups). (A low-cardinality grouping — 4
roles — is NOT the win case: its recompute is a single cheap scan, and
a measured run showed sync ≈ recompute there; distinct IVM earns its
keep when the mart is wide.)
IVM_JOIN=1 swaps the mart for the delta-join rollup (JoinRollup): a
conv→channel dimension table (seed_convs rows) joins the fact feed and
the mart groups by channel (cnt + sum(turn_idx) + sum(weight)); every
tick ALSO rewrites a slice of dim rows to new channels (group moves
that retract joined contributions), and the recompute baseline pays
the full fact⋈dim join + agg a lookback-free refresh would pay, while
the sync folds two changelog deltas against pruned snapshot probes.
Artifact: bench_runs/IVM_r04.json (sum mode) /
bench_runs/IVM_DISTINCT_r04.json (distinct mode) /
bench_runs/IVM_JOIN_r04.json (join mode; IVM_DIM_CHURN dim rows
re-channeled per tick, default 1_000).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
from digital_analytics_data_platform_spark.plans.ivm import IncrementalRollup
from digital_analytics_data_platform_spark.session import get_spark


def _digest(df, cols):
    """Order-insensitive content digest: xor of per-row xxhash64."""
    row_h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(row_h).alias("h"),
    ).collect()[0]
    return (int(r["n"]), int(r["h"] or 0))


def main() -> dict:
    seed_events = int(os.environ.get("IVM_SEED_EVENTS", "16000000"))
    batch_events = int(os.environ.get("IVM_BATCH_EVENTS", "400000"))
    batches = int(os.environ.get("IVM_BATCHES", "8"))
    cpus = int(os.environ.get("IVM_CPUS", "8"))
    buckets = int(os.environ.get("IVM_BUCKETS", "16"))
    seed_convs = int(os.environ.get("IVM_SEED_CONVS", "100000"))
    window_convs = int(os.environ.get("IVM_WINDOW_CONVS", "2000"))
    distinct_mode = os.environ.get("IVM_DISTINCT") == "1"
    join_mode = os.environ.get("IVM_JOIN") == "1"
    dim_churn = int(os.environ.get("IVM_DIM_CHURN", "1000"))
    spark = get_spark("bench-ivm", master=f"local[{cpus}]", shuffle_partitions=cpus)

    total = seed_events + batches * batch_events
    d = tempfile.mkdtemp(prefix="ivmlake_")

    def gen(lo: int, hi: int, n_convs: int) -> "F.DataFrame":
        return datagen.change_log(
            spark,
            total,
            n_convs=n_convs,
            turns_per_conv=20,
            garbage_frac=0.0,
            hot_key_frac=0.02,
            id_range=(lo, hi),
        ).drop("op", "commit_lsn")

    # Tick 0: seed load across the full conv namespace.
    seed = gen(0, seed_events, seed_convs)
    tbl = LakeTable.create(
        os.path.join(d, "bronze"), seed.schema, ["conv_id", "turn_idx"], ["ts", "lsn"],
        n_buckets=buckets,
    )
    def dim_batch(conv_lo: int, conv_hi: int, salt: int):
        """Deterministic dim rows for conv ids [lo, hi): channel drawn
        from 8 values re-keyed by `salt` (so a new salt moves ~7/8 of
        the slice to a different channel), plus a numeric weight."""
        return spark.range(conv_lo, conv_hi).select(
            F.concat(F.lit("conv_"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("conv_id"),
            F.concat(
                F.lit("ch_"), F.pmod(F.xxhash64(F.col("id") + F.lit(salt)), F.lit(8)).cast("string")
            ).alias("channel"),
            # multiples of 0.25 are exactly representable in binary
            # floating point, so SUM(weight) is order-independent and
            # the mart/recompute digests can compare exactly
            (F.pmod(F.col("id"), F.lit(16)) / F.lit(4.0)).alias("weight"),
            F.timestamp_seconds(F.lit(1767225600 + salt)).alias("ts"),
            (F.lit(salt) * F.lit(10_000_000) + F.col("id")).alias("lsn"),
        )

    if join_mode:
        from digital_analytics_data_platform_spark.plans.ivm import JoinRollup

        dim0 = dim_batch(0, seed_convs, 0)
        dimtbl = LakeTable.create(
            os.path.join(d, "dim"), dim0.schema, ["conv_id"], ["ts", "lsn"], n_buckets=buckets
        )
        merge_changes(spark, dimtbl, dim0, batch_key="dim-seed", strategy="mor")
        roll = JoinRollup.create(
            os.path.join(d, "mart"),
            tbl,
            dimtbl,
            join_cols=["conv_id"],
            group_cols=["channel"],
            sum_cols=["turn_idx", "weight"],
            n_buckets=buckets,
        )
        mart_cols = ["channel", "cnt", "sum_turn_idx", "sum_weight"]
    elif distinct_mode:
        from digital_analytics_data_platform_spark.plans.ivm import DistinctCountRollup

        roll = DistinctCountRollup.create(
            os.path.join(d, "mart"), tbl, ["conv_id"], "role", n_buckets=buckets
        )
        mart_cols = ["conv_id", "distinct_role"]
    else:
        roll = IncrementalRollup.create(
            os.path.join(d, "mart"), tbl, ["conv_id"], ["turn_idx"], n_buckets=buckets
        )
        mart_cols = ["conv_id", "cnt", "sum_turn_idx"]

    ticks = []

    def tick(label, batch, dbatch=None):
        t0 = time.monotonic()
        merge_changes(spark, tbl, batch, batch_key=f"b{label}", strategy="mor")
        if dbatch is not None:
            merge_changes(spark, dimtbl, dbatch, batch_key=f"d{label}", strategy="mor")
        apply_wall = time.monotonic() - t0

        t0 = time.monotonic()
        r = roll.sync(spark, tbl)
        sync_wall = time.monotonic() - t0

        # The recompute a lookback-free refresh would have to do: full
        # source scan + LWW collapse + hash agg, reduced to the same
        # digest shape so both sides pay the materialization.
        t0 = time.monotonic()
        if join_mode:
            recomp = (
                tbl.read(spark)
                .join(dimtbl.read(spark), on="conv_id")
                .groupBy("channel")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.col("turn_idx").cast("double")).alias("sum_turn_idx"),
                    F.sum("weight").alias("sum_weight"),
                )
            )
        elif distinct_mode:
            # countDistinct ignores nulls (the feed's delete-shaped
            # events carry null payloads); a group with ONLY null values
            # has no support rows, hence no mart row → filter d > 0
            recomp = (
                tbl.read(spark)
                .groupBy("conv_id")
                .agg(F.countDistinct("role").alias("distinct_role"))
                .filter(F.col("distinct_role") > 0)
            )
        else:
            recomp = (
                tbl.read(spark)
                .groupBy("conv_id")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.col("turn_idx").cast("double")).alias("sum_turn_idx"),
                )
            )
        dig_recomp = _digest(recomp, mart_cols)
        recompute_wall = time.monotonic() - t0

        dig_mart = _digest(roll.read(spark), mart_cols)
        assert dig_mart == dig_recomp, f"tick {label}: mart {dig_mart} != recompute {dig_recomp}"

        ticks.append(
            {
                "tick": label,
                "source_rows_live": tbl.total_rows(),
                "mart_groups": dig_mart[0],
                "changed_groups": int(r.get("groups") or 0),
                "apply_wall_s": round(apply_wall, 2),
                "ivm_sync_wall_s": round(sync_wall, 2),
                "full_recompute_wall_s": round(recompute_wall, 2),
                "mart_equals_recompute": True,
            }
        )
        print(json.dumps(ticks[-1]), file=sys.stderr)

    tick("seed", seed)

    # Incremental ticks: each batch touches a CONSTANT window of convs —
    # even conv numbers are remapped onto existing seed convs (updates),
    # odd conv numbers become brand-new convs unique to this tick. The
    # changed-group count stays ~window_convs while the source grows.
    num = F.substring("conv_id", 6, 8).cast("int")
    for b in range(batches):
        lo = seed_events + b * batch_events
        raw = gen(lo, lo + batch_events, window_convs)
        new_num = F.when(
            num % 2 == 0, F.pmod(num * 7919, F.lit(seed_convs))
        ).otherwise(F.lit(seed_convs) + F.lit(b * window_convs) + num)
        batch = raw.withColumn(
            "conv_id", F.concat(F.lit("conv_"), F.lpad(new_num.cast("string"), 8, "0"))
        )
        dbatch = None
        if join_mode:
            # group-move churn: re-channel a rolling slice of existing
            # dim rows (salt=b+1 redraws each conv's channel), forcing
            # retraction of their already-joined contributions
            start = (b * dim_churn * 13) % max(1, seed_convs - dim_churn)
            dbatch = dim_batch(start, start + dim_churn, b + 1)
        tick(b, batch, dbatch)

    inc = ticks[1:]
    half = len(inc) // 2
    mean = lambda xs: sum(xs) / max(1, len(xs))  # noqa: E731
    out = {
        "metric": "IVM sync wall vs source growth (O(changed-groups) check), exactness verified per tick",
        "distinct_mode": distinct_mode,
        "join_mode": join_mode,
        "dim_churn": dim_churn if join_mode else None,
        "seed_events": seed_events,
        "batch_events": batch_events,
        "batches": batches,
        "cpus": cpus,
        "buckets": buckets,
        "seed_convs": seed_convs,
        "window_convs": window_convs,
        "ticks": ticks,
        "sync_wall_first_half_s": round(mean([t["ivm_sync_wall_s"] for t in inc[:half]]), 2),
        "sync_wall_second_half_s": round(mean([t["ivm_sync_wall_s"] for t in inc[half:]]), 2),
        "recompute_wall_first_half_s": round(
            mean([t["full_recompute_wall_s"] for t in inc[:half]]), 2
        ),
        "recompute_wall_second_half_s": round(
            mean([t["full_recompute_wall_s"] for t in inc[half:]]), 2
        ),
        "sync_speedup_vs_recompute_last_tick": round(
            inc[-1]["full_recompute_wall_s"] / max(1e-9, inc[-1]["ivm_sync_wall_s"]), 2
        )
        if inc
        else None,
        "all_ticks_exact": all(t["mart_equals_recompute"] for t in ticks),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
