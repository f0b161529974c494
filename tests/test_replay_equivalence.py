"""Replay equivalence: full synthetic CDC logs through the engine must
match the trivially-correct DuckDB reducer byte-for-byte on per-turn
text under stable (conv_id, turn_idx) order — the north-rule gate."""

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import compact, merge_changes
from tests.conftest import assert_state_equal, oracle_state


def run_replay(spark, make_table, n_events, n_batches, strategy="cow", compact_at=(), **gen_kw):
    log = datagen.change_log(spark, n_events, **gen_kw)
    tbl = make_table()
    for i in range(n_batches):
        lo, hi = i * n_events // n_batches, (i + 1) * n_events // n_batches
        merge_changes(
            spark,
            tbl,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_key=f"replay:{i}",
            strategy=strategy,
        )
        if i in compact_at:
            compact(spark, tbl)
    got = tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    exp = oracle_state(log.toPandas())
    assert_state_equal(got, exp)
    return tbl


def test_replay_small(spark, make_table):
    run_replay(spark, make_table, 5_000, 3, n_convs=100, turns_per_conv=10)


def test_replay_hot_keys(spark, make_table):
    # 60% of events hit one conversation — the skew case
    run_replay(spark, make_table, 8_000, 4, n_convs=50, turns_per_conv=20, hot_key_frac=0.6)


def test_replay_heavy_churn(spark, make_table):
    # few keys, many updates/deletes/dups → every key rewritten many times
    run_replay(
        spark,
        make_table,
        6_000,
        3,
        n_convs=10,
        turns_per_conv=5,
        delete_frac=0.15,
        dup_frac=0.2,
    )


def test_replay_unordered_batches(spark, make_table):
    # batches applied out of global order: 2,0,1 — final state identical
    n = 6_000
    log = datagen.change_log(spark, n, n_convs=80, turns_per_conv=10)
    tbl = make_table()
    for i in (2, 0, 1):
        lo, hi = i * n // 3, (i + 1) * n // 3
        merge_changes(
            spark, tbl, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)), batch_key=f"o:{i}"
        )
    got = tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    assert_state_equal(got, oracle_state(log.toPandas()))


def test_replay_with_schema_evolution(spark, make_table):
    """First half of the log physically lacks the `tool` column."""
    from tests.conftest import TRANSCRIPT_SCHEMA
    import pyspark.sql.types as T

    n = 6_000
    log = datagen.change_log(spark, n, n_convs=60, turns_per_conv=10, tool_from_frac=0.5)
    pre, post = datagen.split_for_schema_evolution(log, n, 0.5)
    tbl = make_table(schema=T.StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"]))
    merge_changes(spark, tbl, pre, batch_key="pre")
    merge_changes(spark, tbl, post, batch_key="post")
    got = tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    exp = oracle_state(log.toPandas())
    assert_state_equal(got, exp)
    assert got["tool"].notna().sum() > 0


def test_replay_mor_with_midway_compact(spark, make_table):
    """Merge-on-read appends + a mid-replay compaction must be replay-
    equivalent to copy-on-write (same oracle)."""
    tbl = run_replay(
        spark, make_table, 6_000, 4, strategy="mor", compact_at=(1,),
        n_convs=80, turns_per_conv=10, delete_frac=0.1,
    )
    # after compaction + more mor batches, deltas exist again
    assert tbl.snapshot().props.get("delta_buckets")


def test_mor_tombstone_and_cow_interop(spark, make_table):
    """MOR delete wins over an earlier COW insert; a COW merge after MOR
    folds the touched buckets' deltas down."""
    from tests.conftest import cdc_rows

    tbl = make_table()
    merge_changes(spark, tbl, cdc_rows(spark, [("I", "c1", 0, "user", "v1", None, 10, 1)]), batch_key="a")
    merge_changes(
        spark, tbl, cdc_rows(spark, [("D", "c1", 0, None, None, None, 20, 2)]),
        batch_key="b", strategy="mor",
    )
    assert tbl.read(spark).count() == 0
    # late older update cannot resurrect through the MOR tombstone
    merge_changes(
        spark, tbl, cdc_rows(spark, [("U", "c1", 0, "user", "stale", None, 15, 3)]),
        batch_key="c", strategy="mor",
    )
    assert tbl.read(spark).count() == 0
    # COW merge on the same bucket clears its delta bookkeeping
    merge_changes(spark, tbl, cdc_rows(spark, [("I", "c1", 1, "user", "new", None, 30, 4)]), batch_key="d")
    assert [r["text"] for r in tbl.read(spark).collect()] == ["new"]


def test_generator_is_deterministic(spark):
    a = datagen.change_log(spark, 2_000, seed=7).toPandas()
    b = datagen.change_log(spark, 2_000, seed=7).toPandas()
    assert a.equals(b)
    c = datagen.change_log(spark, 2_000, seed=8).toPandas()
    assert not a.equals(c)


def test_generator_slices_union_to_full_log(spark):
    """id_range slicing is O(slice) batch feeding for huge replays; the
    union of slices must equal the full log byte-for-byte."""
    import pandas as pd

    sort = ["commit_lsn", "lsn", "text"]
    full = datagen.change_log(spark, 4_000).toPandas().sort_values(sort).reset_index(drop=True)
    parts = [
        datagen.change_log(spark, 4_000, id_range=(lo, lo + 1000)).toPandas()
        for lo in range(0, 4_000, 1000)
    ]
    u = pd.concat(parts).sort_values(sort).reset_index(drop=True)
    assert full.equals(u)
