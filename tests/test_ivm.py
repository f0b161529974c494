"""Incremental view maintenance: a SUM/COUNT rollup synced from the
source's image changelog must equal a full recompute after every sync,
under inserts, LWW updates, deletes, late/out-of-order events,
compaction in the window, and crash-replayed syncs."""

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import compact, merge_changes
from digital_analytics_data_platform_spark.plans.ivm import IncrementalRollup
from tests.conftest import cdc_rows


def _recompute(spark, src):
    """Ground truth: full batch aggregation of the source's live rows."""
    return {
        (r.role,): (r.cnt, r.sum_turn_idx)
        for r in src.read(spark)
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("turn_idx").cast("double")).alias("sum_turn_idx"),
        )
        .collect()
    }


def _mart(spark, roll):
    return {
        (r.role,): (r.cnt, round(r.sum_turn_idx, 6))
        for r in roll.read(spark).collect()
    }


@pytest.fixture()
def src_and_rollup(spark, make_table, tmp_path):
    src = make_table("ivm_src", n_buckets=4)
    roll = IncrementalRollup.create(
        str(tmp_path / "ivm_mart"), src, ["role"], ["turn_idx"], n_buckets=4
    )
    return src, roll


def test_ivm_tracks_recompute_through_churn(spark, src_and_rollup):
    src, roll = src_and_rollup

    # batch 1: plain inserts across three roles
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", f"c{i}", t, ["user", "assistant", "tool"][i % 3], f"m{i}/{t}", None, i, i * 10 + t)
             for i in range(12) for t in range(3)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    r = roll.sync(spark, src)
    assert not r["skipped"]
    assert _mart(spark, roll) == _recompute(spark, src)

    # batch 2: LWW updates that MOVE rows between groups (role changes:
    # the retraction case a lookback recompute gets for free and naive
    # upsert marts get wrong) + deletes + a brand-new conversation
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [
                ("U", "c0", 0, "assistant", "rewritten", None, 1000, 9001),  # user → assistant
                ("U", "c1", 1, "tool", "rewritten", "search", 1000, 9002),  # assistant → tool
                ("D", "c2", 2, None, None, None, 1000, 9003),  # delete one tool row
                ("U", "c99", 0, "user", "new conv", None, 1000, 9004),
            ],
        ),
        batch_key="b2",
        strategy="mor",
    )
    roll.sync(spark, src)
    assert _mart(spark, roll) == _recompute(spark, src)

    # batch 3: late event LOSES LWW (no state change) + compaction in
    # the window — the exact changelog must contribute nothing for them
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c0", 0, "user", "stale", None, 5, 1)]),  # loses to lsn 9001
        batch_key="b3",
        strategy="mor",
    )
    compact(spark, src, all_buckets=True)
    r3 = roll.sync(spark, src)
    assert _mart(spark, roll) == _recompute(spark, src)
    assert r3.get("groups", 0) == 0  # nothing actually changed

    # a whole group disappearing must tombstone its mart row
    live_c99 = [("D", "c99", 0, None, None, None, 2000, 9100)]
    merge_changes(spark, src, cdc_rows(spark, live_c99), batch_key="b4", strategy="mor")
    roll.sync(spark, src)
    truth = _recompute(spark, src)
    got = _mart(spark, roll)
    assert got == truth
    assert all(cnt > 0 for cnt, _ in got.values())


def _recompute_mm(spark, src):
    """Ground truth incl. extrema: full batch aggregation of live rows."""
    return {
        (r.role,): (r.cnt, r.min_lsn, r.max_lsn)
        for r in src.read(spark)
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .collect()
    }


def _mart_mm(spark, roll):
    return {
        (r.role,): (r.cnt, r.min_lsn, r.max_lsn) for r in roll.read(spark).collect()
    }


def test_ivm_min_max_through_churn(spark, make_table, tmp_path):
    """MIN/MAX maintenance: incremental for inserts, dirty-group source
    recompute when a retraction removes the stored extremum — including
    the tie case (a duplicate of the min survives) and group-moving
    updates."""
    src = make_table("ivm_mm_src", n_buckets=4)
    roll = IncrementalRollup.create(
        str(tmp_path / "ivm_mm_mart"), src, ["role"], ["turn_idx"],
        min_cols=["lsn"], max_cols=["lsn"], n_buckets=4,
    )

    # inserts only (clean path): user lsn ∈ {10, 20}, assistant {30, 40}
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [
                ("U", "c1", 0, "user", "a", None, 1, 10),
                ("U", "c1", 1, "user", "b", None, 1, 20),
                ("U", "c2", 0, "assistant", "c", None, 1, 30),
                ("U", "c2", 1, "assistant", "d", None, 1, 40),
            ],
        ),
        batch_key="b1",
        strategy="mor",
    )
    roll.sync(spark, src)
    assert _mart_mm(spark, roll) == _recompute_mm(spark, src)

    # retract the user MIN (delete the lsn=10 row): dirty recompute must
    # find the surviving lsn=20 row
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c1", 0, None, None, None, 50, 50)]),
        batch_key="b2",
        strategy="mor",
    )
    roll.sync(spark, src)
    truth = _recompute_mm(spark, src)
    assert _mart_mm(spark, roll) == truth
    assert truth[("user",)][1] == 20  # min actually moved

    # retract the assistant MAX via a group-moving LWW update
    # (assistant→tool): assistant max must fall back to 30, tool gains
    # the moved row at its new lsn
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c2", 1, "tool", "moved", "search", 60, 60)]),
        batch_key="b3",
        strategy="mor",
    )
    roll.sync(spark, src)
    truth = _recompute_mm(spark, src)
    assert _mart_mm(spark, roll) == truth
    assert truth[("assistant",)][2] == 30
    assert truth[("tool",)] == (1, 60, 60)

    # tie case: two extra user rows at the current min lsn; retracting
    # one marks the group dirty and the recompute must find the
    # surviving duplicate (min stays put)
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [
                ("U", "c3", 0, "user", "dup-min-1", None, 70, 20),
                ("U", "c3", 1, "user", "dup-min-2", None, 70, 20),
            ],
        ),
        batch_key="b4",
        strategy="mor",
    )
    roll.sync(spark, src)
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c3", 0, None, None, None, 80, 80)]),
        batch_key="b5",
        strategy="mor",
    )
    roll.sync(spark, src)
    truth = _recompute_mm(spark, src)
    assert _mart_mm(spark, roll) == truth
    assert truth[("user",)][1] == 20

    # whole group disappears: tombstoned, not a stale-extremum row
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c2", 1, None, None, None, 90, 90)]),
        batch_key="b6",
        strategy="mor",
    )
    roll.sync(spark, src)
    truth = _recompute_mm(spark, src)
    got = _mart_mm(spark, roll)
    assert got == truth
    assert ("tool",) not in got  # tombstoned, not a stale-extremum row


def test_ivm_min_max_conv_keyed_prunes_source(spark, make_table, tmp_path):
    """When the rollup is keyed by the source's first key column, the
    dirty recompute read is bucket-pruned to the dirty groups' buckets."""
    src = make_table("ivm_mm_conv", n_buckets=4)
    roll = IncrementalRollup.create(
        str(tmp_path / "ivm_mm_conv_mart"), src, ["conv_id"], ["turn_idx"],
        max_cols=["lsn"], n_buckets=4,
    )
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", f"c{i}", t, "user", f"m{i}/{t}", None, 1, i * 10 + t) for i in range(8) for t in range(2)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    roll.sync(spark, src)

    # delete ONE conversation's max row → exactly that group is dirty
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c3", 1, None, None, None, 500, 500)]),
        batch_key="b2",
        strategy="mor",
    )
    r = roll.sync(spark, src)
    assert r["groups"] == 1
    got = {
        (row.conv_id,): (row.cnt, row.max_lsn) for row in roll.read(spark).collect()
    }
    truth = {
        (row.conv_id,): (row.cnt, row.max_lsn)
        for row in src.read(spark)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("lsn").alias("max_lsn"))
        .collect()
    }
    assert got == truth
    assert truth[("c3",)] == (1, 30)


def test_ivm_sync_is_idempotent_and_cursor_atomic(spark, src_and_rollup):
    src, roll = src_and_rollup
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", f"c{i}", 0, "user", f"m{i}", None, i, i + 1) for i in range(10)]),
        batch_key="b1",
        strategy="mor",
    )
    r1 = roll.sync(spark, src)
    assert roll.cursor() == r1["head"]
    before = _mart(spark, roll)

    # replaying the same window (crash-after-commit recovery) is a
    # ledger no-op and the mart is unchanged
    r2 = roll.sync(spark, src)
    assert r2["skipped"] is True
    assert _mart(spark, roll) == before

    # the cursor prop rode the SAME commit as the totals: no snapshot
    # exists where totals are applied but the cursor is stale
    versions = roll.table.list_snapshots()
    applied = [
        v
        for v in versions
        if any(f["rows"] for f in roll.table.snapshot(v).files)
    ]
    for v in applied:
        assert int(roll.table.snapshot(v).props.get("ivm_src_version", 0)) > 0


def test_ivm_empty_window_advances_cursor(spark, src_and_rollup):
    src, roll = src_and_rollup
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c1", 0, "user", "hi", None, 0, 1)]),
        batch_key="b1",
        strategy="mor",
    )
    roll.sync(spark, src)
    # compaction-only window: exact changelog is empty, cursor still moves
    compact(spark, src, all_buckets=True)
    r = roll.sync(spark, src)
    assert not r["skipped"] and r["groups"] == 0
    assert roll.cursor() == src.snapshot().version


def test_ivm_synced_inside_streaming_apply(spark, make_table, tmp_path):
    """`apply_stream(rollups=[…])` maintains the mart in the same
    streaming pass as the CDC apply; after availableNow replay the mart
    equals a full recompute, and a checkpoint-resumed restart with new
    segments keeps it exact."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.streaming import (
        apply_stream,
        cdc_file_stream,
        write_log_segments,
    )

    n = 4_000
    full_log = datagen.change_log(spark, n * 2, n_convs=60, turns_per_conv=8)
    log_dir = str(tmp_path / "cdclog")
    write_log_segments(full_log.filter(F.col("lsn") < n), log_dir, n_segments=4)

    tbl = make_table("ivm_stream_src")
    roll = IncrementalRollup.create(
        str(tmp_path / "mart"), tbl, ["role"], ["turn_idx"], n_buckets=4
    )
    ckpt = str(tmp_path / "ckpt")

    src = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    _, m1 = apply_stream(
        spark, src, tbl.path, ckpt, pipeline_id="bronze", strategy="mor",
        rollups=[roll], rollup_sync_every=2,
    )
    assert m1.batches >= 4
    roll.sync(spark, tbl)  # drain any tail window past the last cadence tick
    assert _mart(spark, roll) == _recompute(spark, tbl)

    # new segments + checkpoint resume: mart stays exact
    write_log_segments(full_log.filter(F.col("lsn") >= n), log_dir, n_segments=2)
    src2 = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    apply_stream(
        spark, src2, tbl.path, ckpt, pipeline_id="bronze", strategy="mor",
        rollups=[roll], rollup_sync_every=1,
    )
    assert _mart(spark, roll) == _recompute(spark, tbl)


def test_ivm_min_max_dirty_recompute_on_bloomed_source(spark, make_table, tmp_path):
    """A source table carrying per-file blooms adds the keyset-bloom
    pruning tier to the dirty-group recompute read; the result must stay
    exactly equal to a full recompute (pruning is conservative)."""
    src = make_table("ivm_mm_bloom", n_buckets=4, props={"bloom_cols": ["conv_id"]})
    roll = IncrementalRollup.create(
        str(tmp_path / "ivm_mm_bloom_mart"), src, ["conv_id"], ["turn_idx"],
        min_cols=["lsn"], max_cols=["lsn"], n_buckets=4,
    )
    # several MOR batches over disjoint convs → a delta tail the keyset
    # bloom can skip when only one conv's group goes dirty
    for b in range(3):
        merge_changes(
            spark,
            src,
            cdc_rows(
                spark,
                [
                    ("U", f"c{b}_{i}", t, "user", f"m{b}/{i}/{t}", None, b * 100 + i, b * 1000 + i * 10 + t)
                    for i in range(4)
                    for t in range(2)
                ],
            ),
            batch_key=f"b{b}",
            strategy="mor",
        )
    roll.sync(spark, src)

    # delete c1_2's max row → dirty recompute must find the survivor
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c1_2", 1, None, None, None, 900, 99_999)]),
        batch_key="del",
        strategy="mor",
    )
    r = roll.sync(spark, src)
    assert r["groups"] == 1
    got = {
        row.conv_id: (row.cnt, row.min_lsn, row.max_lsn) for row in roll.read(spark).collect()
    }
    truth = {
        row.conv_id: (row.cnt, row.min_lsn, row.max_lsn)
        for row in src.read(spark)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .collect()
    }
    assert got == truth
    assert truth["c1_2"] == (1, 1020, 1020)


def test_ivm_sumsq_serves_exact_variance_through_churn(spark, make_table, tmp_path):
    """sumsq columns are invertible like SUM: through updates and
    deletes the mart's (cnt, sum, sumsq) must equal a recompute, and
    the derived population variance must match Spark's var_pop."""
    src = make_table("ivm_sq_src", n_buckets=4)
    roll = IncrementalRollup.create(
        str(tmp_path / "ivm_sq_mart"), src, ["role"], ["lsn"], sumsq_cols=["lsn"], n_buckets=4
    )

    def check():
        got = {
            r.role: (r.cnt, r.sum_lsn, r.sumsq_lsn) for r in roll.read(spark).collect()
        }
        truth = {
            r.role: (r.cnt, r.s, r.sq)
            for r in src.read(spark)
            .groupBy("role")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("lsn").cast("double")).alias("s"),
                F.sum(F.col("lsn").cast("double") * F.col("lsn")).alias("sq"),
            )
            .collect()
        }
        assert got == truth
        var = {
            r.role: round(r.v, 6)
            for r in src.read(spark)
            .groupBy("role")
            .agg(F.var_pop(F.col("lsn").cast("double")).alias("v"))
            .collect()
        }
        derived = {
            role: round(sq / cnt - (s / cnt) ** 2, 6) for role, (cnt, s, sq) in got.items()
        }
        assert derived == var

    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", f"c{i}", t, "user" if i % 2 else "assistant", "m", None, 1, i * 7 + t) for i in range(6) for t in range(3)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    roll.sync(spark, src)
    check()

    # update moves a row's lsn (retract old square, add new) + delete a row
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", "c1", 0, "user", "m2", None, 90, 5000), ("D", "c2", 2, None, None, None, 91, 5001)],
        ),
        batch_key="b2",
        strategy="mor",
    )
    roll.sync(spark, src)
    check()
