"""Exact COUNT(DISTINCT) incremental maintenance (DistinctCountRollup):
two composed IncrementalRollups (support mart over (group, value) →
outer mart counting live support rows) must track a full
`groupBy(g).agg(countDistinct(v))` recompute through inserts, updates
that move values/groups, deletes, multiplicity churn, null values, and
replayed syncs."""

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import merge_changes
from digital_analytics_data_platform_spark.plans.ivm import DistinctCountRollup
from tests.conftest import cdc_rows


def _truth(spark, src, group, value):
    return {
        tuple(r[g] for g in group): r["d"]
        for r in src.read(spark)
        .groupBy(*group)
        .agg(F.countDistinct(value).alias("d"))
        .filter(F.col("d") > 0)
        .collect()
    }


def _mart(spark, dc, group, value):
    return {
        tuple(r[g] for g in group): r[f"distinct_{value}"]
        for r in dc.read(spark).collect()
    }


@pytest.fixture()
def src_and_distinct(spark, make_table, tmp_path):
    src = make_table("dcr_src", n_buckets=4)
    dc = DistinctCountRollup.create(
        str(tmp_path / "dcr_mart"), src, ["role"], "conv_id", n_buckets=4
    )
    return src, dc


def test_distinct_count_through_churn(spark, src_and_distinct):
    src, dc = src_and_distinct

    # batch 1: 3 convs as user, 2 as assistant (multiple turns per conv
    # → multiplicity > 1 behind each (role, conv) support pair)
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", f"c{i}", t, "user", f"u{i}/{t}", None, 1, i * 10 + t) for i in range(3) for t in range(3)]
            + [("U", f"c{i}", t, "assistant", f"a{i}/{t}", None, 1, 100 + i * 10 + t) for i in (7, 8) for t in range(2)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    dc.sync(spark, src)
    assert _mart(spark, dc, ["role"], "conv_id") == _truth(spark, src, ["role"], "conv_id")
    assert _mart(spark, dc, ["role"], "conv_id") == {("user",): 3, ("assistant",): 2}

    # batch 2: multiplicity-only churn (update one turn's text) — the
    # distinct count must NOT move
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c0", 1, "user", "rewritten", None, 50, 1000)]),
        batch_key="b2",
        strategy="mor",
    )
    dc.sync(spark, src)
    assert _mart(spark, dc, ["role"], "conv_id") == {("user",): 3, ("assistant",): 2}

    # batch 3: a turn flips role user→assistant (value c2 moves groups:
    # support (user, c2) loses one row but survives, (assistant, c2)
    # appears → assistant gains a distinct conv)
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c2", 0, "assistant", "now assistant", None, 60, 1100)]),
        batch_key="b3",
        strategy="mor",
    )
    dc.sync(spark, src)
    truth = _truth(spark, src, ["role"], "conv_id")
    assert _mart(spark, dc, ["role"], "conv_id") == truth == {("user",): 3, ("assistant",): 3}

    # batch 4: delete ALL of c1's user turns → user loses a distinct
    # conv; delete every assistant turn of c7 → assistant loses one
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("D", "c1", t, None, None, None, 70, 1200 + t) for t in range(3)]
            + [("D", "c7", t, None, None, None, 70, 1300 + t) for t in range(2)],
        ),
        batch_key="b4",
        strategy="mor",
    )
    dc.sync(spark, src)
    truth = _truth(spark, src, ["role"], "conv_id")
    assert _mart(spark, dc, ["role"], "conv_id") == truth == {("user",): 2, ("assistant",): 2}


def test_distinct_count_null_values_ignored(spark, make_table, tmp_path):
    src = make_table("dcr_null_src", n_buckets=4)
    dc = DistinctCountRollup.create(
        str(tmp_path / "dcr_null_mart"), src, ["role"], "tool", n_buckets=4
    )
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [
                ("U", "c1", 0, "assistant", "x", "python", 1, 1),
                ("U", "c1", 1, "assistant", "y", None, 1, 2),  # null tool: no distinct contribution
                ("U", "c1", 2, "assistant", "z", "search", 1, 3),
                ("U", "c2", 0, "user", "q", None, 1, 4),  # group with ONLY null values → absent
            ],
        ),
        batch_key="b1",
        strategy="mor",
    )
    dc.sync(spark, src)
    got = _mart(spark, dc, ["role"], "tool")
    assert got == _truth(spark, src, ["role"], "tool") == {("assistant",): 2}

    # the null-tool row later gains a tool → +1 distinct
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c1", 1, "assistant", "y", "sql", 9, 100)]),
        batch_key="b2",
        strategy="mor",
    )
    dc.sync(spark, src)
    assert _mart(spark, dc, ["role"], "tool") == {("assistant",): 3}


def test_distinct_count_sync_idempotent_and_loadable(spark, src_and_distinct, tmp_path):
    src, dc = src_and_distinct
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", f"c{i}", 0, "user", "m", None, 1, i) for i in range(5)]),
        batch_key="b1",
        strategy="mor",
    )
    dc.sync(spark, src)
    before = _mart(spark, dc, ["role"], "conv_id")
    r = dc.sync(spark, src)  # no new source commits → both levels skip
    assert r["skipped"] is True
    assert _mart(spark, dc, ["role"], "conv_id") == before == {("user",): 5}

    reloaded = DistinctCountRollup.load(str(tmp_path / "dcr_mart"), ["role"], "conv_id")
    assert _mart(spark, reloaded, ["role"], "conv_id") == before
    assert reloaded.support.cursor() == src.snapshot().version


def test_distinct_rollup_synced_inside_streaming_apply(spark, make_table, tmp_path):
    """`apply_stream(rollups=[DistinctCountRollup])` maintains both IVM
    levels in the streaming pass (incl. the periodic compact folding
    BOTH marts' MOR tails); after replay the distinct counts equal a
    countDistinct recompute of the source."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.streaming import (
        apply_stream,
        cdc_file_stream,
        write_log_segments,
    )

    n = 4_000
    log = datagen.change_log(spark, n, n_convs=60, turns_per_conv=8)
    log_dir = str(tmp_path / "cdclog")
    write_log_segments(log, log_dir, n_segments=4)

    tbl = make_table("dcr_stream_src")
    dc = DistinctCountRollup.create(str(tmp_path / "dcr_stream_mart"), tbl, ["role"], "conv_id", n_buckets=4)
    _, m = apply_stream(
        spark, cdc_file_stream(spark, log_dir, max_files_per_trigger=1),
        tbl.path, str(tmp_path / "ckpt"), pipeline_id="bronze", strategy="mor",
        rollups=[dc], rollup_sync_every=2, compact_every=2,
    )
    assert m.batches >= 4
    dc.sync(spark, tbl)  # drain the tail window past the last cadence tick
    assert _mart(spark, dc, ["role"], "conv_id") == _truth(spark, tbl, ["role"], "conv_id")


def test_read_topk_heavy_hitters(spark, src_and_distinct):
    """read_topk serves exact per-group heavy hitters straight from the
    support mart (no source scan): top-k values by live row count,
    ties broken by value ascending, current as of the last sync."""
    src, dc = src_and_distinct
    # role 'user': c0 ×3 rows, c1 ×2, c2 ×1; role 'asst': c1 ×2, c3 ×2 (tie)
    rows = (
        [("U", "c0", t, "user", "m", None, 1, 10 + t) for t in range(3)]
        + [("U", "c1", t, "user", "m", None, 1, 20 + t) for t in range(2)]
        + [("U", "c2", 0, "user", "m", None, 1, 30)]
        + [("U", "c1", t + 10, "asst", "m", None, 1, 40 + t) for t in range(2)]
        + [("U", "c3", t + 10, "asst", "m", None, 1, 50 + t) for t in range(2)]
    )
    merge_changes(spark, src, cdc_rows(spark, rows), batch_key="b1", strategy="mor")
    dc.sync(spark, src)
    got = {
        (r.role, r.rank): (r.conv_id, r.value_rows)
        for r in dc.read_topk(spark, k=2).collect()
    }
    assert got == {
        ("user", 1): ("c0", 3),
        ("user", 2): ("c1", 2),
        ("asst", 1): ("c1", 2),  # tie with c3 → value-ascending wins
        ("asst", 2): ("c3", 2),
    }
    # a delete dethrones the leader at the next sync
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("D", "c0", t, None, None, None, 2, 100 + t) for t in range(2)]),
        batch_key="b2",
        strategy="mor",
    )
    dc.sync(spark, src)
    top1 = {r.role: r.conv_id for r in dc.read_topk(spark, k=1).collect()}
    assert top1["user"] == "c1"
