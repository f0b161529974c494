"""Physical-plan assertions: the scale properties the engine claims
(filter pushdown to the scan, broadcast for small dims, no
row-at-a-time Python in any registry query) checked against
`.explain`/optimizedPlan output, so a regression that silently
de-optimizes a plan fails CI rather than only showing up at 100 TB.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="driver testdata not present"
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@needs_testdata
def test_lookback_filter_pushes_to_parquet_scan(spark):
    """S1: the lookback predicate must reach the parquet reader as a
    pushed filter, and the projection must prune the read schema —
    a scan that reads all columns to serve two is wrong at any scale."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = ev.filter(F.col("ts") >= F.lit("2024-01-15")).select("event_id", "ts")
    plan = _explain(q)
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp" in plan


@needs_testdata
def test_calendar_dim_join_broadcasts(spark):
    """J8: the fiscal-calendar dim (≈52 rows/yr) must broadcast — a
    shuffle join against a hundred-row dim is the canonical small-dim
    mistake."""
    from digital_analytics_data_platform_spark.queries import q_yoy_weekly

    plan = _explain(q_yoy_weekly(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


@needs_testdata
def test_no_row_at_a_time_python_in_any_registry_plan(spark):
    """§2.8 contract: zero per-row Python UDFs anywhere. Pandas/Arrow
    UDFs (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
    sanctioned Python escape hatch; BatchEvalPython (pickle-per-row) is
    banned. Checks every registry entry that builds a plan lazily."""
    from digital_analytics_data_platform_spark.queries import PYTEST_ONLY, REGISTRY

    # entries that execute eagerly (streaming into memory sinks, k-means
    # training collects) are driven by their own tests; everything else
    # must produce a BatchEvalPython-free plan. PYTEST_ONLY entries are
    # off the driver's 50-row CORRECTNESS window but stay under the
    # same no-per-row-Python contract.
    eager = {"stream_windowed_rollup", "stream_events_rollup", "ivf_ann"}
    checked = 0
    for name, fn in {**REGISTRY, **PYTEST_ONLY}.items():
        if name in eager:
            continue
        plan = _explain(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
        checked += 1
    assert checked >= 50


@needs_testdata
def test_exact_dedupe_has_partial_combine_and_no_window(spark):
    """W1-at-scale: the LWW dedupe must run PARTIAL aggregation before
    the exchange (map-side combine collapses hot keys, so a Zipf-skewed
    conversation can't stall one reducer) and must never be a Window
    over the full shuffled table. Note the physical op is SortAggregate,
    not HashAggregate — `max_by(struct, struct)` carries a struct
    aggregation buffer, which Spark's hash aggregate cannot hold
    (mutable-buffer-types rule); the scale property that matters is the
    partial combine + single shuffle, which this asserts."""
    from digital_analytics_data_platform_spark.operators.dedupe import dedupe_lww

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _explain(dedupe_lww(ev, ["user_id", "event_type"], ["ts", "event_id"]))
    import re

    assert "partial_max_by" in plan  # map-side combine, pre-shuffle
    assert "Window" not in plan
    # one shuffle, keyed by the merge key (formatted explain prints each
    # node twice: once in the tree, once in the detail section)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_gold_keys_read_is_column_pruned(spark, tmp_path):
    """A keys-only projection over a gold mart must read ONLY the key
    columns (+ the deleted flag), never the full metric width — plan
    hygiene for consumption-time key scans (the per-batch scoped-delete
    lookup itself now reads the narrow conv-bucketed key index, see
    test_gold_scoped_delete_reads_keyidx_bucket_pruned)."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.lake.table import LakeTable
    from digital_analytics_data_platform_spark.plans.pipeline import MedallionPipeline
    from tests.conftest import TRANSCRIPT_SCHEMA

    p = MedallionPipeline(str(tmp_path / "med"), n_buckets=8, run_qa=False)
    p.create_tables(TRANSCRIPT_SCHEMA)
    p.apply_batch(spark, datagen.change_log(spark, 1000, n_convs=10, turns_per_conv=5), 0)
    g = LakeTable.load(str(tmp_path / "med" / "gold_daily"))
    q = g.read(spark).select("day", "conv_id")
    plan = _explain(q)
    assert "ReadSchema: struct<day:date,conv_id:string,_deleted:boolean>" in plan


def test_gold_day_range_read_prunes_files(spark, tmp_path):
    """Consumption-time pruning: a `day BETWEEN` dashboard read over a
    day-keyed gold mart must skip files whose per-file min/max day
    stats cannot overlap the range (VERDICT r3 ask #6). MOR appends
    keep per-commit files day-range-narrow, so a range read touches
    only the commits that cover it."""
    import datetime as dt

    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes

    schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("n_turns", T.LongType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tbl = LakeTable.create(str(tmp_path / "mart"), schema, ["day", "conv_id"], ["lsn"], n_buckets=4)
    for m, lo in enumerate((1, 11, 21)):
        rows = [
            (dt.date(2025, 1, lo + i), f"c{j}", i + j, m * 1000 + i * 10 + j)
            for i in range(10)
            for j in range(3)
        ]
        merge_changes(
            spark, tbl, spark.createDataFrame(rows, schema), batch_key=f"b{m}", strategy="mor"
        )
    all_files = tbl.read(spark).inputFiles()
    pruned = tbl.read(spark, stats_range={"day": ("2025-01-21", "2025-01-31")})
    assert 0 < len(pruned.inputFiles()) < len(all_files)
    # skipping is conservative, not exact — the predicate still applies
    got = pruned.filter(F.col("day") >= "2025-01-21").count()
    exp = tbl.read(spark).filter(F.col("day") >= "2025-01-21").count()
    assert got == exp == 30


def test_changelog_key_semijoin_broadcasts_small_windows(spark, make_table):
    """The changed-key semi-joins in read_changes/read_changelog must
    broadcast the key set for normal-sized windows (the manifest's row
    counts gate it for free): a sort-merge join would shuffle the TABLE
    side's full row payloads, re-coupling changelog cost to table size.
    Oversized windows must fall back to the shuffle join rather than
    broadcast an unbounded key set."""
    from tests.conftest import cdc_rows

    from digital_analytics_data_platform_spark.lake import merge_changes

    tbl = make_table("clog_bcast", n_buckets=4)
    merge_changes(
        spark,
        tbl,
        cdc_rows(
            spark,
            [("U", f"c{i}", t, "user", f"m{i}/{t}", None, 1, i * 10 + t)
             for i in range(20) for t in range(3)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    v1 = tbl.snapshot().version
    merge_changes(
        spark,
        tbl,
        cdc_rows(spark, [("U", "c1", 0, "user", "upd", None, 99, 9900)]),
        batch_key="b2",
        strategy="mor",
    )

    for df in (
        tbl.read_changes(spark, since_version=v1),
        tbl.read_changelog(spark, since_version=v1),
    ):
        plan = _explain(df)
        assert "BroadcastHashJoin" in plan, plan
        # the TABLE-side key restriction must never sort-merge; the
        # changelog's before↔after FullOuter join (two already
        # key-restricted small sides) legitimately stays SMJ — Spark
        # cannot broadcast full-outer joins
        assert "SortMergeJoin LeftSemi" not in plan, plan

    # window above the gate: the engine must NOT hint a broadcast of an
    # unbounded key set (Spark may still pick one from its own size
    # stats at this toy scale — that's its call, not the engine's)
    small = tbl.read_changes(spark, since_version=v1)
    big = tbl.read_changes(spark, since_version=v1, broadcast_keys_max_rows=0)
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()


def test_logical_mapping_keeps_pushdown_and_identity_is_free(spark, make_table):
    """S33 scale guard: after a metadata-only rename, a filter on the
    LOGICAL column name must still reach the parquet scan as a pushed
    filter on the PHYSICAL column (Catalyst pushes through the alias
    projection) — and an identity mapping must add NO plan nodes at all
    (read() returns the untouched frame)."""
    from digital_analytics_data_platform_spark.lake.merge import compact, merge_changes
    from tests.conftest import cdc_rows

    tbl = make_table("planmap")
    merge_changes(
        spark, tbl,
        cdc_rows(spark, [("U", "c1", 0, "user", "hello", None, 10, 1)]),
        batch_key="b0", strategy="mor",
    )
    assert tbl.snapshot().mapping() == {}  # identity: projection short-circuits

    # compact so the read has no LWW collapse — a payload filter can
    # never push below the collapse (it could promote a loser version),
    # so the pushdown claim is about the canonical-file read path
    compact(spark, tbl)
    tbl.rename_column("text", "content")
    q = tbl.read(spark).filter(F.col("content") == "hello").select("conv_id", "content")
    plan = _explain(q)
    # pushed down under the PHYSICAL name, projected out as the logical,
    # and the read schema pruned to exactly the touched physical columns
    assert "EqualTo(text,hello)" in plan, plan
    assert "ReadSchema: struct<conv_id:string,text:string,_deleted:boolean>" in plan, plan
    assert q.count() == 1
