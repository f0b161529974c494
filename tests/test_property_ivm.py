"""Property-based check (hypothesis): for ANY small change log split
into sync windows, the incremental rollup — including the
non-invertible MIN/MAX path with its dirty-group recompute and the
ins==ret no-op skip rule — equals a full recompute of the source after
every sync. The tiny ts value range (4 distinct values) forces heavy
extremum ties, retractions of the current min/max, and LWW-losing late
events, the exact cases where an unsound skip/dirty rule would drift."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
from digital_analytics_data_platform_spark.plans.ivm import IncrementalRollup
from tests.conftest import TRANSCRIPT_SCHEMA, cdc_rows

event = st.tuples(
    st.sampled_from(["U", "U", "U", "D"]),  # deletes at ~25%
    st.integers(0, 2),                      # conv
    st.integers(0, 1),                      # turn
    st.sampled_from(["r0", "r1"]),          # role (the rollup group)
    st.integers(0, 3),                      # ts seconds — tiny range → ties
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from digital_analytics_data_platform_spark.session import get_spark

        _spark = get_spark("prop-ivm", master="local[2]", shuffle_partitions=2)
    return _spark


def _recompute(spark, src):
    return {
        r.role: (r.cnt, r.s, r.mn, r.mx)
        for r in src.read(spark)
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("turn_idx").cast("double")).alias("s"),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )
        .collect()
    }


def _mart(spark, roll):
    return {
        r.role: (r.cnt, r.sum_turn_idx, r.min_ts, r.max_ts)
        for r in roll.read(spark).collect()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event, min_size=2, max_size=16), st.integers(1, 3))
def test_ivm_min_max_equals_recompute_for_any_log(events, n_windows):
    spark = _get_spark()
    d = tempfile.mkdtemp(prefix="prop_ivm_")
    try:
        src = LakeTable.create(
            f"{d}/src", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=2
        )
        roll = IncrementalRollup.create(
            f"{d}/mart", src, ["role"], ["turn_idx"],
            min_cols=["ts"], max_cols=["ts"], n_buckets=2,
        )
        rows = [
            (op, f"c{conv}", turn, role if op == "U" else None,
             f"t{i}" if op == "U" else None, None, ts, i)
            for i, (op, conv, turn, role, ts) in enumerate(events)
        ]
        per = max(1, len(rows) // n_windows)
        for w in range(0, len(rows), per):
            batch = rows[w : w + per]
            merge_changes(spark, src, cdc_rows(spark, batch), batch_key=f"w{w}", strategy="mor")
            roll.sync(spark, src)
            assert _mart(spark, roll) == _recompute(spark, src)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _recompute_distinct(spark, src):
    return {
        r.role: r.d
        for r in src.read(spark)
        .filter(F.col("role").isNotNull())
        .groupBy("role")
        .agg(F.countDistinct("conv_id").alias("d"))
        .collect()
    }


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event, min_size=2, max_size=16), st.integers(1, 3))
def test_distinct_ivm_equals_recompute_for_any_log(events, n_windows):
    """Same adversarial shape for the two-level COUNT(DISTINCT) rollup:
    3 convs × 2 roles × heavy LWW ties → constant value churn between
    groups, support rows flapping to zero and back."""
    from digital_analytics_data_platform_spark.plans.ivm import DistinctCountRollup

    spark = _get_spark()
    d = tempfile.mkdtemp(prefix="prop_dcr_")
    try:
        src = LakeTable.create(
            f"{d}/src", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=2
        )
        dc = DistinctCountRollup.create(f"{d}/mart", src, ["role"], "conv_id", n_buckets=2)
        rows = [
            (op, f"c{conv}", turn, role if op == "U" else None,
             f"t{i}" if op == "U" else None, None, ts, i)
            for i, (op, conv, turn, role, ts) in enumerate(events)
        ]
        per = max(1, len(rows) // n_windows)
        for w in range(0, len(rows), per):
            merge_changes(spark, src, cdc_rows(spark, rows[w : w + per]), batch_key=f"w{w}", strategy="mor")
            dc.sync(spark, src)
            got = {r.role: r.distinct_conv_id for r in dc.read(spark).collect()}
            assert got == _recompute_distinct(spark, src)
    finally:
        shutil.rmtree(d, ignore_errors=True)
