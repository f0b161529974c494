"""Incrementally maintained join views (JoinRollup, S29): exact
delta-join maintenance of a fact⋈dim grouped rollup from BOTH tables'
image changelogs — the Flink two-input delta-join / Materialize
JOIN-in-a-materialized-view analog.

Reference analog: every reference gold mart re-joins its lookback
window to dimension tables per run (e.g. the SA360 campaign weekly
MERGE re-joining calendar + account dims over 120 days,
``sql/02_SDI_SA360/03_GOLD/MERGE/01_sp_merge_sdi_gold_sa360_campaign_
weekly.sql``); JoinRollup maintains the joined rollup with no lookback
horizon, retracting exactly when EITHER side changes.
"""

import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
from digital_analytics_data_platform_spark.lake.merge import compact
from digital_analytics_data_platform_spark.plans.ivm import JoinRollup
from tests.conftest import TRANSCRIPT_SCHEMA, cdc_rows

DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
    ]
)


def dim_rows(spark, rows):
    """Build a dim CDC batch from (op, conv, channel, weight, ts_s, lsn)."""
    data = [
        (
            r[0],
            r[1],
            r[2],
            r[3],
            datetime.fromtimestamp(1767225600 + r[4], tz=timezone.utc).replace(tzinfo=None),
            r[5],
            0,
        )
        for r in rows
    ]
    sch = T.StructType(
        [T.StructField("op", T.StringType()), *DIM_SCHEMA.fields, T.StructField("commit_lsn", T.LongType())]
    )
    return spark.createDataFrame(data, sch)


def _recompute(spark, fact, dim):
    j = fact.read(spark).join(dim.read(spark), on="conv_id")
    return {
        r.channel: (r.cnt, r.st, r.sw)
        for r in j.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("turn_idx").cast("double")).alias("st"),
            F.sum("weight").alias("sw"),
        )
        .collect()
    }


def _mart(spark, jr):
    return {
        r.channel: (r.cnt, r.sum_turn_idx, r.sum_weight) for r in jr.read(spark).collect()
    }


def _mk(tmp_path, spark, n_buckets=4, **dim_kw):
    fact = LakeTable.create(
        str(tmp_path / "fact"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=n_buckets
    )
    dim = LakeTable.create(
        str(tmp_path / "dim"), DIM_SCHEMA, ["conv_id"], ["ts", "lsn"], n_buckets=n_buckets, **dim_kw
    )
    jr = JoinRollup.create(
        str(tmp_path / "mart"),
        fact,
        dim,
        join_cols=["conv_id"],
        group_cols=["channel"],
        sum_cols=["turn_idx", "weight"],
        n_buckets=n_buckets,
    )
    return fact, dim, jr


def test_join_rollup_tracks_both_sides(spark, tmp_path):
    fact, dim, jr = _mk(tmp_path, spark)

    # window 1: inserts on both sides
    merge_changes(
        spark,
        fact,
        cdc_rows(
            spark,
            [
                ("U", "c0", 0, "user", "t0", None, 0, 1),
                ("U", "c0", 1, "asst", "t1", None, 1, 2),
                ("U", "c1", 0, "user", "t2", None, 2, 3),
                ("U", "c9", 0, "user", "t9", None, 2, 4),  # no dim row → unjoined
            ],
        ),
        batch_key="f1",
        strategy="mor",
    )
    merge_changes(
        spark,
        dim,
        dim_rows(spark, [("U", "c0", "web", 1.5, 0, 1), ("U", "c1", "app", 2.0, 0, 2)]),
        batch_key="d1",
        strategy="mor",
    )
    jr.sync(spark, fact)
    assert _mart(spark, jr) == _recompute(spark, fact, dim)
    assert _mart(spark, jr) == {"web": (2, 1.0, 3.0), "app": (1, 0.0, 2.0)}

    # window 2: dim group move (c0 web→app) + fact delete + fact insert;
    # the dim update must retract BOTH of c0's joined contributions from
    # 'web' and re-add them under 'app'
    merge_changes(
        spark, dim, dim_rows(spark, [("U", "c0", "app", 1.5, 5, 10)]), batch_key="d2", strategy="mor"
    )
    merge_changes(
        spark,
        fact,
        cdc_rows(
            spark,
            [("D", "c1", 0, None, None, None, 5, 11), ("U", "c1", 1, "user", "t3", None, 6, 12)],
        ),
        batch_key="f2",
        strategy="mor",
    )
    jr.sync(spark, fact)
    assert _mart(spark, jr) == _recompute(spark, fact, dim)
    assert "web" not in _mart(spark, jr)  # group emptied → tombstoned

    # window 3: dim delete drops every joined row of c1; late dim row
    # joins the previously-unjoined c9 facts in
    merge_changes(
        spark,
        dim,
        dim_rows(spark, [("D", "c1", None, None, 8, 20), ("U", "c9", "web", 0.5, 8, 21)]),
        batch_key="d3",
        strategy="mor",
    )
    jr.sync(spark, fact)
    assert _mart(spark, jr) == _recompute(spark, fact, dim)

    # idempotent replay: nothing advanced → skip, state unchanged
    assert jr.sync(spark, fact)["skipped"] is True
    assert _mart(spark, jr) == _recompute(spark, fact, dim)


def test_join_rollup_fact_only_and_dim_only_windows(spark, tmp_path):
    """Cursors advance independently: a sync where only one side moved
    folds only that side's delta against the other's snapshot."""
    fact, dim, jr = _mk(tmp_path, spark)
    merge_changes(
        spark, dim, dim_rows(spark, [("U", "c0", "web", 1.0, 0, 1)]), batch_key="d1", strategy="mor"
    )
    jr.sync(spark, fact)  # dim-only window; no facts yet → empty mart
    assert _mart(spark, jr) == {}
    merge_changes(
        spark,
        fact,
        cdc_rows(spark, [("U", "c0", 0, "user", "t0", None, 0, 1)]),
        batch_key="f1",
        strategy="mor",
    )
    jr.sync(spark, fact)  # fact-only window
    assert _mart(spark, jr) == _recompute(spark, fact, dim) == {"web": (1, 0.0, 1.0)}
    f0, d0 = jr.cursors()
    assert f0 == fact.snapshot().version and d0 == dim.snapshot().version


def test_join_rollup_survives_reload_and_compaction(spark, tmp_path):
    """Crash recovery: a reloaded JoinRollup resumes from the durable
    cursors; compaction commits on either side produce empty changelogs
    and never disturb the mart."""
    fact, dim, jr = _mk(tmp_path, spark)
    merge_changes(
        spark,
        fact,
        cdc_rows(spark, [("U", "c0", 0, "user", "t0", None, 0, 1)]),
        batch_key="f1",
        strategy="mor",
    )
    merge_changes(
        spark, dim, dim_rows(spark, [("U", "c0", "web", 1.0, 0, 1)]), batch_key="d1", strategy="mor"
    )
    jr.sync(spark, fact)
    before = _mart(spark, jr)

    jr2 = JoinRollup.load(
        str(tmp_path / "mart"),
        LakeTable.load(str(tmp_path / "dim")),
        join_cols=["conv_id"],
        group_cols=["channel"],
        sum_cols=["turn_idx", "weight"],
    )
    assert jr2.cursors() == jr.cursors()
    assert jr2.sync(spark, fact)["skipped"] is True

    compact(spark, fact)
    compact(spark, dim)
    res = jr2.sync(spark, fact)  # versions advanced, changelogs empty
    assert res["skipped"] is False and res["groups"] == 0
    assert _mart(spark, jr2) == before


def test_join_rollup_rejects_minmax_and_ambiguous_columns(spark, tmp_path):
    from digital_analytics_data_platform_spark.plans.ivm import IncrementalRollup

    fact, dim, jr = _mk(tmp_path, spark)
    bad = IncrementalRollup(jr.table, ["channel"], [], min_cols=["weight"])
    with pytest.raises(ValueError, match="MIN/MAX"):
        JoinRollup(bad, dim, ["conv_id"], [], ["channel", "weight"])
    # 'ts' exists in both schemas → ambiguous reference must raise
    with pytest.raises(ValueError, match="both fact and dim"):
        JoinRollup._split_cols(fact, dim, ["conv_id"], ["ts"])


def test_join_rollup_probe_prunes_dim_buckets(spark, tmp_path):
    """The dim-side probe must read only the buckets holding the fact
    window's join keys — file-skipping via the manifest, asserted on
    the probe's input file count."""
    fact, dim, jr = _mk(tmp_path, spark, n_buckets=8)
    # seed 8 dim rows spread over the 8 buckets, one commit each so
    # every bucket gets its own file
    for i in range(8):
        merge_changes(
            spark,
            dim,
            dim_rows(spark, [("U", f"c{i}", "web", 1.0, 0, i + 1)]),
            batch_key=f"d{i}",
            strategy="mor",
        )
    # one fact conv → the probe should touch exactly c0's bucket
    merge_changes(
        spark,
        fact,
        cdc_rows(spark, [("U", "c0", 0, "user", "t0", None, 0, 100)]),
        batch_key="f1",
        strategy="mor",
    )
    keys = spark.createDataFrame([("c0",)], "conv_id string")
    probed = jr._probe(spark, dim, dim.snapshot().version, keys, ["conv_id", "channel", "weight"], broadcast_ok=True)
    files = [
        r.filename
        for r in probed.select(F.input_file_name().alias("filename")).distinct().collect()
    ]
    assert len(files) == 1, files
    jr.sync(spark, fact)
    assert _mart(spark, jr) == {"web": (1, 0.0, 1.0)}


event = st.tuples(
    st.sampled_from(["U", "U", "U", "D"]),  # fact op
    st.integers(0, 2),  # conv
    st.integers(0, 1),  # turn
    st.integers(0, 3),  # ts seconds — tiny range → LWW ties
)
dim_event = st.tuples(
    st.sampled_from(["U", "U", "D"]),  # dim op (deletes ~33%)
    st.integers(0, 2),  # conv
    st.sampled_from(["web", "app"]),  # channel (the rollup group)
    st.integers(0, 3),  # ts seconds
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from digital_analytics_data_platform_spark.session import get_spark

        _spark = get_spark("prop-join-ivm", master="local[2]", shuffle_partitions=2)
    return _spark


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(event, min_size=1, max_size=10),
    st.lists(dim_event, min_size=1, max_size=8),
    st.integers(1, 3),
)
def test_join_ivm_equals_recompute_for_any_log(fact_events, dim_events, n_windows):
    """For ANY interleaving of fact and dim change logs split into sync
    windows, the joined mart equals a full fact⋈dim recompute after
    every sync. 3 convs × 2 channels × 4 ts values force constant
    group moves, LWW-losing late events, and joined-row retractions on
    both sides."""
    spark = _get_spark()
    d = tempfile.mkdtemp(prefix="prop_jivm_")
    try:
        fact = LakeTable.create(
            f"{d}/fact", TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=2
        )
        dim = LakeTable.create(f"{d}/dim", DIM_SCHEMA, ["conv_id"], ["ts", "lsn"], n_buckets=2)
        jr = JoinRollup.create(
            f"{d}/mart",
            fact,
            dim,
            join_cols=["conv_id"],
            group_cols=["channel"],
            sum_cols=["turn_idx", "weight"],
            n_buckets=2,
        )
        f_rows = [
            (op, f"c{conv}", turn, "user" if op == "U" else None,
             f"t{i}" if op == "U" else None, None, ts, i)
            for i, (op, conv, turn, ts) in enumerate(fact_events)
        ]
        d_rows = [
            (op, f"c{conv}", ch if op == "U" else None,
             float(i) if op == "U" else None, ts, 1000 + i)
            for i, (op, conv, ch, ts) in enumerate(dim_events)
        ]
        per_f = max(1, len(f_rows) // n_windows)
        per_d = max(1, len(d_rows) // n_windows)
        for w in range(n_windows):
            fb = f_rows[w * per_f : (w + 1) * per_f] if w < n_windows - 1 else f_rows[w * per_f :]
            db = d_rows[w * per_d : (w + 1) * per_d] if w < n_windows - 1 else d_rows[w * per_d :]
            if fb:
                merge_changes(spark, fact, cdc_rows(spark, fb), batch_key=f"f{w}", strategy="mor")
            if db:
                merge_changes(spark, dim, dim_rows(spark, db), batch_key=f"d{w}", strategy="mor")
            jr.sync(spark, fact)
            assert _mart(spark, jr) == _recompute(spark, fact, dim)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_join_rollup_synced_inside_streaming_apply(spark, tmp_path):
    """`apply_stream(rollups=[JoinRollup])` maintains the joined mart in
    the streaming pass (the runner passes the streamed table as the
    fact side; the dim is fixed at construction). After replay the mart
    equals a full fact⋈dim recompute."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.streaming import (
        apply_stream,
        cdc_file_stream,
        write_log_segments,
    )

    n = 4_000
    log = datagen.change_log(spark, n, n_convs=60, turns_per_conv=8)
    log_dir = str(tmp_path / "jr_cdclog")
    write_log_segments(log, log_dir, n_segments=4)

    fact = LakeTable.create(
        str(tmp_path / "jr_stream_fact"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        ["ts", "lsn"],
        n_buckets=8,
    )
    dim = LakeTable.create(
        str(tmp_path / "jr_stream_dim"), DIM_SCHEMA, ["conv_id"], ["ts", "lsn"], n_buckets=8
    )
    # dim covers only half the conv namespace — unjoined facts must
    # contribute nothing
    merge_changes(
        spark,
        dim,
        dim_rows(
            spark,
            [("U", f"conv_{i:08d}", f"ch{i % 3}", 0.25 * (i % 8), 0, i + 1) for i in range(0, 60, 2)],
        ),
        batch_key="dim-seed",
        strategy="mor",
    )
    jr = JoinRollup.create(
        str(tmp_path / "jr_stream_mart"),
        fact,
        dim,
        join_cols=["conv_id"],
        group_cols=["channel"],
        sum_cols=["turn_idx", "weight"],
        n_buckets=8,
    )
    _, m = apply_stream(
        spark,
        cdc_file_stream(spark, log_dir, max_files_per_trigger=1),
        fact.path,
        str(tmp_path / "jr_ckpt"),
        pipeline_id="bronze",
        strategy="mor",
        rollups=[jr],
        rollup_sync_every=2,
        compact_every=2,
    )
    assert m.batches >= 4
    jr.sync(spark, fact)  # drain the tail window past the last cadence tick
    assert _mart(spark, jr) == _recompute(spark, fact, dim)
    assert len(_mart(spark, jr)) > 0
