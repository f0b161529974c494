"""Snapshot-bootstrap (DBLog-style initial load) semantics.

The contract under test (streaming/bootstrap.py): bootstrapping a fresh
table from (source snapshot consistent as of log position P) + (tail of
events with lsn >= P) yields the same final state as applying the
ENTIRE change history through the merge kernel — under any interleaving
of snapshot chunks and tail batches, with crash-resume, and without
deleted-key resurrection.
"""

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.datagen import change_log
from digital_analytics_data_platform_spark.lake import LakeTable
from digital_analytics_data_platform_spark.lake.merge import (
    compact,
    expire_tombstones,
    merge_changes,
    retention_truncate,
)
from digital_analytics_data_platform_spark.streaming.bootstrap import (
    apply_snapshot_chunks,
    bootstrap_begin,
    bootstrap_finish,
    bootstrap_stream,
)

from tests.conftest import cdc_rows

BUSINESS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _apply_log(spark, table, log, *, batches=3, lo=None, hi=None):
    """Apply a slice of the log in ordered batches through the kernel."""
    bounds = log.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    lo = lo if lo is not None else int(bounds[0])
    hi = hi if hi is not None else int(bounds[1]) + 1
    step = max(1, (hi - lo + batches - 1) // batches)
    for i in range(batches):
        a, b = lo + i * step, min(lo + (i + 1) * step, hi)
        if a >= b:
            break
        merge_changes(
            spark,
            table,
            log.filter((F.col("lsn") >= a) & (F.col("lsn") < b)),
            batch_key=f"seq:{a}",
            strategy="mor",
        )


def _state(spark, table, cols):
    return (
        table.read(spark)
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


def _assert_frames_equal(got, want, cols):
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    g, w = got[cols].reset_index(drop=True), want[cols].reset_index(drop=True)
    bad = (g != w) & ~(g.isna() & w.isna())
    assert not bad.any().any(), f"mismatch:\n{g[bad.any(axis=1)].head()}\nvs\n{w[bad.any(axis=1)].head()}"


def _make_split(spark, tmp_path, *, ooo_window_s, name="source_db", n=12_000, p=7_000):
    """A synthetic deployment: full log, a source table holding the
    LWW state of the prefix (lsn < P), and the split point P.

    ``ooo_window_s=0`` gives a split-consistent feed (event time never
    runs backwards across P) — the bounded-disorder precondition for
    exact unversioned bootstrap; the default jitter violates it for a
    handful of deleted keys (tombstone-history loss, measured at ~20
    keys for this log), which is exactly what the tombstone-carrying
    versioned mode exists for."""
    # ooo_window_s=1 ⇒ jitter is always 0 s (pmod(h, 1) = 0) — the
    # split-consistent feed; pmod(h, 0) would be null, hence min 1
    log = change_log(
        spark, n, n_convs=200, turns_per_conv=20, seed=7, ooo_window_s=max(ooo_window_s, 1)
    )
    src = LakeTable.create(
        str(tmp_path / name),
        log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"],
        ["ts", "lsn"],
        n_buckets=8,
    )
    _apply_log(spark, src, log.filter(F.col("lsn") < p), batches=2)
    compact(spark, src)
    return log, src, p


@pytest.fixture()
def split_source(spark, tmp_path):
    """Split-consistent variant (no cross-split disorder)."""
    return _make_split(spark, tmp_path, ooo_window_s=0)


@pytest.fixture()
def split_source_jittered(spark, tmp_path):
    """Full out-of-order jitter — includes cross-split delete
    inversions (the tombstone-loss cases)."""
    return _make_split(spark, tmp_path, ooo_window_s=3600, name="source_db_j")


def _reference_state(spark, tmp_path, log, name="ref"):
    ref = LakeTable.create(
        str(tmp_path / name),
        log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"],
        ["ts", "lsn"],
        n_buckets=8,
    )
    _apply_log(spark, ref, log, batches=4)
    return ref


def test_bootstrap_equivalence_unversioned_interleaved(spark, tmp_path, split_source):
    """snapshot@P (payload only) + tail(lsn>=P), chunks interleaved
    BETWEEN tail batches in an arbitrary order == full-history apply,
    on every business column (lsn differs by design for keys whose
    winner predates P — the sentinel)."""
    log, src, p = split_source
    snapshot_df = src.read(spark).drop("lsn")  # unversioned: payload + ts only

    tgt = LakeTable.create(
        str(tmp_path / "tgt"), log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    suffix = log.filter(F.col("lsn") >= p)
    mid = (p + 12_000) // 2

    # interleave: tail batch 1 → chunks → tail batch 2
    bootstrap_begin(tgt, snapshot_lsn=p, chunks=4, versioned=False)
    _apply_log(spark, tgt, suffix, batches=1, lo=p, hi=mid)
    results = apply_snapshot_chunks(
        spark, tgt, snapshot_df, snapshot_lsn=p, chunks=4, versioned=False
    )
    _apply_log(spark, tgt, suffix, batches=1, lo=mid, hi=12_000)

    assert len(results) == 4 and not any(r.skipped for r in results)
    assert not tgt.snapshot().props.get("bootstrap"), "marker must clear on finish"

    ref = _reference_state(spark, tmp_path, log)
    _assert_frames_equal(_state(spark, tgt, BUSINESS), _state(spark, ref, BUSINESS), BUSINESS)


def test_bootstrap_equivalence_versioned_tombstone_carrying(spark, tmp_path, split_source_jittered):
    """Lake-to-lake migration mode: the snapshot carries tombstones
    with their true (ts, lsn) — exact under FULL event-time jitter
    (including the ~20 cross-split delete inversions this log holds,
    which an unversioned bootstrap provably resurrects) and under
    arbitrary snapshot/tail overlap. Matches the full-history
    reference INCLUDING lsn (no sentinel)."""
    from digital_analytics_data_platform_spark.streaming.bootstrap import lake_snapshot_changes

    log, src, p = split_source_jittered
    snapshot_df = lake_snapshot_changes(spark, src)  # live rows + op='D' tombstones

    tgt = LakeTable.create(
        str(tmp_path / "tgt_v"), log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    overlap_tail = log.filter(F.col("lsn") >= p - 2_000)  # replays 2k prefix events
    _apply_log(spark, tgt, overlap_tail, batches=2)
    apply_snapshot_chunks(spark, tgt, snapshot_df, snapshot_lsn=p, chunks=3, versioned=True)

    ref = _reference_state(spark, tmp_path, log, name="ref_v")
    cols = BUSINESS + ["lsn"]
    _assert_frames_equal(_state(spark, tgt, cols), _state(spark, ref, cols), cols)


def test_bootstrap_interleaving_commutes_under_jitter(spark, tmp_path, split_source_jittered):
    """Disorder decides WHAT the converged state is — never whether the
    interleave converges to it. Under full jitter (where unversioned
    full-history equivalence provably does not hold), an interleaved
    chunk/tail bootstrap still lands bit-identically on the same state
    as applying the identical inputs in one sequential order."""
    from digital_analytics_data_platform_spark.streaming.bootstrap import snapshot_to_changes

    log, src, p = split_source_jittered
    snapshot_df = src.read(spark).drop("lsn")
    suffix = log.filter(F.col("lsn") >= p)
    schema = log.drop("op", "commit_lsn").schema

    control = LakeTable.create(
        str(tmp_path / "ctl"), schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8
    )
    merge_changes(
        spark,
        control,
        snapshot_to_changes(snapshot_df, versioned=False, snapshot_lsn=p),
        batch_key="snap:all",
        strategy="mor",
    )
    _apply_log(spark, control, suffix, batches=2)

    tgt = LakeTable.create(
        str(tmp_path / "ilv"), schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8
    )
    mid = (p + 12_000) // 2
    bootstrap_begin(tgt, snapshot_lsn=p, chunks=4, versioned=False)
    _apply_log(spark, tgt, suffix, batches=1, lo=p, hi=mid)
    apply_snapshot_chunks(spark, tgt, snapshot_df, snapshot_lsn=p, chunks=4, versioned=False)
    _apply_log(spark, tgt, suffix, batches=1, lo=mid, hi=12_000)

    cols = BUSINESS + ["lsn"]
    _assert_frames_equal(_state(spark, tgt, cols), _state(spark, control, cols), cols)


def test_sentinel_chunk_never_overwrites_tail_event(spark, make_table):
    """Race: tail upsert applied BEFORE the snapshot chunk for the same
    key, with an identical ts (worst case — the tie). The chunk's
    sentinel lsn=-1 must lose; a snapshot-only key must survive."""
    tbl = make_table("race")
    tail = cdc_rows(spark, [("U", "c1", 0, "user", "new text", None, 100, 10)])
    merge_changes(spark, tbl, tail, batch_key="t:0", strategy="mor")

    snap_rows = cdc_rows(
        spark,
        [
            ("U", "c1", 0, "user", "stale snapshot text", None, 100, 999),
            ("U", "c2", 0, "user", "snapshot-only row", None, 50, 999),
        ],
    ).drop("lsn")  # unversioned source: no reliable per-row version
    apply_snapshot_chunks(spark, tbl, snap_rows, snapshot_lsn=5, chunks=2)

    got = {r["conv_id"]: (r["text"], r["lsn"]) for r in tbl.read(spark).collect()}
    assert got["c1"] == ("new text", 10)
    assert got["c2"] == ("snapshot-only row", -1)


def test_delete_race_no_resurrection_and_maintenance_guard(spark, make_table):
    """A tail DELETE lands before the snapshot chunk holding the same
    key. Mid-bootstrap, tombstone expiry and retention sweeps must
    refuse (they could erase the tombstone and let the chunk resurrect
    the key); after the chunk applies, the key stays deleted; after
    finish, maintenance works again."""
    import datetime

    tbl = make_table("delrace")
    bootstrap_begin(tbl, snapshot_lsn=5, chunks=2, versioned=False)
    merge_changes(
        spark,
        tbl,
        cdc_rows(spark, [("D", "c1", 0, None, None, None, 200, 50)]),
        batch_key="t:0",
        strategy="mor",
    )

    with pytest.raises(RuntimeError, match="bootstrap in flight"):
        expire_tombstones(spark, tbl, older_than_lsn=1_000)
    with pytest.raises(RuntimeError, match="bootstrap in flight"):
        retention_truncate(spark, tbl, datetime.datetime(2030, 1, 1))

    snap_rows = cdc_rows(
        spark, [("U", "c1", 0, "user", "pre-delete snapshot state", None, 100, 999)]
    ).drop("lsn")
    apply_snapshot_chunks(spark, tbl, snap_rows, snapshot_lsn=5, chunks=2)

    assert tbl.read(spark).filter(F.col("conv_id") == "c1").count() == 0, "deleted key resurrected"
    assert expire_tombstones(spark, tbl, older_than_lsn=1_000) >= 0  # guard lifted


def test_bootstrap_resume_after_crash(spark, tmp_path, split_source):
    """Crash after chunk 1 of 4: the re-run ledger-skips the applied
    chunks, completes the rest, clears the marker, and the state is
    identical to an uninterrupted bootstrap."""
    log, src, p = split_source
    snapshot_df = src.read(spark).drop("lsn")
    tgt = LakeTable.create(
        str(tmp_path / "tgt_resume"), log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )

    class Boom(RuntimeError):
        pass

    def crash_after(i, res):
        if i == 1:
            raise Boom()

    with pytest.raises(Boom):
        apply_snapshot_chunks(
            spark, tgt, snapshot_df, snapshot_lsn=p, chunks=4, on_chunk=crash_after
        )
    assert tgt.snapshot().props.get("bootstrap"), "marker must survive the crash"

    results = apply_snapshot_chunks(spark, tgt, snapshot_df, snapshot_lsn=p, chunks=4)
    assert [r.skipped for r in results] == [True, True, False, False]
    assert not tgt.snapshot().props.get("bootstrap")

    clean = LakeTable.create(
        str(tmp_path / "tgt_clean"), log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    apply_snapshot_chunks(spark, clean, snapshot_df, snapshot_lsn=p, chunks=4)
    cols = BUSINESS
    _assert_frames_equal(_state(spark, tgt, cols), _state(spark, clean, cols), cols)


def test_bootstrap_chunks_are_bucket_aligned(spark, tmp_path, split_source):
    """Each chunk's MERGE touches only its contiguous bucket range —
    the O(chunk) scale property (a chunk never rewrites or appends
    outside its slice of the keyspace)."""
    log, src, p = split_source
    snapshot_df = src.read(spark).drop("lsn")
    tgt = LakeTable.create(
        str(tmp_path / "tgt_align"), log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    seen: dict[int, list[int]] = {}
    apply_snapshot_chunks(
        spark, tgt, snapshot_df, snapshot_lsn=p, chunks=4,
        on_chunk=lambda i, r: seen.setdefault(i, list(r.affected_buckets)),
    )
    for i, buckets in seen.items():
        lo, hi = 2 * i, 2 * i + 2  # 8 buckets / 4 chunks
        assert all(lo <= b < hi for b in buckets), f"chunk {i} leaked into buckets {buckets}"
    assert any(seen.values()), "expected non-empty chunks"


def test_bootstrap_begin_refuses_second_and_finish_is_idempotent(spark, make_table):
    tbl = make_table("guard")
    bootstrap_begin(tbl, snapshot_lsn=100, chunks=4, versioned=False)
    # same (pipeline, point) → resume, not error
    m = bootstrap_begin(tbl, snapshot_lsn=100, chunks=4, versioned=False)
    assert m["snapshot_lsn"] == 100
    with pytest.raises(RuntimeError, match="already mid-bootstrap"):
        bootstrap_begin(tbl, snapshot_lsn=200, chunks=4, versioned=False, pipeline_id="other")
    bootstrap_finish(tbl)
    bootstrap_finish(tbl)  # idempotent
    assert not tbl.snapshot().props.get("bootstrap")


def test_bootstrap_stream_end_to_end(spark, tmp_path, split_source):
    """The full interleaved shape: checkpointed tail stream + driver-
    thread chunk loop racing it through OCC. Final state equals the
    full-history reference; the tail filter drops pre-P events
    (unversioned safety) so replayed old segments are harmless."""
    from digital_analytics_data_platform_spark.streaming import (
        cdc_file_stream,
        write_log_segments,
    )

    log, src, p = split_source
    snapshot_df = src.read(spark).drop("lsn")
    tgt_path = str(tmp_path / "tgt_stream")
    LakeTable.create(
        tgt_path, log.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=8,
    )
    log_dir = str(tmp_path / "feed")
    # segments include pre-P events on purpose — the unversioned tail
    # filter must exclude them
    write_log_segments(log.filter(F.col("lsn") >= p - 1_000), log_dir, n_segments=4)
    source = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)

    query, metrics, chunk_results = bootstrap_stream(
        spark,
        snapshot_df,
        source,
        tgt_path,
        str(tmp_path / "ckpt"),
        snapshot_lsn=p,
        chunks=4,
        versioned=False,
    )
    assert metrics.batches > 0
    assert len(chunk_results) == 4
    tgt = LakeTable.load(tgt_path)
    assert not tgt.snapshot().props.get("bootstrap")

    ref = _reference_state(spark, tmp_path, log, name="ref_stream")
    _assert_frames_equal(_state(spark, tgt, BUSINESS), _state(spark, ref, BUSINESS), BUSINESS)


def test_bootstrap_stream_tail_filter_binds_table_order_col(spark, tmp_path, split_source):
    """r4 ADVICE: the unversioned tail filter hardcoded ``F.col('lsn')``
    while apply_snapshot_chunks parameterizes order_cols from the table
    snapshot — a table whose commit-order column is named differently
    got an AnalysisException (or an unfiltered tail, breaking the
    unversioned-exactness precondition). The filter must bind
    ``snap.order_cols[-1]``. Same end-to-end shape as
    test_bootstrap_stream_end_to_end, with the order column renamed
    ``lsn`` → ``seq`` everywhere."""
    from digital_analytics_data_platform_spark.streaming import (
        cdc_file_stream,
        write_log_segments,
    )

    log, src, p = split_source
    log_seq = log.withColumnRenamed("lsn", "seq")
    snapshot_df = src.read(spark).drop("lsn")
    tgt_path = str(tmp_path / "tgt_seq")
    LakeTable.create(
        tgt_path, log_seq.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "seq"], n_buckets=8,
    )
    log_dir = str(tmp_path / "feed_seq")
    # segments include pre-P events on purpose — the tail filter must
    # exclude them via the table's own order column name
    write_log_segments(
        log_seq.filter(F.col("seq") >= p - 1_000), log_dir, segment_col="seq", n_segments=2
    )
    source = cdc_file_stream(spark, log_dir, max_files_per_trigger=1, schema=log_seq.schema)

    query, metrics, chunk_results = bootstrap_stream(
        spark,
        snapshot_df,
        source,
        tgt_path,
        str(tmp_path / "ckpt_seq"),
        snapshot_lsn=p,
        chunks=2,
        versioned=False,
    )
    assert metrics.batches > 0
    tgt = LakeTable.load(tgt_path)
    assert not tgt.snapshot().props.get("bootstrap")

    # reference: the full renamed history through the kernel
    ref = LakeTable.create(
        str(tmp_path / "ref_seq"), log_seq.drop("op", "commit_lsn").schema,
        ["conv_id", "turn_idx"], ["ts", "seq"], n_buckets=8,
    )
    bounds = log_seq.agg(F.min("seq"), F.max("seq")).collect()[0]
    lo, hi = int(bounds[0]), int(bounds[1]) + 1
    step = max(1, (hi - lo + 3) // 4)
    for i in range(4):
        a, b = lo + i * step, min(lo + (i + 1) * step, hi)
        if a >= b:
            break
        merge_changes(
            spark, ref,
            log_seq.filter((F.col("seq") >= a) & (F.col("seq") < b)),
            batch_key=f"seq:{a}", strategy="mor",
        )
    _assert_frames_equal(_state(spark, tgt, BUSINESS), _state(spark, ref, BUSINESS), BUSINESS)
