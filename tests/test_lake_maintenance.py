"""Storage lifecycle maintenance: snapshot expiry, orphan-file vacuum,
and incremental changelog reads (the Iceberg expire_snapshots /
remove_orphan_files / incremental-read surface the reference delegates
to its warehouse; here it is first-class on the LakeTable format)."""

import os

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import LakeTable, compact, merge_changes
from tests.conftest import cdc_rows


def _apply(spark, tbl, rows, key):
    merge_changes(spark, tbl, cdc_rows(spark, rows), batch_key=key, strategy="mor")


def _parquet_count(path):
    return sum(
        1
        for dirpath, _d, names in os.walk(os.path.join(path, "data"))
        for n in names
        if n.endswith(".parquet")
    )


def test_expire_snapshots_vacuums_replaced_files(spark, make_table):
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "a", None, 10, 1)], "b1")
    _apply(spark, tbl, [("U", "c1", 0, "user", "b", None, 20, 2)], "b2")
    _apply(spark, tbl, [("I", "c2", 0, "user", "c", None, 30, 3)], "b3")
    compact(spark, tbl, all_buckets=True)  # replaces every delta file
    pre_files = _parquet_count(tbl.path)
    versions = tbl.list_snapshots()
    assert len(versions) >= 5  # create + 3 merges + compact

    stats = tbl.expire_snapshots(keep_last=1)
    assert stats["expired_snapshots"] == len(versions) - 1
    assert stats["deleted_files"] > 0 and stats["freed_bytes"] > 0
    assert _parquet_count(tbl.path) < pre_files
    # only the current manifest remains; current state intact
    assert tbl.list_snapshots() == [versions[-1]]
    assert {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in tbl.read(spark).collect()
    } == {("c1", 0): "b", ("c2", 0): "c"}


def test_expire_keeps_time_travel_for_retained_versions(spark, make_table):
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "a", None, 10, 1)], "b1")
    v1 = tbl.snapshot().version
    _apply(spark, tbl, [("U", "c1", 0, "user", "b", None, 20, 2)], "b2")
    v2 = tbl.snapshot().version

    tbl.expire_snapshots(keep_last=2)
    # both retained versions stay readable with their original state
    assert tbl.read(spark, snapshot_version=v1).collect()[0]["text"] == "a"
    assert tbl.read(spark, snapshot_version=v2).collect()[0]["text"] == "b"
    # the expired creation snapshot fails loudly, not silently
    try:
        tbl.snapshot(0)
        assert False, "expected missing-manifest error"
    except FileNotFoundError:
        pass


def test_expire_never_deletes_files_live_in_retained(spark, make_table):
    """A file written in an expired version but still referenced by the
    current manifest (MOR delta carried forward) must survive."""
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "a", None, 10, 1)], "b1")
    _apply(spark, tbl, [("I", "c2", 0, "user", "b", None, 20, 2)], "b2")
    live_before = {f["path"] for f in tbl.snapshot().files}
    tbl.expire_snapshots(keep_last=1)
    for rel in live_before:
        assert os.path.exists(os.path.join(tbl.path, rel)), rel


def test_remove_orphan_files(spark, make_table):
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "a", None, 10, 1)], "b1")
    # simulate a crash between write_data_files and commit: files land,
    # manifest never publishes them
    batch = cdc_rows(spark, [("I", "c9", 0, "user", "orphan", None, 99, 9)])
    staged = batch.withColumn("_deleted", F.lit(False)).drop("op").withColumn(
        "_bucket", tbl.bucket_expr(tbl.snapshot().n_buckets)
    )
    tbl.write_data_files(staged)
    pre = _parquet_count(tbl.path)

    # grace window protects the in-flight write
    kept = tbl.remove_orphan_files(grace_seconds=3600)
    assert kept["deleted_files"] == 0 and _parquet_count(tbl.path) == pre

    stats = tbl.remove_orphan_files(grace_seconds=0)
    assert stats["deleted_files"] > 0
    assert _parquet_count(tbl.path) < pre
    # committed state untouched
    assert tbl.read(spark).count() == 1


def test_read_changes_emits_upserts_and_deletes(spark, make_table):
    tbl = make_table()
    _apply(
        spark,
        tbl,
        [
            ("I", "c1", 0, "user", "hello", None, 10, 1),
            ("I", "c2", 0, "user", "yo", None, 20, 2),
            ("I", "c3", 0, "user", "hey", None, 30, 3),
        ],
        "b1",
    )
    v1 = tbl.snapshot().version
    _apply(
        spark,
        tbl,
        [
            ("U", "c1", 0, "user", "hello v2", None, 40, 4),
            ("D", "c2", 0, None, None, None, 50, 5),
            ("I", "c4", 0, "user", "new", None, 60, 6),
        ],
        "b2",
    )
    changes = {
        (r["conv_id"], r["turn_idx"]): (r["_change_type"], r["text"])
        for r in tbl.read_changes(spark, since_version=v1).collect()
    }
    # exactly the touched keys for a MOR append; c3 untouched -> absent
    assert changes == {
        ("c1", 0): ("upsert", "hello v2"),
        ("c2", 0): ("delete", None),
        ("c4", 0): ("upsert", "new"),
    }


def test_read_changes_empty_and_late_loser_current_value(spark, make_table):
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "winner", None, 100, 10)], "b1")
    v1 = tbl.snapshot().version
    assert tbl.read_changes(spark, since_version=v1).count() == 0
    # a late out-of-order event that LOSES last-writer-wins: the key is
    # re-emitted (it was touched) but with its CURRENT winning value
    _apply(spark, tbl, [("U", "c1", 0, "user", "stale late", None, 50, 5)], "b2")
    rows = tbl.read_changes(spark, since_version=v1).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "winner" and rows[0]["_change_type"] == "upsert"


def test_read_changes_window_between_versions(spark, make_table):
    tbl = make_table()
    _apply(spark, tbl, [("I", "c1", 0, "user", "a", None, 10, 1)], "b1")
    v1 = tbl.snapshot().version
    _apply(spark, tbl, [("I", "c2", 0, "user", "b", None, 20, 2)], "b2")
    v2 = tbl.snapshot().version
    _apply(spark, tbl, [("I", "c3", 0, "user", "c", None, 30, 3)], "b3")
    got = {r["conv_id"] for r in tbl.read_changes(spark, since_version=v1, until_version=v2).collect()}
    assert got == {"c2"}


def test_changelog_replay_equivalence(spark, make_table):
    """A downstream consumer applying read_changes windows version by
    version must converge to the table's exact final state — the
    changelog-emission analog of the north rule's replay equivalence."""
    from digital_analytics_data_platform_spark import datagen

    tbl = make_table("src", n_buckets=8)
    log = datagen.change_log(spark, 2_000, n_convs=25, turns_per_conv=8).cache()
    versions = [tbl.snapshot().version]
    for i in range(4):
        lo, hi = i * 500, (i + 1) * 500
        merge_changes(
            spark,
            tbl,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_key=f"b{i}",
            strategy="mor",
        )
        versions.append(tbl.snapshot().version)
    if tbl.snapshot().props.get("delta_buckets"):
        compact(spark, tbl, all_buckets=True)
        versions.append(tbl.snapshot().version)

    state: dict = {}
    for since, until in zip(versions, versions[1:]):
        for r in tbl.read_changes(spark, since_version=since, until_version=until).collect():
            k = (r["conv_id"], r["turn_idx"])
            if r["_change_type"] == "delete":
                state.pop(k, None)
            else:
                state[k] = r["text"]
    final = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in tbl.read(spark).collect()
    }
    assert state == final


def test_pipeline_maintenance_cadence(spark, tmp_path):
    """expire_snapshots_every triggers per-table snapshot expiry inside
    apply_batch; ledgers (current-snapshot props) survive, so replay
    stays a no-op after expiry."""
    from digital_analytics_data_platform_spark.plans import MedallionPipeline
    from tests.conftest import TRANSCRIPT_SCHEMA

    p = MedallionPipeline(
        str(tmp_path / "m"), n_buckets=8, run_qa=False,
        expire_snapshots_every=2, keep_snapshots=1,
    )
    p.create_tables(TRANSCRIPT_SCHEMA)
    b1 = cdc_rows(spark, [("I", "c1", 0, "user", "a", None, 10, 1)])
    b2 = cdc_rows(spark, [("I", "c2", 0, "user", "b", None, 20, 2)])
    r1 = p.apply_batch(spark, b1, "b1")
    assert r1.maintenance is None
    r2 = p.apply_batch(spark, b2, "b2")
    assert r2.maintenance is not None
    assert any(s["expired_snapshots"] > 0 for s in r2.maintenance)
    # every surviving table kept only its newest manifest
    from digital_analytics_data_platform_spark.lake import LakeTable
    import os as _os

    for name in _os.listdir(str(tmp_path / "m")):
        path = str(tmp_path / "m" / name)
        if LakeTable.exists(path):
            t = LakeTable.load(path)
            assert t.list_snapshots() == [t.snapshot().version]
    # state intact and replay after expiry still a ledger no-op
    assert p.read(spark, "bronze").count() == 2
    r3 = p.apply_batch(spark, b2, "b2")
    assert r3.bronze.skipped
    assert p.read(spark, "bronze").count() == 2
