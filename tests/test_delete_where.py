"""Row-level predicate DELETE (`delete_where`) — tombstone events
through the merge kernel, so erasure is changelog-visible and flows to
every incremental consumer instead of silently vanishing in a rewrite.
"""

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake.merge import delete_where, merge_changes
from tests.conftest import cdc_rows


def _seed(spark, tbl):
    merge_changes(
        spark, tbl,
        cdc_rows(
            spark,
            [
                ("U", "c1", 0, "user", "keep me", None, 10, 1),
                ("U", "c1", 1, "tool", "wipe me", "browser", 11, 2),
                ("U", "c2", 0, "tool", "wipe me too", "terminal", 12, 3),
                ("U", "c2", 1, "assistant", "also keep", None, 13, 4),
            ],
        ),
        batch_key="seed", strategy="mor",
    )


def test_delete_where_removes_matches_and_is_idempotent(spark, make_table):
    tbl = make_table("dw")
    _seed(spark, tbl)
    res = delete_where(spark, tbl, F.col("role") == "tool", batch_key="gdpr:1")
    assert res.deletes == 2
    left = {(r["conv_id"], r["turn_idx"]) for r in tbl.read(spark).collect()}
    assert left == {("c1", 0), ("c2", 1)}
    # replay of the same erasure request is a ledger no-op
    res2 = delete_where(spark, tbl, F.col("role") == "tool", batch_key="gdpr:1")
    assert res2.skipped
    # SQL-string predicate form
    res3 = delete_where(spark, tbl, "text LIKE 'also%'", batch_key="gdpr:2")
    assert res3.deletes == 1
    assert {r["conv_id"] for r in tbl.read(spark).collect()} == {"c1"}


def test_delete_where_is_changelog_visible_and_reinstatable(spark, make_table):
    tbl = make_table("dwcl")
    _seed(spark, tbl)
    v0 = tbl.snapshot().version
    delete_where(spark, tbl, F.col("role") == "tool", batch_key="gdpr:1")

    cl = tbl.read_changelog(spark, since_version=v0).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in cl} == {("c1", 1), ("c2", 0)}
    assert all(r["_change_type"] == "delete" for r in cl)
    assert all(r["before"] is not None and r["after"] is None for r in cl)
    # tombstone order: same ts as the winner it deletes, lsn above any ingested
    assert all(r["lsn"] > 4 for r in cl)

    # a LATER feed event (higher lsn) reinstates the key normally
    merge_changes(
        spark, tbl,
        cdc_rows(spark, [("U", "c1", 1, "tool", "restored", "browser", 20, 99)]),
        batch_key="later", strategy="mor",
    )
    got = tbl.read(spark).filter((F.col("conv_id") == "c1") & (F.col("turn_idx") == 1)).first()
    assert got is not None and got["text"] == "restored"


def test_delete_where_retracts_from_ivm_mart(spark, tmp_path, make_table):
    from digital_analytics_data_platform_spark.plans import IncrementalRollup

    tbl = make_table("dwivm")
    roll = IncrementalRollup.create(
        str(tmp_path / "mart"), tbl, ["conv_id"], ["turn_idx"], n_buckets=4
    )
    _seed(spark, tbl)
    roll.sync(spark, tbl)
    before = {r["conv_id"]: r["cnt"] for r in roll.read(spark).collect()}
    assert before == {"c1": 2, "c2": 2}

    delete_where(spark, tbl, F.col("role") == "tool", batch_key="gdpr:1")
    roll.sync(spark, tbl)
    after = {r["conv_id"]: r["cnt"] for r in roll.read(spark).collect()}
    assert after == {"c1": 1, "c2": 1}, "IVM mart did not retract erased rows"


def test_delete_where_respects_renamed_columns(spark, make_table):
    tbl = make_table("dwren")
    _seed(spark, tbl)
    tbl.rename_column("role", "speaker")
    res = delete_where(spark, tbl, F.col("speaker") == "tool", batch_key="gdpr:1")
    assert res.deletes == 2
    assert tbl.read(spark).filter(F.col("speaker") == "tool").count() == 0
