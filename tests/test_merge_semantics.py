"""Merge-kernel semantics on handcrafted change logs: duplicates,
out-of-order delivery, tombstones (no resurrection), schema evolution,
quarantine, idempotent replay — the scenario coverage the north rule
mandates (FIXTURES.md §F2)."""

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import merge_changes
from tests.conftest import cdc_rows


def state(spark, tbl):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in tbl.read(spark).collect()
    }


def test_insert_update_delete(spark, make_table):
    tbl = make_table()
    b1 = cdc_rows(
        spark,
        [
            ("I", "c1", 0, "user", "hello", None, 10, 1),
            ("I", "c1", 1, "assistant", "hi", None, 20, 2),
            ("I", "c2", 0, "user", "yo", None, 30, 3),
        ],
    )
    merge_changes(spark, tbl, b1, batch_key="b1")
    b2 = cdc_rows(
        spark,
        [
            ("U", "c1", 1, "assistant", "hi (edited)", None, 40, 4),
            ("D", "c2", 0, None, None, None, 50, 5),
        ],
    )
    r = merge_changes(spark, tbl, b2, batch_key="b2")
    assert r.updates == 1 and r.deletes == 1
    assert state(spark, tbl) == {("c1", 0): "hello", ("c1", 1): "hi (edited)"}


def test_future_ts_guard_quarantines(spark, make_table):
    """Events beyond max_ts are quarantined, not applied (the
    future-bucket guard, SURVEY §2.9)."""
    from datetime import datetime

    tbl = make_table()
    r = merge_changes(
        spark,
        tbl,
        cdc_rows(
            spark,
            [
                ("I", "c1", 0, "user", "ok", None, 10, 1),
                ("I", "c1", 1, "user", "from the future", None, 10**9, 2),
            ],
        ),
        batch_key="b1",
        max_ts=datetime(2026, 6, 1),
    )
    assert r.quarantined == 1
    assert state(spark, tbl) == {("c1", 0): "ok"}


def test_duplicate_deliveries_are_noops(spark, make_table):
    tbl = make_table()
    rows = [("I", "c1", 0, "user", "hello", None, 10, 1)]
    merge_changes(spark, tbl, cdc_rows(spark, rows * 3), batch_key="b1")  # triple in-batch
    merge_changes(spark, tbl, cdc_rows(spark, rows), batch_key="b2")  # redelivered later
    assert state(spark, tbl) == {("c1", 0): "hello"}
    assert tbl.read(spark).count() == 1


def test_out_of_order_older_update_loses(spark, make_table):
    tbl = make_table()
    merge_changes(
        spark, tbl, cdc_rows(spark, [("I", "c1", 0, "user", "v2", None, 100, 10)]), batch_key="b1"
    )
    # older ts arrives later: must NOT overwrite
    merge_changes(
        spark, tbl, cdc_rows(spark, [("U", "c1", 0, "user", "v1-late", None, 50, 11)]), batch_key="b2"
    )
    assert state(spark, tbl) == {("c1", 0): "v2"}
    # equal ts, higher lsn wins (total order tie-break)
    merge_changes(
        spark, tbl, cdc_rows(spark, [("U", "c1", 0, "user", "v3", None, 100, 12)]), batch_key="b3"
    )
    assert state(spark, tbl) == {("c1", 0): "v3"}


def test_tombstone_blocks_resurrection(spark, make_table):
    tbl = make_table()
    merge_changes(
        spark,
        tbl,
        cdc_rows(
            spark,
            [("I", "c1", 0, "user", "born", None, 10, 1), ("D", "c1", 0, None, None, None, 30, 2)],
        ),
        batch_key="b1",
    )
    assert state(spark, tbl) == {}
    # late update OLDER than the delete must stay dead
    merge_changes(
        spark, tbl, cdc_rows(spark, [("U", "c1", 0, "user", "zombie", None, 20, 3)]), batch_key="b2"
    )
    assert state(spark, tbl) == {}
    # genuinely newer re-insert revives the key
    merge_changes(
        spark, tbl, cdc_rows(spark, [("I", "c1", 0, "user", "reborn", None, 40, 4)]), batch_key="b3"
    )
    assert state(spark, tbl) == {("c1", 0): "reborn"}


def test_delete_of_unknown_key_leaves_guard_tombstone(spark, make_table):
    tbl = make_table()
    merge_changes(
        spark, tbl, cdc_rows(spark, [("D", "cX", 5, None, None, None, 100, 1)]), batch_key="b1"
    )
    assert state(spark, tbl) == {}
    # an older insert arriving later must not resurrect
    merge_changes(
        spark, tbl, cdc_rows(spark, [("I", "cX", 5, "user", "late", None, 90, 2)]), batch_key="b2"
    )
    assert state(spark, tbl) == {}


def test_schema_evolution_midstream(spark, make_table):
    from tests.conftest import TRANSCRIPT_SCHEMA
    import pyspark.sql.types as T

    pre_schema = T.StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    tbl = make_table(schema=pre_schema)
    pre = cdc_rows(spark, [("I", "c1", 0, "user", "old-world", None, 10, 1)]).drop("tool")
    merge_changes(spark, tbl, pre, batch_key="b1")
    assert "tool" not in [f.name for f in tbl.snapshot().schema().fields]

    post = cdc_rows(spark, [("I", "c1", 1, "tool", "call", "search", 20, 2)])
    merge_changes(spark, tbl, post, batch_key="b2")
    fields = [f.name for f in tbl.snapshot().schema().fields]
    assert "tool" in fields
    out = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in tbl.read(spark).collect()}
    assert out == {("c1", 0): None, ("c1", 1): "search"}


def test_quarantine_garbage_keys(spark, make_table):
    tbl = make_table()
    bad = cdc_rows(
        spark,
        [
            ("I", None, 0, "user", "no conv", None, 10, 1),
            ("I", "c1", -3, "user", "neg turn", None, 10, 2),
            ("I", "c1", 0, "user", "good", None, 10, 3),
        ],
    )
    r = merge_changes(spark, tbl, bad, batch_key="b1")
    assert r.quarantined == 2 and r.inserts == 1
    q = spark.read.parquet(tbl.quarantine_path())
    assert q.count() == 2


def test_ledger_skips_replayed_batch(spark, make_table):
    tbl = make_table()
    b = cdc_rows(spark, [("I", "c1", 0, "user", "x", None, 10, 1)])
    merge_changes(spark, tbl, b, batch_key="bronze:0")
    r = merge_changes(spark, tbl, b, batch_key="bronze:0")
    assert r.skipped
    assert tbl.read(spark).count() == 1


def test_lww_replay_idempotent_without_ledger(spark, make_table):
    tbl = make_table()
    b = cdc_rows(
        spark,
        [
            ("I", "c1", 0, "user", "a", None, 10, 1),
            ("U", "c1", 0, "user", "b", None, 20, 2),
            ("D", "c1", 1, None, None, None, 30, 3),
        ],
    )
    merge_changes(spark, tbl, b, batch_key="k1")
    before = sorted(map(tuple, tbl.read(spark).select("conv_id", "turn_idx", "text").collect()))
    merge_changes(spark, tbl, b, batch_key="k2")  # new key → ledger does not skip
    after = sorted(map(tuple, tbl.read(spark).select("conv_id", "turn_idx", "text").collect()))
    assert before == after


def test_full_row_replacement_semantics(spark, make_table):
    # winner's values replace the whole row (reference MERGE UPDATE sets all cols)
    tbl = make_table()
    merge_changes(
        spark, tbl, cdc_rows(spark, [("I", "c1", 0, "tool", "x", "search", 10, 1)]), batch_key="b1"
    )
    merge_changes(
        spark, tbl, cdc_rows(spark, [("U", "c1", 0, "user", "y", None, 20, 2)]), batch_key="b2"
    )
    row = tbl.read(spark).collect()[0]
    assert row["tool"] is None and row["role"] == "user" and row["text"] == "y"


def test_bucket_pruning_reads(spark, make_table):
    tbl = make_table(n_buckets=4)
    rows = [("I", f"c{i}", 0, "user", f"t{i}", None, 10 + i, i) for i in range(20)]
    merge_changes(spark, tbl, cdc_rows(spark, rows), batch_key="b1")
    snap = tbl.snapshot()
    some_bucket = snap.files[0]["bucket"]
    pruned = tbl.read(spark, buckets=[some_bucket])
    full = tbl.read(spark)
    assert 0 < pruned.count() < full.count() == 20


def test_compact_scoped_to_delta_buckets(spark, make_table):
    """Compaction rewrites ONLY buckets carrying MOR deltas; canonical
    files of untouched buckets are carried by the manifest unchanged
    (at 100 TB a compaction must not rewrite the cold 90%)."""
    from digital_analytics_data_platform_spark.lake import compact, merge_changes
    from tests.conftest import cdc_rows

    tbl = make_table(n_buckets=8)
    # seed many conversations via COW → canonical files in most buckets
    seed = cdc_rows(
        spark, [("I", f"c{i}", 0, "user", f"t{i}", None, 100 + i, i) for i in range(40)]
    )
    merge_changes(spark, tbl, seed, batch_key="seed", strategy="cow")
    before = {f["path"]: f["bucket"] for f in tbl.snapshot().files}
    # one MOR batch touching a single conversation → deltas in 1 bucket
    one = cdc_rows(spark, [("U", "c0", 0, "user", "updated", None, 999, 1000)])
    res = merge_changes(spark, tbl, one, batch_key="mor1", strategy="mor")
    assert res.strategy == "mor" and len(res.affected_buckets) == 1
    delta_bucket = res.affected_buckets[0]

    rows = compact(spark, tbl)
    assert rows > 0
    snap = tbl.snapshot()
    assert snap.props.get("delta_buckets") == {}
    after = {f["path"]: f["bucket"] for f in snap.files}
    # untouched buckets: identical file paths carried over
    untouched_before = {p for p, b in before.items() if b != delta_bucket}
    untouched_after = {p for p, b in after.items() if b != delta_bucket}
    assert untouched_before == untouched_after
    # the delta bucket was rewritten (no old path survives)
    assert not any(b == delta_bucket for p, b in after.items() if p in before and before[p] == delta_bucket)
    # state is correct post-compact
    got = tbl.read(spark).filter("conv_id = 'c0'").collect()
    assert len(got) == 1 and got[0]["text"] == "updated"
    # compacting again with no deltas is a no-op
    assert compact(spark, tbl) == 0


def test_replace_full_rebuild(spark, make_table):
    """S5 CREATE-OR-REPLACE: the feed becomes the whole table state in
    one atomic snapshot; prior versions stay readable (time travel);
    replay via batch_key is a no-op."""
    from digital_analytics_data_platform_spark.lake import merge_changes, replace_full
    from tests.conftest import cdc_rows

    tbl = make_table()
    merge_changes(
        spark,
        tbl,
        cdc_rows(spark, [("I", "old", 0, "user", "old row", None, 10, 1)]),
        batch_key="b0",
    )
    v_before = tbl.snapshot().version

    feed = cdc_rows(
        spark,
        [
            ("I", "new1", 0, "user", "a", None, 20, 10),
            ("U", "new1", 0, "user", "a2", None, 30, 11),  # LWW collapses to this
            ("I", "new2", 0, "user", "b", None, 25, 12),
            ("D", "new3", 0, None, None, None, 26, 13),  # delete winner → absent
        ],
    )
    res = replace_full(spark, tbl, feed, batch_key="rebuild:1")
    assert res.strategy == "replace_full" and res.keys_written == 2
    state = {r["conv_id"]: r["text"] for r in tbl.read(spark).collect()}
    assert state == {"new1": "a2", "new2": "b"}  # old row gone, D absent
    # time travel: previous snapshot still shows the old state
    old = tbl.read(spark, snapshot_version=v_before).collect()
    assert [r["conv_id"] for r in old] == ["old"]
    # replay is a ledger no-op
    assert replace_full(spark, tbl, feed, batch_key="rebuild:1").skipped


def test_table_path_with_space(spark, tmp_path):
    """Code-review regression: executor-side stats must decode the
    percent-encoded _metadata.file_path URI — a table under a directory
    with a space previously committed 'my%20lake' paths and bricked
    every subsequent read."""
    from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
    from tests.conftest import TRANSCRIPT_SCHEMA, cdc_rows

    path = str(tmp_path / "my lake" / "bronze")
    tbl = LakeTable.create(path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4)
    merge_changes(
        spark, tbl, cdc_rows(spark, [("I", "c1", 0, "user", "hello", None, 10, 1)]), batch_key="b0"
    )
    rel = tbl.snapshot().files[0]["path"]
    # un-decoded URI would relpath into '../..%20..' garbage
    assert "%20" not in rel and not rel.startswith(".."), rel
    assert tbl.read(spark).count() == 1


def test_ledger_trim_evicts_oldest_inserted(spark, make_table, monkeypatch):
    """Round-2 defect: the trim sorted keys lexicographically, so
    'bronze:10' was evicted before 'bronze:9' — the MOST RECENT batches
    lost their exactly-once guard. Eviction must be oldest-inserted."""
    from digital_analytics_data_platform_spark.lake import merge as merge_mod

    monkeypatch.setattr(merge_mod, "_LEDGER_MAX", 4)
    tbl = make_table()
    for i in range(12):
        merge_changes(
            spark, tbl,
            cdc_rows(spark, [("I", f"c{i}", 0, "user", f"t{i}", None, 10 + i, i + 1)]),
            batch_key=f"bronze:{i}",
        )
    ledger = tbl.snapshot().props[merge_mod._LEDGER_KEY]
    # most recent 4 retained — under lexicographic eviction bronze:9
    # would be gone while bronze:2 survived
    assert list(ledger) == ["bronze:8", "bronze:9", "bronze:10", "bronze:11"]
    # a replay of a retained batch is still a no-op
    assert merge_changes(
        spark, tbl,
        cdc_rows(spark, [("I", "c11", 0, "user", "t11", None, 21, 12)]),
        batch_key="bronze:11",
    ).skipped


def test_ledger_trim_replayed_key_moves_to_back(monkeypatch):
    from digital_analytics_data_platform_spark.lake import merge as merge_mod

    monkeypatch.setattr(merge_mod, "_LEDGER_MAX", 3)
    ledger = {}
    for k in ("a", "b", "c"):
        merge_mod._trim_ledger(ledger, k, 0, 0)
    merge_mod._trim_ledger(ledger, "a", 0, 0)  # replay: now most recent
    merge_mod._trim_ledger(ledger, "d", 0, 0)  # evicts b (oldest), not a
    assert list(ledger) == ["c", "a", "d"]


# ---- type-widening schema evolution (Iceberg promotion rules) ----------

WIDEN_SCHEMA_INT = "op string, conv_id string, turn_idx int, score int, ts timestamp, lsn long"
WIDEN_SCHEMA_LONG = "op string, conv_id string, turn_idx int, score long, ts timestamp, lsn long"


def _widen_table(tmp_path, name):
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    return LakeTable.create(
        str(tmp_path / name), schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=4
    )


def _w_rows(spark, schema, rows):
    import datetime

    base = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(op, c, t, s, base + datetime.timedelta(seconds=off), lsn) for op, c, t, s, off, lsn in rows],
        schema,
    )


def test_type_widening_int_to_long(spark, tmp_path):
    """A column arriving wider mid-stream (int→long) promotes the table
    schema; old int32 files stay readable (scan-time upcast) — for both
    write strategies."""
    for strat in ("cow", "mor"):
        tbl = _widen_table(tmp_path, f"w_{strat}")
        merge_changes(
            spark, tbl, _w_rows(spark, WIDEN_SCHEMA_INT, [("I", "c1", 0, 5, 10, 1)]),
            batch_key="b1", strategy=strat,
        )
        merge_changes(
            spark, tbl,
            _w_rows(spark, WIDEN_SCHEMA_LONG, [("U", "c1", 0, 2**40, 20, 2), ("I", "c2", 0, 7, 20, 3)]),
            batch_key="b2", strategy=strat,
        )
        got = {(r["conv_id"], r["turn_idx"]): r["score"] for r in tbl.read(spark).collect()}
        assert got == {("c1", 0): 2**40, ("c2", 0): 7}, strat
        assert tbl.snapshot().schema()["score"].dataType.simpleString() == "bigint", strat


def test_narrower_batch_casts_up_without_demotion(spark, tmp_path):
    """After promotion, a batch still sending int casts up; the table
    schema never narrows back."""
    tbl = _widen_table(tmp_path, "w_narrow")
    merge_changes(spark, tbl, _w_rows(spark, WIDEN_SCHEMA_LONG, [("I", "c1", 0, 2**40, 10, 1)]), batch_key="b1")
    assert tbl.snapshot().schema()["score"].dataType.simpleString() == "bigint"
    merge_changes(spark, tbl, _w_rows(spark, WIDEN_SCHEMA_INT, [("U", "c1", 0, 9, 20, 2)]), batch_key="b2")
    assert tbl.snapshot().schema()["score"].dataType.simpleString() == "bigint"
    assert tbl.read(spark).collect()[0]["score"] == 9


def test_key_column_type_change_refused(spark, tmp_path):
    """Key types drive bucketing (binary-encoding hash): widening one
    must fail loudly, never silently re-bucket."""
    import pytest

    tbl = _widen_table(tmp_path, "w_key")
    bad = "op string, conv_id string, turn_idx long, score int, ts timestamp, lsn long"
    with pytest.raises(ValueError, match="key column"):
        merge_changes(spark, tbl, _w_rows(spark, bad, [("I", "c1", 0, 1, 10, 1)]), batch_key="b1")


def test_incompatible_type_change_refused(spark, tmp_path):
    import pytest

    tbl = _widen_table(tmp_path, "w_bad")
    bad = "op string, conv_id string, turn_idx int, score string, ts timestamp, lsn long"
    import datetime

    df = spark.createDataFrame(
        [("I", "c1", 0, "oops", datetime.datetime(2026, 1, 1), 1)], bad
    )
    with pytest.raises(ValueError, match="incompatible type change"):
        merge_changes(spark, tbl, df, batch_key="b1")


def test_type_widening_through_reconcile(spark, tmp_path):
    """The parameterized reconcile path honors the same promotion rules."""
    import datetime

    from digital_analytics_data_platform_spark.lake.merge import reconcile_backfill

    tbl = _widen_table(tmp_path, "w_rec")
    merge_changes(spark, tbl, _w_rows(spark, WIDEN_SCHEMA_INT, [("I", "c1", 0, 5, 10, 1)]), batch_key="b1")
    start = datetime.datetime(2026, 1, 1)
    end = start + datetime.timedelta(hours=1)
    corrected = _w_rows(spark, WIDEN_SCHEMA_LONG, [("U", "c1", 0, 2**41, 30, 2)])
    reconcile_backfill(spark, tbl, corrected, start, end, batch_key="rec1")
    assert tbl.snapshot().schema()["score"].dataType.simpleString() == "bigint"
    assert {r["score"] for r in tbl.read(spark).collect()} == {2**41}


# ---- dead-letter (quarantine) replay ------------------------------------


def test_quarantine_replay_after_fix(spark, make_table):
    """Garbage rows (null keys) quarantine; after an operator fix they
    re-merge through the normal path; unfixable rows re-quarantine and
    nothing is lost or force-applied."""
    from pyspark.sql import functions as F

    from digital_analytics_data_platform_spark.lake import (
        read_quarantine,
        replay_quarantine,
    )

    tbl = make_table()
    r = merge_changes(
        spark,
        tbl,
        cdc_rows(
            spark,
            [
                ("I", "c1", 0, "user", "good", None, 10, 1),
                ("I", None, 1, "user", "lost conv_id c9", None, 20, 2),
                ("I", None, None, "user", "hopeless", None, 30, 3),
            ],
        ),
        batch_key="b1",
    )
    assert r.quarantined == 2
    assert read_quarantine(spark, tbl).count() == 2

    # incident fix: rows whose text names the conversation get the key back
    def fix(df):
        return df.withColumn(
            "conv_id",
            F.coalesce(F.col("conv_id"), F.regexp_extract("text", r"(c\d+)$", 1)),
        ).withColumn("conv_id", F.when(F.col("conv_id") == "", None).otherwise(F.col("conv_id")))

    res = replay_quarantine(spark, tbl, fix=fix, batch_key="quarantine:incident-1")
    assert res.consumed_rows == 2 and res.requarantined == 1
    assert state(spark, tbl) == {("c1", 0): "good", ("c9", 1): "lost conv_id c9"}
    # the hopeless row is back in quarantine, not lost, not applied
    leftover = read_quarantine(spark, tbl).collect()
    assert len(leftover) == 1 and leftover[0]["text"] == "hopeless"


def test_quarantine_replay_idempotent_and_empty(spark, make_table):
    from digital_analytics_data_platform_spark.lake import replay_quarantine

    tbl = make_table()
    # empty DLQ: no-op
    res = replay_quarantine(spark, tbl, batch_key="quarantine:none")
    assert res.consumed_files == 0 and res.merge is None

    merge_changes(
        spark, tbl,
        cdc_rows(spark, [("I", None, 0, "user", "bad", None, 10, 1)]),
        batch_key="b1",
    )
    # no fix: the row re-quarantines; replaying again under the same key
    # is ledger-skipped and must NOT delete the re-quarantined copy
    # (the DLQ holds different rows than the batch that coined the key)
    r1 = replay_quarantine(spark, tbl, batch_key="quarantine:retry")
    assert r1.consumed_rows == 1 and r1.requarantined == 1
    from digital_analytics_data_platform_spark.lake import read_quarantine

    assert read_quarantine(spark, tbl).count() == 1
    r2 = replay_quarantine(spark, tbl, batch_key="quarantine:retry")
    assert r2.merge.skipped and read_quarantine(spark, tbl).count() == 1
    # a NEW key converges: consumes the copy, re-quarantines it once
    r3 = replay_quarantine(spark, tbl, batch_key="quarantine:retry-2")
    assert r3.consumed_rows == 1 and r3.requarantined == 1
    assert read_quarantine(spark, tbl).count() == 1


def test_null_op_rows_quarantine_not_vanish(spark, make_table):
    """A row whose op is NULL (wire decoders emit these for garbage
    JSON / DDL / unknown op codes) must be quarantined — it previously
    slipped through as deleted=NULL and silently vanished from reads."""
    from pyspark.sql import functions as F

    from digital_analytics_data_platform_spark.lake import read_quarantine

    for strat in ("mor", "cow"):
        tbl = make_table(name=f"nullop_{strat}")
        batch = cdc_rows(
            spark,
            [
                ("I", "c1", 0, "user", "good", None, 10, 1),
                ("I", "c1", 1, "user", "intent unknown", None, 20, 2),
            ],
        ).withColumn(
            "op", F.when(F.col("text") == "intent unknown", None).otherwise(F.col("op"))
        )
        r = merge_changes(spark, tbl, batch, batch_key="b1", strategy=strat)
        assert r.quarantined == 1, strat
        assert state(spark, tbl) == {("c1", 0): "good"}, strat
        q = read_quarantine(spark, tbl).collect()
        assert len(q) == 1 and q[0]["text"] == "intent unknown", strat
