"""Lake → wire CDC-out relay: a downstream mirror tailing the relayed
envelopes must converge to the source table's exact state — the
outbound analog of the replay-equivalence north rule."""

import os

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import compact, merge_changes
from digital_analytics_data_platform_spark.streaming import (
    apply_stream,
    cdc_json_stream,
    relay_changes,
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]


def _state(spark, tbl):
    return sorted(tuple(r) for r in tbl.read(spark).select(*COLS).collect())


def _mirror_tick(spark, wire_dir, mirror, ckpt, codec):
    src = cdc_json_stream(spark, wire_dir, codec=codec)
    return apply_stream(spark, src, mirror.path, ckpt, pipeline_id="mirror")[1]


@pytest.mark.parametrize("codec", ["debezium", "canal"])
def test_relay_mirror_converges(spark, make_table, tmp_path, codec):
    log = datagen.change_log(
        spark, 3_000, n_convs=40, turns_per_conv=8, garbage_frac=0.0
    ).cache()
    src_tbl = make_table("src", n_buckets=4)
    mirror = make_table("mirror", n_buckets=4)
    wire_dir = str(tmp_path / "wire")
    ckpt = str(tmp_path / "ckpt")

    # tick 1: two MOR batches (includes deletes from the generator)
    for i in range(2):
        merge_changes(
            spark,
            src_tbl,
            log.filter((F.col("lsn") >= i * 750) & (F.col("lsn") < (i + 1) * 750)),
            batch_key=f"b{i}",
            strategy="mor",
        )
    r1 = relay_changes(spark, src_tbl, wire_dir, codec=codec)
    assert not r1.skipped and r1.rows > 0 and r1.segments
    assert all(s.endswith(".jsonl") for s in r1.segments)
    _mirror_tick(spark, wire_dir, mirror, ckpt, codec)
    assert _state(spark, mirror) == _state(spark, src_tbl)

    # idle tick: nothing new → nothing written, cursor unchanged
    r_idle = relay_changes(spark, src_tbl, wire_dir, codec=codec)
    assert r_idle.skipped and r_idle.rows == 0 and not r_idle.segments

    # tick 2: more batches + a compaction commit in the window — the
    # conservative superset re-emission must stay idempotent downstream
    for i in range(2, 4):
        merge_changes(
            spark,
            src_tbl,
            log.filter((F.col("lsn") >= i * 750) & (F.col("lsn") < (i + 1) * 750)),
            batch_key=f"b{i}",
            strategy="mor",
        )
    compact(spark, src_tbl, all_buckets=True)
    r2 = relay_changes(spark, src_tbl, wire_dir, codec=codec)
    assert r2.since_version == r1.until_version and r2.until_version > r2.since_version
    _mirror_tick(spark, wire_dir, mirror, ckpt, codec)
    assert _state(spark, mirror) == _state(spark, src_tbl)
    assert len(_state(spark, mirror)) > 0


def test_relay_delete_rides_the_wire(spark, make_table, tmp_path):
    from tests.conftest import cdc_rows

    src_tbl = make_table("src2", n_buckets=2)
    mirror = make_table("mirror2", n_buckets=2)
    wire_dir = str(tmp_path / "w2")
    ckpt = str(tmp_path / "ck2")
    merge_changes(
        spark,
        src_tbl,
        cdc_rows(spark, [("I", "c1", 0, "user", "hello", None, 10, 1),
                         ("I", "c2", 0, "user", "bye", None, 11, 2)]),
        batch_key="b1",
    )
    relay_changes(spark, src_tbl, wire_dir)
    _mirror_tick(spark, wire_dir, mirror, ckpt, "debezium")
    merge_changes(
        spark,
        src_tbl,
        cdc_rows(spark, [("D", "c2", 0, None, None, None, 20, 3)]),
        batch_key="b2",
    )
    r = relay_changes(spark, src_tbl, wire_dir)
    assert r.rows >= 1
    m = _mirror_tick(spark, wire_dir, mirror, ckpt, "debezium")
    assert m.deletes >= 1
    assert _state(spark, mirror) == _state(spark, src_tbl)
    assert {r[0] for r in _state(spark, mirror)} == {"c1"}


def test_relay_unknown_codec_and_cursor(spark, make_table, tmp_path):
    src_tbl = make_table("src3", n_buckets=2)
    with pytest.raises(ValueError):
        relay_changes(spark, src_tbl, str(tmp_path / "w3"), codec="nope")
    # fresh table, version 0 → skip, no cursor advance needed
    r = relay_changes(spark, src_tbl, str(tmp_path / "w3"))
    assert r.skipped
    assert not os.path.exists(str(tmp_path / "w3" / "_relay_cursor.json"))


@pytest.mark.parametrize("codec", ["debezium", "wal2json", "maxwell", "canal"])
def test_relay_images_mirror_converges_and_carries_before(
    spark, make_table, tmp_path, codec
):
    """images=True relay: true insert/update/delete ops on the wire,
    update envelopes carry the pre-update image in the codec's before
    slot (Debezium `before`, wal2json `identity`, Maxwell/Canal `old`),
    deletes ride at the tombstone's lsn, compaction relays nothing, and
    a mirror tailing the feed still converges byte-for-byte."""
    import json

    from tests.conftest import cdc_rows

    src_tbl = make_table(f"srci_{codec}", n_buckets=2)
    mirror = make_table(f"mirri_{codec}", n_buckets=2)
    wire_dir = str(tmp_path / f"wi_{codec}")
    ckpt = str(tmp_path / f"cki_{codec}")

    merge_changes(
        spark,
        src_tbl,
        cdc_rows(
            spark,
            [
                ("I", "c1", 0, "user", "hello", None, 10, 1),
                ("I", "c2", 0, "user", "bye", None, 11, 2),
            ],
        ),
        batch_key="b1",
        strategy="mor",
    )
    r1 = relay_changes(spark, src_tbl, wire_dir, codec=codec, images=True)
    assert r1.rows == 2
    _mirror_tick(spark, wire_dir, mirror, ckpt, codec)

    merge_changes(
        spark,
        src_tbl,
        cdc_rows(
            spark,
            [
                ("U", "c1", 0, "user", "hello-EDIT", "search", 20, 3),
                ("D", "c2", 0, None, None, None, 20, 4),
            ],
        ),
        batch_key="b2",
        strategy="mor",
    )
    r2 = relay_changes(spark, src_tbl, wire_dir, codec=codec, images=True)
    assert r2.rows == 2
    envs = [
        json.loads(ln)
        for seg in r2.segments
        for ln in open(seg).read().strip().split("\n")
    ]
    op_of = lambda j: j.get("op") or j.get("type") or j.get("action")  # noqa: E731
    ups = [j for j in envs if op_of(j) in ("u", "U", "update", "UPDATE")]
    dels = [j for j in envs if op_of(j) in ("d", "D", "delete", "DELETE")]
    assert len(ups) == 1 and len(dels) == 1
    before_slot = {
        "debezium": "before",
        "wal2json": "identity",
        "maxwell": "old",
        "canal": "old",
    }[codec]
    pre = ups[0].get(before_slot)
    assert pre is not None and "hello" in json.dumps(pre)
    # Maxwell/Canal old = changed columns only; unchanged `role` absent
    if codec in ("maxwell", "canal"):
        assert "user" not in json.dumps(pre)
    # the delete envelope rides at the tombstone's lsn (4), not the
    # before-image's (2)
    dj = json.dumps(dels[0])
    if codec == "debezium":
        assert dels[0]["source"]["lsn"] == 4
    elif codec == "maxwell":
        assert dels[0]["position"].endswith(":4")
    elif codec == "canal":
        assert dels[0]["es"] == 4
    else:
        assert dels[0]["lsn"].endswith("/4"), dj

    _mirror_tick(spark, wire_dir, mirror, ckpt, codec)
    assert _state(spark, mirror) == _state(spark, src_tbl)

    # a compaction-only window relays nothing in images mode
    compact(spark, src_tbl, all_buckets=True)
    r3 = relay_changes(spark, src_tbl, wire_dir, codec=codec, images=True)
    assert r3.rows == 0


def test_relay_cursor_as_expiry_floor(spark, make_table, tmp_path):
    """A lagging relay registers its cursor as an expire_protect floor:
    the streaming runner's aggressive keep_last=1 expiry retains the
    relay's window, so the next tick encodes exactly what accrued while
    it lagged — and the same lag WITHOUT the floor fails loudly."""
    import pytest

    from digital_analytics_data_platform_spark.streaming import (
        apply_stream,
        cdc_file_stream,
        relay_cursor,
        write_log_segments,
    )

    log = datagen.change_log(
        spark, 3_000, n_convs=40, turns_per_conv=8, garbage_frac=0.0
    ).cache()
    first, second = log.filter(F.col("lsn") < 1500), log.filter(F.col("lsn") >= 1500)
    for name, protect in (("prot", True), ("bare", False)):
        tbl = make_table(f"src_{name}", n_buckets=4)
        wire = str(tmp_path / f"wire_{name}")
        log_dir = str(tmp_path / f"log_{name}")
        write_log_segments(first, log_dir, n_segments=2)
        src = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
        apply_stream(spark, src, tbl.path, str(tmp_path / f"ck_{name}"), pipeline_id="b",
                     strategy="mor")
        r1 = relay_changes(spark, tbl, wire)
        assert not r1.skipped
        cursor_after_t1 = relay_cursor(wire)

        # relay lags while the stream applies more and expires hard
        write_log_segments(second, log_dir, n_segments=2)
        src2 = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
        apply_stream(
            spark, src2, tbl.path, str(tmp_path / f"ck_{name}"), pipeline_id="b",
            strategy="mor", expire_every=1, expire_keep_last=1,
            expire_protect=[lambda w=wire: relay_cursor(w)] if protect else None,
        )
        if protect:
            # the cursor's manifest survived; the catch-up tick works
            assert min(tbl.list_snapshots()) <= cursor_after_t1
            r2 = relay_changes(spark, tbl, wire)
            assert not r2.skipped and r2.rows > 0
        else:
            # hazard is real: the bare table expired the relay's window
            assert min(tbl.list_snapshots()) > cursor_after_t1
            with pytest.raises(FileNotFoundError):
                relay_changes(spark, tbl, wire)
