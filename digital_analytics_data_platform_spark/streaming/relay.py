"""Lake → wire CDC-out relay: publish a table's incremental changelog
as JSON change envelopes a downstream binlog-style consumer can tail.

This closes the loop on the CDC story: the engine ingests Debezium /
wal2json / Maxwell / Canal feeds (``cdc_json_stream``) AND can emit the
same formats from its own commit history (``LakeTable.read_changes``),
so a second lake — or any off-the-shelf CDC consumer — can mirror a
table without rescanning it. The reference's outbound surface is a
BigQuery→Dataflow export job (``README.md:269-275``); here it is a
manifest-diff read re-encoded on the wire, O(delta) not O(table).

Delivery contract: **at-least-once emission, exactly-once effect**.
The cursor file is advanced only *after* the segment files are
published, so a crash between the two re-emits the last window; every
row carries its original ``(ts, lsn)``, so any LWW upsert consumer
(e.g. this engine's own ``apply_stream``) converges to the same state
regardless of replays — the same idempotence argument as the inbound
path. Deletes ride as full-image tombstone envelopes while the
tombstone is retained (see ``read_changes`` for the expiry caveat).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable

CURSOR_FILE = "_relay_cursor.json"


@dataclass
class RelayResult:
    since_version: int
    until_version: int
    rows: int = 0
    segments: list[str] = field(default_factory=list)

    @property
    def skipped(self) -> bool:
        return self.until_version == self.since_version


def _codec_module(codec: str):
    from ..sources import canal, debezium, maxwell, wal2json

    codecs = {
        "debezium": debezium,
        "maxwell": maxwell,
        "canal": canal,
        "wal2json": wal2json,
    }
    if codec not in codecs:
        raise ValueError(f"unknown wire codec {codec!r}; choose from {sorted(codecs)}")
    return codecs[codec]


def _read_cursor(out_dir: str) -> int:
    p = os.path.join(out_dir, CURSOR_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["version"])


def relay_cursor(out_dir: str) -> int:
    """The relay's durable position: the last source snapshot version it
    has fully encoded (0 before the first tick). Expose this to
    snapshot expiry as a retention floor —
    ``apply_stream(expire_protect=[lambda: relay_cursor(out_dir)])`` —
    so a lagging relay's next ``read_changes(since_version=cursor)``
    can never lose its manifest to aggressive ``expire_keep_last``."""
    return _read_cursor(out_dir)


def _write_cursor(out_dir: str, version: int) -> None:
    p = os.path.join(out_dir, CURSOR_FILE)
    tmp = p + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, p)  # atomic on POSIX


def relay_changes(
    spark: SparkSession,
    table: LakeTable,
    out_dir: str,
    *,
    codec: str = "debezium",
    lsn_col: str = "lsn",
    n_segments: int = 1,
    images: bool = False,
) -> RelayResult:
    """One relay tick: encode the table's changes since the cursor as
    ``codec`` envelopes and publish them as ``.jsonl`` segments under
    ``out_dir``, then advance the cursor. Run it on a schedule (or after
    each apply) for a continuous mirror; each tick is O(delta).

    Envelope mapping: ``_change_type='delete'`` → a delete envelope
    carrying the full row image; everything else → update. The window's
    ``until_version`` rides as the transaction id (``txId``/``xid``/
    ``id`` per codec), giving consumers a commit-window handle; row
    ordering authority stays with ``(ts, lsn)`` exactly as on the
    inbound wire.

    ``images=True`` relays from :meth:`LakeTable.read_changelog`
    instead: ops refine to true insert/update/delete, update envelopes
    carry the pre-update row image in the codec's before slot
    (Debezium ``before``, Maxwell/Canal ``old``, wal2json ``identity``),
    and no-op rewrites (compaction, clustering, rescale) relay nothing
    at all — the exact-changelog contract downstream diff consumers
    need. Costs one extra pruned read of the old snapshot per tick.

    Returns a :class:`RelayResult`; ``skipped`` is true when the table
    has no commits past the cursor (nothing is written).
    """
    mod = _codec_module(codec)
    os.makedirs(out_dir, exist_ok=True)
    since = _read_cursor(out_dir)
    until = table.snapshot().version
    if until <= since:
        return RelayResult(since, since)

    if images:
        clog = table.read_changelog(spark, since_version=since, until_version=until)
        all_cols = [f.name for f in clog.schema["after"].dataType.fields]
        row_cols = [c for c in all_cols if c != lsn_col]
        img = F.coalesce(F.col("after"), F.col("before"))
        changes = clog.select(
            # payload columns from the row image; the wire position
            # (lsn) from the changelog's flat event-order column, so a
            # delete rides at the tombstone's lsn, not its before-image's
            *[img[c].alias(c) if c != lsn_col else F.col(lsn_col) for c in all_cols],
            F.when(F.col("_change_type") == "insert", F.lit("I"))
            .when(F.col("_change_type") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("_op"),
            F.when(
                F.col("before").isNotNull(),
                F.struct(*[F.col("before")[c].alias(c) for c in row_cols]),
            ).alias("_before"),
            F.lit(until).cast("long").alias("_commit"),
        )
        wire = mod.encode_envelopes(
            changes,
            row_cols,
            op_col="_op",
            lsn_col=lsn_col,
            commit_lsn_col="_commit",
            before_col="_before",
        )
    else:
        changes = table.read_changes(spark, since_version=since, until_version=until)
        row_cols = [c for c in changes.columns if c not in ("_change_type", lsn_col)]
        wire = mod.encode_envelopes(
            changes.select(
                *changes.columns,
                F.when(F.col("_change_type") == "delete", F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("_op"),
                F.lit(until).cast("long").alias("_commit"),
            ),
            row_cols,
            op_col="_op",
            lsn_col=lsn_col,
            commit_lsn_col="_commit",
        )

    staging = os.path.join(out_dir, f"_staging_{uuid.uuid4().hex}")
    wire.coalesce(max(1, n_segments)).write.mode("overwrite").text(staging)
    parts = sorted(glob.glob(os.path.join(staging, "part-*")))
    segments = []
    for i, part in enumerate(parts):
        # flat files with ordered names + strictly increasing mtimes, so
        # a downstream FileStreamSource consumes windows in commit order
        seg = os.path.join(out_dir, f"cdc_v{since:09d}_v{until:09d}_{i:04d}.jsonl")
        shutil.move(part, seg)
        segments.append(seg)
    shutil.rmtree(staging, ignore_errors=True)
    base_t = time.time() - len(segments)
    for j, seg in enumerate(segments):
        os.utime(seg, (base_t + j, base_t + j))
    # distributed count over the just-written segments (O(delta)),
    # doubling as a readability check on what was published
    rows = spark.read.text(segments).count() if segments else 0
    _write_cursor(out_dir, until)
    return RelayResult(since, until, rows=rows, segments=segments)
