"""Dead-letter replay: reprocess quarantined rows after a fix.

The MERGE kernel never drops garbage silently — rows failing the key /
order / future-ts guards append to ``<table>/quarantine/`` as parquet
(P3 discipline; the reference's analog is the staging-table rows its
MERGE filters out, e.g. ``sql/05_SDI_DIRECTORIES_UPLOAD/…`` validation
gates). That makes quarantine a dead-letter queue, and a DLQ needs a
replay path: after the upstream defect is fixed (a connector sending
null conv_ids, a producer with a skewed clock), the operator corrects
the quarantined rows and re-merges them.

Safety protocol (single-writer, same assumption as the rest of the
lake): SNAPSHOT the quarantine file list first, read exactly those
files, re-merge — rows that are *still* bad re-quarantine themselves as
NEW part files via the kernel's own guard — and delete the consumed
files only after the merge actually committed (never on a ledger skip:
by then the DLQ may hold different rows than the batch that coined the
key). A crash between commit and delete leaves consumed files in
place; replaying them under a NEW key converges — LWW idempotence
absorbs the re-apply, still-bad rows re-quarantine exactly once.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .merge import MergeResult, merge_changes
from .table import LakeTable


@dataclass
class QuarantineReplayResult:
    consumed_files: int
    consumed_rows: int
    requarantined: int
    merge: MergeResult | None
    wall_s: float = 0.0


def list_quarantine_files(table: LakeTable) -> list[str]:
    qdir = table.quarantine_path()
    if not os.path.isdir(qdir):
        return []
    return sorted(
        os.path.join(qdir, f)
        for f in os.listdir(qdir)
        if f.endswith(".parquet") or f.startswith("part-")
    )


def read_quarantine(spark: SparkSession, table: LakeTable) -> DataFrame:
    """The current dead-letter contents (empty frame if none).

    Quarantined rows carry the change-event shape (business columns +
    ``op``), not the table shape — they never made it past staging.
    Files from different write paths differ slightly (the MOR one-pass
    divert adds the internal deleted flag; COW-era files may carry
    ``commit_lsn``), so the read merges schemas and strips internals."""
    from .table import DELETED_COL

    files = list_quarantine_files(table)
    if not files:
        from pyspark.sql import types as T

        from .merge import _business_fields

        fields = _business_fields(table.snapshot().schema())
        return spark.createDataFrame(
            [], T.StructType(fields + [T.StructField("op", T.StringType(), True)])
        )
    return spark.read.option("mergeSchema", "true").parquet(*files).drop(DELETED_COL)


def replay_quarantine(
    spark: SparkSession,
    table: LakeTable,
    *,
    fix: Callable[[DataFrame], DataFrame] | None = None,
    batch_key: str | None = None,
    strategy: str = "mor",
    max_ts=None,
    write_salt: int = 1,
) -> QuarantineReplayResult:
    """Re-merge the dead-letter queue through the normal MERGE path.

    ``fix`` is the operator's correction (column repairs, key
    backfills); rows it cannot save are simply left invalid — the
    kernel's guards re-quarantine them, so replay never loses a row
    and never force-applies garbage. ``batch_key`` gives the replay
    exactly-once semantics like any other batch (recommended:
    ``"quarantine:<incident-id>"``).
    """
    t0 = time.monotonic()
    from .table import DELETED_COL

    files = list_quarantine_files(table)
    if not files:
        return QuarantineReplayResult(0, 0, 0, None, wall_s=time.monotonic() - t0)
    df = spark.read.option("mergeSchema", "true").parquet(*files).drop(DELETED_COL)
    if fix is not None:
        df = fix(df)
    res = merge_changes(
        spark,
        table,
        df,
        batch_key=batch_key,
        strategy=strategy,
        max_ts=max_ts,
        write_salt=write_salt,
    )
    consumed_rows = res.events_in if not res.skipped else 0
    # consumed files are deleted ONLY after the merge actually committed.
    # On a ledger skip they are KEPT: the DLQ may hold different rows
    # than the batch that originally used this key (e.g. rows
    # re-quarantined by that very replay), and deleting them would lose
    # data. A crash between commit and delete therefore leaves the
    # consumed files in place — replaying them under a NEW key is
    # harmless (LWW idempotence re-applies, still-bad rows re-quarantine)
    # and converges with the files removed.
    if not res.skipped:
        for p in files:
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
    return QuarantineReplayResult(
        consumed_files=len(files),
        consumed_rows=consumed_rows,
        requarantined=res.quarantined,
        merge=res,
        wall_s=time.monotonic() - t0,
    )
