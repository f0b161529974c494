"""Minimal snapshot-based lake table format + MERGE kernel.

The sandbox ships no Iceberg/Delta jars, so the engine provides its own
small lakehouse layer with the same guarantees the reference relies on
(atomic commits, partition-scoped rewrite, schema evolution, lineage):

- a table is a directory of immutable parquet data files plus a chain
  of JSON snapshot manifests; the current snapshot pointer is advanced
  by an atomic rename, so readers always see a consistent table and a
  crashed writer leaves no partial state (the analog of the
  reference's ``BEGIN TRANSACTION … COMMIT`` delete-and-reinsert,
  ``sql/07_SDI_ADOBE_PULSE_ORDERS/01_BRONZE/MERGE/01_sp_merge_…:26-91``).
- data files are grouped into hash buckets of the merge key, so a MERGE
  rewrites only the buckets its batch touches (the analog of BigQuery
  ``PARTITION BY date CLUSTER BY account_id, campaign_id``,
  ``sql/02_SDI_SA360/01_BRONZE/DDL/00_create_…campaign_daily.sql:132-133``).
- snapshots carry the table schema (Spark JSON), per-file row counts and
  min/max stats for pruning, an idempotency ledger for exactly-once
  applies, and per-bucket lineage metrics.
"""

from .table import LakeTable, lww_collapse
from .merge import (
    merge_changes,
    compact,
    expire_tombstones,
    retention_truncate,
    reconcile_backfill,
    replace_full,
    rescale_buckets,
    MergeResult,
)
from .quarantine import (
    QuarantineReplayResult,
    list_quarantine_files,
    read_quarantine,
    replay_quarantine,
)

__all__ = [
    "LakeTable",
    "lww_collapse",
    "merge_changes",
    "compact",
    "expire_tombstones",
    "retention_truncate",
    "reconcile_backfill",
    "replace_full",
    "rescale_buckets",
    "MergeResult",
    "QuarantineReplayResult",
    "list_quarantine_files",
    "read_quarantine",
    "replay_quarantine",
]
