"""Structured Streaming wiring: CDC source → foreachBatch MERGE → lake.

The reference's "incremental" execution is scheduled micro-batch upsert
with a lookback window (``README.md:261-268``); Structured Streaming
gives the same semantics natively — ``trigger(availableNow=True)`` for
backfill/replay (the chunked-backfill-loop analog,
``sql/02_SDI_SA360/01_BRONZE/Backfill/00_backfill_…:18-32``) and
``processingTime`` triggers for tailing a live feed.
"""

from .source import cdc_file_stream, cdc_json_stream, cdc_schema, write_log_segments
from .runner import apply_stream, metrics_df, StreamMetrics
from .relay import relay_changes, relay_cursor, RelayResult
from .bootstrap import (
    apply_snapshot_chunks,
    bootstrap_begin,
    bootstrap_finish,
    bootstrap_stream,
    lake_snapshot_changes,
    snapshot_to_changes,
)

__all__ = [
    "apply_snapshot_chunks",
    "lake_snapshot_changes",
    "bootstrap_begin",
    "bootstrap_finish",
    "bootstrap_stream",
    "snapshot_to_changes",
    "cdc_file_stream",
    "cdc_json_stream",
    "cdc_schema",
    "write_log_segments",
    "apply_stream",
    "metrics_df",
    "StreamMetrics",
    "relay_changes",
    "relay_cursor",
    "RelayResult",
]
