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

__all__ = [
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
