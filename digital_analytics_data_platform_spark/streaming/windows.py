"""Watermarked event-time window aggregation — §2.9's late-data
semantics expressed natively in Structured Streaming.

The reference handles lateness with bounded lookback re-MERGE windows
(60d bronze daily / 7d entity / 14d gold long — e.g.
``sql/02_SDI_SA360/01_BRONZE/MERGE/01_merge_sdi_bronze_sa360_campaign_daily.sql:27``);
the engine's MERGE kernel keeps that guarantee for the tables. This
operator is the *streaming-native* counterpart for live rollups: a
``withWatermark`` + tumbling-window aggregation whose state is bounded
by the watermark — events later than ``lateness`` are dropped from the
live aggregate (they still reach the tables through the MERGE path,
which is why the two coexist).

Scale shape: the aggregation is a hash agg keyed by (window, group
cols) with map-side partial combine; state store size is
O(active windows × groups), bounded by watermark eviction — no
unbounded state at 10^10 events/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 minute",
    lateness: str = "2 minutes",
    group_cols: tuple[str, ...] = ("role",),
    aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window rollup with a watermark.

    Returns a streaming DataFrame (append-capable once the watermark
    closes a window): ``window_start, window_end, <group_cols>,
    <aggs>`` — default aggs: ``n_events`` (count) + ``n_convs``
    (approx distinct ``conv_id``, the streaming-legal distinct)."""
    if aggs is None:
        aggs = {
            "n_events": F.count(F.lit(1)),
            "n_convs": F.approx_count_distinct("conv_id"),
        }
    agg = (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window), *[F.col(c) for c in group_cols])
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in group_cols],
        *aggs.keys(),
    )


def run_windowed_rollup_to_memory(
    spark,
    stream: DataFrame,
    *,
    query_name: str = "windowed_rollup",
    checkpoint_dir: str,
    **kwargs,
) -> "object":
    """Drive the rollup into a memory sink in append mode (only
    watermark-closed windows emit — the semantics tests assert on).
    Returns the StreamingQuery; caller awaits/stops it."""
    out = windowed_rollup(stream, **kwargs)
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
