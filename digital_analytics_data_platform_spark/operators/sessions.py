"""Timeout-gap sessionization — grouping a keyed event stream into
sessions separated by idle gaps, batch and streaming.

Reference analog: the clickstream entry-pages pipeline consumes
pre-sessionized rows and re-derives per-session first/last events per
run (``sql/08_SDI_CLICKSTREAM/01_BRONZE/MERGE/01_sp_merge_…
entryPagesSession_daily.sql:131-136``) — the sessionization itself
happens upstream in Adobe. This module is the engine-side upstream:
Spark-native ``F.session_window`` (batch AND Structured Streaming —
the same merging-window implementation powers both), plus a
gaps-and-islands row labeler for consumers that need a session id on
every event row.

Semantics (pinned by test): two consecutive events of the same key
merge iff ``ts₂ − ts₁ ≤ gap`` (inclusive — an event landing exactly at
the previous session's expiry instant still joins it); a new session
starts when the gap EXCEEDS the timeout. ``session_end`` is
``last_ts + gap`` (Spark's window-end convention).

Scale shape: ``session_window`` is one shuffle on the group keys with
merging-interval state per key (bounded by session count, and by the
watermark in streaming); the row labeler is one window sort per key —
per-key state bounded by that key's events, skew-safe for conversation
keys (a conversation's events fit one partition by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-session rollup via the native merging session window:
    ``(*key_cols, session_start, session_end, <aggs>)``. Default aggs:
    ``n_events`` + ``first_ts``/``last_ts`` (the reference's
    first/last-event extraction, computed at session grain)."""
    if aggs is None:
        aggs = {
            "n_events": F.count(F.lit(1)),
            "first_ts": F.min(ts_col),
            "last_ts": F.max(ts_col),
        }
    out = df.groupBy(*key_cols, F.session_window(F.col(ts_col), gap)).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return out.select(
        *key_cols,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *aggs.keys(),
    )


def sessionize_ids(
    df: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Label every input row with its session: adds ``session_seq``
    (1-based per key, in time order) and ``session_start``. The classic
    gaps-and-islands build — LAG to mark gap breaks, running SUM to
    number islands — with the same boundary rule as :func:`sessionize`
    (break when the gap exceeds ``gap_seconds``).

    ``tiebreak_cols`` break ordering ties at equal timestamps (ties
    never affect session MEMBERSHIP — a zero gap always merges — only
    which row is considered first)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # exact integer microseconds (unix_timestamp would truncate to
    # seconds and mis-classify sub-second boundary gaps)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    brk = (
        prev_ts.isNull()
        | (us(F.col(ts_col)) - us(prev_ts) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled = df.withColumn("session_seq", F.sum(brk).over(wsum))
    return labeled.withColumn(
        "session_start", F.min(ts_col).over(Window.partitionBy(*key_cols, "session_seq"))
    )


def streaming_session_rollup(
    stream: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("conv_id",),
    ts_col: str = "ts",
    gap: str = "30 minutes",
    lateness: str = "2 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Streaming-native sessionization: ``withWatermark`` +
    ``session_window`` — sessions merge across micro-batches while
    open, emit (append mode) once the watermark passes ``session_end``,
    and state is evicted with them. Same output shape as
    :func:`sessionize`; same state-bound argument as
    :func:`…streaming.windows.windowed_rollup` with "active windows" =
    open sessions."""
    if aggs is None:
        aggs = {"n_events": F.count(F.lit(1))}
    out = (
        stream.withWatermark(ts_col, lateness)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap))
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return out.select(
        *key_cols,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *aggs.keys(),
    )
