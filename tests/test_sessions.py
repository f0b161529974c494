"""Timeout-gap sessionization (operators/sessions.py): batch
session_window rollup, gaps-and-islands row labeling, and the
streaming variant — all three agreeing on the same boundary rule
(merge iff gap < timeout; session_end = last_ts + gap).

Reference analog: the clickstream entry-pages pipeline consumes
upstream-sessionized rows (sql/08_SDI_CLICKSTREAM/01_BRONZE/MERGE/
01_sp_merge_…entryPagesSession_daily.sql:131-136); these operators ARE
that upstream, Spark-native.
"""

import datetime as dt

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.operators.sessions import (
    sessionize,
    sessionize_ids,
    streaming_session_rollup,
)

BASE = dt.datetime(2026, 1, 1, 10, 0, 0)


def _events(spark, rows):
    """rows: (user, off_seconds, value)"""
    data = [(u, BASE + dt.timedelta(seconds=off), float(v)) for u, off, v in rows]
    return spark.createDataFrame(data, "user_id string, ts timestamp_ntz, value double")


def test_sessionize_boundary_rule(spark):
    """Exactly-at-gap MERGES (inclusive); one second over splits;
    session_end is last_ts + gap."""
    df = _events(
        spark,
        [
            ("u", 0, 1),
            ("u", 1800, 1),  # exactly 30:00 after previous → merges
            ("u", 1800 + 1801, 1),  # 30:01 after → NEW session
            ("v", 0, 1),
        ],
    )
    out = {
        (r.user_id, r.session_start): r
        for r in sessionize(df, ["user_id"], gap="30 minutes").collect()
    }
    assert len(out) == 3
    s1 = out[("u", BASE)]
    assert s1.n_events == 2
    assert s1.session_end == BASE + dt.timedelta(seconds=1800 + 1800)
    s2 = out[("u", BASE + dt.timedelta(seconds=3601))]
    assert s2.n_events == 1
    assert out[("v", BASE)].n_events == 1


def test_sessionize_ids_agrees_with_rollup(spark):
    """The row labeler and the session_window rollup must induce the
    same sessions: same count per user, same per-session sizes and
    starts."""
    rows = []
    for u in range(6):
        off = u * 7
        for s in range(u % 3 + 1):  # 1..3 sessions per user
            for e in range(3 + (u + s) % 4):  # 3..6 events per session
                rows.append((f"u{u}", off, 1))
                off += 300 + 37 * e  # intra-session gaps < 30min
            off += 1800 + 60 * s  # inter-session gap ≥ 30min
    df = _events(spark, rows)
    roll = sessionize(df, ["user_id"], gap="30 minutes")
    ids = sessionize_ids(df, ["user_id"], gap_seconds=1800)
    from_ids = ids.groupBy("user_id", "session_seq", "session_start").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    a = {(r.user_id, r.session_start): r.n_events for r in roll.collect()}
    b = {(r.user_id, r.session_start): r.n_events for r in from_ids.collect()}
    assert a == b and len(a) == sum(u % 3 + 1 for u in range(6))


def test_streaming_session_rollup_emits_closed_sessions(spark, tmp_path):
    """Sessions merge ACROSS micro-batches while open, emit once when
    the watermark passes session_end, and late events are dropped from
    the closed session."""
    from digital_analytics_data_platform_spark.streaming.source import (
        cdc_file_stream,
        cdc_schema,
        write_log_segments,
    )

    def ev(lsn, off_s, conv="c1"):
        return ("U", conv, int(lsn), "user", "t", None, BASE + dt.timedelta(seconds=off_s), lsn, 0)

    # batch 1: two events 10s apart (open session); batch 2: one more
    # 20s later (same session — continuation across batches); batch 3:
    # events 2h later advance the watermark far past the session's end;
    # batch 4: a LATE event inside the closed session's span.
    rows = [ev(0, 0), ev(1, 10)]
    rows += [ev(2, 30)]
    rows += [ev(10, 7200), ev(11, 7210)]
    rows += [ev(20, 60)]  # late — session already closed
    df = spark.createDataFrame(rows, cdc_schema())
    log_dir = str(tmp_path / "sesslog")
    segs = write_log_segments(df, log_dir, n_segments=4)
    assert len(segs) == 4

    src = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    out = streaming_session_rollup(
        src, key_cols=("conv_id",), gap="5 minutes", lateness="2 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("session_rollup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("session_rollup_stream").collect()
    closed = [r for r in got if r.session_start == BASE]
    assert len(closed) == 1, got
    # all three on-time events merged across micro-batches; the late
    # event did not reopen or mutate the emitted session
    assert closed[0].n_events == 3
    assert closed[0].session_end == BASE + dt.timedelta(seconds=30 + 300)
    # the 2h-later session never closed (watermark trails max ts)
    assert all(r.session_start == BASE for r in got)


def test_batch_sessionize_matches_streaming_on_closed_sessions(spark, tmp_path):
    """Stream ≡ batch: the streaming rollup's emitted (closed) sessions
    equal the batch sessionize over the same on-time events."""
    from digital_analytics_data_platform_spark.streaming.source import (
        cdc_file_stream,
        cdc_schema,
        write_log_segments,
    )

    rows = []
    lsn = 0
    for conv in ("a", "b"):
        off = 0 if conv == "a" else 45
        for s in range(2):
            for e in range(3):
                rows.append(("U", conv, lsn, "user", "t", None, BASE + dt.timedelta(seconds=off), lsn, 0))
                lsn += 1
                off += 60
            off += 600  # ≥ gap → next session
    # closer: far-future events to push the watermark past everything
    rows += [("U", "z", lsn, "user", "t", None, BASE + dt.timedelta(hours=5), lsn, 0)]
    df = spark.createDataFrame(rows, cdc_schema())
    log_dir = str(tmp_path / "sess2log")
    write_log_segments(df, log_dir, n_segments=3)

    src = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    out = streaming_session_rollup(src, key_cols=("conv_id",), gap="5 minutes", lateness="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("session_stream_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess2ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_rows = {
        (r.conv_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("session_stream_eq").collect()
        if r.conv_id in ("a", "b")
    }
    batch = sessionize(
        df.filter(F.col("conv_id").isin("a", "b")),
        ["conv_id"],
        gap="5 minutes",
        aggs={"n_events": F.count(F.lit(1))},
    )
    batch_rows = {
        (r.conv_id, r.session_start, r.session_end, r.n_events) for r in batch.collect()
    }
    assert stream_rows == batch_rows and len(batch_rows) == 4
