"""Structured Streaming apply: availableNow replay over log segments,
checkpoint resume, exactly-once across restarts, batch metrics."""

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.streaming import (
    apply_stream,
    cdc_file_stream,
    write_log_segments,
)
from digital_analytics_data_platform_spark.streaming.runner import read_batch_metrics
from tests.conftest import assert_state_equal, oracle_state


def test_streaming_replay_and_resume(spark, make_table, tmp_path):
    n = 6_000
    full_log = datagen.change_log(spark, n * 2, n_convs=80, turns_per_conv=10)
    first, second = full_log.filter(F.col("lsn") < n), full_log.filter(F.col("lsn") >= n)
    log_dir = str(tmp_path / "cdclog")
    segs = write_log_segments(first, log_dir, n_segments=6)
    assert len(segs) == 6

    tbl = make_table()
    ckpt = str(tmp_path / "ckpt")

    # phase 1: consume everything available, one segment per micro-batch
    src = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    _, m1 = apply_stream(spark, src, tbl.path, ckpt, pipeline_id="bronze")
    assert m1.batches >= 6
    assert m1.events == first.count()

    # phase 2: two more segments arrive; SAME checkpoint resumes, old
    # segments are not reprocessed
    extra = write_log_segments(second, log_dir, n_segments=2)
    assert len(extra) == 2
    src2 = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    _, m2 = apply_stream(spark, src2, tbl.path, ckpt, pipeline_id="bronze")
    assert m2.events == second.count()  # only the new segments
    assert m1.events + m2.events == n * 2  # full log consumed exactly once

    got = tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    assert_state_equal(got, oracle_state(full_log.toPandas()))

    # phase 3: restart once more with nothing new → zero batches applied
    src3 = cdc_file_stream(spark, log_dir)
    _, m3 = apply_stream(spark, src3, tbl.path, ckpt, pipeline_id="bronze")
    assert m3.events == 0

    metrics = read_batch_metrics(tbl.path, "bronze")
    assert len(metrics) == m1.batches + m2.batches + m3.batches
    assert sum(m["events_in"] for m in metrics) == n * 2
    assert all("affected_buckets" in m for m in metrics)


def test_streaming_crash_replay_is_noop(spark, make_table, tmp_path):
    """Simulate crash-after-table-commit-before-checkpoint: reapplying
    the same batchId through the ledger leaves state unchanged."""
    from digital_analytics_data_platform_spark.lake import merge_changes

    n = 2_000
    log = datagen.change_log(spark, n, n_convs=30, turns_per_conv=8)
    tbl = make_table()
    r1 = merge_changes(spark, tbl, log, batch_key="bronze:0")
    assert not r1.skipped
    v_before = tbl.snapshot().version
    r2 = merge_changes(spark, tbl, log, batch_key="bronze:0")  # replayed batchId
    assert r2.skipped and tbl.snapshot().version == v_before


def test_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState keyed state accumulates across
    micro-batches (custom stateful streaming operator)."""
    from digital_analytics_data_platform_spark.streaming.stateful import (
        conversation_progress,
    )

    log = datagen.change_log(spark, 2_000, n_convs=20, turns_per_conv=10, garbage_frac=0.0)
    log_dir = str(tmp_path / "log")
    write_log_segments(log, log_dir, n_segments=4)
    stream = cdc_file_stream(spark, log_dir, max_files_per_trigger=1)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql(
        "SELECT conv_id, max(n_events) AS n FROM conv_progress GROUP BY conv_id"
    ).toPandas()
    exp = log.groupBy("conv_id").count().toPandas()
    exp = exp[exp["conv_id"].notna()]
    merged = out.merge(exp, on="conv_id")
    assert len(merged) == len(exp)
    # state accumulated across the 4 single-file micro-batches
    assert (merged["n"] == merged["count"]).all()
