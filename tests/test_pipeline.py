"""Medallion orchestration: Bronze→Silver→Gold per batch, incremental
recompute scoped to touched conversations, delete propagation, QA."""

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.plans import MedallionPipeline
from tests.conftest import TRANSCRIPT_SCHEMA, cdc_rows


def _pipe(tmp_path, **kw):
    p = MedallionPipeline(str(tmp_path / "medallion"), n_buckets=8, run_qa=False, **kw)
    p.create_tables(TRANSCRIPT_SCHEMA)
    return p


def test_medallion_end_to_end(spark, tmp_path):
    p = _pipe(tmp_path)
    n = 3_000
    log = datagen.change_log(spark, n, n_convs=30, turns_per_conv=10)
    for i in range(2):
        lo, hi = i * n // 2, (i + 1) * n // 2
        r = p.apply_batch(spark, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)), i)
        assert r.silver is not None and r.gold_daily is not None
    bronze = p.read(spark, "bronze")
    silver = p.read(spark, "silver")
    daily = p.read(spark, "gold_daily")
    weekly = p.read(spark, "gold_weekly")
    # silver rows == bronze rows (enrichment never drops/duplicates)
    assert silver.count() == bronze.count()
    # weekly == sum(daily) == silver count — layer reconciliation
    d = daily.agg(F.sum("n_turns")).collect()[0][0]
    w = weekly.agg(F.sum("n_turns")).collect()[0][0]
    assert d == w == silver.count()


def test_medallion_replay_batch_is_noop(spark, tmp_path):
    p = _pipe(tmp_path)
    b = cdc_rows(spark, [("I", "c1", 0, "user", "hello", None, 10, 1)])
    p.apply_batch(spark, b, "x")
    v_before = {layer: p.read(spark, layer).count() for layer in ("bronze", "silver", "gold_daily")}
    r = p.apply_batch(spark, b, "x")  # same batch id → ledger no-op at every layer
    assert r.bronze.skipped
    for layer, n in v_before.items():
        assert p.read(spark, layer).count() == n


def test_medallion_delete_cascades_to_gold(spark, tmp_path):
    p = _pipe(tmp_path)
    p.apply_batch(
        spark,
        cdc_rows(
            spark,
            [
                ("I", "c1", 0, "user", "hello", None, 10, 1),
                ("I", "c1", 1, "assistant", "hi", None, 20, 2),
                ("I", "c2", 0, "user", "other", None, 30, 3),
            ],
        ),
        0,
    )
    assert p.read(spark, "gold_daily").filter("conv_id = 'c1'").count() == 1
    # delete every c1 turn → silver rows gone, gold row tombstoned
    p.apply_batch(
        spark,
        cdc_rows(
            spark,
            [
                ("D", "c1", 0, None, None, None, 40, 4),
                ("D", "c1", 1, None, None, None, 50, 5),
            ],
        ),
        1,
    )
    assert p.read(spark, "silver").filter("conv_id = 'c1'").count() == 0
    assert p.read(spark, "gold_daily").filter("conv_id = 'c1'").count() == 0
    assert p.read(spark, "gold_weekly").filter("conv_id = 'c1'").count() == 0
    # untouched conversation survives
    assert p.read(spark, "gold_daily").filter("conv_id = 'c2'").count() == 1


def test_medallion_update_reaggregates_gold(spark, tmp_path):
    p = _pipe(tmp_path)
    p.apply_batch(
        spark,
        cdc_rows(spark, [("I", "c1", 0, "user", "one two three", None, 10, 1)]),
        0,
    )
    t1 = p.read(spark, "gold_daily").collect()[0]["total_tokens"]
    p.apply_batch(
        spark,
        cdc_rows(spark, [("U", "c1", 0, "user", "one two three four five", None, 20, 2)]),
        1,
    )
    rows = p.read(spark, "gold_daily").collect()
    assert len(rows) == 1 and rows[0]["total_tokens"] == t1 + 2
