"""Approximate COUNT(DISTINCT) sketch rollup (SketchRollup): HLL
sketches per group, folded incrementally for insert-only windows and
rebuilt per dirty group on retraction — the bounded-memory companion
to the exact DistinctCountRollup."""

import pytest
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import merge_changes
from digital_analytics_data_platform_spark.plans import SketchRollup
from tests.conftest import cdc_rows


def _truth(spark, src):
    return {
        r.role: r.d
        for r in src.read(spark)
        .filter(F.col("conv_id").isNotNull())
        .groupBy("role")
        .agg(F.countDistinct("conv_id").alias("d"))
        .filter(F.col("d") > 0)
        .collect()
    }


def _mart(spark, sk):
    return {r.role: r.approx_distinct_conv_id for r in sk.read(spark).collect()}


@pytest.fixture()
def src_and_sketch(spark, make_table, tmp_path):
    src = make_table("skr_src", n_buckets=4)
    sk = SketchRollup.create(str(tmp_path / "skr_mart"), src, ["role"], "conv_id", n_buckets=4)
    return src, sk


def test_sketch_exact_at_low_cardinality_through_churn(spark, src_and_sketch):
    """In HLL coupon mode (small distinct sets) the estimate is exact,
    so the mart must EQUAL a countDistinct recompute through inserts,
    group moves, and deletes — and insert-only windows must never
    trigger the dirty recompute."""
    src, sk = src_and_sketch

    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("U", f"c{i}", 0, "user" if i % 2 else "asst", "m", None, 1, i) for i in range(12)],
        ),
        batch_key="b1",
        strategy="mor",
    )
    r = sk.sync(spark, src)
    assert r["dirty_groups"] == 0, "insert-only window must fold without source access"
    assert _mart(spark, sk) == _truth(spark, src)

    # group move: c1 user→asst retracts from 'user' (dirty) and inserts
    # into 'asst'
    merge_changes(
        spark,
        src,
        cdc_rows(spark, [("U", "c1", 0, "asst", "m2", None, 2, 100)]),
        batch_key="b2",
        strategy="mor",
    )
    r = sk.sync(spark, src)
    assert r["dirty_groups"] >= 1
    assert _mart(spark, sk) == _truth(spark, src)

    # delete a whole role → its mart row must tombstone
    merge_changes(
        spark,
        src,
        cdc_rows(
            spark,
            [("D", f"c{i}", 0, None, None, None, 3, 200 + i) for i in range(0, 12, 2)],
        ),
        batch_key="b3",
        strategy="mor",
    )
    sk.sync(spark, src)
    assert _mart(spark, sk) == _truth(spark, src)

    # idempotent replay + reload
    assert sk.sync(spark, src)["skipped"] is True
    sk2 = SketchRollup.load(str(sk.table.path), ["role"], "conv_id")
    assert _mart(spark, sk2) == _truth(spark, src)


def test_sketch_accuracy_bound_at_high_cardinality(spark, make_table, tmp_path):
    """At 6k distinct values per group the HLL estimate (lg_k=12,
    rsd≈1.6%) must land within 5% (≈3σ) of the true count. The
    incrementally-unioned fold estimates with the composite estimator
    (union drops the one-pass HIP accumulator), so it need not EQUAL a
    one-shot sketch — but both must sit inside the bound, close to each
    other (documented honesty note in SketchRollup)."""
    src = make_table("skr_big", n_buckets=4)
    sk = SketchRollup.create(str(tmp_path / "skr_big_mart"), src, ["role"], "conv_id", n_buckets=4)
    for w in range(3):
        rows = [
            ("U", f"c{w * 2000 + i}", 0, "user", "m", None, 1, w * 10000 + i)
            for i in range(2000)
        ]
        merge_changes(spark, src, cdc_rows(spark, rows), batch_key=f"b{w}", strategy="mor")
        r = sk.sync(spark, src)
        assert r["dirty_groups"] == 0
    est = _mart(spark, sk)["user"]
    assert abs(est - 6000) / 6000 < 0.05, est
    oneshot = (
        src.read(spark)
        .groupBy("role")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("conv_id", F.lit(12))).cast("long").alias("d"))
        .collect()[0]["d"]
    )
    assert abs(oneshot - 6000) / 6000 < 0.05, oneshot
    assert abs(est - oneshot) / 6000 < 0.02, (est, oneshot)


def test_sketch_replay_convergence_any_batching(spark, make_table, tmp_path):
    """The same logical log applied in different window splits must
    converge to identical estimates (union is associative/commutative;
    dirty rebuilds read a snapshot, not a path)."""
    rows = [
        ("U", f"c{i % 7}", i % 3, "user" if i % 2 else "asst", "m", None, (i * 13) % 5, i)
        for i in range(30)
    ] + [("D", f"c{i}", 0, None, None, None, 6, 100 + i) for i in range(3)]

    results = []
    for splits, name in ((1, "one"), (3, "three")):
        src = make_table(f"skr_rc_src_{name}", n_buckets=4)
        sk = SketchRollup.create(
            str(tmp_path / f"skr_rc_mart_{name}"), src, ["role"], "conv_id", n_buckets=4
        )
        per = (len(rows) + splits - 1) // splits
        for w in range(splits):
            chunk = rows[w * per : (w + 1) * per]
            if chunk:
                merge_changes(spark, src, cdc_rows(spark, chunk), batch_key=f"w{w}", strategy="mor")
                sk.sync(spark, src)
        results.append(_mart(spark, sk))
    assert results[0] == results[1]
    assert results[0] == _truth(spark, LastSrc(tmp_path))  # noqa: F821  (defined below)


class LastSrc:
    """Tiny adapter: _truth(src) over the last-created source table."""

    def __init__(self, tmp_path):
        from digital_analytics_data_platform_spark.lake import LakeTable

        self._t = LakeTable.load(str(tmp_path / "skr_rc_src_three"))

    def read(self, spark):
        return self._t.read(spark)
