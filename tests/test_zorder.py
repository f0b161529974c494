"""Z-order (Morton) clustered compaction: multi-dimensional file
pruning — the Delta OPTIMIZE ZORDER / Iceberg multi-column sort-order
analog over this table format's per-file min/max stats."""

import datetime as dt

from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
from digital_analytics_data_platform_spark.lake.merge import compact
from digital_analytics_data_platform_spark.lake.zorder import zorder_key
from tests.conftest import TRANSCRIPT_SCHEMA, cdc_rows


def test_zorder_key_is_monotone_per_dimension(spark):
    """Fixing one dimension, the interleaved key must be monotone in
    the other — the property that makes min/max stats prune boxes."""
    df = spark.range(0, 64).select(
        (F.col("id") % 8).cast("int").alias("a"), (F.col("id") / 8).cast("int").alias("b")
    )
    out = df.withColumn("z", zorder_key(df, ["a", "b"], bits_per_dim=3)).collect()
    z = {(r.a, r.b): r.z for r in out}
    for fixed in range(8):
        row_z = [z[(a, fixed)] for a in range(8)]
        col_z = [z[(fixed, b)] for b in range(8)]
        assert row_z == sorted(row_z)
        assert col_z == sorted(col_z)
    # interleave, not concatenate: the max key uses both dims' high bits
    assert z[(7, 7)] == 2**6 - 1
    # classic Morton spot checks (3-bit dims, a = dim 0 → even bit lanes)
    assert z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(3, 5)] == 0b100111


def _state_hash(spark, tbl):
    from digital_analytics_data_platform_spark.lake.table import DELETED_COL

    return (
        tbl.read(spark, include_deleted=True)
        .agg(
            F.expr(f"bit_xor(xxhash64(conv_id, turn_idx, text, cast({DELETED_COL} as string)))").alias("h"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )


def _files_scanned(spark, tbl, lo, hi, turn_hi):
    pruned = tbl.read(
        spark, stats_range={"ts": (lo.isoformat(), hi.isoformat()), "turn_idx": (0, turn_hi)}
    )
    got = pruned.filter(
        (F.col("ts") >= lo) & (F.col("ts") <= hi) & (F.col("turn_idx") <= turn_hi)
    )
    n = got.count()
    return len(pruned.inputFiles()), n


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """After z-order compaction on (ts, turn_idx), a 2-D box read must
    (a) return exactly the same rows, (b) scan fewer files than the
    lexicographic (ts, turn_idx) clustering does for a predicate on the
    TRAILING dimension — the case lexicographic layout cannot prune."""
    base = dt.datetime(2026, 1, 1)
    rows = [
        (
            "U",
            f"c{i % 97}",
            i % 40,  # turn_idx spans 0..39
            "user",
            f"t{i}",
            None,
            (i * 7919) % 86400,  # ts spread over one day, decorrelated from turn
            i,
        )
        for i in range(4000)
    ]

    def build(name, mode):
        tbl = LakeTable.create(
            str(tmp_path / name), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=2
        )
        merge_changes(spark, tbl, cdc_rows(spark, rows), batch_key="b", strategy="mor")
        compact(
            spark, tbl, all_buckets=True, write_salt=8,
            cluster_by=["ts", "turn_idx"], cluster_mode=mode,
        )
        return tbl

    z = build("ztbl", "zorder")
    lex = build("lextbl", "range")
    assert _state_hash(spark, z) == _state_hash(spark, lex)

    epoch = dt.datetime(2026, 1, 1)  # cdc_rows bases at 1767225600 = 2026-01-01T00:00Z
    lo = epoch + dt.timedelta(seconds=30000)
    hi = epoch + dt.timedelta(seconds=40000)

    # trailing-dimension-only selectivity: turn_idx <= 3 over the FULL
    # ts range — lexicographic files all span turn_idx, z-order files
    # don't
    full_lo, full_hi = epoch, epoch + dt.timedelta(days=2)
    z_files, z_rows = _files_scanned(spark, z, full_lo, full_hi, 3)
    lex_files, lex_rows = _files_scanned(spark, lex, full_lo, full_hi, 3)
    assert z_rows == lex_rows > 0
    assert z_files < lex_files, (z_files, lex_files)

    # 2-D box: equal answers, and z-order must prune vs scanning all
    z_files, z_rows = _files_scanned(spark, z, lo, hi, 3)
    lex_files, lex_rows = _files_scanned(spark, lex, lo, hi, 3)
    assert z_rows == lex_rows > 0
    assert z_files < len(z.snapshot().files)


def test_zorder_rejects_unsupported(spark, tmp_path):
    import pytest

    df = spark.range(4).select(F.col("id"), F.col("id").cast("string").alias("s"))
    with pytest.raises(ValueError, match="z-order"):
        zorder_key(df, ["id"])
    with pytest.raises(ValueError, match="string"):
        zorder_key(df, ["id", "s"])
