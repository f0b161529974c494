"""As-of join — the reference's only non-equi join (SURVEY §2.3 J2):
enrich each fact row with the latest dimension snapshot at-or-before
its time (``sql/02_SDI_SA360/02_SILVER/MERGE/01_merge_sdi_silver_sa360_
campaign_daily.sql:42-62``: ``LEFT JOIN e ON keys AND e.date <= d.date
QUALIFY ROW_NUMBER() … = 1``).

The warehouse spelling is a range join + rank — quadratic blowup per
key. The Spark-first implementation here is the **union-sort** as-of:
tag both sides, union, and carry the latest right payload forward with
``last(ignorenulls=True)`` over a per-key time-ordered window. One
shuffle + sort, linear in rows, no range-join explosion — this is the
plan you want at 100 TB (same trick Flink/kdb use for as-of).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedupe import dedupe_lww


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    *,
    right_order: Sequence[str] | None = None,
    payload: Sequence[str] | None = None,
    prefix: str = "",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` per key (inclusive, like the
    reference's ``e.date <= d.date``). ``right_order`` dedupes multiple
    right snapshots at the same instant (LWW). ``payload`` selects the
    right columns to carry (default: all non-key, non-time)."""
    keys = list(keys)
    payload = list(payload or [c for c in right.columns if c not in (*keys, right_time)])

    r = right
    if right_order:
        r = dedupe_lww(r, [*keys, right_time], list(right_order))

    r_tagged = r.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_rp"),
    )
    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_rp"].dataType).alias("_rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    r_tagged = r_tagged.withColumn("_lp", F.lit(None).cast(l_tagged.schema["_lp"].dataType))

    unioned = r_tagged.unionByName(l_tagged)
    # right rows sort before left rows at equal time → inclusive <=
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_rp", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lp.*"),
        *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in payload],
    )
    return out
