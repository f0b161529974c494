"""Reshaping operators (SURVEY §2.6): wide↔long, union spines,
date-spine generation, proration explode.

The reference's Gold layer ships four shapes of every mart —
daily/weekly × wide/long — produced by UNPIVOT (``…01_sp_merge_sdi_
gold_sa360_campaign_daily_long.sql:48-66``), conditional-agg pivot
(``sql/18_SDI_PULSE_BYOD/02_SILVER/03_…sa360_weekly.sql:106-132``),
UNION-DISTINCT key spines (``sql/12_SDI_TOTALSEARCH/03_GOLD/01_…
unified_daily.sql:39-77``) and date-array explodes
(``sql/01_common/01_vw_qgp_calendar.sql:10-13``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    *,
    var_name: str = "metric_name",
    value_name: str = "metric_value",
    exclude_nulls: bool = True,
) -> DataFrame:
    """Wide → long. ``EXCLUDE NULLS`` matches the reference's row-
    explosion guard (``…daily_long.sql:7-9,48``)."""
    out = df.unpivot(list(ids), list(values), var_name, value_name)
    if exclude_nulls:
        out = out.filter(F.col(value_name).isNotNull())
    return out


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    value_col: str,
    *,
    pivot_values: Sequence[str] | None = None,
    agg: str = "max",
) -> DataFrame:
    """Long → wide via grouped pivot (the conditional-agg manual pivot,
    A2). Passing ``pivot_values`` avoids the extra distinct-scan job —
    always do so at scale."""
    g = df.groupBy(*keys).pivot(pivot_col, list(pivot_values) if pivot_values else None)
    return getattr(g, "agg")(getattr(F, agg)(value_col).alias(value_col))


def union_by_name(frames: Sequence[DataFrame], *, allow_missing: bool = True) -> DataFrame:
    """UNION ALL of heterogeneous marts (T3/T4)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), frames)


def key_spine(frames: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """UNION DISTINCT of key tuples across sources (T5/J4) — the
    join-driven-duplication guard: left-join each pre-aggregated source
    to this spine instead of chaining FULL OUTER joins."""
    return union_by_name([f.select(*keys) for f in frames]).distinct()


def spine_join(
    frames: dict[str, DataFrame], keys: Sequence[str], *, pre_aggregate: bool = True
) -> DataFrame:
    """Key-spine + defensive left joins (J4): each source is
    re-aggregated to key grain first ("prevents join-driven row
    duplication", ``sql/12_…/03_GOLD/01_…unified_daily.sql:29-31``)."""
    keys = list(keys)
    spine = key_spine(list(frames.values()), keys)
    out = spine
    for _name, f in frames.items():
        side = f
        if pre_aggregate:
            metrics = [c for c in f.columns if c not in keys]
            side = f.groupBy(*keys).agg(*[F.max(c).alias(c) for c in metrics])
        out = out.join(side, keys, "left")
    return out


def date_spine(spark, start: str, end: str, *, col_name: str = "d") -> DataFrame:
    """GENERATE_DATE_ARRAY + UNNEST analog (T10)."""
    return spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS {col_name}"
    )


def date_spine_from_bounds(
    bounds: DataFrame, lo_col: str = "lo", hi_col: str = "hi", *, col_name: str = "d"
) -> DataFrame:
    """T10 variant with PLAN-SIDE bounds: ``bounds`` is a 1-row frame
    (e.g. ``df.agg(min(..), max(..))``) and the spine explodes from it —
    no driver ``collect()``, so spine + fact join stay ONE Spark plan."""
    return bounds.select(
        F.explode(F.sequence(F.col(lo_col), F.col(hi_col), F.expr("interval 1 day"))).alias(col_name)
    )


def explode_date_range(
    df: DataFrame, start_col: str, end_col: str, *, out_col: str = "d"
) -> DataFrame:
    """CROSS JOIN UNNEST(GENERATE_DATE_ARRAY(start,end)) per row (J6) —
    e.g. weekly rows exploded to days for proration (A12)."""
    return df.withColumn(
        out_col,
        F.explode(F.sequence(F.col(start_col), F.col(end_col), F.expr("interval 1 day"))),
    )
