"""Scalar column helpers (SURVEY §2.2): the reference's defensive
projection discipline re-expressed as composable column functions.
All JVM-side / codegen'd — no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_if_blank(c: Column | str) -> Column:
    """``NULLIF(TRIM(x), '')`` — blank-to-null normalization on every
    string dim (``…01_merge_sdi_bronze_sa360_campaign_daily.sql:40-46``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.nullif(F.trim(c), F.lit(""))


def safe_cast(c: Column | str, dtype: str) -> Column:
    """``SAFE_CAST`` → ``try_cast``: null on failure, never error
    (port note "SAFE_CAST -> TRY_CAST",
    ``…02_sdi_sp_dashboardPulseTms_bronze_adobeFunnel_weekly.sql:19``)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.try_cast(dtype)


def safe_date(c: Column | str, fmt: str = "yyyyMMdd") -> Column:
    """``SAFE.PARSE_DATE('%Y%m%d', s)`` → ``to_date`` (null on fail);
    pair with a not-null filter to drop partition garbage
    (``…campaign_daily.sql:12,37,130-132``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def safe_divide(a: Column | str, b: Column | str) -> Column:
    """``SAFE_DIVIDE`` → ``try_divide`` (null on /0)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.try_divide(a, b)


def null_key_sentinel(c: Column | str, sentinel: str = "__NULL__") -> Column:
    """NULL-safe grouping key (``COALESCE(k,'__NULL__')`` inside dedupe
    partitions, ``sql/07_…/01_…:66``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c, F.lit(sentinel))


def key_hash(cols: Sequence[str], *, bits: int = 256) -> Column:
    """Content hash of a composite key — the manifest/idempotency-ledger
    key (sha256 manifest, ``01_Notebook_v8.ipynb:215``)."""
    return F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]), bits)


def defensive_project(
    df: DataFrame,
    string_cols: Sequence[str] = (),
    double_cols: Sequence[str] = (),
    long_cols: Sequence[str] = (),
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """The reference's full Bronze projection: try-cast every column,
    blank→null every dim, standardize names
    (``…01_merge_sdi_bronze_sa360_campaign_daily.sql:34-123``)."""
    out = df
    for c in string_cols:
        out = out.withColumn(c, null_if_blank(safe_cast(c, "string")))
    for c in double_cols:
        out = out.withColumn(c, safe_cast(c, "double"))
    for c in long_cols:
        out = out.withColumn(c, safe_cast(c, "bigint"))
    if renames:
        out = out.withColumnsRenamed(renames)
    return out


def sorted_distinct_agg(c: Column | str, sep: str = ", ") -> Column:
    """``STRING_AGG(DISTINCT x ORDER BY x)`` spelled the Spark-safe way:
    ``array_join(sort_array(collect_set(x)))``. The reference documents
    a real Spark ``RewriteDistinctAggregates`` ClassCastException with
    two DISTINCT listaggs and this exact workaround
    (``…v1 (Databricks)/01_BRONZE/02_…:22-32``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.array_join(F.sort_array(F.collect_set(c)), sep)


def latest_non_null(value: Column | str, order: Sequence[Column | str]) -> Column:
    """``ARRAY_AGG(x IGNORE NULLS ORDER BY … DESC LIMIT 1)[OFFSET(0)]``
    (A6): latest non-null value per group via max_by over null-guarded
    order (null values get a minimal order so any non-null wins)."""
    v = F.col(value) if isinstance(value, str) else value
    ords = [F.col(o) if isinstance(o, str) else o for o in order]
    guard = F.when(v.isNull(), F.lit(0)).otherwise(F.lit(1))
    return F.max_by(v, F.struct(guard, *ords))
