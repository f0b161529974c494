"""Fiscal (QGP-style) calendar logic — the reference's one custom
function plus its calendar dimension (SURVEY §2.7).

``fn_qgp_week(event_date)``: week-ending next Saturday, capped at the
quarter end ("partial week") — ``sql/01_common/00_fn_qgp_week.sql:6-33``.
The richer dimension classifies NORMAL / BOUNDARY_STUB / BOUNDARY_FIRST
weeks and builds WoW / prior-year pointers
(``sql/20_SDI_MFC_BQ/01_BRONZE/00_sdi_vw_mfc_dim_qgp_calendar.sql``).

Everything is pure column expressions — no Python UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def quarter_end(d: Column) -> Column:
    """LAST_DAY(d, QUARTER) — port rule from the reference's own
    Databricks translation (``…04_sp_sdi_pulseTms_silver_upvForecast_
    weekly.sql:73-74``)."""
    return F.date_sub(F.add_months(F.trunc(d, "quarter"), 3), 1)


def week_end_saturday(d: Column) -> Column:
    """Next Saturday at-or-after d (Saturday maps to itself)."""
    # dayofweek: 1=Sunday … 7=Saturday → days until Saturday = (7 - dow) % 7
    return F.date_add(d, (F.lit(7) - F.dayofweek(d)) % 7)


def qgp_week(d: Column) -> Column:
    """week-ending Saturday, capped at quarter end (partial weeks)."""
    sat, qe = week_end_saturday(d), quarter_end(d)
    return F.when(qe < sat, qe).otherwise(sat)


def qgp_calendar(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension at QGP-week grain: week-type classification,
    days-in-period, WoW pointer and prior-year ISO-week mapping
    (``sql/20_SDI_MFC_BQ/01_BRONZE/00_sdi_vw_mfc_dim_qgp_calendar.sql``).

    Pointer semantics match the reference exactly:

    - ``prior_week`` (``wow_prior_qgp_date``, ref :83-88): NULL for
      BOUNDARY_STUB, lag-2 for BOUNDARY_FIRST (skip the stub), lag-1
      otherwise.
    - ``prior_year_qgp_week`` (ref :90-107): self-join on
      ``(iso_week, iso_year − 1, week_type)`` restricted to
      NORMAL / BOUNDARY_FIRST rows; stubs get NULL.

    Bounded dimension (≈52 rows/year) — the global-order window and the
    tiny self-join are fine at any data scale; this table is always the
    broadcast side of fact joins."""
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS d"
    )
    cal = days.select(
        F.col("d"),
        qgp_week(F.col("d")).alias("qgp_week"),
        quarter_end(F.col("d")).alias("quarter_end"),
        F.quarter("d").alias("quarter"),
    )
    weeks = (
        cal.groupBy("qgp_week", "quarter_end", "quarter")
        .agg(
            F.count(F.lit(1)).alias("days_in_period"),
            F.min("d").alias("period_start"),
            F.max("d").alias("period_end"),
        )
        .withColumn(
            "week_type",
            F.when(F.col("days_in_period") == 7, F.lit("NORMAL"))
            .when(F.col("qgp_week") == F.col("quarter_end"), F.lit("BOUNDARY_STUB"))
            .otherwise(F.lit("BOUNDARY_FIRST")),
        )
        .withColumn("iso_year", F.expr("extract(YEAROFWEEK FROM qgp_week)"))
        .withColumn("iso_week", F.weekofyear("qgp_week"))
    )
    w = Window.orderBy("qgp_week")
    weeks = weeks.withColumn(
        "prior_week",
        F.when(F.col("week_type") == "BOUNDARY_STUB", F.lit(None).cast("date"))
        .when(F.col("week_type") == "BOUNDARY_FIRST", F.lag("qgp_week", 2).over(w))
        .otherwise(F.lag("qgp_week", 1).over(w)),
    )
    lookup = weeks.filter(F.col("week_type") != "BOUNDARY_STUB").select(
        F.col("qgp_week").alias("prior_year_qgp_week"),
        F.col("iso_week"),
        (F.col("iso_year") + 1).alias("iso_year"),
        F.col("week_type"),
    )
    return weeks.join(lookup, ["iso_week", "iso_year", "week_type"], "left")
