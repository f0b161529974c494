"""Validated CSV upload source — the reference's interactive-ingest
path (S8): pandas read → column-map/rename → date+numeric coercion →
domain validation → ``spark.createDataFrame`` → MERGE-ready staging
(``sql/19_SDI_PULSE_TMS_v1 (Databricks)/01_BRONZE/06_…upvForecast_weekly.py:66-361``).

Validation failures raise before anything touches a table (the
reference's pre-MERGE duplicate-key guard + ASSERT discipline, same
file ``:295-308`` and ``…Backfill Reconcile/01_…:39-52``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class UploadValidationError(ValueError):
    pass


def load_validated_csv(
    spark: SparkSession,
    path: str,
    *,
    column_map: dict[str, str] | None = None,
    date_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    key_cols: Sequence[str] = (),
    required_cols: Sequence[str] = (),
    week_ending_saturday_col: str | None = None,
) -> DataFrame:
    """Read + validate a small operator-uploaded CSV and return a
    MERGE-ready DataFrame (Arrow path via createDataFrame)."""
    pdf = pd.read_csv(path)
    if column_map:
        pdf = pdf.rename(columns=column_map)
    missing = [c for c in required_cols if c not in pdf.columns]
    if missing:
        raise UploadValidationError(f"missing required columns: {missing}")
    for c in date_cols:
        pdf[c] = pd.to_datetime(pdf[c], errors="coerce")
        if pdf[c].isna().any():
            raise UploadValidationError(f"unparseable dates in column {c!r}")
    for c in numeric_cols:
        pdf[c] = pd.to_numeric(pdf[c], errors="coerce")
        if pdf[c].isna().any():
            raise UploadValidationError(f"non-numeric values in column {c!r}")
    if key_cols:
        dups = pdf.duplicated(subset=list(key_cols))
        if dups.any():
            raise UploadValidationError(
                f"{int(dups.sum())} duplicate key rows on {list(key_cols)} (pre-MERGE guard)"
            )
    if week_ending_saturday_col:
        dows = pdf[week_ending_saturday_col].dt.dayofweek  # Mon=0 … Sat=5
        if (dows != 5).any():
            raise UploadValidationError(
                f"{week_ending_saturday_col} values must be week-ending Saturdays"
            )
    return spark.createDataFrame(pdf)
