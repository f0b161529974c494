"""QA suite: queryable PASS/FAIL test-results rows, the reference's
first-class QA product re-expressed (SURVEY.md §5).

Mechanisms ported:
1. critical invariants — duplicate grain, null/blank keys, freshness,
   non-negative metrics (``sql/02_SDI_SA360/01_BRONZE/tests/01_sp_bronze_
   campaign_daily_critical.sql:20-214``);
2. cross-layer reconciliation at tolerance 1e-6 — weekly == SUM(daily),
   silver rows == bronze rows (``…tests/02_…reconciliation.sql:12-13``,
   ``…03_GOLD/tests/04_…weekly_reconciliation.sql``);
3. anomaly detection — latest period vs ≥8-period baseline, FAIL
   outside [avg/5, avg×5] (``…tests/05_sp_bronze_weekly_deep_validation.sql``).

Each check emits one row: (test_layer, test_name, severity,
expected_value, actual_value, variance_value, status,
is_critical_failure) — the ``*_test_results`` schema
(``…tests/00_create_sdi_bronze_sa360_test_results.sql:18-45``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOLERANCE = 1e-6


def _row(layer: str, name: str, severity: str, expected: float, actual: float, passed: bool) -> dict:
    return {
        "test_layer": layer,
        "test_name": name,
        "severity": severity,
        "expected_value": float(expected),
        "actual_value": float(actual),
        "variance_value": float(actual - expected),
        "status": "PASS" if passed else "FAIL",
        "is_critical_failure": (not passed) and severity == "HIGH",
    }


def check_no_duplicate_grain(df: DataFrame, keys: list[str], layer: str) -> dict:
    dups = df.groupBy(*keys).count().filter("count > 1").count()
    return _row(layer, "duplicate_grain", "HIGH", 0, dups, dups == 0)


def check_no_null_keys(df: DataFrame, keys: list[str], layer: str) -> dict:
    cond = F.lit(False)
    for k in keys:
        cond = cond | F.col(k).isNull()
    nulls = df.filter(cond).count()
    return _row(layer, "null_or_blank_keys", "HIGH", 0, nulls, nulls == 0)


def check_no_future_ts(df: DataFrame, ts_col: str, max_ts, layer: str) -> dict:
    n = df.filter(F.col(ts_col) > F.lit(max_ts)).count()
    return _row(layer, "future_timestamps", "MEDIUM", 0, n, n == 0)


def check_non_negative(df: DataFrame, metric_cols: list[str], layer: str) -> dict:
    cond = F.lit(False)
    for m in metric_cols:
        cond = cond | (F.col(m) < 0)
    n = df.filter(cond).count()
    return _row(layer, "non_negative_metrics", "MEDIUM", 0, n, n == 0)


def check_rollup_reconciles(
    daily: DataFrame, weekly: DataFrame, metric: str, week_col: str = "qgp_week"
) -> dict:
    """Gold weekly == SUM(gold daily) per metric, tolerance 1e-6."""
    from ..operators.calendar import qgp_week

    d = daily.withColumn(week_col, qgp_week(F.col("day"))).agg(F.sum(metric)).collect()[0][0] or 0
    w = weekly.agg(F.sum(metric)).collect()[0][0] or 0
    return _row("gold", f"weekly_eq_sum_daily_{metric}", "HIGH", d, w, abs(d - w) <= TOLERANCE)


def check_layer_rowcount(upstream: DataFrame, downstream: DataFrame, name: str, layer: str) -> dict:
    a, b = upstream.count(), downstream.count()
    return _row(layer, name, "HIGH", a, b, a == b)


def check_anomaly_vs_baseline(
    series: DataFrame, period_col: str, value_col: str, *, min_history: int = 8, factor: float = 5.0
) -> dict:
    rows = series.orderBy(F.col(period_col).desc()).limit(min_history * 4).collect()
    if len(rows) < min_history + 1:
        return _row("bronze", f"anomaly_{value_col}", "LOW", 0, 0, True)  # SKIP ≈ PASS(LOW)
    latest = rows[0][value_col]
    baseline = sum(r[value_col] for r in rows[1:]) / (len(rows) - 1)
    ok = baseline / factor <= latest <= baseline * factor
    return _row("bronze", f"anomaly_{value_col}", "MEDIUM", baseline, latest, ok)


def run_quality_checks(
    bronze: DataFrame,
    silver: DataFrame,
    gold_daily: DataFrame,
    gold_weekly: DataFrame,
    *,
    max_ts: Any = None,
    out_dir: str | None = None,
) -> list[dict]:
    keys = ["conv_id", "turn_idx"]
    results = [
        check_no_duplicate_grain(bronze, keys, "bronze"),
        check_no_null_keys(bronze, keys, "bronze"),
        check_no_duplicate_grain(silver, keys, "silver"),
        check_layer_rowcount(bronze, silver, "silver_rows_eq_bronze", "silver"),
        check_no_duplicate_grain(gold_daily, ["day", "conv_id"], "gold"),
        check_non_negative(gold_daily, ["n_turns", "total_tokens"], "gold"),
        check_rollup_reconciles(gold_daily, gold_weekly, "n_turns"),
        check_rollup_reconciles(gold_daily, gold_weekly, "total_tokens"),
    ]
    if max_ts is not None:
        results.append(check_no_future_ts(bronze, "ts", max_ts, "bronze"))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"qa_{int(time.time()*1000)}.json"), "w") as f:
            json.dump(results, f, indent=1)
    return results
