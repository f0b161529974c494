"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the engine's core LWW-dedupe +
rollup) on /root/testdata/sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2
plus the training-data operators; see
``digital_analytics_data_platform_spark/queries.py``. Exactly 50
entries (the driver's CORRECTNESS gate caps at 50 rows), EVERY one
oracle-bearing. Engine-hash twins of the portable oracle-checked
operators and rows-only plumbing live in ``queries.PYTEST_ONLY``
(exercised by tests/ and bench.py instead of burning a driver row).
``oracle_sql()`` — DuckDB-equivalent SQL per query, complete over
``queries()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from digital_analytics_data_platform_spark.queries import ORACLES, REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last-writer-wins dedupe of the change-feed-shaped
    `events` table (the CDC apply's core operator), rolled up per
    surviving event_type."""
    from pyspark.sql import functions as F

    from digital_analytics_data_platform_spark.operators.dedupe import dedupe_lww

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    latest = dedupe_lww(
        ev.select("user_id", "event_type", "ts", "event_id", "value"),
        ["user_id", "event_type"],
        ["ts", "event_id"],
    )
    return (
        latest.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max("ts").alias("latest_ts"),
        )
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
