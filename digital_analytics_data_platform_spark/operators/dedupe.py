"""Last-writer-wins dedupe — the reference's load-bearing operator
(~40 sites; canonical form
``sql/02_SDI_SA360/01_BRONZE/MERGE/01_merge_sdi_bronze_sa360_campaign_daily.sql:134-146``:
``ROW_NUMBER() OVER (PARTITION BY merge_key ORDER BY file_load_datetime
DESC, filename DESC, insert_date DESC) = 1``).

Three physical strategies, same semantics:

- :func:`dedupe_lww` (default) — ``groupBy(keys).agg(max_by(payload,
  order))``. Hash aggregation with partial (map-side) combine: hot keys
  collapse before the shuffle, so Zipf skew cannot stall a reducer, and
  no per-partition sort is needed. The right default at 100 TB.
- :func:`dedupe_lww_window` — the reference's ROW_NUMBER idiom
  verbatim. Full shuffle + sort of every row; kept for parity and for
  when rank>1 rows are needed.
- :func:`dedupe_lww_salted` — explicit two-phase salted variant
  (per-(key, salt) partial LWW, then final per-key LWW), the
  hand-rolled skew treatment the north rule names. With partial-agg
  hash aggregation phase 1 is what Catalyst already does for
  :func:`dedupe_lww`; this spelling makes the plan explicit and is the
  fallback if an orderable-payload ``max_by`` is ever unavailable.

All orderings must be total (include a unique tiebreaker such as
``lsn``) — the reference's "deterministic tie-breakers" rule
(``…01_merge_sdi_silver_sa360_campaign_daily.sql:13``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cols(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> list[str]:
    return [c for c in df.columns if c not in set(keys)]


def dedupe_lww(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> DataFrame:
    """Keep, per key, the row with the greatest ``order`` tuple."""
    payload = _cols(df, keys, order)
    w = F.max_by(F.struct(*[F.col(c) for c in payload]), F.struct(*[F.col(c) for c in order]))
    out = df.groupBy(*keys).agg(w.alias("_w"))
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def dedupe_lww_window(
    df: DataFrame, keys: Sequence[str], order: Sequence[str], *, nulls_last: bool = True
) -> DataFrame:
    """ROW_NUMBER()=1 spelling (QUALIFY idiom, SURVEY §2.5 W1/W3)."""
    ordering = [
        (F.col(c).desc_nulls_last() if nulls_last else F.col(c).desc()) for c in order
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def dedupe_lww_salted(
    df: DataFrame, keys: Sequence[str], order: Sequence[str], *, salt: int = 16
) -> DataFrame:
    """Two-phase salted LWW: phase 1 collapses each hot key to ≤``salt``
    candidates on a salted shuffle; phase 2 finishes per key."""
    payload = _cols(df, keys, order)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt))
    w = F.max_by(F.struct(*[F.col(c) for c in payload]), F.struct(*[F.col(c) for c in order]))
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(w.alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return dedupe_lww(phase1, keys, order)


def first_event_pick(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> DataFrame:
    """First-event extraction (sessionization canonical entry row,
    ``sql/08_SDI_CLICKSTREAM/…/01_…entryPagesSession_daily.sql:131-136``):
    per key keep the row with the *smallest* order tuple (min_by)."""
    payload = _cols(df, keys, order)
    w = F.min_by(F.struct(*[F.col(c) for c in payload]), F.struct(*[F.col(c) for c in order]))
    out = df.groupBy(*keys).agg(w.alias("_w"))
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
