"""Z-order (Morton) interleaved clustering key — the multi-dimensional
file-clustering analog of Delta ``OPTIMIZE ZORDER BY`` / Iceberg's
multi-column sort orders.

Lexicographic range clustering on ``(a, b)`` gives sliver-precise
per-file min/max stats on ``a`` but nearly useless stats on ``b`` (every
file spans most of ``b``'s range). Interleaving the bits of the two
dimensions instead makes file extents approximate squares in
(a, b)-space, so a predicate on EITHER dimension — or a 2-D box — prunes
roughly √(selectivity) of the files per dimension. Everything here is a
pure column expression (codegen'd): normalize each dimension to a
``bits``-wide integer rank by equal-width scaling over its observed
min/max, then interleave bits into one long the existing
``repartitionByRange`` + within-file sort machinery clusters on.

Equal-width normalization is the deliberate trade (Delta does the same
via range-partition ids): heavy skew in a dimension degrades its
pruning smoothly, never correctness — stats pruning remains
conservative, and the actual predicate is always re-applied on the
returned rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZKEY_COL = "_zkey"


def _to_long(col: Column, dt: T.DataType) -> Column:
    """Map a supported column type onto an order-preserving long."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01"))
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("long")
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # double → long by scaling below (rank uses the double value)
        return col.cast("double")
    raise ValueError(
        f"z-order does not support {dt.simpleString()} columns "
        "(order-preserving integer mapping needed; strings have no "
        "bounded rank — cluster them lexicographically instead)"
    )


def zorder_key(df: DataFrame, cols: list[str], *, bits_per_dim: int | None = None) -> Column:
    """A Morton-interleaved long over ``cols``. Bounds are computed
    from ``df`` itself (one tiny agg job — this runs inside compaction,
    which already rewrites the data). Nulls rank lowest (bucket 0)."""
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns (one column is plain range clustering)")
    d = len(cols)
    bits = bits_per_dim or min(16, 62 // d)
    if bits * d > 62:
        raise ValueError(f"bits_per_dim={bits} × {d} dims exceeds a long")
    schema = df.schema
    longs = {c: _to_long(F.col(c), schema[c].dataType) for c in cols}
    bounds = df.agg(
        *[F.min(longs[c]).alias(f"lo_{c}") for c in cols],
        *[F.max(longs[c]).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    ranks = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi is None or hi == lo:
            ranks.append(F.lit(0).cast("long"))
            continue
        span = float(hi) - float(lo)
        rank = F.floor(((longs[c] - F.lit(lo)) / F.lit(span)) * F.lit(top)).cast("long")
        # clamp (floating rounding at the top edge) + nulls → 0
        rank = F.least(F.greatest(rank, F.lit(0)), F.lit(top))
        ranks.append(F.coalesce(rank, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for di, r in enumerate(ranks):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * d + di))
    return z
