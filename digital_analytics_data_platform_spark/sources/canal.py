"""Alibaba Canal flatMessage JSON codec (public format, the
``canal.mq.flatMessage=true`` wire shape): MySQL binlog events as
``{data: [rows], old, database, table, es, ts, id, isDdl, type,
pkNames}`` — the third wire format next to Debezium and Maxwell.

Two structural quirks make this decoder different:

- ``data`` is an ARRAY of row images (one message batches the rows of
  one binlog event) → the decoder explodes it, so one JSON line can
  yield several change events;
- Canal stringifies every column value (``data`` rows are string maps
  regardless of the MySQL column types) → the decoder parses
  ``array<map<string,string>>`` and casts each payload column to the
  target row schema, Spark-side (``CAST`` handles ints, doubles,
  booleans and ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` timestamps).

Still pure column expressions end to end: ``from_json`` + ``explode``
+ casts, all codegen'd, no per-row Python. ``explode`` is a map-only
generate — no shuffle is introduced before the apply's LWW agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OP_MAP = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}

_ENVELOPE = T.StructType(
    [
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("isDdl", T.BooleanType()),
        T.StructField("type", T.StringType()),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
    ]
)


def _op_col(op: Column, is_ddl: Column) -> Column:
    out = F.lit(None).cast("string")
    for code, mapped in _OP_MAP.items():
        out = F.when(op == code, F.lit(mapped)).otherwise(out)
    # DDL messages carry no row images; null-op → quarantine
    return F.when(F.coalesce(is_ddl, F.lit(False)), F.lit(None).cast("string")).otherwise(out)


def decode_envelopes(
    raw: DataFrame,
    row_schema: T.StructType,
    *,
    json_col: str = "value",
) -> DataFrame:
    """Decode Canal flatMessage JSON into the engine's change-event
    shape: one output row per element of ``data``, payload columns cast
    from Canal's stringified values to ``row_schema`` types, plus
    ``op ∈ {I,U,D}``, ``lsn`` (``es`` — the binlog event time in ms;
    Canal exposes no finer per-event cursor in the flat format) and
    ``commit_lsn`` (``id``, the message/batch id).

    Unparseable JSON and DDL messages survive as a single null-op row
    (``explode_outer`` keeps them) for the quarantine path."""
    env = raw.withColumn("_env", F.from_json(F.col(json_col), _ENVELOPE))
    rows = env.select("_env.*").withColumn("_row", F.explode_outer("data"))
    names = set(row_schema.fieldNames())
    extras = []  # payload columns win the lsn/commit_lsn names when present
    if "lsn" not in names:
        extras.append(F.col("es").alias("lsn"))
    if "commit_lsn" not in names:
        extras.append(F.col("id").alias("commit_lsn"))
    return rows.select(
        *[
            F.element_at(F.col("_row"), f.name).cast(f.dataType).alias(f.name)
            for f in row_schema.fields
        ],
        _op_col(F.col("type"), F.col("isDdl")).alias("op"),
        *extras,
    )


def encode_envelopes(
    changes: DataFrame,
    row_cols: list[str],
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    commit_lsn_col: str | None = "commit_lsn",
    pk_names: tuple[str, ...] = ("conv_id", "turn_idx"),
    before_col: str | None = None,
) -> DataFrame:
    """Inverse of :func:`decode_envelopes` (test/bench feed builder):
    one row per message, values stringified the way Canal does (CAST to
    string — timestamps keep microseconds, which CAST parses back).

    ``before_col`` (optional) names a struct column with the pre-update
    row image; when set, ``UPDATE`` messages carry Canal's ``old``
    array — one map of the changed columns' previous (stringified)
    values, parallel to ``data``."""
    kv = []
    for c in row_cols:
        kv.append(F.lit(c))
        kv.append(F.col(c).cast("string"))
    old = F.lit(None).cast(T.ArrayType(T.MapType(T.StringType(), T.StringType())))
    if before_col is not None:
        old_kv = []
        for c in row_cols:
            old_kv.append(F.lit(c))
            old_kv.append(
                F.when(
                    ~F.col(before_col)[c].eqNullSafe(F.col(c)),
                    F.col(before_col)[c].cast("string"),
                )
            )
        old = F.when(
            F.col(op_col) == "U",
            F.array(F.map_filter(F.create_map(*old_kv), lambda _k, v: v.isNotNull())),
        ).otherwise(old)
    env = F.struct(
        F.array(F.create_map(*kv)).alias("data"),
        old.alias("old"),
        F.lit("analytics").alias("database"),
        F.lit("transcripts").alias("table"),
        F.col(lsn_col).cast("long").alias("es"),
        F.col(lsn_col).cast("long").alias("ts"),
        (
            F.col(commit_lsn_col).cast("long")
            if commit_lsn_col
            else F.lit(None).cast("long")
        ).alias("id"),
        F.lit(False).alias("isDdl"),
        F.when(F.col(op_col) == "I", F.lit("INSERT"))
        .when(F.col(op_col) == "U", F.lit("UPDATE"))
        .when(F.col(op_col) == "D", F.lit("DELETE"))
        .alias("type"),
        F.array(*[F.lit(p) for p in pk_names]).alias("pkNames"),
    )
    return changes.select(F.to_json(env).alias("value"))
