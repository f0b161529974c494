"""Maxwell-daemon JSON change-envelope codec (public format, see
maxwells-daemon.io): MySQL binlog events published as
``{database, table, type, ts, xid, commit, position, data, old}``
records — the second of the three wire formats a binlog tail commonly
lands in (Debezium: ``sources/debezium.py``; Canal: ``sources/canal.py``).

Same Spark-first discipline as the Debezium decoder: one ``from_json``
with an explicit schema + column expressions, codegen'd Jackson parse,
no per-row Python. Map-only stage that fuses into the apply's first
shuffle at 10^10 events.

Contract differences vs Debezium worth pinning:

- ``type`` is spelled out (``insert``/``update``/``delete``, plus
  ``bootstrap-insert``/``bootstrap-start``/``bootstrap-complete`` for
  snapshot loads — data-bearing bootstrap rows are inserts, the
  start/complete markers carry no row and surface as null-op garbage
  for the quarantine path);
- the full row image always rides in ``data`` (deletes included), so
  no before/after selection is needed;
- there is no numeric LSN field: ordering comes from ``position``
  (``"<binlog file>:<offset>"``). The decoder parses the offset and
  falls back to ``xid`` then ``ts`` (epoch seconds) when absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .debezium import _JSON_OPTS

_OP_MAP = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The Maxwell envelope for a given row payload schema. ``old``
    holds only the changed columns on updates; it is typed like the
    row so consumers can diff, but the engine's LWW apply reads the
    full ``data`` image and ignores it."""
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("commit", T.BooleanType()),
            T.StructField("position", T.StringType()),
            T.StructField("data", row_schema),
            T.StructField("old", row_schema),
        ]
    )


def _op_col(op: Column) -> Column:
    out = F.lit(None).cast("string")
    for code, mapped in _OP_MAP.items():
        out = F.when(op == code, F.lit(mapped)).otherwise(out)
    return out


def decode_envelopes(
    raw: DataFrame,
    row_schema: T.StructType,
    *,
    json_col: str = "value",
) -> DataFrame:
    """Decode Maxwell JSON envelopes into the engine's change-event
    shape: payload columns + ``op ∈ {I,U,D}``, ``lsn`` (binlog offset
    parsed from ``position``, falling back to ``xid`` then ``ts``) and
    ``commit_lsn`` (``xid`` — Maxwell's transaction id plays the
    commit-grouping role Debezium's ``txId`` does).

    Unparseable JSON, DDL rows, and bootstrap markers surface as rows
    with null ``op`` for the merge kernel's quarantine path."""
    env = raw.withColumn(
        "_env", F.from_json(F.col(json_col), envelope_schema(row_schema), _JSON_OPTS)
    )
    offset = F.regexp_extract(F.col("_env.position"), r":(\d+)$", 1)
    lsn = F.coalesce(
        F.when(offset != "", offset).cast("long"),
        F.col("_env.xid"),
        F.col("_env.ts"),
    )
    names = set(row_schema.fieldNames())
    extras = []  # payload columns win the lsn/commit_lsn names when present
    if "lsn" not in names:
        extras.append(lsn.alias("lsn"))
    if "commit_lsn" not in names:
        extras.append(F.col("_env.xid").alias("commit_lsn"))
    return env.select(
        *[F.col(f"_env.data.{f.name}").alias(f.name) for f in row_schema.fields],
        _op_col(F.col("_env.type")).alias("op"),
        *extras,
    )


def encode_envelopes(
    changes: DataFrame,
    row_cols: list[str],
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    commit_lsn_col: str | None = "commit_lsn",
    ts_s_col: str | None = None,
    binlog_file: str = "binlog.000001",
    before_col: str | None = None,
) -> DataFrame:
    """Inverse of :func:`decode_envelopes` (test/bench feed builder and
    outbound mirror): the ``lsn`` rides as the offset in ``position``
    so decode(encode(x)) round-trips ordering exactly.

    ``before_col`` (optional) names a struct column with the pre-update
    row image; when set, ``update`` envelopes carry Maxwell's ``old``
    field — the previous values of exactly the columns that changed
    (unchanged columns are nulled and dropped from the JSON, Maxwell's
    own contract). A column that changed *from* SQL null is likewise
    absent — an accepted fidelity limit of null-dropping JSON."""
    payload = F.struct(*[F.col(c) for c in row_cols])
    old = F.lit(None).cast(T.StructType([T.StructField(c, T.StringType()) for c in row_cols]))
    if before_col is not None:
        old = F.when(
            F.col(op_col) == "U",
            F.struct(
                *[
                    F.when(
                        ~F.col(before_col)[c].eqNullSafe(F.col(c)), F.col(before_col)[c]
                    ).alias(c)
                    for c in row_cols
                ]
            ),
        )
    env = F.struct(
        F.lit("analytics").alias("database"),
        F.lit("transcripts").alias("table"),
        F.when(F.col(op_col) == "I", F.lit("insert"))
        .when(F.col(op_col) == "U", F.lit("update"))
        .when(F.col(op_col) == "D", F.lit("delete"))
        .alias("type"),
        (F.col(ts_s_col) if ts_s_col else F.lit(None)).cast("long").alias("ts"),
        (
            F.col(commit_lsn_col).cast("long")
            if commit_lsn_col
            else F.lit(None).cast("long")
        ).alias("xid"),
        F.lit(True).alias("commit"),
        F.concat(F.lit(binlog_file + ":"), F.col(lsn_col).cast("string")).alias("position"),
        payload.alias("data"),
        old.alias("old"),
    )
    return changes.select(F.to_json(env, _JSON_OPTS).alias("value"))
