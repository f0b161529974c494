"""wal2json (PostgreSQL logical decoding) change-envelope codec —
format version 2 (public format, see the wal2json README): one JSON
object per message, ``action ∈ {B, C, I, U, D, M, T}`` with row
messages carrying the payload as an ARRAY of ``{name, type, value}``
column entries rather than an object. Completes the engine's wire
family of the four formats a WAL/binlog tail commonly lands in
(Debezium: ``sources/debezium.py``; Maxwell: ``sources/maxwell.py``;
Canal: ``sources/canal.py``).

Same Spark-first discipline: one ``from_json`` with an explicit
schema, then pure column expressions — the array payload pivots to
columns via ``map_from_entries`` + per-field ``map[key]`` lookups with
casts, all inside whole-stage codegen; no per-row Python. Map-only
stage that fuses into the apply's first shuffle at 10^10 events.

Contract differences vs the other three worth pinning:

- ``action`` is already the engine's single-letter op for row
  messages; ``B``/``C`` (transaction begin/commit), ``M`` (logical
  message) and ``T`` (truncate) carry no row and surface as null-op
  garbage for the quarantine path;
- the row image is ``columns: [{name, type, value}]``; DELETEs carry
  the old row in ``identity`` instead (and UPDATEs may carry both —
  ``columns`` wins). Decoding assumes ``REPLICA IDENTITY FULL`` so
  deletes keep their ordering columns (ts/lsn), which is how a
  CDC-grade Postgres source is deployed; with default (PK-only)
  identity the non-key fields of a delete decode as null and the
  tombstone still orders by the envelope LSN;
- the LSN is Postgres's ``XXXXXXXX/YYYYYYYY`` hex pair; the decoder
  folds it to one monotonic long (``hi<<32 | lo``). ``xid`` (present
  with wal2json's ``include-xids``) plays the commit-grouping role.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .debezium import _JSON_OPTS

_COLUMN_ENTRY = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def envelope_schema() -> T.StructType:
    """The wal2json v2 envelope. Payload values are decoded as strings
    (wal2json emits JSON scalars; Spark's permissive from_json coerces
    them) and cast per target field on the way out — the payload row
    schema is the *caller's* contract, not the envelope's."""
    return T.StructType(
        [
            T.StructField("action", T.StringType()),
            T.StructField("xid", T.LongType()),
            T.StructField("lsn", T.StringType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("columns", T.ArrayType(_COLUMN_ENTRY)),
            T.StructField("identity", T.ArrayType(_COLUMN_ENTRY)),
        ]
    )


def _lsn_long(lsn: Column) -> Column:
    """Fold ``hi/lo`` hex LSN to one ordered long: (hi << 32) | lo."""
    hi = F.conv(F.split(lsn, "/").getItem(0), 16, 10).cast("long")
    lo = F.conv(F.split(lsn, "/").getItem(1), 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def decode_envelopes(
    raw: DataFrame,
    row_schema: T.StructType,
    *,
    json_col: str = "value",
) -> DataFrame:
    """Decode wal2json v2 envelopes into the engine's change-event
    shape: payload columns + ``op ∈ {I,U,D}``, ``lsn`` (folded from the
    hex pair) and ``commit_lsn`` (``xid``). Transaction markers (B/C),
    logical messages (M), truncates (T) and unparseable JSON surface as
    rows with null ``op`` for the merge kernel's quarantine path."""
    env = raw.withColumn("_env", F.from_json(F.col(json_col), envelope_schema(), _JSON_OPTS))
    to_map = lambda c: F.map_from_entries(  # noqa: E731
        F.transform(c, lambda e: F.struct(e["name"].alias("k"), e["value"].alias("v")))
    )
    # columns wins when both present (UPDATE carries old identity too);
    # DELETE rows fall through to identity (REPLICA IDENTITY FULL)
    payload = F.coalesce(to_map(F.col("_env.columns")), to_map(F.col("_env.identity")))
    ident = to_map(F.col("_env.identity"))
    names = set(row_schema.fieldNames())
    extras = []  # payload columns win the lsn/commit_lsn names when present
    if "lsn" not in names:
        extras.append(_lsn_long(F.col("_env.lsn")).alias("lsn"))
    if "commit_lsn" not in names:
        extras.append(F.col("_env.xid").alias("commit_lsn"))
    op = F.when(F.col("_env.action").isin("I", "U", "D"), F.col("_env.action"))
    return env.select(
        *[
            F.coalesce(payload[f.name], ident[f.name]).cast(f.dataType).alias(f.name)
            for f in row_schema.fields
        ],
        op.alias("op"),
        *extras,
    )


def encode_envelopes(
    changes: DataFrame,
    row_cols: list[str],
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    commit_lsn_col: str | None = "commit_lsn",
    table: str = "transcripts",
    before_col: str | None = None,
) -> DataFrame:
    """Inverse of :func:`decode_envelopes` (test/bench feed builder and
    outbound mirror): the long ``lsn`` unfolds back to the hex pair so
    decode(encode(x)) round-trips ordering exactly. DELETE rows carry
    the full image in ``identity`` (REPLICA IDENTITY FULL) and null
    ``columns``, matching what the decoder expects.

    ``before_col`` (optional) names a struct column with the pre-update
    row image; when set, ``U`` envelopes also carry the old row in
    ``identity`` — wal2json's REPLICA IDENTITY FULL update shape (the
    decoder already prefers ``columns`` when both are present)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.lit("text").alias("type"),
                F.col(c).cast("string").alias("value"),
            )
            for c in row_cols
        ]
    )
    is_del = F.col(op_col) == "D"
    identity = F.when(is_del, entries)
    if before_col is not None:
        identity = identity.when(
            F.col(op_col) == "U",
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("name"),
                        F.lit("text").alias("type"),
                        F.col(before_col)[c].cast("string").alias("value"),
                    )
                    for c in row_cols
                ]
            ),
        )
    lsn_hex = F.concat(
        F.lower(F.conv(F.shiftrightunsigned(F.col(lsn_col).cast("long"), 32), 10, 16)),
        F.lit("/"),
        F.lower(F.conv(F.col(lsn_col).cast("long").bitwiseAND(F.lit(0xFFFFFFFF)), 10, 16)),
    )
    env = F.struct(
        F.col(op_col).alias("action"),
        (
            F.col(commit_lsn_col).cast("long")
            if commit_lsn_col
            else F.lit(None).cast("long")
        ).alias("xid"),
        lsn_hex.alias("lsn"),
        F.lit(None).cast("string").alias("timestamp"),
        F.lit("public").alias("schema"),
        F.lit(table).alias("table"),
        F.when(~is_del, entries).alias("columns"),
        identity.alias("identity"),
    )
    return changes.select(F.to_json(env).alias("value"))
