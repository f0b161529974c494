"""Debezium-style JSON change-envelope source — the wire format a real
binlog/WAL tail delivers (Debezium's MySQL/Postgres connectors publish
``{before, after, op, ts_ms, source:{lsn, ...}}`` records; public
format, see debezium.io docs). The north-star feed is "a binlog/WAL-
style change feed" (BASELINE.json); the parquet log segments in
``streaming/source.py`` are the landed form, this module is the decoder
for the raw JSON form so the engine can tail either.

Spark-first: one ``from_json`` with an explicit schema + column
expressions — JSON parsing stays inside Tungsten (codegen'd Jackson
parse), no UDF, no per-row Python. At 10^10 events the decode is a
map-only stage that fuses into the apply's first shuffle.

Reference analog: the reference's file-upload ingestion normalizes a
semi-structured landing payload before MERGE
(``sql/05_SDI_DIRECTORIES_UPLOAD/…`` CSV→staging→MERGE); a Debezium
envelope is the streaming-native equivalent of that landing contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Debezium op codes → the engine's change-event ops. Snapshot reads
# ('r') are inserts by definition; updates carry the full after-image
# (the engine's LWW apply needs no before-image diffing).
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}

# Spark's default JSON timestampFormat truncates to milliseconds; a CDC
# wire format must round-trip the full microsecond precision (the LWW
# order is (ts, lsn) — a truncated ts reorders events).
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The Debezium envelope for a given row payload schema."""
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("txId", T.LongType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
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
    """Decode a column of Debezium JSON envelopes into the engine's
    change-event shape: the payload columns (after-image; before-image
    for deletes, Debezium leaves ``after`` null on ``d``) plus
    ``op ∈ {I,U,D}``, ``lsn`` (source.lsn, falling back to ts_ms when
    the connector omits it) and ``commit_lsn`` (source.txId).

    Unparseable JSON and unknown op codes survive as rows with null
    ``op`` — the merge kernel's quarantine path owns garbage handling
    (P3 discipline: never drop silently, never fail the batch).
    """
    env = raw.withColumn(
        "_env", F.from_json(F.col(json_col), envelope_schema(row_schema), _JSON_OPTS)
    )
    img = F.when(F.col("_env.op") == "d", F.col("_env.before")).otherwise(F.col("_env.after"))
    names = set(row_schema.fieldNames())
    extras = []  # payload columns win the lsn/commit_lsn names when present
    if "lsn" not in names:
        extras.append(F.coalesce(F.col("_env.source.lsn"), F.col("_env.ts_ms")).alias("lsn"))
    if "commit_lsn" not in names:
        extras.append(F.col("_env.source.txId").alias("commit_lsn"))
    out = env.withColumn("_img", img).select(
        *[F.col(f"_img.{f.name}").alias(f.name) for f in row_schema.fields],
        _op_col(F.col("_env.op")).alias("op"),
        *extras,
    )
    return out


def encode_envelopes(
    changes: DataFrame,
    row_cols: list[str],
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    commit_lsn_col: str | None = "commit_lsn",
    ts_ms_col: str | None = None,
    before_col: str | None = None,
) -> DataFrame:
    """Inverse of :func:`decode_envelopes` (test/bench feed builder and
    outbound CDC mirror): wrap change rows as Debezium JSON envelopes in
    a single ``value`` string column. Deletes carry the image in
    ``before`` with ``after`` null, everything else the reverse —
    matching the connector contract ``decode_envelopes`` parses.

    ``before_col`` (optional) names a struct column holding the
    pre-update row image (fields = ``row_cols``, e.g. from
    ``LakeTable.read_changelog``); when set, ``u`` envelopes carry it
    in ``before`` — the full Debezium update contract — instead of
    null. Decode is unaffected (the engine's LWW apply keys on the
    after image)."""
    payload = F.struct(*[F.col(c) for c in row_cols])
    is_del = F.col(op_col) == "D"
    before = F.when(is_del, payload)
    if before_col is not None:
        before = before.when(F.col(op_col) == "U", F.col(before_col))
    env = F.struct(
        before.alias("before"),
        F.when(~is_del, payload).alias("after"),
        F.when(F.col(op_col) == "I", F.lit("c"))
        .when(F.col(op_col) == "U", F.lit("u"))
        .when(is_del, F.lit("d"))
        .alias("op"),
        (F.col(ts_ms_col) if ts_ms_col else F.lit(None)).cast("long").alias("ts_ms"),
        F.struct(
            F.col(lsn_col).cast("long").alias("lsn"),
            (
                F.col(commit_lsn_col).cast("long")
                if commit_lsn_col
                else F.lit(None).cast("long")
            ).alias("txId"),
            F.lit("transcripts").alias("table"),
        ).alias("source"),
    )
    return changes.select(F.to_json(env, _JSON_OPTS).alias("value"))
