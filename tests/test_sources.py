"""CSV upload validation + content-hash manifest (S8/S9)."""

import pytest

from digital_analytics_data_platform_spark.sources import (
    FileManifest,
    UploadValidationError,
    load_validated_csv,
)

CSV_OK = """week_sun_sat,forecast_upv,channel
2026-01-10,100.5,web
2026-01-17,200.0,web
"""

CSV_DUP = """week_sun_sat,forecast_upv,channel
2026-01-10,100.5,web
2026-01-10,300.0,web
"""

CSV_BAD_DATE = CSV_OK.replace("2026-01-17", "not-a-date")
CSV_NOT_SATURDAY = CSV_OK.replace("2026-01-17", "2026-01-15")


def _write(tmp_path, content, name="u.csv"):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_upload_ok(spark, tmp_path):
    df = load_validated_csv(
        spark,
        _write(tmp_path, CSV_OK),
        date_cols=["week_sun_sat"],
        numeric_cols=["forecast_upv"],
        key_cols=["week_sun_sat", "channel"],
        required_cols=["week_sun_sat", "forecast_upv", "channel"],
        week_ending_saturday_col="week_sun_sat",
    )
    assert df.count() == 2


@pytest.mark.parametrize(
    "content,msg",
    [
        (CSV_DUP, "duplicate key"),
        (CSV_BAD_DATE, "unparseable dates"),
        (CSV_NOT_SATURDAY, "Saturdays"),
    ],
)
def test_upload_rejections(spark, tmp_path, content, msg):
    with pytest.raises(UploadValidationError, match=msg):
        load_validated_csv(
            spark,
            _write(tmp_path, content),
            date_cols=["week_sun_sat"],
            numeric_cols=["forecast_upv"],
            key_cols=["week_sun_sat", "channel"],
            week_ending_saturday_col="week_sun_sat",
        )


def test_upload_missing_column(spark, tmp_path):
    with pytest.raises(UploadValidationError, match="missing required"):
        load_validated_csv(spark, _write(tmp_path, CSV_OK), required_cols=["nope"])


def test_manifest_idempotent_reupload(tmp_path):
    m = FileManifest(str(tmp_path / "manifest.json"))
    f1 = _write(tmp_path, CSV_OK, "a.csv")
    assert m.should_process("2026-01-10", f1)
    m.register("2026-01-10", f1)
    assert not m.should_process("2026-01-10", f1)  # same content → skip
    f2 = _write(tmp_path, CSV_OK + "2026-01-24,9.0,web\n", "a2.csv")
    assert m.should_process("2026-01-10", f2)  # changed content → supersede
    m.register("2026-01-10", f2)
    assert not m.should_process("2026-01-10", f2)


# ---------------------------------------------------------------------------
# Debezium JSON envelope source (binlog wire format)


def test_debezium_decode_ops_and_images(spark):
    """c/r → I, u → U, d → D (image from `before`); unknown op codes and
    garbage JSON survive as null-op rows for the quarantine path."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.sources.debezium import decode_envelopes

    row_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    raw = spark.createDataFrame(
        [
            ('{"after":{"k":"a","v":1},"op":"c","ts_ms":5,"source":{"lsn":10,"txId":1}}',),
            ('{"after":{"k":"b","v":2},"op":"r","source":{"lsn":11,"txId":1}}',),
            ('{"before":{"k":"a","v":1},"after":{"k":"a","v":9},"op":"u","source":{"lsn":12,"txId":2}}',),
            ('{"before":{"k":"b","v":2},"op":"d","source":{"lsn":13,"txId":2}}',),
            ('{"after":{"k":"c","v":3},"op":"x","source":{"lsn":14,"txId":3}}',),  # unknown op
            ("not json at all",),
            ('{"after":{"k":"e","v":5},"op":"c","ts_ms":77,"source":null}',),  # lsn falls back to ts_ms
        ],
        T.StructType([T.StructField("value", T.StringType())]),
    )
    got = {
        (r["k"], r["v"], r["op"], r["lsn"], r["commit_lsn"])
        for r in decode_envelopes(raw, row_schema).collect()
    }
    assert ("a", 1, "I", 10, 1) in got
    assert ("b", 2, "I", 11, 1) in got  # snapshot read is an insert
    assert ("a", 9, "U", 12, 2) in got  # update carries the after-image
    assert ("b", 2, "D", 13, 2) in got  # delete carries the before-image
    assert ("c", 3, None, 14, 3) in got  # unknown op → null op (quarantine)
    assert (None, None, None, None, None) in got  # garbage → all-null row
    assert ("e", 5, "I", 77, None) in got  # source.lsn null → ts_ms fallback


def test_debezium_roundtrip_feed_applies_identically(spark, tmp_path):
    """End-to-end: a change log encoded to Debezium wire format, decoded
    by the envelope source, and applied through MERGE yields the exact
    same table state as applying the original log directly."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
    from digital_analytics_data_platform_spark.sources.debezium import (
        decode_envelopes,
        encode_envelopes,
    )
    from tests.conftest import TRANSCRIPT_SCHEMA

    log = datagen.change_log(spark, 4000, n_convs=40, turns_per_conv=10)
    row_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    wire = encode_envelopes(log, row_cols, ts_ms_col="lsn")
    decoded = decode_envelopes(wire, log.select(*row_cols).schema)

    t_direct = LakeTable.create(
        str(tmp_path / "direct"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
    )
    t_wire = LakeTable.create(
        str(tmp_path / "wire"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
    )
    merge_changes(spark, t_direct, log, batch_key="b0")
    merge_changes(spark, t_wire, decoded, batch_key="b0")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    a = sorted(tuple(r) for r in t_direct.read(spark).select(*cols).collect())
    b = sorted(tuple(r) for r in t_wire.read(spark).select(*cols).collect())
    assert a == b and len(a) > 0


def test_maxwell_decode_ops_and_position(spark):
    """insert/bootstrap-insert → I, update → U, delete → D; lsn parses
    the binlog offset from `position`, falling back to xid then ts;
    garbage and bootstrap markers are null-op quarantine rows."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.sources.maxwell import decode_envelopes

    row_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    raw = spark.createDataFrame(
        [
            ('{"type":"insert","data":{"k":"a","v":1},"xid":1,"position":"binlog.000003:1234"}',),
            ('{"type":"update","data":{"k":"a","v":9},"old":{"v":1},"xid":2,"position":"binlog.000003:1300"}',),
            ('{"type":"delete","data":{"k":"a","v":9},"xid":3,"position":"binlog.000003:1400"}',),
            ('{"type":"bootstrap-insert","data":{"k":"b","v":2},"xid":4}',),  # lsn -> xid fallback
            ('{"type":"insert","data":{"k":"c","v":3},"ts":99}',),  # lsn -> ts fallback
            ('{"type":"bootstrap-start","ts":5}',),  # marker: null-op row
            ("not json",),
        ],
        T.StructType([T.StructField("value", T.StringType())]),
    )
    got = {
        (r["k"], r["v"], r["op"], r["lsn"], r["commit_lsn"])
        for r in decode_envelopes(raw, row_schema).collect()
    }
    assert ("a", 1, "I", 1234, 1) in got
    assert ("a", 9, "U", 1300, 2) in got
    assert ("a", 9, "D", 1400, 3) in got
    assert ("b", 2, "I", 4, 4) in got
    assert ("c", 3, "I", 99, None) in got
    assert (None, None, None, 5, None) in got  # bootstrap-start marker
    assert (None, None, None, None, None) in got  # garbage


def test_canal_decode_explodes_and_casts(spark):
    """Canal batches row images per message and stringifies values: the
    decoder explodes `data` and casts to the target schema; DDL and
    garbage messages survive as null-op rows."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.sources.canal import decode_envelopes

    row_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    raw = spark.createDataFrame(
        [
            ('{"data":[{"k":"a","v":"1"},{"k":"b","v":"2"}],"es":100,"id":7,"isDdl":false,"type":"INSERT"}',),
            ('{"data":[{"k":"a","v":"9"}],"es":200,"id":8,"isDdl":false,"type":"UPDATE"}',),
            ('{"data":[{"k":"b","v":"2"}],"es":300,"id":9,"isDdl":false,"type":"DELETE"}',),
            ('{"data":null,"es":400,"id":10,"isDdl":true,"type":"ALTER","sql":"alter table t add c int"}',),
            ("nope",),
        ],
        T.StructType([T.StructField("value", T.StringType())]),
    )
    got = {
        (r["k"], r["v"], r["op"], r["lsn"], r["commit_lsn"])
        for r in decode_envelopes(raw, row_schema).collect()
    }
    assert ("a", 1, "I", 100, 7) in got and ("b", 2, "I", 100, 7) in got  # one message, two events
    assert ("a", 9, "U", 200, 8) in got
    assert ("b", 2, "D", 300, 9) in got
    assert (None, None, None, 400, 10) in got  # DDL → quarantine row
    assert (None, None, None, None, None) in got  # garbage


def test_maxwell_and_canal_roundtrip_apply_identically(spark, tmp_path):
    """decode(encode(log)) applied through MERGE equals applying the
    original log directly — for both wire formats, microsecond
    timestamps and nullable tool column included."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
    from digital_analytics_data_platform_spark.sources import canal, maxwell
    from tests.conftest import TRANSCRIPT_SCHEMA

    log = datagen.change_log(spark, 3000, n_convs=30, turns_per_conv=10)
    row_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]

    t_direct = LakeTable.create(
        str(tmp_path / "direct"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
    )
    merge_changes(spark, t_direct, log, batch_key="b0")
    expect = sorted(tuple(r) for r in t_direct.read(spark).select(*cols).collect())
    assert expect

    for name, codec in (("maxwell", maxwell), ("canal", canal)):
        wire = codec.encode_envelopes(log, row_cols)
        decoded = codec.decode_envelopes(wire, log.select(*row_cols).schema)
        # the payload carries its own lsn column; the envelope-level lsn
        # dupe from decode is dropped in favor of the payload's
        t = LakeTable.create(
            str(tmp_path / name), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
        )
        merge_changes(spark, t, decoded, batch_key="b0")
        got = sorted(tuple(r) for r in t.read(spark).select(*cols).collect())
        assert got == expect, name


def test_wal2json_decode_actions_and_lsn_fold(spark):
    """I/U/D actions pass through; DELETE decodes from `identity`
    (REPLICA IDENTITY FULL); the hex LSN pair folds to one ordered
    long; B/C/M/T markers and garbage are null-op quarantine rows."""
    from pyspark.sql import types as T

    from digital_analytics_data_platform_spark.sources.wal2json import decode_envelopes

    row_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    raw = spark.createDataFrame(
        [
            ('{"action":"B","xid":7,"lsn":"0/10"}',),
            (
                '{"action":"I","xid":7,"lsn":"0/16B2C50","columns":'
                '[{"name":"k","type":"text","value":"a"},{"name":"v","type":"integer","value":"1"}]}',
            ),
            (
                '{"action":"U","xid":7,"lsn":"0/16B2C58","columns":'
                '[{"name":"k","type":"text","value":"a"},{"name":"v","type":"integer","value":"9"}],'
                '"identity":[{"name":"k","type":"text","value":"a"},{"name":"v","type":"integer","value":"1"}]}',
            ),
            (
                '{"action":"D","xid":8,"lsn":"1/00000010","identity":'
                '[{"name":"k","type":"text","value":"a"},{"name":"v","type":"integer","value":"9"}]}',
            ),
            ('{"action":"C","xid":7,"lsn":"0/16B2C60"}',),
            ('{"action":"T","xid":9,"lsn":"0/17000000","schema":"public","table":"t"}',),
            ("not json",),
        ],
        T.StructType([T.StructField("value", T.StringType())]),
    )
    got = {
        (r["k"], r["v"], r["op"], r["lsn"], r["commit_lsn"])
        for r in decode_envelopes(raw, row_schema).collect()
    }
    assert ("a", 1, "I", 0x16B2C50, 7) in got
    assert ("a", 9, "U", 0x16B2C58, 7) in got  # columns wins over identity
    assert ("a", 9, "D", (1 << 32) + 0x10, 8) in got  # hi/lo fold keeps order
    assert (None, None, None, 0x10, 7) in got  # begin marker → quarantine
    assert (None, None, None, None, None) in got  # garbage
    ops = [r[2] for r in got]
    assert ops.count(None) == 4  # B, C, T, garbage


def test_wal2json_roundtrip_applies_identically(spark, tmp_path):
    """decode(encode(log)) applied through MERGE equals applying the
    original log directly — same contract as the Maxwell/Canal/Debezium
    identity oracles, including deletes riding in `identity`."""
    from digital_analytics_data_platform_spark import datagen
    from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
    from digital_analytics_data_platform_spark.sources import wal2json
    from tests.conftest import TRANSCRIPT_SCHEMA

    log = datagen.change_log(spark, 3000, n_convs=30, turns_per_conv=10)
    row_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]

    t_direct = LakeTable.create(
        str(tmp_path / "direct"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
    )
    merge_changes(spark, t_direct, log, batch_key="b0")
    expect = sorted(tuple(r) for r in t_direct.read(spark).select(*row_cols).collect())
    assert expect

    wire = wal2json.encode_envelopes(log, row_cols)
    decoded = wal2json.decode_envelopes(wire, log.select(*row_cols).schema)
    t = LakeTable.create(
        str(tmp_path / "w2j"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], ["ts", "lsn"]
    )
    merge_changes(spark, t, decoded, batch_key="b0")
    got = sorted(tuple(r) for r in t.read(spark).select(*row_cols).collect())
    assert got == expect
