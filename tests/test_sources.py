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
