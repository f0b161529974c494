"""The local oracle gate must PREDICT the driver's hash compare.

r3/r4 post-mortem: scripts/check_oracles.py coerced every numeric
column to float64 before comparing, so DuckDB's HUGEINT→float64 drift
(an uncast integer ``sum``) was invisible locally while fatal at the
driver — "50/50 OK" was honestly reported two rounds running against a
red driver row. These tests pin the r5 contract: int-vs-float kind
drift fails, benign representation differences (int32 vs int64, DATE
as object vs datetime64) do not. No Spark needed — pure pandas.
"""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from check_oracles import col_kind, kind_mismatches, norm_frame  # noqa: E402


def test_int_vs_float_kind_drift_is_flagged():
    spark_side = pd.DataFrame({"checksum": pd.array([479604], dtype="int64")})
    oracle_side = pd.DataFrame({"checksum": pd.array([479604.0], dtype="float64")})
    assert kind_mismatches(spark_side, oracle_side) == [("checksum", "int", "float")]


def test_duckdb_hugeint_sum_reproduces_the_r4_defect():
    """The actual failure shape: DuckDB types sum(BIGINT) as HUGEINT and
    .df() converts it to float64; the cast variant stays int64. The
    harness must fail the former and pass the latter."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    uncast = con.sql("SELECT sum(x) AS s FROM (VALUES (1::BIGINT), (2::BIGINT)) t(x)").df()
    cast = con.sql(
        "SELECT sum(x)::BIGINT AS s FROM (VALUES (1::BIGINT), (2::BIGINT)) t(x)"
    ).df()
    spark_like = pd.DataFrame({"s": pd.array([3], dtype="int64")})
    assert col_kind(uncast["s"].dtype) == "float"
    assert kind_mismatches(spark_like, uncast), "HUGEINT drift must be flagged"
    assert not kind_mismatches(spark_like, cast)


def test_int_width_difference_is_benign():
    a = pd.DataFrame({"n": pd.array([5], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([5], dtype="int64")})
    assert not kind_mismatches(a, b)
    ga, gb = norm_frame(a), norm_frame(b)
    assert ga.equals(gb)


def test_date_object_vs_datetime64_is_benign():
    """Spark DATE → object(datetime.date); DuckDB DATE → datetime64[ns].
    The driver greens these (9 such r4 rows), so the gate must too:
    same kind bucket, identical normalized strings."""
    import datetime

    a = pd.DataFrame({"d": [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    assert not kind_mismatches(a, b)
    assert norm_frame(a).equals(norm_frame(b))


def test_norm_never_coerces_int_to_float():
    g = norm_frame(pd.DataFrame({"n": pd.array([7], dtype="int64")}))
    assert str(g["n"].dtype) == "int64"
    assert g["n"].iloc[0] == 7


def test_real_timestamp_values_still_compared():
    a = pd.DataFrame({"t": pd.to_datetime(["2024-01-01 10:00:00"])})
    b = pd.DataFrame({"t": pd.to_datetime(["2024-01-01 11:00:00"])})
    assert not kind_mismatches(a, b)  # same kind...
    assert not norm_frame(a).equals(norm_frame(b))  # ...but values differ
