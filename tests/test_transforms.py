"""Transform registry semantics — reference TrxUnsigned/TrxNotEmpty +
chaining (XmlTests.cs:123-145)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventanalysis_spark.functions import transforms as trx
from eventanalysis_spark.functions.scalars import hex_or_dec, iso_week_key


def _eval(spark, col_expr, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    val, err = trx.apply_chain(F.col("v"), col_expr)
    return df.select(val.alias("val"), err.alias("err")).collect()


def test_unsigned_hex_golden(spark):
    """'0xa3fc' → '41980' (XmlTests.cs:139-144)."""
    rows = _eval(spark, "unsigned", ["0xa3fc", "123", "0x10"])
    assert [r.val for r in rows] == ["41980", "123", "16"]
    assert all(r.err is None for r in rows)


def test_unsigned_notempty_chain(spark):
    rows = _eval(spark, "unsigned,notempty", ["0xa3fc", ""])
    assert rows[0].val == "41980" and rows[0].err is None
    assert rows[1].val is None and "notempty" in rows[1].err


def test_notempty_error(spark):
    rows = _eval(spark, "notempty", ["x", ""])
    assert rows[0].err is None
    assert "empty" in rows[1].err


def test_unsigned_invalid(spark):
    rows = _eval(spark, "unsigned", ["0xzz", "abc"])
    assert all(r.val is None and "invalid" in r.err for r in rows)


def test_case_insensitive_lookup():
    assert trx.get("UNSIGNED") == trx.get("unsigned")


def test_hex_or_dec_column(spark):
    df = spark.createDataFrame(
        [("0xff",), ("10",), ("",), (None,)], "v string"
    )
    got = [r.x for r in df.select(hex_or_dec(F.col("v")).alias("x")).collect()]
    assert got == [255, 10, None, None]


def test_iso_week_key(spark):
    """ISO year ≠ calendar year at year boundaries: 2024-12-30 and
    2025-01-01 are both 2025-W01; 2027-01-01 is 2026-W53."""
    df = spark.createDataFrame(
        [("2024-12-30",), ("2025-01-01",), ("2027-01-01",), ("2025-06-15",)],
        "d string",
    ).select(F.col("d").cast("timestamp").alias("ts"))
    got = [r.k for r in df.select(iso_week_key(F.col("ts")).alias("k")).collect()]
    assert got == ["2025-W01", "2025-W01", "2026-W53", "2025-W24"]
