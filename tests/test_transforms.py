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


def test_unsigned_overflow_is_error_not_crash(spark):
    """ADVICE r1: a 25-digit decimal (out of int64 range) must produce an
    error row, not an ANSI-mode runtime exception."""
    rows = _eval(
        spark, "unsigned",
        ["1234567890123456789012345", "0xffffffffffffffffff", "12"],
    )
    assert rows[0].val is None and "out of range" in rows[0].err
    assert rows[1].val is None and "out of range" in rows[1].err
    assert rows[2].val == "12" and rows[2].err is None


def test_hex_or_dec_malformed_yields_null_under_ansi(spark):
    df = spark.createDataFrame(
        [("abc",), ("99999999999999999999999999",), ("-7",)], "v string"
    )
    got = [r.x for r in df.select(hex_or_dec(F.col("v")).alias("x")).collect()]
    assert got == [None, None, -7]


def test_ticks_ts_roundtrip_exact(spark):
    """ADVICE r1: ticks↔ts must round-trip exactly for current-epoch ticks
    (~1.77e16, beyond double's 2^53 exact-integer range)."""
    from eventanalysis_spark.functions.scalars import (
        dotnet_ticks_to_epoch_ticks,
        epoch_ticks_to_dotnet_ticks,
        ticks_to_ts,
        ts_to_ticks,
    )

    ticks = [17700000000000010, 17700000000000090, 9999999999999990, 10]
    df = spark.createDataFrame([(t,) for t in ticks], "t long")
    back = [
        r.b
        for r in df.select(
            ts_to_ticks(ticks_to_ts(F.col("t"))).alias("b")
        ).collect()
    ]
    # µs precision: the sub-µs digit truncates to 0 (documented reduction)
    assert back == [t - (t % 10) for t in ticks]
    rt = [
        r.b
        for r in df.select(
            dotnet_ticks_to_epoch_ticks(
                epoch_ticks_to_dotnet_ticks(F.col("t"))
            ).alias("b")
        ).collect()
    ]
    assert rt == ticks


def test_iso_week_key(spark):
    """ISO year ≠ calendar year at year boundaries: 2024-12-30 and
    2025-01-01 are both 2025-W01; 2027-01-01 is 2026-W53."""
    df = spark.createDataFrame(
        [("2024-12-30",), ("2025-01-01",), ("2027-01-01",), ("2025-06-15",)],
        "d string",
    ).select(F.col("d").cast("timestamp").alias("ts"))
    got = [r.k for r in df.select(iso_week_key(F.col("ts")).alias("k")).collect()]
    assert got == ["2025-W01", "2025-W01", "2026-W53", "2025-W24"]
