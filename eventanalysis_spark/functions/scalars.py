"""Scalar column functions — SURVEY.md §2.8 (F4-F15), all pure Catalyst
expressions (JVM-side, codegen'd; no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unix epoch in .NET ticks — reference TimeUtil.cs:36-64
EPOCH_DOTNET_TICKS = 621355968000000000


def hex_or_dec(col: Column) -> Column:
    """F4: '' → null; '0x' prefix → hex; else decimal. Signed passthrough.
    Reference XmlStringValueConversions.cs:27-59.

    Malformed or out-of-int64-range inputs yield NULL (try_cast), never a
    runtime error — required under Spark 4 ANSI mode so invalid rows can be
    routed to quarantine with an error column instead of killing the task."""
    t = F.trim(col)
    is_hex = F.lower(t).startswith("0x")
    hexpart = F.substring(t, 3, 32)
    return (
        F.when(t.isNull() | (t == ""), F.lit(None).cast("long"))
        .when(
            # conv() itself throws ARITHMETIC_OVERFLOW under ANSI for >64-bit
            # inputs — gate it on ≤16 valid hex digits; 2^63..2^64-1 results
            # then null out via try_cast
            is_hex & hexpart.rlike(r"^[0-9a-fA-F]{1,16}$"),
            F.conv(hexpart, 16, 10).try_cast("long"),
        )
        .when(is_hex, F.lit(None).cast("long"))
        .otherwise(t.try_cast("long"))
    )


def empty_null(col: Column) -> Column:
    """F8/P8: '' → null (EmptyNull, XmlStringValueConversions.cs:99-106)."""
    return F.nullif(col, F.lit(""))


def missing_string(col: Column, default: str = "?") -> Column:
    """P8: null → '?' (AppOverview2.fs:22)."""
    return F.coalesce(col, F.lit(default))


def ticks_to_ts(col: Column) -> Column:
    """F11: epoch-ticks (100 ns since Unix epoch) → timestamp (µs precision;
    the sub-µs digit is a documented precision reduction, SURVEY.md §1.3).

    Exact integer division: ticks for current dates (~1.77e16) exceed 2^53,
    so double `/` would be off by up to ~1 µs and break ticks↔ts round
    trips. Decimal division + long cast truncates toward zero, matching
    .NET integer division (TimeUtil.cs:36-64)."""
    return F.timestamp_micros((col.cast("decimal(38,0)") / 10).cast("long"))


def dotnet_ticks_to_epoch_ticks(col: Column) -> Column:
    """F11: .NET UTC DateTime ticks → Unix-epoch ticks
    (`ticks = utcTicks − 621355968000000000`, TimeUtil.cs:36-64)."""
    return col - F.lit(EPOCH_DOTNET_TICKS)


def epoch_ticks_to_dotnet_ticks(col: Column) -> Column:
    """F11 inverse of :func:`dotnet_ticks_to_epoch_ticks`."""
    return col + F.lit(EPOCH_DOTNET_TICKS)


def ts_to_ticks(col: Column) -> Column:
    """F11 inverse: timestamp → 100 ns epoch ticks."""
    return F.unix_micros(col) * 10


def compact_time_string(col: Column, with_fraction: bool = False) -> Column:
    """F11: the reference's yyyyMMdd-HHmmss[-fffffff] wire format
    (TimeUtil.cs:95-153); fraction rendered from µs (padded to 7)."""
    base = F.date_format(col, "yyyyMMdd-HHmmss")
    if not with_fraction:
        return base
    frac = F.lpad((F.unix_micros(col) % 1_000_000).cast("string"), 6, "0")
    return F.concat(base, F.lit("-"), frac, F.lit("0"))


def day_key(ts: Column) -> Column:
    """F12: 'yyyy-MM-dd' of the UTC stamp (AppDiag.fs:29-38)."""
    return F.date_format(ts, "yyyy-MM-dd")


def iso_week_key(ts: Column) -> Column:
    """F12: ISO week key 'yyyy-Www' with the ISO *week-numbering year*
    (ISOWeek.GetYear semantics — Spark's `weekofyear` is ISO but `year`
    is calendar, so derive the ISO year from the Thursday of the week)."""
    thursday = F.date_add(F.date_trunc("week", ts), 3)
    return F.concat(
        F.year(thursday).cast("string"),
        F.lit("-W"),
        F.lpad(F.weekofyear(ts).cast("string"), 2, "0"),
    )


def month_key(ts: Column) -> Column:
    """F12: 'yyyy-MM'."""
    return F.date_format(ts, "yyyy-MM")


def period_key(ts: Column, period: str) -> Column:
    if period == "day":
        return day_key(ts)
    if period == "week":
        return iso_week_key(ts)
    if period == "month":
        return month_key(ts)
    raise ValueError(f"unknown period {period!r} (day|week|month)")


def url_hash(col: Column) -> Column:
    """Stable 64-bit identity hash of the url — the `rid` role at scale
    (partitioning, watermarks, salting)."""
    return F.xxhash64(col)


def archive_name(machine: Column, job: Column, month: Column,
                 rid_min: Column, rid_max: Column, compressed: bool = True) -> Column:
    """F14: `{machine}.{job}.archive.{yyyy-MM}.{ridMin:D6}-{ridMax:D6}.evarc[.gz]`
    (ArchiveInfo.cs:140-159) — kept as a naming convention for exported
    monthly partitions."""
    ext = ".evarc.gz" if compressed else ".evarc"
    return F.concat(
        F.concat_ws(
            ".",
            machine,
            job,
            F.lit("archive"),
            month,
            F.concat(
                F.lpad(rid_min.cast("string"), 6, "0"),
                F.lit("-"),
                F.lpad(rid_max.cast("string"), 6, "0"),
            ),
        ),
        F.lit(ext),
    )
