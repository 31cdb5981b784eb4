"""Aggregation operators — SURVEY.md §2.4 (A1-A8) + §2.5 W3/W4.

All are single hash-aggregates with map-side partial aggregation; the only
deliberate structural choice vs the reference is A2: the reference joins
the fact INTO the dims and groups (flagged "heavy performance cost",
OpenDbV2.cs:728-734) — here we aggregate the fact FIRST and join dims onto
the (small) grouped result. Catalyst will not reorder that for us; writing
it aggregate-then-join is the 100-TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.functions.scalars import period_key


def class_counts(fact: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A1: GROUP BY keys ORDER BY keys count (RawEventDbV1.cs:196-203)."""
    keys = keys or ["event_class"]
    return fact.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).orderBy(*keys)


def overview(
    fact: DataFrame,
    host_info: DataFrame | None = None,
    lang_info: DataFrame | None = None,
) -> DataFrame:
    """A2: the Overview — per (host, lang, event_class, ever) count with
    dimension descriptions attached (OpenDbV2.GetOverview, :736-758).
    Aggregate-then-broadcast-join; deterministic report ordering O4."""
    g = fact.groupBy("host", "lang", "event_class", "ever").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    if host_info is not None:
        g = g.join(F.broadcast(host_info), "host", "left")
    if lang_info is not None:
        g = g.join(F.broadcast(lang_info), "lang", "left")
    return g.orderBy("host", "lang", "event_class", "ever")


def group_stats(fact: DataFrame, keys: list[str],
                ts_col: str = "warc_ts", bytes_col: str = "n_bytes") -> DataFrame:
    """A3: per-group count / min / max ts / byte totals
    (RawEventDbV1.cs:226-268 — COUNT, MIN/MAX rid, MIN/MAX ts,
    SUM(LENGTH(xml)))."""
    return (
        fact.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("url").alias("first_url"),
            F.max("url").alias("last_url"),
            F.min(ts_col).alias("ts_min"),
            F.max(ts_col).alias("ts_max"),
            F.sum(bytes_col).alias("total_bytes"),
            F.max(bytes_col).alias("max_bytes"),
            F.avg(bytes_col).alias("avg_bytes"),
        )
        .orderBy(*keys)
    )


def watermark_bounds(fact: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """A4: scalar min/max watermark probe (OpenDbV2.cs:108-123)."""
    return fact.agg(
        F.min(ts_col).alias("ts_min"),
        F.max(ts_col).alias("ts_max"),
        F.count(F.lit(1)).alias("n"),
    )


def period_rollup(
    fact: DataFrame,
    period: str = "day",
    ts_col: str = "warc_ts",
    bytes_col: str = "n_bytes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """A5: day / ISO-week / month rollup (AppDiag.fs:29-101 +
    EventRowStatistics.cs:17-98). The reference streams rid-ordered rows and
    emits on bucket change (W4); a hash aggregate needs no order at all —
    same result, shuffle only on the (tiny) bucket key."""
    keys = [period_key(F.col(ts_col), period).alias("period")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    return (
        fact.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts_col).alias("ts_min"),
            F.max(ts_col).alias("ts_max"),
            F.sum(bytes_col).alias("total_bytes"),
            F.max(bytes_col).alias("max_bytes"),
            F.avg(bytes_col).alias("avg_bytes"),
        )
        .orderBy("period", *(extra_keys or []))
    )


def host_rollup(overview_df: DataFrame) -> DataFrame:
    """A6: second-level regroup of the overview by host: distinct
    (lang,class) combos + total events + a uniqueness audit column
    (AppOverview2.fs:110-139)."""
    return (
        overview_df.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_combos"),
            F.sum("n_events").alias("n_events"),
            F.countDistinct("event_class").alias("n_classes"),
        )
        .withColumn("ambiguous", F.col("n_combos") > F.col("n_classes"))
        .orderBy("host")
    )


def sink_aggregates(routed: DataFrame, period: str = "day") -> DataFrame:
    """THE north-rule per-sink aggregate: counts by
    (sink, host, lang, event_class, period-bucket). Must match the oracle
    exactly — every column aliased, deterministic order."""
    return (
        routed.groupBy(
            "sink",
            "host",
            "lang",
            "event_class",
            period_key(F.col("warc_ts"), period).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink", "host", "lang", "event_class", "bucket")
    )


def tumbling_window_rollup(fact: DataFrame, duration: str = "1 day") -> DataFrame:
    """W3 via Spark's native event-time tumbling window (the reference's
    month-boundary probe, ArchiveBuilder.cs:139-193, exists only because
    SQLite has no window semantics — Spark's `window()` is the direct
    primitive)."""
    return (
        fact.groupBy(F.window(F.col("warc_ts"), duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("total_bytes"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "total_bytes",
        )
        .orderBy("w_start")
    )
