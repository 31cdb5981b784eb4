"""M3 — rule-based filter + fan-out router.

Parity targets:
  - P3: ShouldProcess(eid, ver) = state.Enabled && ver >= state.MinVersion,
    DEFAULT-ALLOW for unknown ids (EventInfoTracker.cs:44-55); crucially,
    "observe even ignored events!" (EventImportJob.cs:93-94) — dropped rows
    still feed discovery/observation aggregates;
  - the event-job registry (JobRegistry.cs:52-68) becomes the rules table's
    sink column: one parse pass fans out to N sinks.

Spark-first: the rule table is tiny → broadcast left join, so routing adds
zero shuffles; the router returns ONE DataFrame with (sink, allowed)
columns and `fan_out` performs N filtered writes off a single cached pass.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

DEFAULT_SINK = "misc"


def apply_rules(
    enriched: DataFrame,
    rules: DataFrame,
    default_sink: str = DEFAULT_SINK,
    class_col: str = "event_class",
    version_col: str = "ever",
) -> DataFrame:
    """Broadcast-join the rule table and compute routing columns:

      allowed     : enabled && version >= min_version, default-allow when
                    the class has no rule (EventInfoTracker.cs:50-54)
      sink        : rule sink, or `default_sink` for unknown classes
      drop_reason : null for routed rows; 'disabled' | 'min_version' for
                    dropped ones — rides into the quarantine partition so
                    quarantined data is triageable without re-deriving
                    which rule fired

    No rows are dropped here — observation happens on the full frame."""
    r = rules.select(
        F.col(class_col).alias("__rule_class"),
        F.col("min_version").alias("__rule_minver"),
        F.col("enabled").alias("__rule_enabled"),
        F.col("sink").alias("__rule_sink"),
    )
    j = enriched.join(
        F.broadcast(r), enriched[class_col] == r["__rule_class"], "left"
    )
    enabled = F.coalesce(F.col("__rule_enabled"), F.lit(True))
    ver_ok = F.coalesce(F.col(version_col), F.lit(0)) >= F.coalesce(
        F.col("__rule_minver"), F.lit(0)
    )
    return (
        j.withColumn("allowed", enabled & ver_ok)
        .withColumn(
            "drop_reason",
            F.when(F.col("allowed"), F.lit(None).cast("string"))
            .when(~enabled, F.lit("disabled"))
            .otherwise(F.lit("min_version")),
        )
        .withColumn("sink", F.coalesce(F.col("__rule_sink"), F.lit(default_sink)))
        .drop("__rule_class", "__rule_minver", "__rule_enabled", "__rule_sink")
    )


def routed_only(with_rules: DataFrame) -> DataFrame:
    """The rows that actually flow to sinks (post-filter; drop_reason is
    null by construction on allowed rows, so it is dropped too)."""
    return with_rules.where(F.col("allowed")).drop("allowed", "drop_reason")


def observation_counts(with_rules: DataFrame, class_col: str = "event_class") -> DataFrame:
    """The 'observe even ignored events' aggregate: per-class totals
    including dropped rows (EventInfoTracker observation semantics)."""
    return (
        with_rules.groupBy(class_col)
        .agg(
            F.count(F.lit(1)).alias("n_observed"),
            F.sum(F.col("allowed").cast("long")).alias("n_routed"),
            F.sum((~F.col("allowed")).cast("long")).alias("n_dropped"),
        )
        .orderBy(class_col)
    )


def fan_out(
    with_rules: DataFrame,
    write_sink: Callable[[str, DataFrame], None],
    sinks: list[str] | None = None,
    cache: bool = True,
) -> dict[str, int]:
    """One cached pass → N filtered sink writes (multi-sink routing).

    At 100 TB the cache is MEMORY_AND_DISK_DESER on the routed projection
    only (post-parse, payload dropped), so each sink write re-reads the
    cached columnar blocks instead of re-running the parse UDF N times.
    Returns per-sink routed-row counts (the per-sink aggregate the north
    rule pins)."""
    routed = routed_only(with_rules)
    if sinks is None:
        sinks = [r["sink"] for r in routed.select("sink").distinct().collect()]
    if cache:
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    counts: dict[str, int] = {}
    try:
        for s in sorted(sinks):
            part = routed.where(F.col("sink") == s)
            write_sink(s, part)
            counts[s] = part.count()
    finally:
        if cache:
            routed.unpersist()
    return counts
