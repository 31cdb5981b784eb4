"""Interval joins: point-in-interval, interval-overlap, interval merge.

Log pipelines constantly need "which window contains this event"
(deploy window ⋈ error burst, purchase window ⋈ click, CIDR range ⋈
address) and "which windows overlap". Spark has no native range-join
optimization: a plain inequality join plans as BroadcastNestedLoopJoin
(small side) or a cartesian product — O(|L|·|R|) comparisons, dead at
web scale.

Spark-first shape: **binning**. Chop the number line into fixed-width
bins; an interval is replicated to every bin it touches, a point lands
in exactly one bin; the join becomes an equi-join on (keys…, bin) with
the exact predicate re-checked as a residual filter. Catalyst then
plans a plain shuffled hash / sort-merge join keyed by bin — partial
shuffles, AQE skew handling, the works. This is the same design
Databricks ships as `range_join` hints and Flink as interval joins;
here it is pure DataFrame composition.

De-duplication is by construction, never by `.distinct()`:
  - a point has ONE bin, so point⋈interval emits each match once;
  - an overlapping interval pair is attributed to exactly one bin —
    the bin of `greatest(l.start, r.start)` (the overlap's left edge),
    which both sides replicated to — so overlap⋈ emits each pair once.
A trailing `.distinct()` would be a second full shuffle of the output;
the responsibility-bin trick removes it.

Choosing `bin_width`: an interval spanning B bins costs B replica rows
(sequence() is JVM-side, rows stay narrow), a bin containing N_l × N_r
rows costs N_l·N_r residual checks. Set it near the median interval
length; order-of-magnitude errors degrade smoothly (more replicas OR
more residual work, never wrong answers).

Intervals are half-open `[start, end)` throughout — the convention that
makes adjacent windows non-overlapping. Degenerate intervals
(start >= end) match nothing and are filtered before the explode
(Spark's `sequence(a, b)` DESCENDS when a > b — an ascending guard is
mandatory, see NOTES.md).

No analog in the reference (its queries are point lookups and rollups:
Lcl.EventLog/Jobs/EventJob.Queries.cs); this family is part of the
large-scale log-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bin(c: Column, width: int) -> Column:
    return F.floor(c / F.lit(width)).cast("long")


def _bins_touched(start: Column, end: Column, width: int) -> Column:
    """All bin ids a half-open [start, end) interval touches. Caller
    guarantees start < end, so the sequence ascends."""
    return F.sequence(_bin(start, width), _bin(end, width))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join every point to the interval(s) containing it:
    `start <= point < end` (+ equality on `keys`). Output columns =
    points.* then intervals.* minus the join keys; a point inside k
    intervals emits k rows; with how='left', an uncontained point
    emits one row with null interval columns.

    Plan shape: intervals explode to their touched bins (narrow,
    JVM-side `sequence`), points compute their single bin (narrow),
    then ONE equi-join on (keys…, bin) with the exact containment
    predicate as a residual condition. No distinct needed — a point
    has exactly one bin. Scale: shuffle is keyed by (keys…, bin), so
    time-skew spreads across bins; a mega-interval costs
    span/bin_width replica rows, nothing more.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    dup = [c for c in intervals.columns if c in points.columns and c not in keys]
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {dup}")
    # aliases (not df["col"] references) so both sides may derive from
    # the same source table without AMBIGUOUS_SELF_JOIN
    iv = (
        intervals.where(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__bin",
            F.explode(_bins_touched(F.col(start_col), F.col(end_col), bin_width)),
        )
        .alias("__iv")
    )
    pt = points.withColumn("__bin", _bin(F.col(point_col), bin_width)).alias("__pt")
    c = lambda side, name: F.col(f"{side}.{name}")  # noqa: E731
    cond = c("__pt", "__bin") == c("__iv", "__bin")
    for k in keys:
        cond = cond & (c("__pt", k) == c("__iv", k))
    cond = (
        cond
        & (c("__pt", point_col) >= c("__iv", start_col))
        & (c("__pt", point_col) < c("__iv", end_col))
    )
    out_cols = [c("__pt", x) for x in points.columns] + [
        c("__iv", x) for x in intervals.columns if x not in keys
    ]
    return pt.join(iv, cond, how).select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bounds: tuple[str, str, str, str],
    bin_width: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """All (left, right) interval pairs that overlap:
    `l.start < r.end AND r.start < l.end` (half-open), + equality on
    `keys`. Output = left.* then right.* minus the join keys.

    Each pair is emitted exactly once WITHOUT a distinct: both sides
    replicate to every touched bin, but the join additionally requires
    the bin to be the one containing `greatest(l.start, r.start)` —
    the overlap's left edge, which lies inside both intervals, so both
    sides are guaranteed to have a replica there and no other bin
    qualifies. One equi-join shuffle keyed by (keys…, bin); zero
    post-join shuffles.
    """
    ls, le, rs, re_ = bounds
    dup = [c for c in right.columns if c in left.columns and c not in keys]
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {dup}")
    lv = (
        left.where(F.col(ls) < F.col(le))
        .withColumn("__bin", F.explode(_bins_touched(F.col(ls), F.col(le), bin_width)))
        .alias("__lv")
    )
    rv = (
        right.where(F.col(rs) < F.col(re_))
        .withColumn(
            "__bin", F.explode(_bins_touched(F.col(rs), F.col(re_), bin_width))
        )
        .alias("__rv")
    )
    c = lambda side, name: F.col(f"{side}.{name}")  # noqa: E731
    cond = c("__lv", "__bin") == c("__rv", "__bin")
    for k in keys:
        cond = cond & (c("__lv", k) == c("__rv", k))
    cond = (
        cond
        & (c("__lv", ls) < c("__rv", re_))
        & (c("__rv", rs) < c("__lv", le))
        # responsibility bin: the one holding the overlap's left edge
        & (
            c("__lv", "__bin")
            == _bin(F.greatest(c("__lv", ls), c("__rv", rs)), bin_width)
        )
    )
    out_cols = [c("__lv", x) for x in left.columns] + [
        c("__rv", x) for x in right.columns if x not in keys
    ]
    return lv.join(rv, cond, "inner").select(*out_cols)


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    keys: tuple[str, ...] = (),
    merge_adjacent: bool = True,
) -> DataFrame:
    """Coalesce overlapping (and, by default, exactly-adjacent)
    half-open intervals per key group into maximal disjoint intervals;
    output (keys…, start, end, n_merged).

    Gaps-and-islands in ONE keyed shuffle: a per-key window ordered by
    (start, end) computes the running max of previous ends; a new
    island starts where start > running_max (>= when adjacent
    intervals stay separate); the island id is a running sum of those
    flags over the SAME window sort, and the final groupBy
    (keys…, island) reuses the keys-hash partitioning (partitioning on
    a subset of the grouping keys satisfies the aggregate's required
    distribution — no second exchange).

    Degenerate rows (start >= end) are dropped first.

    Scale note: with empty `keys` the window is a single partition —
    exact global island numbering needs a total order. Production use
    is keyed (per user / host / tenant); for an unkeyed global merge
    at scale, pre-merge per coarse time bucket, then merge the
    bucket-boundary islands.
    """
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        if keys
        else Window.partitionBy(F.lit(0))
    )
    order = w.orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (
        F.col(start_col) > prev_max_end
        if merge_adjacent
        else F.col(start_col) >= prev_max_end
    )
    flagged = (
        df.where(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__new",
            F.when(prev_max_end.isNull() | is_new, F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        flagged.groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )
