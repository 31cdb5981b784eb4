"""Event-log analytics: sessionization, paths, funnels, cohorts, as-of
state enrichment, and rate anomalies over an (id, ts, key, type, value)
event stream.

The reference's query surface stops at per-type counts, rollups and
first/last probes (`/root/reference/eventtool/AppOverview*.fs`,
`AppDiag.fs`); a production log pipeline built on the same table also
needs the classic session/funnel/cohort layer — these operators are the
log-analytics counterpart of the webtext curation family, implemented
Spark-first:

- every window here is PARTITIONED BY the entity key (user/session/
  type) and never global — per-entity history is bounded, so the sort
  inside each hash-partition stays small and there is exactly ONE
  shuffle per operator (by that key);
- funnels use chained filtered aggregates (stage tables are per-user
  aggregates, partial-agg'd map-side before the shuffle) instead of
  per-user collect_list folds, so a mega-user cannot blow a task;
- as-of join is the union + keyed-window `last(ignorenulls)` form — no
  range-explosion join, no per-key loop; DuckDB's native ASOF JOIN is
  the oracle twin;
- ties are always broken by (ts, event_id), never by ts alone, so every
  result is deterministic and cross-engine hash-stable.

All timestamps are compared as (ts, id) structs; a gap of EXACTLY
`gap_seconds` stays inside the session (strictly-greater starts a new
one), matching the strict `>` in the oracle SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a per-key session index to every event: a new session
    starts when the gap since the key's previous event is STRICTLY
    greater than `gap_seconds`. Adds `session_idx` (0-based per key).

    One shuffle (by key); the lag + running-sum windows share the same
    (key, ts, id) sort so Catalyst plans a single Sort under one
    Exchange."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("__new", is_new).withColumn(
        "session_idx",
        (F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "long"
        ),
    ).drop("__new")


def session_stats(
    sessionized: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per (key, session_idx): start/end, duration_secs,
    n_events, n_types, first/last event type (ties → lowest/highest id).
    Single hash aggregate, map-side partial."""
    return sessionized.groupBy(key_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_secs"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(type_col).alias("n_types"),
        F.min_by(type_col, F.struct(ts_col, id_col)).alias("first_type"),
        F.max_by(type_col, F.struct(ts_col, id_col)).alias("last_type"),
    )


def session_paths(
    sessionized: DataFrame,
    k: int = 20,
    max_len: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-k most common session paths: the (ts, id)-ordered event-type
    sequence of each session, truncated to the first `max_len` steps and
    joined with '>'. Returns (path, n_sessions, path_len) ordered by
    count desc then path.

    collect_list here is bounded by the session (gap-bounded), not the
    user's whole history, and the truncation happens before the count
    aggregate so hot paths partial-aggregate map-side."""
    per_session = sessionized.groupBy(key_col, "session_idx").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ts_col, id_col, type_col))
                    ),
                    lambda s: s[type_col],
                ),
                1,
                max_len,
            ),
            ">",
        ).alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .withColumn(
            "path_len", (F.size(F.split(F.col("path"), ">", -1))).cast("int")
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: stage i counts keys whose first step-1 event is
    followed (strictly later in (ts, id) order) by a step-2 event,
    ... through step i. Returns (stage, step, n_keys) with stage 1-based.

    Shape: stage 1 is a filtered min-struct aggregate; each later stage
    joins the (small, per-key) previous stage table to the events
    filtered to just that step's type BEFORE the shuffle, then takes the
    min (ts, id) strictly greater than the previous stage's. No
    collect_list — a key with 10^6 events never materializes an array."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    prev = None
    for i, step in enumerate(steps):
        stage_events = events.where(F.col(type_col) == step).select(
            F.col(key_col).alias("k"),
            F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id")).alias(
                "tk"
            ),
        )
        if prev is None:
            stage = stage_events.groupBy("k").agg(F.min("tk").alias("tk"))
        else:
            stage = (
                stage_events.alias("e")
                .join(prev.alias("p"), "k")
                .where(F.col("e.tk") > F.col("p.tk"))
                .groupBy("k")
                .agg(F.min(F.col("e.tk")).alias("tk"))
            )
        stage = stage.persist()
        counts.append(
            stage.agg(
                F.lit(i + 1).alias("stage"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_keys"),
            )
        )
        prev = stage
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stage")


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: cohort = the key's first active period
    (floor(days-since-epoch / period_days)), offset = periods since the
    cohort period; counts DISTINCT keys active per (cohort, offset).

    Two hash aggregates + one key-partitioned min window — the (key,
    period) distinct collapses before the final count, so the output is
    #cohorts × #offsets no matter how many raw events there are."""
    day = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(86400 * period_days)
    ).cast("long")
    kp = events.select(F.col(key_col).alias("k"), day.alias("p")).distinct()
    w = Window.partitionBy("k")
    with_cohort = kp.withColumn("cohort_p", F.min("p").over(w))
    return (
        with_cohort.groupBy(
            F.col("cohort_p").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).alias("offset_periods"),
        )
        .agg(F.countDistinct("k").alias("n_active"))
        .orderBy("cohort_period", "offset_periods")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For every left row, attach `value_col` from the LATEST right row
    with right.ts <= left.ts on the same key (at-or-before, inclusive).
    Right must be unique per (key, ts) — pre-collapse with max_by first.

    Union-and-carry form: tag both sides, sort each key partition by
    (ts, side) with the right/state row FIRST at equal ts, then carry
    the last non-null state value forward. One shuffle on the key; no
    range join, no explosion when a key has many state rows."""
    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__state"),
    )
    r2 = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (key_col, ts_col)
        ],
        F.lit(0).alias("__side"),
        F.col(value_col).alias("__state"),
    ).select(*lcols, "__side", "__state")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l2.unionByName(r2)
        .withColumn(out_col, F.last("__state", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .drop("__side", "__state")
    )


def rate_anomaly(
    events: DataFrame,
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z_threshold: float = 3.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (type, time-bucket) event-rate z-score against the trailing
    `trailing` buckets (exclusive of the current one): z = (cnt - avg) /
    std, null when fewer than 2 trailing buckets or zero variance.
    Returns (event_type, bucket_start, n_events, trail_avg, z,
    is_anomaly). Observed buckets only (gaps are not zero-filled; at
    web scale a hot type has no gaps, and zero-filling would need a
    dense time spine — compose with a spine table if required).

    One hash aggregate into #types × #buckets rows, then a type-
    partitioned window over that tiny frame."""
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds))
        * F.lit(bucket_seconds)
    ).cast("long")
    per_bucket = events.groupBy(
        F.col(type_col).alias("event_type"), bucket.alias("bucket_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    trail_avg = F.avg("n_events").over(w)
    trail_std = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    z = F.when(
        trail_std.isNotNull() & (trail_std > 0),
        (F.col("n_events") - trail_avg) / trail_std,
    )
    return (
        per_bucket.withColumn("trail_avg", trail_avg)
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.col("z") > F.lit(z_threshold), F.lit(False)),
        )
        .orderBy("event_type", "bucket_start")
    )


def decayed_counts(
    df: DataFrame,
    ts_col: str,
    ref_ts: str,
    half_life_seconds: float,
    keys: tuple[str, ...] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Exponentially time-decayed (weighted) counts per key:
    sum over rows of w · 2^(−(ref−t)/half_life) — the recency-weighted
    volume used for crawl scheduling, host-rate scoring, and trending
    detection. A row `half_life` seconds old counts half as much.

    `ref_ts` is an explicit ISO timestamp string (never wall-clock:
    results must be reproducible). Rows after `ref_ts` are excluded —
    a decayed count is a statement about the past of its reference
    point. One map-side-partial hash aggregate; the decay factor is a
    narrow projection (pow), no Python, no window.

    Output (keys…, decayed_count, n_events); decayed_count rounded to
    6dp (double-sum order + pow ULPs differ across engines at that
    scale, never above it)."""
    ref = F.to_timestamp(F.lit(ref_ts))
    age = F.unix_timestamp(ref) - F.unix_timestamp(F.col(ts_col))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    decay = w * F.pow(F.lit(2.0), -age.cast("double") / F.lit(float(half_life_seconds)))
    return (
        df.where(F.col(ts_col) <= ref)
        .groupBy(*keys)
        .agg(
            F.round(F.sum(decay), 6).alias("decayed_count"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rolling_active(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_buckets: int = 7,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """DAU/WAU-style rolling distinct actives: for every time bucket
    present in the data, the distinct `key_col` count in that bucket
    (n_active) and in the trailing `window_buckets` buckets ending
    there (n_active_window). The standard engagement rollup.

    Distinct-over-a-sliding-window does NOT decompose like a sum, so
    the window is materialized by replication: each (bucket, key) pair
    contributes to the `window_buckets` window-ends it falls in — a
    narrow JVM-side explode of a ≤window_buckets-element sequence —
    then ONE distinct aggregate keyed by (window_end, key) and a count
    per window_end. The replication factor is the window length (a
    constant), the shuffle key embeds the bucket so hot keys spread,
    and per-(bucket,key) dedup happens BEFORE replication so a chatty
    user costs window_buckets rows, not events × window_buckets.
    Window-ends with no bucket of their own in the data (pure trailing
    echoes) are dropped by a broadcast semi-join on observed buckets."""
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    pairs = df.select(b.alias("__b"), F.col(key_col).alias("__k")).distinct()
    days = pairs.select("__b").distinct()
    dau = pairs.groupBy("__b").agg(F.count(F.lit(1)).alias("n_active"))
    wau = (
        pairs.select(
            F.explode(
                F.sequence(F.col("__b"), F.col("__b") + (window_buckets - 1))
            ).alias("__w"),
            "__k",
        )
        .distinct()
        .join(F.broadcast(days), F.col("__w") == days["__b"])
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("n_active_window"))
    )
    return (
        dau.join(wau, dau["__b"] == wau["__w"])
        .select(
            (dau["__b"] * bucket_seconds).alias("bucket_start"),
            "n_active",
            "n_active_window",
        )
    )


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    sentinel: float = -1e9,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line over INTEGER-valued
    (x, y) points: (group..., n_points, slope, intercept, r2).

        slope = Sxy/Sxx   Sxy = n·Σxy − Σx·Σy,  Sxx = n·Σx² − (Σx)²
        intercept = (Σy − slope·Σx)/n
        r²    = Sxy² / (Sxx·Syy)

    Cross-engine exactness: with integer x and y every moment sum
    (Σx, Σy, Σxy, Σx², Σy²) is LONG arithmetic — exact and
    partition-order independent — so the only floating-point ops are
    the final divisions/products, identical in any engine. (Spark's
    built-in regr_slope keeps running DOUBLE sums: partition-order
    noise in the last ulp. This form has none.) One map-side-partial
    hash aggregate per group; no window, no second pass.

    Feed an AGGREGATED series (one row per x, e.g. daily counts), not
    raw events: correctness needs n·Σx² and n·Σxy to stay under 2^63 —
    with day-index x (~10⁴) and count y that holds to ~10⁶ points per
    group, far past any real time series.

    Degenerate groups use `sentinel` (NOTES nullable-double rule):
    n < 2 or zero x-variance → slope/intercept/r2 = sentinel; zero
    y-variance (flat series, perfectly fit) → slope/intercept exact,
    r2 = sentinel (SST = 0 leaves r² undefined)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("n_points")
    big_sxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    big_sxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    big_syy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = big_sxy.cast("double") / big_sxx.cast("double")
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / n.cast("double")
    # cast BEFORE squaring: Sxy² overflows long; the double square of an
    # exactly-represented long is itself deterministic
    r2 = (big_sxy.cast("double") * big_sxy.cast("double")) / (
        big_sxx.cast("double") * big_syy.cast("double")
    )
    degenerate = (n < 2) | (big_sxx == 0)
    return m.select(
        *group_cols,
        "n_points",
        F.when(degenerate, F.lit(sentinel)).otherwise(slope).alias("slope"),
        F.when(degenerate, F.lit(sentinel)).otherwise(intercept).alias(
            "intercept"
        ),
        F.when(degenerate | (big_syy == 0), F.lit(sentinel))
        .otherwise(r2)
        .alias("r2"),
    )


def daily_trend(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    epoch: str = "2020-01-01",
    sentinel: float = -1e9,
) -> DataFrame:
    """Traffic-trend detection per group: roll events up to daily counts
    and fit the OLS line count ~ day (group_trend). x is the day index
    from a FIXED epoch (shift changes only the intercept, and a global
    constant keeps the long moments small). The classic log-pipeline
    question — which event classes / hosts are growing or decaying —
    as two hash aggregates, no window, no collect."""
    day_idx = F.datediff(
        F.to_date(ts_col), F.to_date(F.lit(epoch))
    ).alias("__day")
    daily = df.select(*group_cols, day_idx).groupBy(*group_cols, "__day").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return group_trend(daily, group_cols, "__day", "__n", sentinel=sentinel)
