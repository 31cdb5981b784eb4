"""Event-log analytics operators: sessionization boundaries, path
truncation, funnel ordering, cohort offsets, as-of inclusivity/ties,
anomaly warm-up — all against hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.eventlog import (
    asof_join,
    funnel,
    rate_anomaly,
    retention_cohorts,
    session_paths,
    session_stats,
    sessionize,
)


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    # user 1: three events, gaps 100s then 2000s (gap=1800 splits there).
    # user 2: two events at the SAME ts (tie broken by event_id), then
    #         one exactly gap seconds later (boundary: stays in session).
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "view", 1.0),
        (2, _ts("2024-01-01 00:01:40"), 1, "click", 2.0),
        (3, _ts("2024-01-01 00:35:00"), 1, "purchase", 3.0),
        (4, _ts("2024-01-01 10:00:00"), 2, "view", 4.0),
        (5, _ts("2024-01-01 10:00:00"), 2, "click", 5.0),
        (6, _ts("2024-01-01 10:30:00"), 2, "purchase", 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_sessionize_gap_and_boundary(ev):
    s = sessionize(ev, gap_seconds=1800)
    got = {r.event_id: r.session_idx for r in s.collect()}
    # user 1: 100s gap stays, 2000s gap splits
    assert got[1] == 0 and got[2] == 0 and got[3] == 1
    # user 2: equal-ts tie + exactly-1800s gap both stay in session 0
    assert got[4] == 0 and got[5] == 0 and got[6] == 0


def test_session_stats_first_last_and_duration(ev):
    st = session_stats(sessionize(ev, gap_seconds=1800))
    rows = {(r.user_id, r.session_idx): r for r in st.collect()}
    u2 = rows[(2, 0)]
    assert u2.n_events == 3 and u2.n_types == 3
    assert u2.first_type == "view"  # tie at 10:00:00 → lower event_id
    assert u2.last_type == "purchase"
    assert u2.duration_secs == 1800
    u1b = rows[(1, 1)]
    assert u1b.n_events == 1 and u1b.duration_secs == 0


def test_session_paths_order_and_truncation(ev, spark):
    p = session_paths(sessionize(ev, gap_seconds=1800), k=10, max_len=2)
    got = {r.path: (r.n_sessions, r.path_len) for r in p.collect()}
    # user1 session0 = view>click, user2 session0 truncated to view>click
    assert got["view>click"] == (2, 2)
    assert got["purchase"] == (1, 1)


def test_funnel_requires_order(spark):
    # user 10 completes A→B→C in order; user 11 has B before A only;
    # user 12 has A then C (skips B → stops at stage 1).
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 10, "A"),
        (2, _ts("2024-01-01 00:01:00"), 10, "B"),
        (3, _ts("2024-01-01 00:02:00"), 10, "C"),
        (4, _ts("2024-01-01 00:00:00"), 11, "B"),
        (5, _ts("2024-01-01 00:01:00"), 11, "A"),
        (6, _ts("2024-01-01 00:00:00"), 12, "A"),
        (7, _ts("2024-01-01 00:01:00"), 12, "C"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {r.stage: r.n_keys for r in funnel(ev, ["A", "B", "C"]).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_same_ts_tie_counts(spark):
    # B at the SAME ts as A but higher event_id → strictly greater
    # (ts, id) struct, so it counts.
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "A"),
        (2, _ts("2024-01-01 00:00:00"), 1, "B"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {r.stage: r.n_keys for r in funnel(ev, ["A", "B"]).collect()}
    assert got == {1: 1, 2: 1}


def test_retention_offsets(spark):
    # user 1 active period 0 and 2; user 2 first active period 1.
    day = 86400 * 7
    rows = [
        (1, datetime.utcfromtimestamp(10), 1),
        (2, datetime.utcfromtimestamp(2 * day + 5), 1),
        (3, datetime.utcfromtimestamp(day + 5), 2),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    got = {
        (r.cohort_period, r.offset_periods): r.n_active
        for r in retention_cohorts(ev, period_days=7).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_asof_inclusive_and_latest_state(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:30"), 1),
            (2, _ts("2024-01-01 00:01:00"), 1),  # == state ts → inclusive
            (3, _ts("2024-01-01 00:00:00"), 2),  # before any state → null
        ],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 10.0),
            (1, _ts("2024-01-01 00:01:00"), 20.0),
        ],
        "user_id long, ts timestamp_ntz, sval double",
    )
    out = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, "user_id", "ts", "sval").collect()
    }
    assert out[1] == 10.0
    assert out[2] == 20.0  # at-or-before is inclusive
    assert out[3] is None


def test_rate_anomaly_warmup_and_spike(spark):
    # 8 calm days of 10 events then a 100-event day 9 for one type.
    rows = []
    eid = 0
    for d in range(9):
        n = 100 if d == 8 else 10
        for i in range(n):
            eid += 1
            rows.append((eid, datetime.utcfromtimestamp(d * 86400 + i), "t"))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, event_type string")
    out = rate_anomaly(ev, bucket_seconds=86400, trailing=7, z_threshold=3.0)
    rs = sorted(out.collect(), key=lambda r: r.bucket_start)
    assert rs[0].z is None and not rs[0].is_anomaly  # no trailing window
    assert rs[1].z is None  # single trailing bucket → stddev null
    # constant trailing counts → zero variance → z null, not an error
    assert rs[7].z is None
    assert rs[8].is_anomaly is False or rs[8].z is None  # zero-variance guard
    # make variance non-zero: perturb one day and re-check the spike flags
    rows[0] = (0, datetime.utcfromtimestamp(0), "t")
    ev2 = spark.createDataFrame(
        rows + [(9999, datetime.utcfromtimestamp(3 * 86400 + 500), "t")],
        "event_id long, ts timestamp_ntz, event_type string",
    )
    out2 = rate_anomaly(ev2, bucket_seconds=86400, trailing=7, z_threshold=3.0)
    last = sorted(out2.collect(), key=lambda r: r.bucket_start)[-1]
    assert last.is_anomaly and last.z > 3.0


def test_funnel_empty_step_returns_zero(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 1, "A")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    got = {r.stage: r.n_keys for r in funnel(ev, ["A", "missing"]).collect()}
    assert got == {1: 1, 2: 0}


# ---- time-decayed counts -----------------------------------------------------

from eventanalysis_spark.operators.eventlog import decayed_counts  # noqa: E402


def test_decayed_counts_halving_and_cutoff(spark):
    rows = [
        (1, _ts("2024-01-02 00:00:00"), "a"),   # age 0 at ref -> 1.0
        (2, _ts("2024-01-01 00:00:00"), "a"),   # age 86400 = hl -> 0.5
        (3, _ts("2023-12-31 00:00:00"), "a"),   # 2 half-lives -> 0.25
        (4, _ts("2024-01-03 00:00:00"), "a"),   # AFTER ref: excluded
        (5, _ts("2024-01-02 00:00:00"), "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, k string")
    got = {
        r.k: (r.decayed_count, r.n_events)
        for r in decayed_counts(
            df, "ts", "2024-01-02 00:00:00", 86400.0, keys=("k",)
        ).collect()
    }
    assert got == {"a": (1.75, 3), "b": (1.0, 1)}


def test_decayed_counts_weighted(spark):
    rows = [(1, _ts("2024-01-02 00:00:00"), 3.0), (2, _ts("2024-01-01 00:00:00"), 4.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, v double")
    [r] = decayed_counts(df, "ts", "2024-01-02 00:00:00", 86400.0, weight_col="v").collect()
    assert (r.decayed_count, r.n_events) == (5.0, 2)  # 3 + 4*0.5


# ---- rolling distinct actives --------------------------------------------------

from eventanalysis_spark.operators.eventlog import rolling_active  # noqa: E402


def test_rolling_active_dau_wau(spark):
    day = 86400
    rows = [
        # day 0: users 1,2 ; day 1: user 1 ; day 3: user 3
        (1, _ts("2024-01-01 05:00:00"), 1),
        (2, _ts("2024-01-01 06:00:00"), 2),
        (3, _ts("2024-01-01 07:00:00"), 1),   # same user same day: dedup
        (4, _ts("2024-01-02 05:00:00"), 1),
        (5, _ts("2024-01-04 05:00:00"), 3),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    got = {
        r.bucket_start // day: (r.n_active, r.n_active_window)
        for r in rolling_active(df, window_buckets=3).collect()
    }
    d0 = 19723  # 2024-01-01 in epoch days
    # window=3 trailing days incl. current
    assert got[d0] == (2, 2)          # users {1,2}
    assert got[d0 + 1] == (1, 2)      # day: {1}; window d-2..d: {1,2}
    assert got[d0 + 3] == (1, 2)      # day: {3}; window: {1 (day1), 3}
    assert set(got) == {d0, d0 + 1, d0 + 3}  # no echo-only days


def test_rolling_active_window1_equals_dau(spark):
    rows = [(i, _ts("2024-01-0%d 01:00:00" % (1 + i % 3)), i % 4) for i in range(12)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    got = rolling_active(df, window_buckets=1).collect()
    assert all(r.n_active == r.n_active_window for r in got)


from eventanalysis_spark.operators.eventlog import (  # noqa: E402
    daily_trend,
    group_trend,
)


def test_group_trend_exact_line(spark):
    # y = 2x + 1 exactly: slope 2, intercept 1, r² = 1 — all exact
    df = spark.createDataFrame(
        [("g", x, 2 * x + 1) for x in range(5)], "g string, x long, y long"
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert (r.n_points, r.slope, r.intercept, r.r2) == (5, 2.0, 1.0, 1.0)


def test_group_trend_flat_series_and_degenerates(spark):
    df = spark.createDataFrame(
        [("flat", x, 7) for x in range(4)]       # zero y-variance
        + [("single", 3, 9)]                     # n < 2
        + [("novar", 2, 1), ("novar", 2, 5)],    # zero x-variance
        "g string, x long, y long",
    )
    got = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    f = got["flat"]
    assert (f.slope, f.intercept) == (0.0, 7.0) and f.r2 == -1e9
    s = got["single"]
    assert (s.slope, s.intercept, s.r2) == (-1e9, -1e9, -1e9)
    n = got["novar"]
    assert (n.slope, n.intercept, n.r2) == (-1e9, -1e9, -1e9)


def test_group_trend_partition_invariance(spark):
    import random

    rnd = random.Random(7)
    rows = [("g", x, rnd.randrange(100)) for x in range(50)]
    df1 = spark.createDataFrame(rows, "g string, x long, y long").repartition(1)
    df8 = spark.createDataFrame(
        list(reversed(rows)), "g string, x long, y long"
    ).repartition(8)
    a = group_trend(df1, ["g"], "x", "y").collect()[0]
    b = group_trend(df8, ["g"], "x", "y").collect()[0]
    # LONG moment sums: bit-identical regardless of partitioning/order
    assert (a.slope, a.intercept, a.r2) == (b.slope, b.intercept, b.r2)


def test_daily_trend_counts_per_day(spark):
    # day 0: 1 event, day 1: 2, day 2: 3 → slope exactly 1
    rows = []
    eid = 0
    for day, k in [(1, 1), (2, 2), (3, 3)]:
        for _ in range(k):
            rows.append((eid, datetime(2024, 1, day, 12, 0, 0), "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string"
    )
    r = daily_trend(df, ["event_type"], ts_col="ts").collect()[0]
    assert (r.event_type, r.n_points, r.slope, r.r2) == ("click", 3, 1.0, 1.0)
