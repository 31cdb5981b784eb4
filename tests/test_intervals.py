"""Interval joins: binned results must equal the naive inequality-join
truth on every shape that stresses the binning — intervals spanning
many bins, points on half-open boundaries, responsibility-bin dedup,
degenerate intervals, left-join misses, adjacency in merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.intervals import (
    interval_overlap_join,
    merge_intervals,
    point_in_interval_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    # intervals per key: include one spanning many bins (0..1000 at
    # width 10 = 101 bins), zero-length (70,70), inverted (90,80),
    # touching pair (100,200)+(200,300), duplicate bounds.
    iv = spark.createDataFrame(
        [
            (1, 10, 0, 1000),
            (1, 11, 50, 60),
            (1, 12, 70, 70),
            (1, 13, 90, 80),
            (1, 14, 100, 200),
            (1, 15, 200, 300),
            (2, 20, 55, 65),
            (2, 21, 55, 65),
        ],
        "k long, iv_id long, s long, e long",
    )
    # points: boundary hits (50 in, 60 out of [50,60)), outside all, other key
    pt = spark.createDataFrame(
        [
            (1, 100, 50),
            (1, 101, 60),
            (1, 102, 200),
            (1, 103, 5000),
            (2, 104, 55),
            (3, 105, 55),
        ],
        "k long, pt_id long, p long",
    )
    return pt, iv


def _naive_points(pt, iv):
    return (
        pt.alias("a")
        .join(
            iv.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.p") >= F.col("b.s"))
            & (F.col("a.p") < F.col("b.e")),
        )
        .select("a.pt_id", "b.iv_id")
    )


@pytest.mark.parametrize("width", [1, 7, 10, 1000])
def test_point_join_matches_naive(frames, width):
    pt, iv = frames
    got = point_in_interval_join(
        pt, iv, "p", "s", "e", bin_width=width, keys=("k",)
    ).select("pt_id", "iv_id")
    want = _naive_points(pt, iv)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_point_join_no_duplicate_matches(frames):
    # the 101-bin interval must still match point 200 exactly once
    pt, iv = frames
    got = point_in_interval_join(pt, iv, "p", "s", "e", bin_width=10, keys=("k",))
    rows = got.where((F.col("pt_id") == 102) & (F.col("iv_id") == 10)).count()
    assert rows == 1


def test_point_join_left_keeps_misses(frames):
    pt, iv = frames
    got = point_in_interval_join(
        pt, iv, "p", "s", "e", bin_width=10, keys=("k",), how="left"
    )
    miss = {r.pt_id for r in got.where(F.col("iv_id").isNull()).collect()}
    assert miss == {103, 105}  # outside all / key with no intervals
    # half-open: p=60 misses [50,60) but sits inside [0,1000)
    m101 = {r.iv_id for r in got.where(F.col("pt_id") == 101).collect()}
    assert 11 not in m101 and 10 in m101


def _naive_overlap(lv, rv):
    # half-open semantics: empty/inverted intervals overlap nothing,
    # which the raw l.s < r.e AND r.s < l.e formula alone gets wrong
    lv = lv.where(F.col("s") < F.col("e"))
    rv = rv.where(F.col("s2") < F.col("e2"))
    return (
        lv.alias("a")
        .join(
            rv.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.s") < F.col("b.e2"))
            & (F.col("b.s2") < F.col("a.e")),
        )
        .select("a.iv_id", "b.r_id")
    )


@pytest.mark.parametrize("width", [3, 10, 500])
def test_overlap_join_matches_naive(frames, width):
    _, iv = frames
    rv = spark_right(iv)
    got = interval_overlap_join(
        iv, rv, ("s", "e", "s2", "e2"), bin_width=width, keys=("k",)
    ).select("iv_id", "r_id")
    want = _naive_overlap(iv, rv)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def spark_right(iv):
    # right side derived from the SAME source frame (self-join path):
    # shift bounds so overlaps are nontrivial; rename to r columns
    return iv.select(
        "k",
        (F.col("iv_id") + 1000).alias("r_id"),
        (F.col("s") + 5).alias("s2"),
        (F.col("e") + 5).alias("e2"),
    )


def test_overlap_touching_is_not_overlap(spark):
    lv = spark.createDataFrame([(1, 1, 100, 200)], "k long, iv_id long, s long, e long")
    rv = spark.createDataFrame([(1, 2, 200, 300)], "k long, r_id long, s2 long, e2 long")
    got = interval_overlap_join(lv, rv, ("s", "e", "s2", "e2"), bin_width=50, keys=("k",))
    assert got.count() == 0


def test_merge_intervals_islands(spark):
    rows = [
        (1, 0, 10),     # chain: [0,10)+[10,20) adjacent, [15,30) overlap
        (1, 10, 20),
        (1, 15, 30),
        (1, 40, 50),    # separate island
        (1, 45, 45),    # degenerate, dropped
        (2, 0, 100),    # containment: [20,30) inside
        (2, 20, 30),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        map(tuple, merge_intervals(df, "s", "e", keys=("k",)).collect())
    )
    assert got == [(1, 0, 30, 3), (1, 40, 50, 1), (2, 0, 100, 2)]


def test_merge_adjacent_off(spark):
    df = spark.createDataFrame([(1, 0, 10), (1, 10, 20)], "k long, s long, e long")
    got = sorted(
        map(tuple, merge_intervals(df, "s", "e", keys=("k",), merge_adjacent=False).collect())
    )
    assert got == [(1, 0, 10, 1), (1, 10, 20, 1)]
