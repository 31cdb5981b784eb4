"""Exact quantiles: must equal the type-1 (inverted-CDF) quantile of the
sorted list — global two-phase path and grouped window path, duplicate
heavy values, prob=1.0 → max, partitioning invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.quantiles import (
    exact_quantiles,
    quantile_thresholds,
)


def _type1(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


@pytest.fixture(scope="module")
def df(spark):
    # skewed: value 7 repeated 400x, plus 0..199 once each
    vals = [7] * 400 + list(range(200))
    return spark.createDataFrame(
        [(v, "g%d" % (i % 3)) for i, v in enumerate(vals)], "v long, g string"
    ).repartition(16)


PROBS = [0.01, 0.25, 0.5, 0.75, 0.9, 1.0]


def test_global_matches_sorted_list(df):
    vals = [r.v for r in df.collect()]
    got = {r.prob: r.value for r in exact_quantiles(df, "v", PROBS).collect()}
    assert got == {q: _type1(vals, q) for q in PROBS}


def test_global_partitioning_invariance(df):
    a = exact_quantiles(df, "v", PROBS, num_partitions=2).collect()
    b = exact_quantiles(df.repartition(64), "v", PROBS, num_partitions=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_grouped_matches_sorted_list(df):
    by_g = {}
    for r in df.collect():
        by_g.setdefault(r.g, []).append(r.v)
    got = {}
    for r in exact_quantiles(df, "v", PROBS, keys=("g",)).collect():
        got[(r.g, r.prob)] = r.value
    want = {(g, q): _type1(vs, q) for g, vs in by_g.items() for q in PROBS}
    assert got == want


def test_single_value_and_p1(spark):
    one = spark.createDataFrame([(42,)] * 5, "v long")
    got = {r.prob: r.value for r in exact_quantiles(one, "v", [0.5, 1.0]).collect()}
    assert got == {0.5: 42, 1.0: 42}


def test_nulls_ignored(spark):
    d = spark.createDataFrame([(1,), (None,), (3,), (None,)], "v long")
    [r] = exact_quantiles(d, "v", [1.0]).collect()
    assert r.value == 3


def test_thresholds(df):
    vals = [r.v for r in df.collect()]
    [r] = quantile_thresholds(df, "v", 0.25, 0.9).collect()
    assert (r.lo_value, r.hi_value) == (_type1(vals, 0.25), _type1(vals, 0.9))


def test_bad_probs_rejected(df):
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.0])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
