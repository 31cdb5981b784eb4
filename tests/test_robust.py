"""Robust signals: entropy against hand-computed values and invariants,
MAD outliers against hand-built distributions incl. the degenerate
MAD=0 group and the mean-dragging mega-value a stddev rule would miss."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.robust import char_entropy, mad_outliers


def test_char_entropy_hand_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(docs).collect()}
    assert got[1] == (4, 0.0)                      # single char: H = 0
    assert got[2] == (4, round(math.log(2), 6))    # two equal chars: ln 2
    assert got[3] == (4, round(math.log(4), 6))    # uniform over 4: ln 4
    assert 4 not in got                            # empty text excluded


def test_char_entropy_order_invariance(spark):
    docs = spark.createDataFrame(
        [(1, "aabbcc"), (2, "abcabc"), (3, "ccbbaa")], "doc_id long, text string"
    )
    got = [r.entropy for r in char_entropy(docs).orderBy("doc_id").collect()]
    assert got[0] == got[1] == got[2]  # entropy sees the histogram only


def test_mad_outliers_flags_mega_value_not_dragged(spark):
    # 100 values near 50 plus one at 10^6: the mega-value must be the ONLY
    # outlier (a mean/std rule at z=3.5 would move the threshold so far
    # that nothing flags: std ~ 1e5, |x-mean| of normal rows ~ 1e4 -> z<1,
    # and the mega-value itself sits near z~10 but normal dispersion is
    # invisible)
    rows = [(i, 50 + (i % 5)) for i in range(100)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r.doc_id: r.is_outlier for r in mad_outliers(df, "v").collect()}
    assert got[999] is True
    assert sum(got.values()) == 1


def test_mad_outliers_degenerate_group_flags_nothing(spark):
    rows = [(i, "a", 7) for i in range(10)] + [(100, "a", 9)] + [
        (i, "b", v) for i, v in enumerate(range(200, 240, 4))
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    got = mad_outliers(df, "v", keys=("g",)).collect()
    a = [r for r in got if r.g == "a"]
    # group a: >half identical -> MAD 0 -> nothing flagged, null z
    assert all(r.is_outlier is False and r.robust_z is None for r in a)
    assert len(a) == 11


def test_mad_z_formula(spark):
    rows = [(i, v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7])]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r.v: r.robust_z for r in mad_outliers(df, "v").collect()}
    # median=4, deviations {0,1,1,2,2,3,3}, MAD (type-1 @ .5) = 2
    assert got[7] == round(0.6745 * 3 / 2, 6)
    assert got[4] == 0.0
