"""Count-min sketch: overestimate guarantee, exactness at large width,
mergeability (per-source sketches == whole-corpus sketch), absent-key
zero reads, weighted counts, exact heavy-hitter top-k with ties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.sketches import (
    countmin_lookup,
    countmin_merge,
    countmin_sketch,
    heavy_hitters,
)

DEPTH, WIDTH = 4, 64  # narrow on purpose: collisions must occur


@pytest.fixture(scope="module")
def keyed(spark):
    # 500 rows over 100 distinct keys with a skewed head (key_0 hot)
    return spark.range(500).select(
        F.concat(
            F.lit("key_"),
            F.when(F.col("id") % 5 == 0, F.lit(0)).otherwise(F.col("id") % 100),
        ).alias("k"),
        (F.col("id") % 3 + 1).alias("w"),
    )


def _exact(df):
    return {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}


def test_overestimate_never_under(keyed):
    sk = countmin_sketch(keyed, "k", depth=DEPTH, width=WIDTH)
    items = keyed.select("k").distinct()
    est = {
        r.k: r.cm_est
        for r in countmin_lookup(sk, items, "k", DEPTH, WIDTH).collect()
    }
    exact = _exact(keyed)
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_exact_at_large_width(keyed):
    sk = countmin_sketch(keyed, "k", depth=DEPTH, width=1 << 16)
    items = keyed.select("k").distinct()
    est = {
        r.k: r.cm_est
        for r in countmin_lookup(sk, items, "k", DEPTH, 1 << 16).collect()
    }
    assert est == _exact(keyed)


def test_merge_equals_whole(spark, keyed):
    half_a = keyed.where(F.col("w") == 1)
    half_b = keyed.where(F.col("w") != 1)
    merged = countmin_merge(
        countmin_sketch(half_a, "k", DEPTH, WIDTH).unionByName(
            countmin_sketch(half_b, "k", DEPTH, WIDTH)
        )
    )
    whole = countmin_sketch(keyed, "k", DEPTH, WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_absent_key_reads_zero_when_wide(spark, keyed):
    width = 1 << 16
    sk = countmin_sketch(keyed, "k", DEPTH, width)
    ghost = spark.createDataFrame([("never_seen_xyz",)], "k string")
    [row] = countmin_lookup(sk, ghost, "k", DEPTH, width).collect()
    assert row.cm_est == 0


def test_weighted_counts(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 1)], "k string, w long")
    sk = countmin_sketch(df, "k", DEPTH, 1 << 16, weight_col="w")
    items = df.select("k").distinct()
    est = {r.k: r.cm_est for r in countmin_lookup(sk, items, "k", DEPTH, 1 << 16).collect()}
    assert est == {"a": 15, "b": 1}


def test_grouped_sketches_independent(keyed):
    grouped = countmin_sketch(
        keyed.withColumn("src", F.col("w") % 2), "k", DEPTH, WIDTH,
        group_cols=("src",),
    )
    # collapsing the group dim == ungrouped sketch
    collapsed = countmin_merge(grouped)
    whole = countmin_sketch(keyed, "k", DEPTH, WIDTH)
    assert sorted(map(tuple, collapsed.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_heavy_hitters_exact_and_tiebreak(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r.key, r.cnt) for r in heavy_hitters(df, "k", 3).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 3)]  # b before c: key tiebreak


# ---- bloom -----------------------------------------------------------------

from eventanalysis_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_merge,
    bloom_probe,
    decontaminate_bloom,
)

BITS, HASHES = 1 << 14, 5


def test_bloom_no_false_negatives(keyed):
    bl = bloom_build(keyed.select("k"), "k", BITS, HASHES)
    got = bloom_probe(bl, keyed.select("k").distinct(), "k", BITS, HASHES)
    assert all(r.maybe_present for r in got.collect())


def test_bloom_rejects_absent_when_wide(spark, keyed):
    bl = bloom_build(keyed.select("k"), "k", 1 << 20, HASHES)
    ghosts = spark.createDataFrame(
        [("ghost_%d" % i,) for i in range(200)], "k string"
    )
    got = bloom_probe(bl, ghosts, "k", 1 << 20, HASHES)
    # 200 probes vs 100 keys in 2^20 bits: expected FP rate ~ 0
    assert not any(r.maybe_present for r in got.collect())


def test_bloom_fp_rate_bounded_when_narrow(spark, keyed):
    # 100 keys x 5 hashes in 512 bits -> fill ~0.62, FP rate ~0.62^5 ~ 9%
    bits = 1 << 9
    bl = bloom_build(keyed.select("k"), "k", bits, HASHES)
    ghosts = spark.createDataFrame(
        [("ghost_%d" % i,) for i in range(300)], "k string"
    )
    fp = sum(r.maybe_present for r in bloom_probe(bl, ghosts, "k", bits, HASHES).collect())
    assert 0 < fp < 150  # one-sided error exists but is bounded


def test_bloom_merge_equals_whole(keyed):
    a = keyed.where(F.col("w") == 1).select("k")
    b = keyed.where(F.col("w") != 1).select("k")
    merged = bloom_merge(
        bloom_build(a, "k", BITS, HASHES).unionByName(
            bloom_build(b, "k", BITS, HASHES)
        )
    )
    whole = bloom_build(keyed.select("k"), "k", BITS, HASHES)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_decontaminate_bloom_matches_exact_when_wide(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
        (3, "totally different words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, "alpha beta gamma something"), (11, "epsilon zeta eta other")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_flagged_ngrams, r.is_contaminated)
        for r in decontaminate_bloom(
            docs, bench, k=3, num_bits=1 << 20, num_hashes=5
        ).collect()
    }
    # doc1 shares 'alpha beta gamma'; doc2 shares 'epsilon zeta eta'
    assert got[1] == (1, True) and got[2] == (1, True) and got[3] == (0, False)


# ---- hyperloglog ------------------------------------------------------------

from eventanalysis_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def test_hll_accuracy_at_p10(spark):
    # 20k distinct keys, expect ~3.3% standard error at p=10
    df = spark.range(60000).select((F.col("id") % 20000).cast("string").alias("k"))
    [r] = hll_estimate(hll_sketch(df, "k", p=10), p=10).collect()
    assert abs(r.est_distinct - 20000) / 20000 < 0.12


def test_hll_small_range_linear_counting(spark):
    df = spark.range(50).select(F.col("id").cast("string").alias("k"))
    [r] = hll_estimate(hll_sketch(df, "k", p=10), p=10).collect()
    assert abs(r.est_distinct - 50) / 50 < 0.15


def test_hll_duplicates_do_not_move_estimate(spark):
    a = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(5000).select((F.col("id") % 100).cast("string").alias("k"))
    ea = hll_estimate(hll_sketch(a.unionAll(a), "k"), p=10).collect()[0].est_distinct
    eb = hll_estimate(hll_sketch(a, "k"), p=10).collect()[0].est_distinct
    assert ea == eb  # sketch of a+a == sketch of a
    del b


def test_hll_merge_equals_whole(spark):
    whole = spark.range(8000).select(F.col("id").cast("string").alias("k"))
    a = whole.where(F.col("k").cast("long") < 5000)   # overlapping halves
    b = whole.where(F.col("k").cast("long") >= 3000)
    merged = hll_merge(
        hll_sketch(a, "k", p=10).unionByName(hll_sketch(b, "k", p=10))
    )
    want = hll_sketch(whole, "k", p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))


def test_hll_grouped_and_partition_invariant(spark):
    df = spark.range(30000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7000).cast("string").alias("k"),
    )
    e1 = sorted(map(tuple, hll_estimate(hll_sketch(df, "k", p=10, group_cols=("g",)), p=10, group_cols=("g",)).collect()))
    e2 = sorted(map(tuple, hll_estimate(hll_sketch(df.repartition(32), "k", p=10, group_cols=("g",)), p=10, group_cols=("g",)).collect()))
    assert e1 == e2


def test_hll_bad_p_rejected(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        hll_sketch(df, "k", p=3)
