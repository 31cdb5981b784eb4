"""Selection operators (operators/selection.py): budget prefix
selection vs a pure-Python greedy reference, partition invariance,
DSIR log-weights vs a hand-computed LM ratio, Gumbel top-k determinism
and weight-monotonic bias."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.selection import (
    budget_select,
    dsir_logweights,
    gumbel_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", 6),
        (1, "dog dog dog", 3),
        (2, "the quick brown fox", 4),
        (3, "", 0),
        (4, "cat and dog and bird", 5),
        (5, "one two three four five six seven", 7),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")


# ---- budget_select ---------------------------------------------------

def _greedy(rows, budget):
    """Pure-python reference: rows = [(key, weight)] already ordered."""
    out, cum = [], 0
    for k, w in rows:
        if cum >= budget:
            break
        out.append(k)
        cum += w
    return out


def test_budget_select_matches_greedy_reference(spark, docs):
    # order: n_tokens DESC, doc_id ASC -> [5(7), 0(6), 4(5), 2(4), 1(3), 3(0)]
    ordered = [(5, 7), (0, 6), (4, 5), (2, 4), (1, 3), (3, 0)]
    for budget in (0, 1, 7, 12, 13, 18, 26, 100):
        got = budget_select(
            docs, budget, weight_col="n_tokens", tie_cols=["doc_id"]
        )
        ids = sorted(r["doc_id"] for r in got.collect())
        assert ids == sorted(_greedy(ordered, budget)), budget


def test_budget_select_cum_before_exact(spark, docs):
    rows = {
        r["doc_id"]: r["cum_before"]
        for r in budget_select(docs, 100, tie_cols=["doc_id"]).collect()
    }
    assert rows == {5: 0, 0: 7, 4: 13, 2: 18, 1: 22, 3: 25}


def test_budget_select_partition_invariance(spark, docs):
    a = budget_select(docs.repartition(1), 13, tie_cols=["doc_id"],
                      num_partitions=2)
    b = budget_select(docs.repartition(6), 13, tie_cols=["doc_id"],
                      num_partitions=5)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_budget_select_custom_order(spark, docs):
    got = budget_select(
        docs, 9, order_cols=[F.col("doc_id").asc()], weight_col="n_tokens"
    )
    # doc order 0(6),1(3) -> cum 0,6; doc 2 starts at 9 >= budget
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1]


# ---- dsir_logweights -------------------------------------------------

def test_dsir_logweights_hand_computed(spark):
    src = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logw"])
        for r in dsir_logweights(src, tgt).collect()
    }
    # source counts: a=2 b=2 c=1, Ns=5; target: a=1 b=1, Nt=2; V=3
    def lr(ct, cs):
        return math.log((ct + 1) / (2 + 3)) - math.log((cs + 1) / (5 + 3))

    want0 = round(2 * lr(1, 2) + lr(1, 2), 6)
    want1 = round(lr(1, 2) + lr(0, 1), 6)
    assert got[0][0] == 3 and abs(got[0][1] - want0) < 1e-9
    assert got[1][0] == 2 and abs(got[1][1] - want1) < 1e-9


def test_dsir_target_likeness_orders_weights(spark, docs):
    """Docs sharing the target's vocabulary must out-weigh docs that
    don't: target is dog-speak, doc 1 (all dog) > doc 5 (numbers)."""
    tgt = docs.sparkSession.createDataFrame(
        [(0, "dog dog bird dog")], "doc_id long, text string"
    )
    w = {r["doc_id"]: r["logw"] for r in dsir_logweights(docs, tgt).collect()}
    assert w[1] > w[5]
    assert w[1] > w[0]


def test_dsir_hash_buckets_bounds_dictionary(spark, docs):
    tgt = docs.limit(1)
    hashed = dsir_logweights(docs, tgt, hash_buckets=16)
    plain = dsir_logweights(docs, tgt)
    assert hashed.count() == plain.count()
    # bucketed weights still deterministic across partitionings
    a = sorted(map(tuple, hashed.collect()))
    b = sorted(
        map(tuple, dsir_logweights(docs.repartition(7), tgt, hash_buckets=16).collect())
    )
    assert a == b


# ---- gumbel_topk -----------------------------------------------------

def test_gumbel_topk_deterministic_and_sized(spark, docs):
    tgt = docs.where("doc_id = 4")
    w = dsir_logweights(docs, tgt)
    a = [r["doc_id"] for r in gumbel_topk(w, 3).collect()]
    b = [
        r["doc_id"]
        for r in gumbel_topk(
            dsir_logweights(docs.repartition(5), tgt), 3
        ).collect()
    ]
    assert len(a) == 3 and a == b


def test_gumbel_topk_bias_toward_heavy_weights(spark):
    """With a huge weight gap the heavy rows must always win: weights
    exp(50) vs exp(0) can't be overcome by Gumbel noise from u in
    (5e-7, 1-5e-7) (|g| <= ~15)."""
    rows = [(i, 50.0 if i < 5 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, logw double")
    got = sorted(r["doc_id"] for r in gumbel_topk(df, 5).collect())
    assert got == [0, 1, 2, 3, 4]


def test_gumbel_topk_salt_draws_differ(spark):
    rows = [(i, 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, logw double")
    a = {r["doc_id"] for r in gumbel_topk(df, 10, salt="s1").collect()}
    b = {r["doc_id"] for r in gumbel_topk(df, 10, salt="s2").collect()}
    assert a != b


def test_score_tiers_equal_population_and_determinism(spark):
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.selection import score_tiers

    rows = [(i, float((i * 37) % 100)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = score_tiers(df, "s", tiers=3, labels=["head", "middle", "tail"])
    pops = {r["tier"]: r["n"] for r in out.groupBy("tier").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert pops == {"head": 30, "middle": 30, "tail": 30}
    # best (lowest) score is head rank 0; worst is tail rank n-1
    got = {r["doc_id"]: (r["score_rank"], r["tier"]) for r in out.collect()}
    best = min(rows, key=lambda t: (t[1], t[0]))[0]
    worst = max(rows, key=lambda t: (t[1], t[0]))[0]
    assert got[best] == (0, "head") and got[worst] == (89, "tail")
    # partition-count invariance (two-phase rank, not a lucky layout)
    out8 = score_tiers(df.repartition(8), "s", tiers=3, labels=["head", "middle", "tail"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out8.collect()))
    # descending mode flips the ends
    d = score_tiers(df, "s", tiers=3, ascending=False, labels=["head", "middle", "tail"])
    gd = {r["doc_id"]: r["tier"] for r in d.collect()}
    assert gd[worst] == "head" and gd[best] == "tail"


def test_score_tiers_by_group_histogram_semantics(spark):
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.selection import score_tiers_by_group

    rows = (
        # lang a: 9 distinct scores -> 3/3/3
        [(i, "a", float(i)) for i in range(9)]
        # lang b: all ties -> everyone shares tier 0 (before=0)
        + [(100 + i, "b", 7.0) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = score_tiers_by_group(
        df, "s", "lang", tiers=3, labels=["head", "middle", "tail"]
    )
    got = {r["doc_id"]: r["tier"] for r in out.collect()}
    assert [got[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert all(got[100 + i] == "head" for i in range(6))  # ties share a tier
    # partition invariance (histogram form, no row window)
    out16 = score_tiers_by_group(
        df.repartition(16), "s", "lang", tiers=3, labels=["head", "middle", "tail"]
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out16.collect()))
    # descending flips lang a's ends
    d = score_tiers_by_group(df, "s", "lang", tiers=3, ascending=False,
                             labels=["head", "middle", "tail"])
    gd = {r["doc_id"]: r["tier"] for r in d.collect()}
    assert gd[8] == "head" and gd[0] == "tail"


def test_ngram_novelty_broadcast_and_join(spark):
    from eventanalysis_spark.operators.selection import ngram_novelty

    ref = spark.createDataFrame([(100, "a b c d e")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x y z w"), (2, "a b c x y"), (3, "")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in ngram_novelty(docs, ref, k=3, id_col="doc_id").collect()
    }
    assert out[0].novelty_frac == 0.0                      # fully re-crawled
    assert out[1].novelty_frac == 1.0 and out[1].n_grams == 2
    # grams of doc2: 'a b c' (seen), 'b c x', 'c x y' → 2/3 novel
    assert out[2].n_grams == 3 and out[2].n_novel == 2
    assert out[2].novelty_frac == 0.666667
    assert out[3].n_grams == 0 and out[3].novelty_frac == 0.0
    # the shuffle-join path is result-identical to the broadcast path
    j = {
        r.doc_id: r
        for r in ngram_novelty(docs, ref, k=3, id_col="doc_id", method="join").collect()
    }
    for i in out:
        assert (out[i].n_grams, out[i].n_novel, out[i].novelty_frac) == (
            j[i].n_grams, j[i].n_novel, j[i].novelty_frac
        )
