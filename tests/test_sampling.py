"""Sampling + decontamination operators: determinism, composition,
method equivalence, quota exactness."""

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.sampling import (
    decontaminate,
    hash_sample,
    quota_sample,
    sample_bucket,
    stratified_sample,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"tok{i % 7} common words here doc {i}", ["en", "de", "fr"][i % 3])
        for i in range(400)
    ] + [(400, "", "en")]  # empty doc
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _key():
    return F.col("doc_id").cast("string")


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.25, _key()).collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(13), 0.25, _key()).collect()
    )
    assert a == b and 0 < len(a) < 401
    # rate monotonicity: smaller rate is a subset of larger
    small = set(r.doc_id for r in hash_sample(docs, 0.125, _key()).collect())
    assert small <= set(a)
    # rate 1 keeps everything, rate 0 nothing
    assert hash_sample(docs, 1.0, _key()).count() == 401
    assert hash_sample(docs, 0.0, _key()).count() == 0
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, _key())


def test_stratified_sample_rates_and_default(spark, docs):
    rates = spark.createDataFrame(
        [("en", 1.0), ("de", 0.0)], "lang string, rate double"
    )
    out = stratified_sample(docs, rates, key_col=_key(), default_rate=0.25)
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    n_en = docs.where("lang = 'en'").count()
    assert by_lang["en"] == n_en  # rate 1.0 keeps all
    assert "de" not in by_lang  # rate 0.0 drops all
    n_fr = docs.where("lang = 'fr'").count()
    assert 0 < by_lang["fr"] < n_fr  # default rate samples
    # schema passthrough: no helper columns leak
    assert set(out.columns) == set(docs.columns)


def test_quota_sample_exact_and_stable(spark, docs):
    quotas = spark.createDataFrame([("en", 5), ("de", 7)], "lang string, quota long")
    out = quota_sample(docs, quotas, key_col=_key(), default_quota=3)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 5, "de": 7, "fr": 3}
    # stability: same selection under different partitioning
    out2 = quota_sample(
        docs.repartition(17), quotas, key_col=_key(), default_quota=3
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )
    # quota larger than the stratum keeps the whole stratum
    big = spark.createDataFrame([("en", 10_000)], "lang string, quota long")
    n_en = docs.where("lang = 'en'").count()
    assert (
        quota_sample(docs, big, key_col=_key(), default_quota=0)
        .where("lang = 'en'").count() == n_en
    )


def test_nested_hash_samples_compose(docs):
    # sampling at 0.5 then 0.25 over the same key == sampling at 0.25
    # (bucket thresholds nest)
    nested = hash_sample(hash_sample(docs, 0.5, _key()), 0.25, _key())
    direct = hash_sample(docs, 0.25, _key())
    assert sorted(r.doc_id for r in nested.collect()) == sorted(
        r.doc_id for r in direct.collect()
    )


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dogs"),
            (2, "completely unrelated content xyzzy abc qwerty uvw"),
            (3, ""),  # empty never contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_contaminated_ngrams"], r["is_contaminated"])
        for r in decontaminate(corpus, bench, k=3, threshold=2).collect()
    }
    # doc 1 shares 'quick brown fox' and 'brown fox jumps' → 2 grams
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_decontaminate_methods_agree(docs):
    bench = docs.where("doc_id % 10 = 0")
    corpus = docs.where("doc_id % 10 != 0")
    a = decontaminate(corpus, bench, k=3, threshold=2, method="broadcast")
    b = decontaminate(corpus, bench, k=3, threshold=2, method="join")
    cols = ["doc_id", "n_contaminated_ngrams", "is_contaminated"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, method="nope")


def test_sample_bucket_matches_duckdb(spark):
    """The bucket function is the SQL-replicable md5-60bit hash — pin a
    few values against DuckDB directly."""
    import duckdb

    keys = ["0", "42", "https://example.com/x", ""]
    got = (
        spark.createDataFrame([(k,) for k in keys], "k string")
        .select("k", sample_bucket(F.col("k")).alias("b"))
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT % 1000000", [r["k"]]
        ).fetchone()[0]
        assert r["b"] == want, r["k"]


def test_word_shingles_short_and_empty(spark):
    rows = spark.createDataFrame(
        [(1, "one two"), (2, "a"), (3, "")], "id long, text string"
    ).select("id", word_shingles(F.col("text"), 3).alias("s")).collect()
    got = {r["id"]: r["s"] for r in rows}
    assert got[1] == ["one two"]  # shorter than k → single joined gram
    assert got[2] == ["a"]
    assert got[3] == []


def test_salted_hash_samples_draw_independently(docs):
    """Same-salt nesting is subset/min semantics (previous test); distinct
    salts draw independent buckets so stages compose multiplicatively."""
    half = hash_sample(docs, 0.5, _key())
    same = hash_sample(half, 0.5, _key())
    salted = hash_sample(half, 0.5, _key(), salt="stage2")
    n_half, n_same, n_salted = half.count(), same.count(), salted.count()
    # same-salt: threshold intersection == min(0.5, 0.5) == the 0.5 sample
    assert n_same == n_half
    # distinct salt: an independent coin → roughly rate² of the corpus
    assert n_salted < n_half
    total = docs.count()
    assert 0.15 * total < n_salted < 0.35 * total
    # salted stage is still a subset of its input and still deterministic
    ids = sorted(r.doc_id for r in salted.collect())
    ids2 = sorted(
        r.doc_id
        for r in hash_sample(
            hash_sample(docs.repartition(7), 0.5, _key()), 0.5, _key(), salt="stage2"
        ).collect()
    )
    assert ids == ids2


def test_split_corpus_disjoint_exhaustive_deterministic(spark):
    from eventanalysis_spark.operators.sampling import split_corpus

    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("key")
    )
    out = split_corpus(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, key_col="key"
    )
    rows = out.collect()
    assert len(rows) == 5000  # exhaustive: every row assigned
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}  # disjoint by construction
    assert abs(counts["train"] / 5000 - 0.9) < 0.02
    assert abs(counts["val"] / 5000 - 0.05) < 0.02
    # partition-invariant
    again = {
        r.doc_id: r.split
        for r in split_corpus(
            docs.repartition(13),
            {"train": 0.9, "val": 0.05, "test": 0.05},
            key_col="key",
        ).collect()
    }
    assert all(again[r.doc_id] == r.split for r in rows)
    # salt decorrelates from hash_sample on the same key
    from eventanalysis_spark.operators.sampling import hash_sample

    sampled = {r.doc_id for r in hash_sample(docs, 0.05, key_col="key").collect()}
    test_ids = {r.doc_id for r in rows if r.split == "test"}
    overlap = len(sampled & test_ids) / max(len(sampled), 1)
    assert overlap < 0.3  # would be ~1.0 if correlated


def test_split_corpus_validates_fractions(spark):
    from eventanalysis_spark.operators.sampling import split_corpus

    docs = spark.range(3).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(ValueError):
        split_corpus(docs, {"a": 0.5, "b": 0.4}, key_col="key")


def test_split_corpus_plan_is_narrow(spark):
    from eventanalysis_spark.operators.sampling import split_corpus

    docs = spark.range(100).select(F.col("id").cast("string").alias("key"))
    plan = (
        split_corpus(docs, {"train": 0.9, "val": 0.1}, key_col="key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_shuffle_corpus_is_dense_deterministic_permutation(spark):
    from eventanalysis_spark.operators.sampling import shuffle_corpus

    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    a = {r["k"]: r["shuffle_rank"] for r in shuffle_corpus(df, "k").collect()}
    b = {
        r["k"]: r["shuffle_rank"]
        for r in shuffle_corpus(df.repartition(7), "k").collect()
    }
    assert a == b  # partition-invariant
    assert sorted(a.values()) == list(range(1000))  # dense 0-based permutation
    # different seed -> genuinely different order
    c = {r["k"]: r["shuffle_rank"] for r in shuffle_corpus(df, "k", seed="1").collect()}
    assert c != a
    # matches the single-window reference order
    import hashlib

    want = sorted(a, key=lambda k: (hashlib.md5(("0\x1f" + k).encode()).hexdigest(), k))
    got = sorted(a, key=a.get)
    assert got == want


def test_mixture_resample_multiplicities(spark):
    from eventanalysis_spark.operators.sampling import mixture_resample

    rows = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c"), str(i))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, k string")
    out = mixture_resample(
        df, {"a": 2.5, "b": 0.25, "c": 0.0}, source_col="source", key_col="k"
    )
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "c" not in per  # weight 0 drops the source entirely
    assert per["a"] / 1000 == pytest.approx(2.5, abs=0.15)
    assert per["b"] / 1000 == pytest.approx(0.25, abs=0.1)
    # copy indexes are 0..n-1 per doc and deterministic across partitionings
    a = sorted(map(tuple, out.select("doc_id", "copy_idx").collect()))
    b = sorted(map(tuple, mixture_resample(
        df.repartition(11), {"a": 2.5, "b": 0.25, "c": 0.0},
        source_col="source", key_col="k").select("doc_id", "copy_idx").collect()))
    assert a == b
    copies = {}
    for did, idx in a:
        copies.setdefault(did, []).append(idx)
    assert all(v == list(range(len(v))) for v in copies.values())
    # every doc of an up-sampled source appears at least floor(w) times
    assert all(len(v) >= 2 for d, v in copies.items() if d % 3 == 0)


def test_mixture_resample_default_weight(spark):
    from eventanalysis_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [(1, "x", "1"), (2, "y", "2")], "doc_id long, source string, k string"
    )
    out = mixture_resample(df, {"x": 3.0}, source_col="source", key_col="k")
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"x": 3, "y": 1}


# ---- weighted sampling without replacement ----------------------------------

from eventanalysis_spark.operators.sampling import weighted_sample  # noqa: E402


def test_weighted_sample_exact_k_and_deterministic(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 + 1).cast("double").alias("w"),
    )
    a = sorted(r.doc_id for r in weighted_sample(df, 50, "w").collect())
    b = sorted(
        r.doc_id for r in weighted_sample(df.repartition(32), 50, "w").collect()
    )
    assert len(a) == 50 and a == b


def test_weighted_sample_bias_follows_weights(spark):
    # two strata: weight 20 vs weight 1 -> heavy stratum dominates picks
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, 20.0).otherwise(1.0).alias("w"),
    )
    picked = [r.doc_id for r in weighted_sample(df, 200, "w").collect()]
    heavy = sum(1 for d in picked if d < 1000)
    assert heavy > 150  # ~ w-proportional; uniform would give ~100


def test_weighted_sample_grouped_and_zero_weight(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 10 == 0, 0.0).otherwise(1.0).alias("w"),
    )
    got = weighted_sample(df, 5, "w", keys=("g",)).collect()
    assert len(got) == 15
    assert all(r.doc_id % 10 != 0 for r in got)  # zero weights never picked
