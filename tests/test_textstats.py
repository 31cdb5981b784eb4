"""Text-analysis operators: token counting, quality, lang-id, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.textstats import (
    add_fingerprint,
    bpe_ish_token_count,
    detect_language,
    quality_features,
    token_count,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )


def test_token_count(spark):
    df = _df(spark, ["one two three", "", "   ", "single", "a  b"])
    got = [r.n for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1, 2]


def test_bpe_ish_token_count(spark):
    df = _df(spark, ["hello world42!", ""])
    got = [r.n for r in df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()]
    # hello, world, 42, ! → 4
    assert got[0] == 4 and got[1] == 0


def test_quality_features(spark):
    df = _df(spark, [
        "the cat and the dog sat with a hat for fun in the sun was good",
        "ALL CAPS!!! ... ;;; :::",
        "",
    ])
    rows = quality_features(df).orderBy("id").collect()
    assert rows[0].q_score > rows[1].q_score  # stopwordy prose beats punct noise
    assert rows[2].q_tokens == 0 and rows[2].q_score is not None
    assert 0.0 <= rows[0].q_score <= 1.0


def test_detect_language(spark):
    df = _df(spark, [
        "the cat is in the house and that was good for all of them",
        "der hund ist nicht mit der katze und das ist von zu hause",
        "le chat est dans la maison et les chiens pour que une personne",
        "xyzzy plugh",
        "",
    ])
    got = [r.lang_detected for r in detect_language(df).orderBy("id").collect()]
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"
    assert got[4] == "und"


def test_fingerprint_properties(spark):
    df = _df(spark, ["a b c", "a b c", "c b a", ""])
    got = [r.doc_fingerprint for r in add_fingerprint(df).orderBy("id").collect()]
    assert got[0] == got[1]        # deterministic
    assert got[0] != got[2]        # order-sensitive
    assert got[3] is not None      # empty text gets the seed value
    # stable across partitionings
    got2 = [
        r.doc_fingerprint
        for r in add_fingerprint(df.repartition(5)).orderBy("id").collect()
    ]
    assert got == got2


def test_unigram_logprob_hand_computed(spark):
    import math

    from eventanalysis_spark.operators.textstats import (
        corpus_token_counts,
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "")], "doc_id long, text string"
    )
    counts = {
        r.token: r.cnt for r in corpus_token_counts(docs).collect()
    }
    assert counts == {"a": 3, "b": 1, "c": 1}  # empty doc contributes nothing
    rows = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
    n, v = 5.0, 3.0  # total tokens, vocab
    lp = {t: -math.log((c + 1.0) / (n + v)) for t, c in counts.items()}
    assert rows[0].n_tokens == 3
    assert rows[0].avg_neg_logprob == pytest.approx(
        round((2 * lp["a"] + lp["b"]) / 3, 6)
    )
    assert rows[1].n_tokens == 2
    # empty doc: present, zero tokens, null score (NOT scored as OOV)
    assert rows[2].n_tokens == 0 and rows[2].avg_neg_logprob is None
    # rarer tokens → higher neg logprob → doc 1 scores above doc 0? both
    # contain 'a'; doc 0 has b, doc 1 has c (same count) — sanity: scores
    # positive
    assert rows[0].avg_neg_logprob > 0 and rows[1].avg_neg_logprob > 0


def test_unigram_logprob_external_counts_and_oov(spark):
    import math

    from eventanalysis_spark.operators.textstats import (
        corpus_token_counts,
        unigram_logprob_scores,
    )

    train = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    counts = corpus_token_counts(train)
    score = spark.createDataFrame([(9, "a z")], "doc_id long, text string")
    rows = unigram_logprob_scores(score, counts=counts).collect()
    n, v = 3.0, 2.0
    lp_a = -math.log((2 + 1.0) / (n + v))
    lp_oov = -math.log(1.0 / (n + v))  # z unseen → alpha-smoothed floor
    assert rows[0].avg_neg_logprob == pytest.approx(
        round((lp_a + lp_oov) / 2, 6)
    )


def test_unigram_logprob_plan_broadcasts_vocab(spark):
    from eventanalysis_spark.operators.textstats import unigram_logprob_scores

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    plan = (
        unigram_logprob_scores(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_topk_terms(spark):
    import math

    from eventanalysis_spark.operators.textstats import tfidf_topk_terms

    docs = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "cherry cherry cherry common"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = tfidf_topk_terms(df, k=2).collect()
    n = 4
    # pure-python reference
    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs if t}
    dfreq = Counter()
    for c in tfs.values():
        dfreq.update(c.keys())
    ref = {}
    for d, c in tfs.items():
        scored = sorted(
            (
                (round(tf * math.log(n / dfreq[t]), 6), t)
                for t, tf in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        ref[d] = [(t, s) for s, t in scored]
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    assert 4 not in by_doc  # empty doc emits nothing
    for d in (1, 2, 3):
        ranked = [(t, s) for _, t, s in sorted(by_doc[d])]
        assert ranked == ref[d], d


def test_tfidf_plan_shape(spark):
    from eventanalysis_spark.operators.textstats import tfidf_topk_terms

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = (
        tfidf_topk_terms(df, k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_topk_ranking_properties(spark):
    from eventanalysis_spark.operators.textstats import bm25_topk

    rows = [
        (1, "apple apple apple banana"),     # tf(apple)=3, short
        (2, "apple banana cherry date egg"), # tf(apple)=1
        (3, "banana cherry date egg fig"),   # no apple
        (4, "apple " * 2 + "x " * 46),       # tf=2 but long doc (len norm)
        (5, ""),                              # empty: never scored
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(df, ["apple"], k=10).collect()]
    ids = [d for d, _ in got]
    assert 3 not in ids and 5 not in ids          # only matching docs
    assert ids[0] == 1                            # highest tf, short doc wins
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
    # length normalization: doc 2 (tf=1, len 5) beats doc 4 (tf=2, len 48)
    d = dict(got)
    assert d[2] > d[4] or ids.index(2) < ids.index(4)
    # multi-term query unions scores; k caps output
    top1 = bm25_topk(df, ["apple", "banana"], k=1).collect()
    assert len(top1) == 1


def test_bigram_logprob_self_scoring(spark):
    from eventanalysis_spark.operators.textstats import bigram_logprob_scores

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x"), (3, "")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in bigram_logprob_scores(df, id_col="doc_id").collect()}
    # corpus: (a,b)x3 ctx a=3; (b,a)x1 (b,c)x1 ctx b=2; V = |{b,a,c}| = 3
    # nlp(a,b)=ln(6/4); nlp(b,a)=nlp(b,c)=ln(5/2)
    import math
    ln15, ln25 = math.log(1.5), math.log(2.5)
    assert rows[0].n_bigrams == 3
    assert rows[0].avg_neg_logprob == pytest.approx(
        round((2 * ln15 + ln25) / 3, 6), abs=1e-6
    )
    assert rows[1].n_bigrams == 2
    assert rows[1].avg_neg_logprob == pytest.approx(
        round((ln15 + ln25) / 2, 6), abs=1e-6
    )
    # <2 tokens → no bigrams, null score (not OOV-scored)
    assert rows[2].n_bigrams == 0 and rows[2].avg_neg_logprob is None
    assert rows[3].n_bigrams == 0 and rows[3].avg_neg_logprob is None


def test_bigram_logprob_external_counts_backoff(spark):
    """Unseen bigram in a known context vs unknown context, scored
    against a persisted model trained on a different corpus."""
    import math

    from eventanalysis_spark.operators.textstats import (
        bigram_logprob_scores,
        corpus_bigram_counts,
    )

    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id int, text string"
    )
    counts = corpus_bigram_counts(train)
    score = spark.createDataFrame(
        [(10, "a a"), (11, "z z")], "doc_id int, text string"
    )
    rows = {
        r.doc_id: r
        for r in bigram_logprob_scores(score, counts=counts, id_col="doc_id").collect()
    }
    # known context a (ctx=3), unseen successor: -ln(1/(3+3)) = ln 6
    assert rows[10].avg_neg_logprob == pytest.approx(round(math.log(6), 6), abs=1e-6)
    # unknown context z: flat 1/V with V=3
    assert rows[11].avg_neg_logprob == pytest.approx(round(math.log(3), 6), abs=1e-6)


def test_vocab_topk_and_oov_stats(spark):
    from eventanalysis_spark.operators.textstats import oov_stats, vocab_topk

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ATE the cat"),
            (3, "zzz qqq"),          # fully OOV vs top-3 vocab
            (4, "   "),              # whitespace-only → 0 tokens, rate 0.0
        ],
        "doc_id long, text string",
    )
    v = vocab_topk(docs, k=3).collect()
    # counts: the×4, cat×2, rest×1 → rank 3 tie broken lexicographically (ATE)
    assert [(r["rank"], r["token"], r["cnt"]) for r in v] == [
        (1, "the", 4), (2, "cat", 2), (3, "ATE", 1),
    ]
    got = {r["doc_id"]: r for r in oov_stats(docs, k=3).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (6, 3)  # sat on mat OOV
    assert got[1]["oov_rate"] == 0.5
    assert (got[3]["n_tokens"], got[3]["n_oov"], got[3]["oov_rate"]) == (2, 2, 1.0)
    assert (got[4]["n_tokens"], got[4]["n_oov"], got[4]["oov_rate"]) == (0, 0, 0.0)
    # fixed external vocabulary (cross-corpus form): score corpus B
    # against corpus A's vocab
    fixed = vocab_topk(docs.where("doc_id <= 2"), k=2)  # {the, cat}
    new = spark.createDataFrame([(9, "the new cat food")], "doc_id long, text string")
    r9 = oov_stats(new, vocab=fixed).collect()[0]
    assert (r9["n_tokens"], r9["n_oov"]) == (4, 2)


def test_kneser_ney_bigram_scores(spark):
    """Hand-computed interpolated-KN values (D=0.75): seen pairs, unseen
    pair in a known context, unknown context, unknown successor."""
    import math

    from eventanalysis_spark.operators.textstats import (
        corpus_bigram_counts,
        kneser_ney_bigram_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    # counts: (a,b):2 (b,a):1 (a,c):1 → T=3, V=|{a,b,c}|=3, tv=6
    # ctx a: (3, 2 succ); ctx b: (1, 1 succ); p_cont = 2/6 for a,b,c
    got = {r["doc_id"]: r for r in kneser_ney_bigram_scores(docs).collect()}
    p_b_a = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (2 / 6)   # 0.583333
    p_a_b = (1 - 0.75) / 1 + (0.75 * 1 / 1) * (2 / 6)   # 0.5
    p_c_a = (1 - 0.75) / 3 + (0.75 * 2 / 3) * (2 / 6)   # 0.25
    d1 = round(-(2 * math.log(p_b_a) + math.log(p_a_b)) / 3, 6)
    assert got[1]["n_bigrams"] == 3 and got[1]["avg_neg_logprob"] == d1
    assert got[2]["avg_neg_logprob"] == round(-math.log(p_c_a), 6)
    # cross-corpus: score unseen text against the persisted model
    counts = corpus_bigram_counts(docs)
    new = spark.createDataFrame([(9, "a z z q"), (10, "x")], "doc_id long, text string")
    r = {x["doc_id"]: x for x in
         kneser_ney_bigram_scores(new, counts=counts).collect()}
    p_az = 0.0 / 3 + (0.75 * 2 / 3) * (1 / 6)  # unseen pair, known ctx
    p_unk = 1 / 6                              # unknown context → p_cont floor
    want = round(-(math.log(p_az) + 2 * math.log(p_unk)) / 3, 6)
    assert r[9]["n_bigrams"] == 3 and r[9]["avg_neg_logprob"] == want
    # sub-2-token doc: null score, zero bigrams (same contract as sibling)
    assert r[10]["n_bigrams"] == 0 and r[10]["avg_neg_logprob"] is None


def test_readability_scores_hand_computed(spark):
    from eventanalysis_spark.operators.textstats import readability_scores

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 2 sentences, 6 syll
        (2, "no terminal punctuation here"),  # sentence floor = 1
        (3, ""),                              # empty → NULL flesch
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_scores(df).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    expected = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert abs(r1["flesch"] - expected) < 1e-9
    assert got[2]["n_sentences"] == 1 and got[2]["n_words"] == 4
    assert got[3]["n_words"] == 0 and got[3]["flesch"] is None


def test_zipf_stats_hand_computed(spark):
    import math

    from eventanalysis_spark.operators.textstats import zipf_stats

    # freq table by construction: a×8, b×4, c×2, d×1 (exact Zipf would
    # need 8,4,8/3,2 — so the slope is close to but not exactly -1)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_stats(df, k=10).collect()[0]
    assert (r["n_terms"], r["n_tokens"], r["k_fit"]) == (4, 15, 4)
    xs = [math.log(i + 1) for i in range(4)]
    ys = [math.log(f) for f in (8, 4, 2, 1)]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r["zipf_slope"] - round(slope, 6)) < 1e-9
    assert slope < -1.0  # d's count (1 vs 8/(4**1)=...) pulls it steep


def test_zipf_stats_degenerate_and_k_cap(spark):
    from eventanalysis_spark.operators.textstats import zipf_stats

    one = spark.createDataFrame([(1, "w w w")], "doc_id long, text string")
    r = zipf_stats(one, k=10).collect()[0]
    # single term: rank fit undefined -> NULLs, totals still exact
    assert (r["n_terms"], r["n_tokens"], r["k_fit"]) == (1, 3, 1)
    assert r["zipf_slope"] is None and r["zipf_intercept"] is None
    # k caps the head: fit over top-2 only
    df = spark.createDataFrame(
        [(1, "a a a a b b c")], "doc_id long, text string"
    )
    assert zipf_stats(df, k=2).collect()[0]["k_fit"] == 2


def test_bm25_empty_query_returns_empty(spark):
    """The per-term-column rewrite must keep the old posting-stream
    form's empty-query behavior: zero rows, not an IndexError."""
    from eventanalysis_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    out = bm25_topk(docs, [], k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "bm25"]
