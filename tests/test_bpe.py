"""Real BPE (Sennrich 2016) — operators/bpe.py. Golden merges on the
canonical low/lower example, memo-vs-reference equivalence, determinism,
and the narrow-plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.bpe import (
    END,
    bpe_token_counts,
    encode_word,
    learn_bpe_merges,
)


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    # the classic BPE teaching corpus (Sennrich §3.2 flavor)
    rows = [(0, "low low low low low"), (1, "lower lower widest widest widest"),
            (2, "newest newest newest newest newest newest")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learn_merges_golden(spark, tiny_corpus):
    merges = learn_bpe_merges(tiny_corpus, n_merges=4)
    # hand-derivable: 'es' (9: widest+newest), then 'est' (9), then
    # 'est</w>' (9), then 'lo' (7: low+lower)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_encode_word_applies_merges_in_rank_order(spark, tiny_corpus):
    # 5 merges: es, est, est</w>, lo, low
    merges = learn_bpe_merges(tiny_corpus, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("low", ranks) == ["low", END]
    # more merges keep collapsing: at 10, trained words become one symbol
    merges10 = learn_bpe_merges(tiny_corpus, n_merges=10)
    ranks10 = {p: i for i, p in enumerate(merges10)}
    assert encode_word("newest", ranks10) == ["newest" + END]
    # unseen word degrades to characters + sentinel, never crashes
    out = encode_word("zzz", ranks)
    assert "".join(out) == "zzz" + END


def test_bpe_token_counts_matches_reference(spark, tiny_corpus):
    merges = learn_bpe_merges(tiny_corpus, n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(
        tiny_corpus, merges).collect()}
    for row in tiny_corpus.collect():
        expect = sum(len(encode_word(w, ranks)) for w in row.text.split())
        assert got[row.doc_id] == expect
    # null text → null count
    nulls = spark.createDataFrame([(9, None)], "doc_id long, text string")
    r = bpe_token_counts(nulls, merges).collect()[0]
    assert r.n_bpe_tokens is None


def test_bpe_deterministic_across_partitionings_and_samples(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = learn_bpe_merges(docs, n_merges=50, sample_rate=0.5)
    m2 = learn_bpe_merges(
        docs.repartition(7), n_merges=50, sample_rate=0.5
    )
    assert m1 == m2  # hash-sample + lexicographic ties → pure function
    c1 = bpe_token_counts(docs, m1).orderBy("doc_id").collect()
    c2 = bpe_token_counts(docs.repartition(5), m1).orderBy("doc_id").collect()
    assert c1 == c2


def test_bpe_apply_plan_is_narrow(spark, tiny_corpus):
    merges = learn_bpe_merges(tiny_corpus, n_merges=4)
    plan = (
        bpe_token_counts(tiny_corpus, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "ArrowEvalPython" in plan  # Arrow-batched, not row-at-a-time
