"""Hashed Naive-Bayes classifier: operators/classify.py vs a pure-Python
reference implementation of the same model (same hashing, same Laplace
smoothing), plus plan and shape checks."""

from __future__ import annotations

import hashlib
import math

import pytest

from eventanalysis_spark.operators.classify import (
    nb_score,
    nb_train,
    nb_train_score,
)

DOCS = [
    (1, "spam spam buy now cheap spam", True),
    (2, "buy cheap pills now spam", True),
    (3, "meeting agenda for the quarterly review", False),
    (4, "the quarterly report and review notes", False),
    (5, "spam review", True),
    (6, "", False),  # empty doc: scores the bare prior
]
B = 64
ALPHA = 1.0


def _bucket(tok: str) -> int:
    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    return h % B


def _ref_model():
    c_pos: dict[int, int] = {}
    c_neg: dict[int, int] = {}
    np = nn = 0
    for _, text, y in DOCS:
        np += y
        nn += not y
        for tok in text.lower().split():
            d = c_pos if y else c_neg
            b = _bucket(tok)
            d[b] = d.get(b, 0) + 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    w = {
        b: math.log((c_pos.get(b, 0) + ALPHA) / (t_pos + ALPHA * B))
        - math.log((c_neg.get(b, 0) + ALPHA) / (t_neg + ALPHA * B))
        for b in range(B)
    }
    prior = math.log((np + ALPHA) / (nn + ALPHA))
    return w, prior


def _ref_scores():
    w, prior = _ref_model()
    out = {}
    for did, text, _ in DOCS:
        s = prior + sum(w[_bucket(t)] for t in text.lower().split())
        out[did] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, is_spam boolean")


def test_model_matches_reference(spark, docs):
    model = {
        r.bucket: r.weight
        for r in nb_train(
            docs, "is_spam", num_buckets=B, alpha=ALPHA, hash_fn="md5"
        ).collect()
    }
    w, prior = _ref_model()
    assert len(model) == B + 1
    assert model[-1] == pytest.approx(prior, abs=1e-12)
    for b in range(B):
        assert model[b] == pytest.approx(w[b], abs=1e-12), b


def test_scores_match_reference(spark, docs):
    got = {
        r.doc_id: (r.nb_score, r.nb_pred)
        for r in nb_train_score(
            docs, "is_spam", num_buckets=B, alpha=ALPHA, hash_fn="md5"
        ).collect()
    }
    ref = _ref_scores()
    for did, _, y in DOCS:
        assert got[did][0] == pytest.approx(ref[did], abs=1e-6), did
    # resubstitution on a separable toy corpus classifies correctly
    for did, text, y in DOCS:
        if text:
            assert got[did][1] == y, (did, got[did])
    # empty doc scores exactly the prior
    _, prior = _ref_model()
    assert got[6][0] == pytest.approx(round(prior, 6), abs=1e-6)


def test_separate_train_and_score_corpora(spark, docs):
    model = nb_train(docs, "is_spam", num_buckets=B, hash_fn="md5")
    unseen = spark.createDataFrame(
        [(100, "cheap spam pills"), (101, "quarterly meeting notes")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.nb_pred
        for r in nb_score(unseen, model, num_buckets=B, hash_fn="md5").collect()
    }
    assert got[100] is True
    assert got[101] is False


def test_no_python_in_plans(spark, docs):
    model = nb_train(docs, "is_spam", num_buckets=B, hash_fn="md5")
    scored = nb_score(docs, model, num_buckets=B, hash_fn="md5")
    for df in (model, scored):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_model_broadcast_in_score_plan(spark, docs):
    model = nb_train(docs, "is_spam", num_buckets=B, hash_fn="md5")
    plan = (
        nb_score(docs, model, num_buckets=B, hash_fn="md5")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus-side plan must never shuffle-join: no SMJ anywhere in
    # the score plan (train's densify join is broadcast too)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


# ---- logistic regression (batch gradient, rounded recurrence) ----------------

def _r6(v: float) -> float:
    """HALF_UP 6-dp rounding (Spark F.round semantics, away from zero)."""
    return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6


def _idot(row, w):
    """Exact-integer 6-dp dot product — the engine-portable form
    classify._int_dot uses (long sum, floor((s+5e5)/1e6)/1e6)."""
    s = sum(round(x * 1e6) * round(w[b] * 1e6) for b, x in row.items())
    return math.floor((s + 500000) / 1000000.0) / 1e6


def _lr_ref_scores(docs, buckets=B, lr=0.5, iters=3):
    """Independent NumPy-free reference of the EXACT lr_train recurrence
    (same hashing, same tf features, same 6-dp rounding at every edge)."""
    feat: dict[int, dict[int, float]] = {}
    labels: dict[int, float] = {}
    for did, text, y in docs:
        labels[did] = 1.0 if y else 0.0
        toks = text.lower().split()
        row: dict[int, int] = {}
        for t in toks:
            b = _bucket(t)
            row[b] = row.get(b, 0) + 1
        n = sum(row.values())
        feat[did] = {b: _r6(c / n) for b, c in row.items()}
        feat[did][-1] = 1.0  # bias
    n_docs = float(len(docs))
    w = {b: 0.0 for d in feat.values() for b in d}
    for _ in range(iters):
        z = {did: _idot(row, w) for did, row in feat.items()}
        r = {did: _r6(labels[did] - 1.0 / (1.0 + math.exp(-z[did])))
             for did in feat}
        g: dict[int, float] = {}
        gi: dict[int, int] = {}
        for did, row in feat.items():
            for b, x in row.items():
                gi[b] = gi.get(b, 0) + round(x * 1e6) * round(r[did] * 1e6)
        g = {b: math.floor((v + 500000) / 1000000.0) / 1e6
             for b, v in gi.items()}
        w = {b: _r6(w[b] + lr * g.get(b, 0.0) / n_docs) for b in w}
    return {
        did: _r6(1.0 / (1.0 + math.exp(-_idot(row, w))))
        for did, row in feat.items()
    }


def test_lr_matches_reference_and_separates(spark):
    from eventanalysis_spark.operators.classify import lr_score, lr_train

    docs_rows = [d for d in DOCS if d[1].strip()]  # token-ful docs
    docs = spark.createDataFrame(
        docs_rows, "doc_id long, text string, is_spam boolean"
    )
    model = lr_train(
        docs, "is_spam", num_buckets=B, learning_rate=0.5,
        iterations=3, hash_fn="md5",
    )
    got = {r["doc_id"]: r for r in
           lr_score(docs, model, num_buckets=B, hash_fn="md5").collect()}
    want = _lr_ref_scores(docs_rows)
    for did, s in want.items():
        assert got[did]["lr_score"] == pytest.approx(s, abs=2e-6), did
    # discriminative: every spam doc scores above every ham doc
    spam = [got[d]["lr_score"] for d, _, y in docs_rows if y]
    ham = [got[d]["lr_score"] for d, _, y in docs_rows if not y]
    assert min(spam) > max(ham)
    # deterministic across partitionings
    model13 = lr_train(
        docs.repartition(13), "is_spam", num_buckets=B,
        learning_rate=0.5, iterations=3, hash_fn="md5",
    )
    got13 = {r["doc_id"]: r["lr_score"] for r in
             lr_score(docs, model13, num_buckets=B, hash_fn="md5").collect()}
    assert got13 == {d: r["lr_score"] for d, r in got.items()}


def test_lr_feature_arrays_tokenless_docs_bias_only(spark):
    """explode_outer keeps token-less docs alive via a null-token row;
    that row must NOT hash into a real bucket. md5(NULL) is NULL, but
    xxhash64(NULL) is the seed (42) — unguarded, every empty/null-text
    doc grew a phantom feature in bucket pmod(42, B) under the
    production hash and trained different weights than _lr_features."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.classify import _lr_feature_arrays

    docs = spark.createDataFrame(
        [(1, "hello world", True), (2, "", False), (3, None, True),
         (4, "   ", False)],
        "doc_id long, text string, lab boolean",
    )
    for hash_fn in ("xxhash64", "md5"):
        rows = {r["doc_id"]: r for r in _lr_feature_arrays(
            docs, "lab", "text", "doc_id", 64, hash_fn
        ).collect()}
        assert set(rows) == {1, 2, 3, 4}
        for d in (2, 3, 4):  # token-less: the bias entry alone
            assert rows[d]["__bs"] == [-1], (hash_fn, d, rows[d])
            assert rows[d]["__xi"] == [1000000]
        assert -1 in rows[1]["__bs"] and len(rows[1]["__bs"]) == 3


def test_lr_train_empty_corpus_returns_empty_model(spark):
    from eventanalysis_spark.operators.classify import lr_train

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lab boolean"
    )
    model = lr_train(docs, "lab", num_buckets=16, iterations=2)
    assert model.count() == 0
