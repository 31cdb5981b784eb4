"""TextRank (operators/textrank.py): edge construction hand-check,
rank vs a pure-Python PageRank reference, partition invariance,
top-k determinism."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.textrank import (
    textrank,
    textrank_keywords,
    word_adjacency_edges,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark runs fast and spark scales"),
        (1, "fast data needs fast spark"),
        (2, "scales and data and spark"),
        (3, ""),
        (4, "solo"),
        (5, "dup dup dup"),  # only self-loops -> contributes no edges
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_edges(texts):
    w = Counter()
    for t in texts:
        toks = t.strip().split()
        for u, v in zip(toks, toks[1:]):
            if u != v:
                w[(min(u, v), max(u, v))] += 1
    sym = {}
    for (a, b), c in w.items():
        sym[(a, b)] = c
        sym[(b, a)] = c
    return sym


def _py_textrank(sym_edges, iterations=5, d=0.85):
    outw = defaultdict(float)
    for (s, _t), c in sym_edges.items():
        outw[s] += c
    nodes = sorted(outw)
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for (s, t), c in sym_edges.items():
            contrib[t] += rank[s] * c / outw[s]
        rank = {n: (1 - d) + d * contrib.get(n, 0.0) for n in nodes}
    return rank


def test_edges_hand_computed(spark):
    df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in word_adjacency_edges(df).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 2}


def test_edges_drop_self_loops_and_short_docs(spark, docs):
    got = word_adjacency_edges(docs).collect()
    terms = {r["src"] for r in got}
    assert "dup" not in terms and "solo" not in terms
    assert all(r["src"] != r["dst"] for r in got)


def test_textrank_matches_python_reference(spark, docs):
    texts = [r["text"] for r in docs.collect()]
    want = _py_textrank(_py_edges(texts), iterations=5)
    got = {
        r["term"]: r["rank"]
        for r in textrank(word_adjacency_edges(docs), 5).collect()
    }
    assert set(got) == set(want)
    for term, v in want.items():
        assert abs(got[term] - v) < 1e-9, term


def test_rank_mass_conservation(spark, docs):
    """Sum of ranks stays |V| under PageRank on a symmetric graph with
    no dangling nodes (every node has out-edges by construction)."""
    r = textrank(word_adjacency_edges(docs), 8)
    total = r.agg(F.sum("rank")).collect()[0][0]
    n = r.count()
    assert abs(total - n) < 1e-6


def test_keywords_deterministic_across_partitioning(spark, docs):
    a = [tuple(r) for r in textrank_keywords(docs, k=4).collect()]
    b = [
        tuple(r)
        for r in textrank_keywords(docs.repartition(7), k=4).collect()
    ]
    assert a == b and len(a) == 4
    ranks = [r[1] for r in a]
    assert ranks == sorted(ranks, reverse=True)


def test_keywords_pick_central_terms(spark, docs):
    top = [r["term"] for r in textrank_keywords(docs, k=3).collect()]
    # the hubs of this tiny corpus ("and", "fast", "spark") outrank
    # everything; "solo"/"dup" never appear (no edges)
    assert top == ["and", "fast", "spark"]
