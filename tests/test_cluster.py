"""Connected-components / dedup-cluster tests (operators/cluster.py)."""

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.cluster import (
    connected_components,
    dedup_cluster_assignments,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["comp"] for r in connected_components(df).collect()
    }


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_path_graph_converges_logarithmically(spark):
    # a 64-node path needs pointer jumping (plain neighbor propagation
    # would take 63 rounds; the cap of 25 forces the log-round behavior)
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_cc_star_and_cycle(spark):
    edges = [(5, i) for i in range(6, 10)] + [(20, 21), (21, 22), (22, 20)]
    got = _cc(spark, edges)
    assert {got[i] for i in range(5, 10)} == {5}
    assert {got[i] for i in (20, 21, 22)} == {20}


def test_cc_direction_independent(spark):
    a = _cc(spark, [(3, 1), (2, 3)])
    b = _cc(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_dedup_cluster_assignments(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),    # near dup of 1
        (4, "totally different words entirely here now"),
        (5, "another unrelated document with other text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_cluster_assignments(
            df, id_col="doc_id", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[4] == (4, True)
    assert got[5] == (5, True)


def test_dedup_clusters_transitive(spark):
    # 2-shingle jaccard: 1~2 = 5/7, 2~3 = 3/9, 1~3 = 1/9 — with
    # threshold 0.3 the 1-3 link exists only transitively through 2
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f g h"),
        (3, "e f g h i j"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_cluster_assignments(
            df, id_col="doc_id", num_hashes=32, bands=32,
            shingle_k=2, threshold=0.3,
        ).collect()
    }
    assert got[1] == got[2] == got[3] == 1
