"""Substring-level (cross-document span) dedup — operators/spans.py.

Hand-computed fixtures pin the window/island semantics; a partitioning
sweep pins determinism; a plan check pins the no-Python / per-doc-window
scale shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.spans import (
    crossdoc_dup_grams,
    duplicate_span_islands,
    ngram_windows,
    substring_dup_stats,
)

DOCS = [
    # doc 0 and 1 share the 5-gram "a b c d e" (twice in doc 1)
    (0, "a b c d e x y z w v"),
    (1, "q a b c d e r s a b c d e t"),
    # doc 2 shares nothing
    (2, "p p p p p p"),
    # doc 3: too short for any 5-gram window
    (3, "u v"),
    # doc 4: empty text
    (4, ""),
    # docs 5/6: identical → every window duplicated
    (5, "m n o p q r"),
    (6, "m n o p q r"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_windows_positions_and_counts(docs_df):
    w = ngram_windows(docs_df, k=5).orderBy("doc_id", "pos").collect()
    per_doc = {}
    for r in w:
        per_doc.setdefault(r.doc_id, []).append(r.pos)
    # doc 0: 10 tokens → 6 windows at pos 1..6
    assert per_doc[0] == [1, 2, 3, 4, 5, 6]
    # doc 1: 14 tokens → 10 windows
    assert per_doc[1] == list(range(1, 11))
    # doc 3 (2 tokens) and doc 4 (empty) emit nothing
    assert 3 not in per_doc and 4 not in per_doc
    # docs 5/6: 6 tokens → 2 windows each
    assert per_doc[5] == [1, 2] and per_doc[6] == [1, 2]


def test_crossdoc_dup_grams_excludes_within_doc_repeats(docs_df):
    w = ngram_windows(docs_df, k=5)
    dup = crossdoc_dup_grams(w).collect()
    # cross-doc grams: "a b c d e" (docs 0,1) and the 2 grams of docs 5/6.
    # doc 2's "p p p p p" repeats WITHIN one doc only → not cross-doc.
    assert len(dup) == 3
    assert {r.n_docs for r in dup} == {2}


def test_substring_dup_stats_hand_computed(docs_df):
    rows = {r.doc_id: r for r in substring_dup_stats(docs_df, k=5).collect()}
    assert rows[0].n_windows == 6 and rows[0].n_dup_windows == 1
    assert rows[0].dup_frac == pytest.approx(round(1 / 6, 6))
    # doc 1: the shared gram occurs at two positions → 2 dup windows of 10
    assert rows[1].n_windows == 10 and rows[1].n_dup_windows == 2
    # doc 2: windows but no cross-doc dups → frac 0.0 (not null)
    assert rows[2].n_windows == 2 and rows[2].n_dup_windows == 0
    assert rows[2].dup_frac == 0.0
    # docs 3/4: no windows → present with 0s and NULL frac
    assert rows[3].n_windows == 0 and rows[3].dup_frac is None
    assert rows[4].n_windows == 0 and rows[4].dup_frac is None
    # identical docs: everything duplicated
    assert rows[5].dup_frac == 1.0 and rows[6].dup_frac == 1.0


def test_islands_merge_overlapping_and_adjacent(docs_df):
    rows = duplicate_span_islands(docs_df, k=5).orderBy(
        "doc_id", "span_start"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_windows)
        )
    # doc 0: one dup window at pos 1 → span [1, 5]
    assert by_doc[0] == [(1, 5, 1)]
    # doc 1: dup windows at pos 2 and 9 → intervals [2,6] and [9,13]:
    # gap (7..8) → two islands
    assert by_doc[1] == [(2, 6, 1), (9, 13, 1)]
    # docs 5/6: windows at pos 1,2 overlap → single merged span [1, 6]
    assert by_doc[5] == [(1, 6, 2)] and by_doc[6] == [(1, 6, 2)]
    assert 2 not in by_doc and 3 not in by_doc


def test_adjacent_but_not_overlapping_windows_merge():
    # islands merge when intervals overlap OR touch end+1 == start
    from eventanalysis_spark.session import get_spark

    spark = get_spark("tests", master="local[8]")
    docs = spark.createDataFrame(
        [
            (0, "a b c x x x x x a b c"),  # k=3: dup at pos 1 and 9
            (1, "a b c y a b c"),  # dup at pos 1 and 5: [1,3],[5,7] gap at 4
            (2, "z a b c a b c z"),  # dup at pos 2 and 5: [2,4],[5,7] touch
        ],
        "doc_id long, text string",
    )
    rows = duplicate_span_islands(docs, k=3).orderBy(
        "doc_id", "span_start"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert by_doc[0] == [(1, 3), (9, 11)]
    assert by_doc[1] == [(1, 3), (5, 7)]  # gap token 4 keeps them apart
    assert by_doc[2] == [(2, 7)]  # adjacent intervals merge


def test_stats_deterministic_across_partitionings(spark, docs_df):
    base = substring_dup_stats(docs_df, k=5).orderBy("doc_id").collect()
    for n in (1, 3, 16):
        got = (
            substring_dup_stats(docs_df.repartition(n), k=5)
            .orderBy("doc_id")
            .collect()
        )
        assert got == base


def test_plan_shape_no_python_no_global_window(docs_df):
    """Scale shape: zero Python in the plan (all codegen'd expressions)
    and the island window is PARTITIONED by doc — no single-partition
    Exchange for the window step."""
    plan = duplicate_span_islands(docs_df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan


def test_remove_duplicate_spans_hand_computed(docs_df):
    from eventanalysis_spark.operators.spans import remove_duplicate_spans

    rows = {
        r.doc_id: r for r in remove_duplicate_spans(docs_df, k=5).collect()
    }
    # doc 0: span [1,5] cut → tokens 6..10 remain
    assert rows[0].clean_text == "x y z w v"
    assert rows[0].n_tokens_removed == 5
    # doc 1: spans [2,6] and [9,13] cut → q r s t remain
    assert rows[1].clean_text == "q r s t"
    assert rows[1].n_tokens_removed == 10
    # doc 2: no cross-doc spans → pass-through
    assert rows[2].clean_text == "p p p p p p"
    assert rows[2].n_tokens_removed == 0
    # fully-duplicated docs vanish to empty text
    assert rows[5].clean_text == "" and rows[5].n_tokens_removed == 6
    # short/empty docs pass through
    assert rows[3].clean_text == "u v" and rows[4].clean_text == ""


def test_remove_duplicate_spans_idempotent(spark, docs_df):
    """Second application over the cleaned corpus removes nothing: the
    duplicated material is gone."""
    from eventanalysis_spark.operators.spans import remove_duplicate_spans

    once = remove_duplicate_spans(docs_df, k=5).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = remove_duplicate_spans(once, k=5).collect()
    assert all(r.n_tokens_removed == 0 for r in twice)
