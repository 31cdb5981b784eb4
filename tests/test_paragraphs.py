"""Paragraph-level keep-first dedup: operators/paragraphs.py."""

from __future__ import annotations

import pytest

from eventanalysis_spark.operators.paragraphs import (
    dedup_paragraphs,
    explode_paragraphs,
    paragraph_dup_stats,
)

DOCS = [
    # doc 1: footer appears here first — survives here only
    (1, "alpha beta\nCOMMON FOOTER\ngamma"),
    # doc 2: the footer again, plus an internal repeat of 'x y'
    (2, "x y\nCOMMON FOOTER\nx y\ndelta"),
    # doc 3: all-blank structure with a dup of doc 1's first para
    (3, "alpha beta\n\n  \nepsilon"),
    # doc 4: untouched — must reconstruct byte-identically
    (4, "unique one\n\nunique two"),
    # doc 5: every content para is a later dup → empties out to blanks
    (5, "COMMON FOOTER"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_explode_roundtrip(spark, docs):
    """split('\\n') ⊕ join('\\n') is the identity — position and bytes."""
    paras = explode_paragraphs(docs).collect()
    by_doc = {}
    for r in paras:
        by_doc.setdefault(r.doc_id, []).append((r.para_idx, r.para))
    for did, text in DOCS:
        got = [p for _, p in sorted(by_doc[did])]
        assert "\n".join(got) == text


def test_dup_stats(spark, docs):
    rows = {r.doc_id: r for r in paragraph_dup_stats(docs).collect()}
    # doc 1: 3 content paras, 2 dup (alpha beta + footer)
    assert (rows[1].n_paras, rows[1].n_dup_paras) == (3, 2)
    # doc 2: 4 content paras; footer + both 'x y' (within-doc repeat counts)
    assert (rows[2].n_paras, rows[2].n_dup_paras) == (4, 3)
    # doc 3: blanks excluded from both counts
    assert (rows[3].n_paras, rows[3].n_dup_paras) == (2, 1)
    assert (rows[4].n_paras, rows[4].n_dup_paras) == (2, 0)
    assert rows[4].dup_para_frac == 0.0
    assert rows[2].dup_para_frac == 0.75


def test_keep_first_semantics(spark, docs):
    rows = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # footer survives only in doc 1 (globally first by (doc_id, idx))
    assert rows[1].clean_text == "alpha beta\nCOMMON FOOTER\ngamma"
    assert rows[1].n_paras_removed == 0
    # doc 2 loses the footer and the SECOND 'x y' (first occurrence of
    # 'x y' is doc 2 idx 1 — within-doc keep-first)
    assert rows[2].clean_text == "x y\ndelta"
    assert rows[2].n_paras_removed == 2
    # doc 3 loses 'alpha beta' but keeps its blank-line structure
    assert rows[3].clean_text == "\n  \nepsilon"
    assert rows[3].n_paras_removed == 1
    # untouched doc reconstructs byte-identically
    assert rows[4].clean_text == "unique one\n\nunique two"
    assert rows[4].n_paras_removed == 0
    # fully-duplicated doc empties out
    assert rows[5].clean_text == ""
    assert rows[5].n_paras_removed == 1


def test_idempotent(spark, docs):
    once = dedup_paragraphs(docs).select(
        "doc_id", "clean_text"
    )
    twice = dedup_paragraphs(
        once.withColumnRenamed("clean_text", "text")
    ).collect()
    first = {r.doc_id: r.clean_text for r in once.collect()}
    for r in twice:
        assert r.clean_text == first[r.doc_id]
        assert r.n_paras_removed == 0


def test_no_python_in_plan(spark, docs):
    plan = dedup_paragraphs(docs)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_dedup_lines_within_doc(spark):
    from eventanalysis_spark.operators.paragraphs import dedup_lines_within_doc

    docs = spark.createDataFrame(
        [
            (1, "a b\nc d\na b\ne"),          # within-doc repeat cut
            (2, "a b\nx"),                     # cross-doc repeat NOT cut
            (3, "one\n\ntwo\n\nthree"),        # blanks preserved
            (4, "dup\ndup\ndup"),              # repeated repeats
            (5, ""),                           # empty passes through
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_lines_within_doc(docs).collect()}
    assert rows[1].clean_text == "a b\nc d\ne"
    assert rows[1].n_lines_removed == 1
    assert rows[2].clean_text == "a b\nx"
    assert rows[2].n_lines_removed == 0
    assert rows[3].clean_text == "one\n\ntwo\n\nthree"
    assert rows[4].clean_text == "dup"
    assert rows[4].n_lines_removed == 2
    assert rows[5].clean_text == ""
    assert rows[5].n_lines_removed == 0


def test_dedup_lines_plan_is_narrow(spark):
    from eventanalysis_spark.operators.paragraphs import dedup_lines_within_doc

    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = (
        dedup_lines_within_doc(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
