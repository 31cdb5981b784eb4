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


# ---- per-host template-line removal (site boilerplate) ----------------

HOST_DOCS = [
    # host a (4 pages): NAV in 4/4 pages (template at min_frac=0.5),
    # PROMO in 2/4 (passes min_pages=2 but fails min_frac=0.6 below),
    # page 4 repeats NAV twice — ALL occurrences must go
    (1, "a", "NAV BAR\nalpha one"),
    (2, "a", "NAV BAR\nalpha two\nPROMO"),
    (3, "a", "NAV BAR\nalpha three\nPROMO"),
    (4, "a", "NAV BAR\nmid\nNAV BAR"),
    # host b (2 pages): NAV appears on ONE page only — per-host isolation
    # means b keeps it even though a strips it corpus-wide
    (5, "b", "NAV BAR\nbeta one"),
    (6, "b", "beta two\n\nbeta three"),
    # host c (1 page): min_pages=2 can never fire on a single-page host
    (7, "c", "SOLO FOOTER\nSOLO FOOTER"),
]


@pytest.fixture(scope="module")
def host_docs(spark):
    return spark.createDataFrame(HOST_DOCS, "doc_id long, host string, text string")


def test_host_template_detection(spark, host_docs):
    from eventanalysis_spark.operators.paragraphs import host_template_lines

    tpl = {
        (r.host, r.para): r
        for r in host_template_lines(
            host_docs, min_pages=2, min_frac=0.5
        ).collect()
    }
    # NAV BAR saturates host a (4/4 pages); PROMO (2/4 = 0.5) also clears
    assert tpl[("a", "NAV BAR")].n_pages == 4
    assert tpl[("a", "NAV BAR")].page_frac == 1.0
    assert tpl[("a", "PROMO")].page_frac == 0.5
    # host b: NAV BAR on 1/2 pages — below min_pages AND min_frac
    assert ("b", "NAV BAR") not in tpl
    # host c: within-page repeat counts ONE page — min_pages=2 unreachable
    assert ("c", "SOLO FOOTER") not in tpl
    assert set(tpl) == {("a", "NAV BAR"), ("a", "PROMO")}


def test_host_template_min_frac_gate(spark, host_docs):
    from eventanalysis_spark.operators.paragraphs import host_template_lines

    tpl = host_template_lines(host_docs, min_pages=2, min_frac=0.6).collect()
    # PROMO (2/4 pages = 0.5) fails the tightened frac gate; NAV survives
    assert {(r.host, r.para) for r in tpl} == {("a", "NAV BAR")}


def test_strip_host_templates(spark, host_docs):
    from eventanalysis_spark.operators.paragraphs import strip_host_templates

    rows = {
        r.doc_id: r
        for r in strip_host_templates(
            host_docs, min_pages=2, min_frac=0.6
        ).collect()
    }
    # every NAV occurrence on host a goes — including BOTH on page 4
    assert rows[1].clean_text == "alpha one"
    assert rows[2].clean_text == "alpha two\nPROMO"
    assert rows[4].clean_text == "mid"
    assert rows[4].n_template_lines_removed == 2
    # host b keeps its single NAV (per-host isolation) and blank structure
    assert rows[5].clean_text == "NAV BAR\nbeta one"
    assert rows[5].n_template_lines_removed == 0
    assert rows[6].clean_text == "beta two\n\nbeta three"
    # single-page host untouched
    assert rows[7].clean_text == "SOLO FOOTER\nSOLO FOOTER"


def test_strip_templates_identity_when_no_templates(spark, host_docs):
    """min_pages above every host's page count → nothing is a template →
    every doc reconstructs byte-identically (split ⊕ join identity)."""
    from eventanalysis_spark.operators.paragraphs import strip_host_templates

    rows = {
        r.doc_id: r
        for r in strip_host_templates(host_docs, min_pages=100).collect()
    }
    for did, _host, text in HOST_DOCS:
        assert rows[did].clean_text == text
        assert rows[did].n_template_lines_removed == 0


def test_strip_host_templates_no_python(spark, host_docs):
    from eventanalysis_spark.operators.paragraphs import strip_host_templates

    plan = (
        strip_host_templates(host_docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
