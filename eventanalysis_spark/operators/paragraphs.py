"""Paragraph-level corpus deduplication (keep-first-occurrence).

The between-documents / within-corpus granularity used by public web
pipelines (AI2 Dolma, RefinedWeb): a *paragraph* (newline-delimited
block) that recurs anywhere in the corpus — boilerplate footers, cookie
banners, license blurbs — is kept only at its globally-first occurrence
and cut everywhere else. Complements the two sibling operators:
`dedup.py` removes whole near-duplicate documents, `spans.py` removes
duplicated k-token substrings; this removes repeated *lines/blocks*,
the dominant duplication mode in crawled HTML-to-text output.

The reference engine has no comparable operator; this is part of the
training-data-pipeline surface the mission brief makes first-class.

Spark-first shape:
  - paragraph explosion is JVM-side (split on '\\n' + posexplode) — no
    Python anywhere in the plan;
  - the corpus-wide "first occurrence" winner per paragraph is ONE hash
    aggregate `min(struct(doc_id, para_idx))` over an 8-byte
    xxhash64(paragraph) key — min(struct) compiles to a partial-
    aggregatable SortAggregate, so the shuffle moves one partial row
    per (partition, hash), never the paragraph text;
  - the keep/cut decision re-joins winners to the paragraph stream on
    the 8-byte key; reconstruction is a per-doc sort-free
    `sort_array(collect_list(struct(idx, text)))` — partitioned by
    doc, no global sort;
  - whitespace-only paragraphs are never dedup candidates (empty is not
    content) and survive in place, preserving blank-line structure.

xxhash64 collisions conflate two distinct paragraphs (the later one
would be cut spuriously); at 10^12 paragraphs the birthday bound vs
2^64 gives ~0.03 expected collisions — acceptable for dedup, and the
DuckDB oracle (exact paragraph equality) pins semantics at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """(id, para_idx, para) — one row per newline-delimited paragraph.

    para_idx is 1-based document order. Paragraphs are NOT trimmed (the
    original text must reconstruct byte-identically when nothing is
    cut); emptiness is judged on trim(para) by the callers.

    `parallelism`: same knob as spans.ngram_windows — pass the core
    count when the source arrives in fewer splits than cores (one tiny
    parquet file → one task); leave None for well-split 100 TB sources.
    """
    if parallelism:
        docs = docs.repartition(parallelism)
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos0", "para"),
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("para_idx"),
        "para",
    )


def paragraph_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document paragraph-duplication profile:
    (id, n_paras, n_dup_paras, dup_para_frac).

    n_dup_paras counts non-blank paragraphs whose exact text occurs at
    least twice anywhere in the corpus (including twice within the same
    document — within-doc repetition is duplication too). Blank
    paragraphs are excluded from both numerator and denominator.
    dup_para_frac is null when a doc has no non-blank paragraphs."""
    paras = explode_paragraphs(docs, text_col, id_col, parallelism)
    content = paras.where(F.trim("para") != "").select(
        id_col, F.xxhash64("para").alias("ph")
    )
    dup = (
        content.groupBy("ph")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") > 1)
    )
    per_doc_dup = (
        content.join(dup.select("ph"), "ph")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_paras"))
    )
    totals = content.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(per_doc_dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_dup_paras", F.lit(0)).cast("long").alias("n_dup_paras"),
            F.round(
                F.coalesce("n_dup_paras", F.lit(0)).cast("double")
                / F.col("n_paras"),
                6,
            ).alias("dup_para_frac"),
        )
    )


def dedup_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Keep-first paragraph dedup: every non-blank paragraph survives
    only at its globally-first occurrence — ordered by (doc_id,
    para_idx) — and is cut from all later positions (Dolma's
    'paragraph' dedup granularity; RefinedWeb §'line-wise corrections').

    Blank paragraphs always survive, so untouched documents
    reconstruct byte-identically (split('\\n') ⊕ join('\\n') is the
    identity). Output: (id, clean_text, n_paras_removed)."""
    paras = explode_paragraphs(docs, text_col, id_col, parallelism)
    hashed = paras.withColumn(
        "ph",
        F.when(F.trim("para") != "", F.xxhash64("para")),
    )
    # corpus-wide first occurrence per paragraph hash: one partial-
    # aggregatable min(struct) — the only corpus-scale shuffle, on an
    # 8-byte key with per-doc-batch partial rows
    winners = (
        hashed.where(F.col("ph").isNotNull())
        .groupBy("ph")
        .agg(F.min(F.struct(id_col, "para_idx")).alias("w"))
        .select("ph", F.col(f"w.{id_col}").alias("__wid"), F.col("w.para_idx").alias("__widx"))
    )
    marked = hashed.join(winners, "ph", "left").withColumn(
        "keep",
        F.col("ph").isNull()
        | ((F.col(id_col) == F.col("__wid")) & (F.col("para_idx") == F.col("__widx"))),
    )
    rebuilt = (
        marked.where("keep")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s["para"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("__n_kept"),
        )
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_paras"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("__n_paras") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_paras_removed"),
        )
    )


def dedup_lines_within_doc(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style within-document line dedup: every non-blank line that
    repeats INSIDE the same document survives only at its first
    occurrence (C4 'we discard all but one of any three-sentence span
    occurring more than once' relaxed to the line granularity used by
    its public reimplementations). Corpus-wide repetition is the sibling
    operator `dedup_paragraphs`; this one is purely per-row.

    Scale shape: ONE narrow projection — no explode, no shuffle, no
    Python; embarrassingly parallel at any corpus size. The keep-first
    test is array_position(lines, x) == i (first equal element), which
    is O(L²) in the per-doc line count — right for web pages (L is
    hundreds); a pathological single doc with 10^5+ lines would want the
    explode + per-doc-window form instead.

    Blank lines always survive (blank is structure, not content), so
    untouched documents reconstruct byte-identically.
    Output: (id, clean_text, n_lines_removed)."""
    t = F.split(F.col(text_col), "\n")
    kept = F.filter(
        t,
        lambda x, i: (F.trim(x) == "")
        | (F.array_position(t, x) == i + 1),
    )
    return docs.select(
        F.col(id_col),
        F.concat_ws("\n", kept).alias("clean_text"),
        (F.size(t) - F.size(kept)).cast("long").alias("n_lines_removed"),
    )
