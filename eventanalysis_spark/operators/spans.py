"""Substring-level (cross-document span) deduplication.

Detects token n-gram windows that recur across *different* documents —
the span-level analog of exact/MinHash doc dedup, after Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" (public
arXiv:2107.06499), which removes repeated ~50-token substrings rather
than whole near-duplicate documents. The reference engine has no
comparable operator; this is part of the training-data-pipeline surface
the mission brief makes first-class.

Spark-first shape (vs the paper's suffix array):
  - tokenize + sliding n-gram windows are generated JVM-side
    (split / sequence / transform / slice — no Python in the plan);
  - the gram STRING is dropped immediately in favor of xxhash64(gram)
    (8-byte key), so the big shuffle moves (id, pos, hash) rows only —
    at 100 TB the token-window stream is the dominant cost either way,
    and a long key keeps it as narrow as it can be;
  - "duplicated" grams are found by a map-side-partial hash aggregate
    over gram_hash with an early HAVING-style filter (count of distinct
    docs > 1) — output is tiny relative to the window stream;
  - per-doc marking is one hash join window-stream ⋈ dup-gram-set on the
    8-byte key, then a partial-aggregatable per-doc count;
  - overlapping duplicated windows are merged into maximal spans
    ("islands") with a per-doc window function — partitioned by doc_id,
    so no global sort and no single-partition window.

xxhash64 collisions over distinct grams would conflate two grams; at
10^12 windows the expected collision count is ~0.03 (birthday bound vs
2^64), and a collision only ever *adds* a span candidate — acceptable
for a dedup recall/precision trade at scale, and the DuckDB oracle
(exact gram equality) pins the semantics at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ngram_windows(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """(id, pos, gram_hash) for every k-token sliding window.

    Tokenization: trim, split on whitespace runs — byte-for-byte the
    DuckDB `regexp_split_to_array(trim(text), '\\s+')` twin so the oracle
    is exact. pos is 1-based (first window = 1). Docs with fewer than k
    tokens emit no rows. Entirely JVM-side (codegen'd).

    `parallelism`: window generation is the CPU-heavy narrow stage; when
    the source arrives in fewer splits than cores (one small parquet
    file → ONE task doing all the tokenizing), pass the core count to
    round-robin the docs first. Leave None when the source is already
    well-split (the 100 TB case — parquet splits ≫ cores), where an
    extra full shuffle of the corpus would be pure waste."""
    if parallelism:
        docs = docs.repartition(parallelism)
    toks = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("t")
    )
    grams = toks.select(
        id_col,
        F.posexplode(
            # Spark sequence(1, 0) DESCENDS — gate short docs explicitly.
            # let-binding (transform over a 1-element array): CollapseProject
            # inlines the upstream split into every `t` reference, so without
            # the binding the tokenizer re-runs once PER WINDOW (the shingles()
            # O(tokens²) bug); `u` is a bound lambda variable, split runs once.
            F.expr(
                f"get(transform(array(t), u ->"
                f" CASE WHEN size(u) >= {k} THEN"
                f" transform(sequence(1, size(u) - {k - 1}),"
                f" i -> concat_ws(' ', slice(u, i, {k})))"
                f" ELSE array() END), 0)"
            )
        ).alias("pos0", "gram"),
    )
    return grams.select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.xxhash64("gram").alias("gram_hash"),
    )


def crossdoc_dup_grams(windows: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """gram_hash values appearing in MORE THAN ONE distinct document.

    One hash aggregate on the 8-byte key with map-side partial
    count-distinct; the result set (the duplicated-gram dictionary) is
    orders of magnitude smaller than the window stream."""
    return (
        windows.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def substring_dup_stats(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document cross-doc duplication profile:
    (id, n_windows, n_dup_windows, dup_frac).

    n_dup_windows counts windows whose gram also occurs in another doc;
    dup_frac = n_dup_windows / n_windows (null when a doc has no
    windows). Docs shorter than k tokens appear with n_windows = 0 —
    a curation policy needs to SEE them, not silently lose them."""
    w = ngram_windows(docs, k, text_col, id_col, parallelism)
    dup = crossdoc_dup_grams(w, id_col)
    per_doc_dup = (
        w.join(dup.select("gram_hash"), "gram_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    totals = w.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(per_doc_dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            # null (not 0) when the doc has no windows at all; 0.0 when it
            # has windows but none duplicated — curation policy distinction
            F.round(
                F.coalesce("n_dup_windows", F.lit(0)).cast("double")
                / F.col("n_windows"),
                6,
            ).alias("dup_frac"),
        )
    )


def duplicate_span_islands(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Maximal duplicated substring spans per document.

    Each duplicated k-token window covers token interval
    [pos, pos + k - 1]; overlapping/adjacent windows are merged into
    islands via the classic gaps-and-islands form (running max of span
    end over a PER-DOC window — no unpartitioned window, no global
    sort). Output: (id, span_start, span_end, n_windows) with token
    (not byte) coordinates, one row per maximal span."""
    w = ngram_windows(docs, k, text_col, id_col, parallelism)
    dup = crossdoc_dup_grams(w, id_col)
    spans = w.join(dup.select("gram_hash"), "gram_hash").select(
        id_col, "pos", (F.col("pos") + (k - 1)).alias("end")
    )
    byd = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("end").over(
        byd.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(byd)
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Rewrite each document with its cross-document duplicated spans cut
    out — the apply step of Lee-et-al substring dedup (arXiv:2107.06499
    removes the repeated substring from all but one occurrence; this
    variant removes it everywhere, the conservative form for training
    corpora).

    Shape: the island set is ~spans-per-doc rows (tiny vs the corpus);
    it is grouped to one array row per doc and joined back, then the cut
    is ONE array expression — tokens whose 1-based position falls inside
    any [span_start, span_end] are filtered out and the rest re-joined
    with single spaces. Docs with no duplicated spans pass through with
    whitespace runs collapsed (the operator is idempotent on its own
    output). Output: (id, clean_text, n_tokens_removed)."""
    islands = duplicate_span_islands(docs, k, text_col, id_col, parallelism)
    per_doc = islands.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__t")
    ).join(per_doc, id_col, "left")
    kept = F.filter(
        "__t",
        lambda tok, i: ~F.exists(
            "__spans",
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return toks.select(
        id_col,
        F.when(F.col("__spans").isNull(), F.concat_ws(" ", "__t"))
        .otherwise(F.concat_ws(" ", kept))
        .alias("clean_text"),
        F.when(F.col("__spans").isNull(), F.lit(0).cast("long"))
        .otherwise((F.size("__t") - F.size(kept)).cast("long"))
        .alias("n_tokens_removed"),
    )
