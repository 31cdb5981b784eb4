"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003, "Winnowing: Local Algorithms for Document Fingerprinting"
— the MOSS algorithm).

Where MinHash (dedup.py) answers "are these two DOCUMENTS near-identical
as bags of shingles?", winnowing answers the LOCAL question: "do these
two documents share any contiguous passage of at least t characters?" —
the copied-paragraph / boilerplate-block / license-text signal a
training-data pipeline needs when whole-document similarity is low but
a chunk was lifted verbatim. Guarantee (the paper's): any shared
substring of length >= t = w + k - 1 produces at least one IDENTICAL
selected fingerprint in both documents, and no substring match shorter
than k is ever detected.

Algorithm: normalize text (lowercase, strip non-alphanumerics — the
paper's "irrelevant features" pass), hash every character k-gram, slide
a w-gram window over the hash sequence, and in each window select the
MINIMUM hash — ties broken by the RIGHTMOST occurrence (the paper's
robust-winnowing rule, which minimizes selected-set churn under edits).
The selected (position, hash) set, deduplicated, is the fingerprint.

Scale shape:
  - Selection is a narrow per-row pass — array HOFs over the k-gram
    hash array, zero Python, no shuffle, no window function. Density is
    2/(w+1) of the gram count (paper Thm. 2), so the exploded output is
    a small multiple of the input text volume.
  - Both the gram-hash array and the normalized string are let-bound
    once per row (transform-over-1-element-array) — the NOTES.md HOF
    rule: an unbound reference would re-run normalization per gram and
    re-hash per window, turning O(n·w) into O(n·w·k) regex work.
  - The per-window argmin scans its w-slice (O(n·w) total vs the
    paper's O(n) deque) — the declarative form Catalyst can evaluate
    without a stateful UDF; w is a small constant (4–16) so the factor
    is bounded and the pass stays whole-stage-generated.
  - Overlap detection joins on the fingerprint VALUE with a per-value
    posting cap — the LSH mega-bucket rule (dedup.py): a boilerplate
    gram shared by 10^9 pages must not become a 10^18-pair join key.

Reference parity note: the reference engine has no fingerprint
operator; this extends the web-scale dedup surface (its nearest
neighbor is textstats.fingerprint, a whole-document rolling hash).
Hash is hash60_md5 (dedup.py:34) so the DuckDB oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60_md5


def _normalize(text: Column) -> Column:
    """The paper's feature-cleaning pass: case- and layout-insensitive
    matching. Keep [a-z0-9] only — whitespace and punctuation edits do
    not move fingerprints."""
    return F.regexp_replace(F.lower(text), "[^a-z0-9]", "")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Selected winnowing fingerprints: one row per (id, pos, fp).

    `pos` is the 0-based k-gram start offset in the NORMALIZED text —
    two docs sharing a fingerprint value share the k normalized chars
    at their respective positions; a run of shared fps at compatible
    offsets is a shared passage. Documents whose normalized text is
    empty yield no rows; shorter than k, one whole-string gram at 0
    (short docs still participate, the shingles() convention).

    Guarantees (w=4, k=5 ⇒ t=8): every shared normalized substring of
    length >= 8 is detected; nothing shorter than 5 ever matches.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")

    def _grams(t: Column) -> Column:
        # one hash per k-gram start; len < k ⇒ single whole-string gram
        n_grams = F.greatest(F.length(t) - k + 1, F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: hash60_md5(t.substr(i + 1, F.lit(k))),
        )

    def _select(hs: Column) -> Column:
        # robust winnowing: per window the min hash, rightmost on ties.
        # struct(fp, -pos) makes array_min pick (min fp, max pos).
        ng = F.size(hs)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(ng - w, F.lit(0))),
                lambda i: F.array_min(
                    F.transform(
                        F.sequence(i, F.least(i + w - 1, ng - 1)),
                        lambda j: F.struct(
                            F.get(hs, j).alias("fp"), (-j).alias("njpos")
                        ),
                    )
                ),
            )
        )

    norm = _normalize(F.col(text_col))
    # nested let-binding: normalized string bound once, gram-hash array
    # bound once (NOTES.md HOF rule — lambda vars, not inlined trees)
    selected = F.get(
        F.transform(
            F.array(norm),
            lambda t: F.get(F.transform(F.array(_grams(t)), _select), 0),
        ),
        0,
    )
    return (
        docs.where(F.length(_normalize(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(selected).alias("__s"))
        .select(
            id_col,
            (-F.col("__s.njpos")).cast("int").alias("pos"),
            F.col("__s.fp").alias("fp"),
        )
    )


def winnow_overlap_pairs(
    fps: DataFrame,
    min_common: int = 2,
    max_fanout: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing >= `min_common` DISTINCT fingerprint
    values, from `winnow_fingerprints` output — the MOSS match report.

    Scale shape: distinct (fp, id) postings first (a doc repeating its
    own boilerplate contributes each fp once), then fp values whose
    posting list exceeds `max_fanout` docs are DROPPED before the
    self-join — corpus-universal boilerplate grams carry no pair signal
    and would otherwise emit O(list²) candidates on one join key (the
    LSH mega-bucket rule). Dropped mass is observable: compare
    count(distinct fp) in and out. Pair emission joins the surviving
    postings with id_a < id_b; `n_common` counts distinct shared fps.
    """
    # Pin the postings: `small` and both pair-join sides consume them —
    # unpinned, the md5-per-k-gram fingerprint extraction over every doc
    # re-runs 3x per action. Selected-fingerprint-sized (~n_chars/w per
    # doc), tiny next to one extraction pass.
    posts = (
        fps.select(F.col(id_col).alias("__id"), "fp")
        .distinct()
        .localCheckpoint(eager=False)
    )
    small = (
        posts.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_fanout)
        .select("fp")
    )
    p = posts.join(small, "fp")
    a = p.select("fp", F.col("__id").alias("id_a"))
    b = p.select("fp", F.col("__id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def winnow_shared_passages(
    fps: DataFrame,
    k: int = 5,
    w: int = 4,
    min_fps: int = 2,
    max_fanout: int = 256,
    max_gap: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reconstructed shared passages — the MOSS report form: merge
    matched fingerprints at compatible offsets into
    (id_a, id_b, start_a, start_b, length, n_fps) spans, where
    start_*/length are 0-based char offsets in each doc's NORMALIZED
    text and n_fps counts the distinct fingerprints supporting the span.

    A verbatim shared passage produces fingerprint matches on one
    DIAGONAL (pos_b - pos_a constant), and winnowing guarantees
    consecutive selected fingerprints of a covered passage are at most
    w gram-positions apart — so spans are gaps-and-islands per
    (id_a, id_b, diagonal): split where the position gap exceeds
    `max_gap` (default w + k - 1: the selection guarantee plus k-1
    slack for tie-break jitter at passage edges), then aggregate each
    island. `min_fps` (default 2) suppresses single-gram hash
    coincidences. Span length covers the final k-gram:
    max(pos_a) - min(pos_a) + k.

    Scale shape: the same doc-frequency posting cap as
    winnow_overlap_pairs guards the fp-value join (boilerplate grams
    carry no passage signal); the islands pass is ONE shuffle keyed
    (id_a, id_b, diag) — the island aggregate's grouping keys are a
    superset of the window partition keys, so Catalyst reuses the
    window's exchange for the groupBy."""
    if max_gap is None:
        max_gap = w + k - 1
    # Pin the positional postings — same 3-consumer argument as
    # winnow_overlap_pairs (the fp-df cap + both pair-join sides),
    # without it the fingerprint extraction runs 3x per action.
    posts = fps.select(
        F.col(id_col).alias("__id"), "pos", "fp"
    ).localCheckpoint(eager=False)
    small = (
        posts.select("fp", "__id").distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_fanout)
        .select("fp")
    )
    p = posts.join(small, "fp")
    m = (
        p.select("fp", F.col("__id").alias("id_a"), F.col("pos").alias("pos_a"))
        .join(
            p.select("fp", F.col("__id").alias("id_b"), F.col("pos").alias("pos_b")),
            "fp",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("diag", F.col("pos_b") - F.col("pos_a"))
    )
    from pyspark.sql import Window

    by_diag = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    gap = F.col("pos_a") - F.lag("pos_a").over(by_diag)
    island = F.sum(
        F.when(gap.isNull() | (gap > max_gap), 1).otherwise(0)
    ).over(by_diag.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        m.withColumn("__isl", island)
        .groupBy("id_a", "id_b", "diag", "__isl")
        .agg(
            F.min("pos_a").cast("int").alias("start_a"),
            F.min("pos_b").cast("int").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + k).cast("int").alias("length"),
            F.count_distinct("fp").alias("n_fps"),
        )
        .where(F.col("n_fps") >= min_fps)
        .select("id_a", "id_b", "start_a", "start_b", "length", "n_fps")
    )
