"""Reciprocal-rank fusion (RRF) — hybrid retrieval rank merging.

Combines any number of top-k retrieval lists (sparse BM25, dense
embedding-cosine, URL/quality priors ...) into one ranking with the
Cormack/Clarke/Buettcher formula

    rrf(d) = sum over lists L of 1 / (k + rank_L(d))

(rank 1-based within each list; documents absent from a list contribute
nothing). RRF is the standard way to fuse lexical + vector retrieval
without score calibration — only ranks matter, so BM25's unbounded
scores and cosine's [-1, 1] scores need no normalization.

Scale shape: each input list is already a bounded TOP-K result (the
expensive corpus-wide retrieval — BM25 posting aggregation, ANN bucket
probing — happened upstream); ranking k rows and outer-joining a handful
of k-row frames is constant-sized work regardless of corpus size. The
row_number window below is therefore over AT MOST k rows per list — a
deliberate, bounded exception to the "no unpartitioned windows" rule
(the corpus itself never enters a global window).

Cross-engine determinism: ranks come from (score DESC, id ASC) over
scores the upstream operators already rounded (bm25 ROUND 6, cosine
ROUND 4); the fused score is a sum of exact rationals 1/(k+r) evaluated
as doubles in both engines, reported through the manual
floor(x*1e6 + 0.5)/1e6 rounding (NOTES rule: ROUND() HALF_UP diverges
from double rounding exactly at decimal midpoints, and 1/(60+r) CAN land
on finite binary/decimal values, e.g. 1/64).

The reference engine has no comparable operator; part of the
training-data retrieval surface the brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_list(df: DataFrame, id_col: str, score_col: str, rank_name: str) -> DataFrame:
    """(id, rank) for one bounded retrieval list: 1-based row_number over
    (score DESC, id ASC). Callers pass TOP-K frames only — the window is
    single-partition by design and bounded by k rows."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col), F.row_number().over(w).alias(rank_name)
    )


def rrf_fuse(
    lists: dict[str, DataFrame],
    id_col: str = "doc_id",
    score_cols: dict[str, str] | None = None,
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Fuse named retrieval lists {name: (id, score) top-k frame} into
    (id, rrf_score, <name>_rank ...). Ranks for lists a document missed
    are reported as -1 (sentinel, NOT NULL: nullable ints round-trip as
    NaN doubles through pandas-based comparators). rrf_score uses the
    manual midpoint-safe 6-decimal round; output ordered
    (rrf_score DESC, id ASC), truncated to `topk` when given."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one list")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    score_cols = score_cols or {}
    fused: DataFrame | None = None
    names = list(lists)
    for name in names:
        df = lists[name]
        score = score_cols.get(name)
        if score is None:
            score = [c for c in df.columns if c != id_col][0]
        ranked = rank_list(df, id_col, score, f"__r_{name}")
        fused = ranked if fused is None else fused.join(ranked, id_col, "full_outer")
    contrib = [
        F.when(
            F.col(f"__r_{n}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"__r_{n}")),
        ).otherwise(F.lit(0.0))
        for n in names
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    out = fused.select(
        id_col,
        (F.floor(total * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("rrf_score"),
        *[
            F.coalesce(F.col(f"__r_{n}"), F.lit(-1))
            .cast("long")
            .alias(f"{n}_rank")
            for n in names
        ],
    ).orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return out.limit(topk) if topk else out
