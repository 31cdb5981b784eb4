"""TextRank — PageRank over the corpus word-adjacency graph.

Keyword extraction by graph centrality (Mihalcea & Tarau 2004,
"TextRank: Bringing Order into Texts"): build an undirected graph whose
nodes are terms and whose edge weights count adjacent co-occurrence
(window = 2), then run weighted PageRank

    WS(v) = (1 - d) + d * sum over in-neighbors u of
            w(u,v) / out_strength(u) * WS(u)

for a fixed number of iterations. Complements tf-idf
(textstats.tfidf_topk_terms): tf-idf scores terms by rarity, TextRank by
how central they sit in the co-occurrence structure.

This is also the repo's canonical ITERATIVE GRAPH operator shape (the
k-means twin for graphs): per iteration one join of the rank vector
against the normalized edge list + one aggregate — the classic Spark
PageRank loop, expressed in DataFrames so AQE picks the join strategy
(rank vector broadcasts while the vocabulary is small; shuffles when it
isn't). The edge list is built once, narrow, with zero Python.

Scale notes:
  - Edges come from `arrays_zip(slice, slice)` per doc — no self-join,
    no window; one shuffle to the (src, dst) grain whose size is the
    DISTINCT adjacent-pair vocabulary (Zipf-bounded), not the token
    stream.
  - Stopword hubs make classic skew: the per-edge `frac` column is
    pre-divided by out-strength, so a hub's mass spreads in one
    map-side pass; the per-iteration aggregate is partial-aggregatable
    (sum), never a collect.
  - Lineage grows linearly with iterations; for large K, checkpoint the
    rank vector every ~10 iterations (spark.checkpoint) — at the K<=10
    TextRank operates with, plan depth is a non-issue.

The reference engine has no comparable operator; part of the
training-data/text-analysis surface the brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_adjacency_edges(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Symmetric weighted edge list (src, dst, w) from adjacent token
    pairs (whitespace tokenization, trim + split on runs — same rule as
    textstats/spans). Self-loops (immediate repeats) are dropped; each
    undirected edge appears in both directions with the same weight."""
    toks = docs.select(
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t")
    ).where(F.length(F.trim(F.col(text_col))) > 0)
    pairs = toks.select(
        F.explode(
            # let-binding (NOTES rule): `t`'s split tree otherwise inlines
            # into all four references (2 slices + 2 sizes)
            F.expr(
                "get(transform(array(t), u ->"
                " CASE WHEN size(u) >= 2 THEN"
                " arrays_zip(slice(u, 1, size(u) - 1), slice(u, 2, size(u) - 1))"
                " ELSE array() END), 0)"
            )
        ).alias("p")
    ).select(F.col("p")["0"].alias("u"), F.col("p")["1"].alias("v"))
    canon = pairs.where(F.col("u") != F.col("v")).select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    # Pin the canonical pair aggregate: the symmetric union references it
    # TWICE, and textrank() then references `edges` three more times
    # (outw, ef, nodes) — unpinned, Catalyst duplicates the subtree and
    # the corpus-wide explode+aggregate runs up to 6x per action
    # (measured: the whole textrank_keywords cost was edge-build passes,
    # not the rank iterations). Distinct-adjacent-pair-vocabulary-sized
    # (Zipf-bounded), so the materialization is tiny relative to one
    # corpus pass.
    e = (
        canon.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    return e.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(e.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))


def textrank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over a SYMMETRIC (src, dst, w) edge list for a
    fixed iteration count, rank_0 = 1.0 everywhere. Returns (term, rank)
    for every node, rank UNrounded (callers round for reporting).

    Symmetry is a hard input contract (word_adjacency_edges satisfies
    it by construction): since round 6 the iteration derives the node
    set from the contribution aggregate — with a DIRECTED edge list, a
    node that never appears as dst would silently drop out after
    iteration 1 instead of keeping the (1-d) floor. For directed
    graphs use linkgraph.host_pagerank, which handles dangling mass.

    Per iteration: rank ⋈ pre-normalized edges on src, one sum by dst,
    left-join back onto the node list so isolated-in-degree nodes keep
    the (1-d) floor. Exactly the oracle's unrolled-CTE semantics."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ef = edges.join(outw, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("ow")).alias("frac")
    # Pin the normalized edge list: the unrolled iteration plan references
    # it once per iteration, and without a materialization barrier each
    # reference re-runs the explode + two aggregates that built it (the
    # classic Spark PageRank "cache the links" move; Zipf-bounded
    # vocab-pair size, far smaller than the corpus). Lazy localCheckpoint
    # = computed by the first action, shared by every iteration.
    ).localCheckpoint(eager=False)
    # node set = out-strength keys (the edge list is symmetric, so every
    # node has out-edges); single consumer now (rank_0 only — the
    # per-iteration (1-d)-floor left join is gone), so no pin: it is a
    # cheap aggregate over the pinned edge list
    nodes = outw.select(F.col("src").alias("term"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    base = F.lit(1.0 - damping)
    for _ in range(iterations):
        contrib = (
            ef.join(ranks, ef["src"] == ranks["term"])
            .groupBy(F.col("dst").alias("term"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("s"))
        )
        # No left join back onto `nodes`: the edge list is symmetric (the
        # function's input contract), so every node with out-edges also
        # has in-edges and `contrib` covers the node set exactly —
        # term-for-term identical to `nodes LEFT JOIN contrib` with the
        # COALESCE(s, 0) floor (s is never null: ranks and fracs are
        # total). Dropping the join removes one SortMergeJoin + the
        # nodes-side Exchange+Sort per iteration (plan-audited).
        ranks = contrib.select(
            "term",
            (base + F.lit(damping) * F.col("s")).alias("rank"),
        )
    return ranks


def textrank_keywords(
    docs: DataFrame,
    k: int = 20,
    iterations: int = 5,
    damping: float = 0.85,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k keywords by TextRank: (term, rank) with rank
    rounded to 6 decimals, ordered (rank DESC, term ASC) — the rounded
    value is the ordering key in BOTH engines so the top-k cutoff is
    cross-engine deterministic (same policy as tfidf_topk_terms)."""
    r = textrank(word_adjacency_edges(docs, text_col), iterations, damping)
    return (
        r.select("term", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("term").asc())
        .limit(k)
    )
