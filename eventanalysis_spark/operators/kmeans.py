"""Distributed Lloyd's k-means over embedding columns, plus the two
training-data curation operators built on it:

* **SemDeDup** (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
  embeddings with k-means, then drop every document that has a
  more-senior (smaller-id) near-neighbor above a cosine threshold
  *within its own cluster* — the clustering bounds the pair search so
  semantic dedup never goes O(n²) corpus-wide.
* **Prototypicality pruning** (Sorscher et al. 2022, "Beyond neural
  scaling laws", arXiv:2206.14486): rank each document by distance to
  its cluster centroid and keep the hardest (farthest) fraction — easy,
  prototypical examples are the ones self-supervised pruning removes.

Spark-first shapes, per stage:

- **Seeding** is the same training-free deterministic hash sample as
  `similarity.ivf_centroids`: the k vectors with the smallest
  md5(id) — partition-invariant, RNG-free, SQL-replicable.
- **Assignment** is ONE narrow projection: `least()` over per-centroid
  (distance, cid) structs with the centroid vectors inlined as literals
  and ‖c‖² pre-computed driver-side (the `similarity.ivf_assign` shape:
  no explode, no shuffle, no Python). Distances use the dot identity
  ‖v‖² − 2·v·c + ‖c‖², whose left-fold add order matches DuckDB's
  `list_dot_product` bit-for-bit — the oracle contract.
- **Update** is ONE hash aggregate keyed by cid producing `dim` column
  means — map-side partial, so each partition ships k×dim doubles, and
  the driver holds k×dim floats (k ≤ ~10³; beyond that switch the
  assignment to a broadcast-join + min(struct) aggregate form).
  Every centroid component is rounded to `round_decimals` after each
  iteration: this pins the fit across partition counts AND engines
  (float sums are order-sensitive in the last ULP on both Spark and
  DuckDB; rounding at 1e-6 granularity absorbs that noise with
  negligible effect on the fit).
- **Empty clusters** keep their previous centroid (the MLlib behavior),
  so k never silently shrinks.

At 10^12 rows the per-iteration cost is one corpus scan + a k×dim
shuffle — the same shape MLlib's KMeans uses (centroids broadcast per
iteration), expressed in pure DataFrame ops.

Reference tie-in: the reference has no ML clustering (it is a Windows
event-log tool); this family is part of the training-data-pipeline
surface the brief adds on top of reference parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _as_double, dot, ivf_centroids

Centroids = list[tuple[int, list[float]]]


def _assign_best(vec_col, centroids: Centroids):
    """(d, cid) struct of the argmin-L2 centroid for `vec_col` (already
    double-cast). Ties break to the smaller cid via struct comparison."""
    vv = dot(vec_col, vec_col)
    structs = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        # driver-side left fold == list_dot_product == F.aggregate fold
        cc = 0.0
        for x in cvec:
            cc += float(x) * float(x)
        d = vv - 2 * dot(vec_col, c) + F.lit(cc)
        structs.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    return structs[0] if len(structs) == 1 else F.least(*structs)


def kmeans_assign(
    emb: DataFrame,
    centroids: Centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, __v, cid, __d): nearest centroid + squared-L2 distance for
    every vector — a single narrow projection (centroids are literals),
    zero Exchange, zero Python."""
    v = _as_double(F.col(vec_col))
    best = _assign_best(v, centroids)
    return emb.select(
        F.col(id_col),
        v.alias("__v"),
        best["cid"].alias("cid"),
        best["d"].alias("__d"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> Centroids:
    """Lloyd's algorithm; returns [(cid, [float]*dim)] after `iterations`
    assign/update rounds from deterministic hash-sampled seeds. cids are
    the seed vectors' original ids (the `ivf_centroids` convention).

    This is a TRAINING job (one driver collect of k×dim floats per
    iteration, like MLlib's per-iteration centroid broadcast), not a
    per-query plan step — fit once, reuse the centroid artifact."""
    seeds = ivf_centroids(emb, k, id_col, vec_col).collect()
    cents: Centroids = [(r["cid"], [float(x) for x in r["__c"]]) for r in seeds]
    if not cents:
        raise ValueError("kmeans_fit: empty input")
    dim = len(cents[0][1])
    for _ in range(iterations):
        assigned = kmeans_assign(emb, cents, id_col, vec_col)
        means = assigned.groupBy("cid").agg(
            *[
                F.round(F.avg(F.col("__v")[i]), round_decimals).alias(f"c{i}")
                for i in range(dim)
            ]
        )
        got = {
            r["cid"]: [float(r[f"c{i}"]) for i in range(dim)]
            for r in means.collect()
        }
        # empty cluster -> keep previous centroid (k never shrinks)
        cents = [(cid, got.get(cid, prev)) for cid, prev in cents]
    return cents


def semdedup(
    emb: DataFrame,
    tau: float,
    k: int = 8,
    iterations: int = 2,
    centroids: Centroids | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: (id, cid, keep) for every vector; keep=false iff some
    SMALLER-id vector in the same k-means cluster has cosine ≥ tau (the
    deterministic keep-most-senior variant of arXiv:2303.09540 §3).

    The candidate pair join is keyed by cid, so the pair count is
    Σ_c |c|² — bounded by choosing k so clusters stay small (the paper
    runs k ≈ 50k on LAION). At web scale, chain exact-dup collapse
    first (`dedup.drop_exact_duplicates`) so boilerplate mega-groups
    contribute one representative each, and raise k with corpus size;
    the threshold compare is bit-stable because both sides of the
    cosine use the same left-fold dot.
    """
    cents = centroids or kmeans_fit(emb, k, iterations, id_col, vec_col)
    a = kmeans_assign(emb, cents, id_col, vec_col).select(
        F.col(id_col).alias("__id"), "cid", "__v"
    )
    left = a.select(
        F.col("__id").alias("__il"), F.col("cid").alias("__cl"), F.col("__v").alias("__vl")
    )
    right = a.select(
        F.col("__id").alias("__ir"), F.col("cid").alias("__cr"), F.col("__v").alias("__vr")
    )
    cos = dot(F.col("__vl"), F.col("__vr")) / (
        F.sqrt(dot(F.col("__vl"), F.col("__vl")))
        * F.sqrt(dot(F.col("__vr"), F.col("__vr")))
    )
    dropped = (
        left.join(
            right,
            (F.col("__cl") == F.col("__cr")) & (F.col("__ir") < F.col("__il")),
        )
        .where(cos >= F.lit(float(tau)))
        .select(F.col("__il").alias("__id"))
        .distinct()
    )
    return (
        a.join(dropped.withColumn("__hit", F.lit(1)), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "cid",
            F.col("__hit").isNull().alias("keep"),
        )
    )


def prototypicality_prune(
    emb: DataFrame,
    keep_fraction: float = 0.5,
    k: int = 8,
    iterations: int = 2,
    centroids: Centroids | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "rank",
) -> DataFrame:
    """Self-supervised data pruning (arXiv:2206.14486): per k-means
    cluster, keep the ceil(keep_fraction·|cluster|) vectors FARTHEST
    from their centroid (hard examples), drop the prototypical core.
    Returns (id, cid, dist_sq, keep), dist_sq rounded to 6.

    method='rank' (exact): row_number over (cid) ordered by rounded
    distance desc — rank on the ROUNDED value then id so float ULPs tie
    instead of rank-flipping (cross-engine determinism). The per-cid
    window means one sort per cluster; with the small k of the exact
    form, clusters are n/k-sized — fine at test scale, hot at 100 TB.

    method='quantile' (the 100-TB shape): per-cluster distance threshold
    from approx_percentile (map-side-partial sketch, no per-cluster
    sort), broadcast back, keep d ≥ threshold. Approximate at the
    boundary — counts match 'rank' within sketch accuracy."""
    cents = centroids or kmeans_fit(emb, k, iterations, id_col, vec_col)
    a = kmeans_assign(emb, cents, id_col, vec_col).select(
        F.col(id_col), "cid", F.round("__d", 6).alias("dist_sq")
    )
    if method == "quantile":
        thr = a.groupBy("cid").agg(
            F.expr(
                f"approx_percentile(dist_sq, {1.0 - float(keep_fraction)}, 10000)"
            ).alias("__thr")
        )
        return (
            a.join(F.broadcast(thr), "cid")
            .select(
                id_col, "cid", "dist_sq", (F.col("dist_sq") >= F.col("__thr")).alias("keep")
            )
        )
    w = Window.partitionBy("cid").orderBy(
        F.col("dist_sq").desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("cid")
    return a.select(
        id_col,
        "cid",
        "dist_sq",
        (
            F.row_number().over(w)
            <= F.ceil(F.lit(float(keep_fraction)) * F.count(F.lit(1)).over(wc))
        ).alias("keep"),
    )
