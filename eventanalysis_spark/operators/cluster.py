"""Duplicate-cluster assignment: connected components over near-dup pairs.

Pair relations (exact/MinHash/SimHash/embedding dedup) say which docs are
duplicates of each other; a training pipeline needs the CLUSTER view —
"assign every document to its duplicate group, keep one representative
per group". That is connected components over the pair graph.

Spark-first shape: iterative min-label propagation WITH pointer jumping
(comp(v) ← min(comp(v), min_{u∈N(v)} comp(u), comp(comp(v)))) — the
pointer-jump term halves chain depth every round, so convergence is
O(log n) rounds even on path graphs (the published two-phase star
techniques, e.g. Kiveris et al. "Connected Components in MapReduce",
have the same round bound; plain neighbor propagation alone would need
O(diameter) rounds). Every round is two shuffles keyed by node id, each
iteration's result is localCheckpoint()ed so the plan/lineage stays O(1)
instead of growing per round.

Skew note: near-dup graphs at web scale have mega-clusters (boilerplate).
The per-round aggregate min(comp) over neighbors is map-side partial, so
a hot node id receives at most one row per upstream partition; chain
`dedup.near_duplicate_pairs` (which collapses exact dups first and emits
linear-size star edges) so the edge set itself stays O(candidates + n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.plans.pin import Pinner


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 25,
    pin: str = "local",
    checkpoint_every: int = 4,
) -> DataFrame:
    """(id, component) for every node appearing in `pairs`; component =
    the minimum node id reachable through the pair graph (deterministic
    canonical labels). Raises if not converged within max_iterations
    (log₂-ish rounds needed; 25 covers any graph that fits on disk).

    `pin` selects the per-round materialization strategy (plans/pin.py):
    'local' (default) truncates lineage with localCheckpoint — fastest,
    but executor loss kills the job; 'persist' keeps recomputable
    lineage; 'checkpoint' writes a reliable checkpoint every
    `checkpoint_every` rounds (requires setCheckpointDir) so a long CC
    on a real cluster survives executor loss. The convergence count is
    a per-round action, so superseded rounds' persisted blocks are
    released eagerly via Pinner.rotate."""
    pinner = Pinner(pin, checkpoint_every)
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(edges["src"].alias("id"), labels["comp"].alias("c"))
            .groupBy("id")
            .agg(F.min("c").alias("nbr_min"))
        )
        ptr = (
            labels.alias("a")
            .join(
                labels.select(
                    F.col("id").alias("pid"), F.col("comp").alias("pcomp")
                ),
                F.col("a.comp") == F.col("pid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.col("a.comp").alias("old_comp"),
                F.coalesce(F.col("pcomp"), F.col("a.comp")).alias("ptr_min"),
            )
        )
        stepped = pinner(
            ptr.join(nbr, "id", "left")
            .select(
                "id",
                "old_comp",
                F.least(
                    F.col("old_comp"),
                    F.col("ptr_min"),
                    F.coalesce(F.col("nbr_min"), F.col("old_comp")),
                ).alias("comp"),
            )
        )
        n_changed = stepped.where(F.col("comp") < F.col("old_comp")).count()
        # the count above materialized this round — earlier rounds'
        # persisted blocks are dead state now
        pinner.rotate(keep=stepped)
        labels = stepped.select("id", "comp")
        if n_changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_cluster_assignments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Every document → its duplicate-cluster id: (id, cluster_id,
    is_representative). cluster_id = min doc id in the cluster; docs with
    no duplicates form singleton clusters of themselves.

    Full scale path: exact-dup collapse → MinHash LSH → Jaccard verify
    (all inside dedup.near_duplicate_pairs, linear-size edges) →
    pointer-jumping connected components → left join back to the corpus
    (docs without edges default to their own id — the corpus side joins a
    component table whose size is bounded by the number of duplicated
    docs, usually a small fraction)."""
    from eventanalysis_spark.operators.dedup import near_duplicate_pairs

    pairs = near_duplicate_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        expand="collapsed",
        max_bucket_size=max_bucket_size,
    )
    comps = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comps, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("comp"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col("id") == F.col("cluster_id"))
    )


def split_leakage_safe(
    df: DataFrame,
    fractions: dict[str, float],
    text_col: str = "text",
    id_col: str = "url",
    salt: str = "split",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup-cluster-aware train/val/test split: every member of a
    duplicate CLUSTER lands in the same split, so a near-duplicate of a
    training page can never leak into the test set.

    `sampling.split_corpus` already pins exact re-crawls (same content
    key) to one split; this closes the remaining leak — near duplicates
    with different keys — by hashing the cluster id (the min member id)
    instead of the row's own key. Returns (id, cluster_id, split).

    Scale shape: the cluster pass is dedup_cluster_assignments (exact
    collapse → LSH candidates → verify → pointer-jump components, all
    linear-size); the split itself stays a narrow projection of the
    cluster label — one md5 per row, no extra shuffle beyond the cluster
    join the caller already paid for."""
    from eventanalysis_spark.operators.sampling import split_corpus

    clusters = dedup_cluster_assignments(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
    ).select("id", "cluster_id")
    return split_corpus(
        clusters,
        fractions,
        key_col=F.col("cluster_id").cast("string"),
        salt=salt,
    )
