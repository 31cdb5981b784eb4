"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one broadcast of the query vectors,
JVM-side zip_with/aggregate dot products, TakeOrdered for the top-k (no
global sort materialization).

Scale path: random-hyperplane LSH bucketing (cosine-LSH): each vector gets
a b-bit signature from sign(v·r_i); candidates share a bucket → the
shuffle is on buckets, and the exact re-rank touches only candidates.
An IVF variant (k-means coarse quantizer) would slot in the same shape;
hyperplane LSH is chosen because it needs no training pass.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k per query vector. `query` is small (broadcast); the big
    side streams once, per-query ranking via window over (query_id)."""
    from pyspark.sql.window import Window

    e = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    q = query.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("__q")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine(F.col("__v"), F.col("__q")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller over an LCG —
    no global RNG, reproducible across cluster sizes)."""
    planes = []
    state = seed
    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return state / float(1 << 64)
    for _ in range(bits):
        v = []
        while len(v) < dim:
            u1, u2 = max(nxt(), 1e-12), nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            v.append(r * math.cos(2 * math.pi * u2))
            if len(v) < dim:
                v.append(r * math.sin(2 * math.pi * u2))
        planes.append(v[:dim])
    return planes


def lsh_bucket_ann(
    emb: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: `tables` independent b-bit hyperplane signatures;
    candidates = vectors sharing any (table, signature) bucket with the
    query; exact cosine re-rank on candidates only.

    At 10^12 rows the bucket join replaces the full scan: each table's
    shuffle keys are (table, sig) with ~n/2^bits occupancy."""
    from pyspark.sql.window import Window

    def signature_cols(df, vcol):
        sigs = []
        for t in range(tables):
            planes = _hyperplanes(dim, bits, seed=11 + 97 * t)
            bit_terms = [
                F.when(
                    dot(vcol, F.array(*[F.lit(x) for x in p])) >= 0,
                    F.lit(1 << i).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
                for i, p in enumerate(planes)
            ]
            sig = bit_terms[0]
            for bt in bit_terms[1:]:
                sig = sig.bitwiseOR(bt)
            sigs.append(F.struct(F.lit(t).alias("tbl"), sig.alias("sig")))
        return F.array(*sigs)

    e = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    e_b = e.select(
        id_col, "__v", F.explode(signature_cols(e, F.col("__v"))).alias("b")
    ).select(id_col, "__v", "b.tbl", "b.sig")
    q = query.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("__q"))
    q_b = q.select(
        query_id_col, "__q", F.explode(signature_cols(q, F.col("__q"))).alias("b")
    ).select(query_id_col, "__q", "b.tbl", "b.sig")

    cands = (
        e_b.join(F.broadcast(q_b), ["tbl", "sig"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, "__v", "__q")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col, id_col, cosine(F.col("__v"), F.col("__q")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def embedding_near_duplicates(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 14,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collapse_exact: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via self-join on LSH buckets +
    exact cosine filter (the embedding analog of MinHash near-dup).

    collapse_exact=True (default) first collapses bit-identical vectors to
    their min-id representative: identical embeddings co-bucket in EVERY
    table (the LSH mega-bucket hazard), so a web-scale crawl with 10^6
    copies of one page's embedding would emit 10^12 pairs. Each identity
    group re-enters the output as (rep, member, 1.0) star pairs — O(n)
    per group, same connected components as the exhaustive relation."""
    if collapse_exact:
        groups = emb.groupBy(F.col(vec_col)).agg(F.min(F.col(id_col)).alias("__rep"))
        rep_rows = emb.join(
            groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
        )
        rep_pairs = embedding_near_duplicates(
            rep_rows, dim, threshold, bits, tables, id_col, vec_col,
            collapse_exact=False,
        )
        star = (
            emb.select(F.col(id_col).alias("__mid"), F.col(vec_col))
            .join(groups, vec_col)
            .where(F.col("__mid") != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col("__mid").alias("id_b"),
                F.lit(1.0).alias("cos_sim"),
            )
        )
        return rep_pairs.unionByName(star)
    e = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))

    def sig_array(vcol):
        sigs = []
        for t in range(tables):
            planes = _hyperplanes(dim, bits, seed=311 + 13 * t)
            bit_terms = [
                F.when(
                    dot(vcol, F.array(*[F.lit(x) for x in p])) >= 0,
                    F.lit(1 << i).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
                for i, p in enumerate(planes)
            ]
            sig = bit_terms[0]
            for bt in bit_terms[1:]:
                sig = sig.bitwiseOR(bt)
            sigs.append(F.struct(F.lit(t).alias("tbl"), sig.alias("sig")))
        return F.array(*sigs)

    banded = e.select(
        id_col, "__v", F.explode(sig_array(F.col("__v"))).alias("b")
    ).select(id_col, "__v", "b.tbl", "b.sig")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.__v"), F.col("b.__v")).alias("cos_sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 via the dot identity ‖a‖² − 2a·b + ‖b‖² — the same
    left-fold sum shape as `dot`, so a SQL twin using list_dot_product
    reproduces it bit-for-bit (same add order)."""
    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Training-free deterministic coarse quantizer: the centroids are the
    n vectors whose md5(id) ranks smallest — a hash-derived sample
    (partition-invariant, no RNG, reproducible across cluster sizes, and
    SQL-replicable for the oracle). A deployment with a trained k-means
    codebook drops its centroids into the same (cid, __c) slot; every
    downstream stage is unchanged."""
    return (
        emb.select(
            F.col(id_col).alias("cid"),
            _as_double(F.col(vec_col)).alias("__c"),
        )
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
    )


def ivf_assign(
    emb: DataFrame,
    codebook: list[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list assignment: argmin-L2 centroid per vector, computed
    as ONE projection — `least()` over per-centroid (distance, cid)
    structs with the centroid vectors inlined as literals and ‖c‖²
    pre-computed driver-side. The corpus is neither exploded |codebook|×
    (the cross-join form) nor shuffled (the groupBy form): assignment is
    a narrow map, the 100 TB shape. Ties break to the smaller cid
    (struct comparison). Suits codebooks up to ~10³ centroids — beyond
    that, switch to a broadcast cross join + min(struct) aggregate.

    `codebook`: [(cid, [float, ...]), ...] — a pre-built artifact (the
    IVF index build / trained k-means output), not a per-query job."""
    v = _as_double(F.col(vec_col))
    vv = dot(v, v)
    structs = []
    for cid, cvec in codebook:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        cc = float(sum(float(x) * float(x) for x in cvec))
        d = vv - 2 * dot(v, c) + F.lit(cc)
        structs.append(F.struct(d.alias("__d"), F.lit(cid).alias("cid")))
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    return emb.select(
        F.col(id_col), v.alias("__v"), best["cid"].alias("cid")
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into n_centroids inverted
    lists, probe the nprobe lists nearest each query, exact cosine
    re-rank candidates only.

    The 10^12-row shape: the corpus is scanned once for assignment (a
    broadcast cross join against a ≤10^3-row codebook — in production the
    assignment is materialized once and reused across queries, exactly an
    IVF index build), and each query touches ~nprobe/n_centroids of the
    data. Candidate generation is a broadcast join on cid; the only
    per-query work is the re-rank."""
    from pyspark.sql.window import Window

    cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    # the ONE collect here is the index build (materializing the codebook
    # artifact), not per-query work — production reuses it across queries
    codebook = [(r["cid"], list(r["__c"])) for r in cents.collect()]
    assigned = ivf_assign(emb, codebook, id_col, vec_col)

    q = query.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("__q")
    )
    probe_scored = q.crossJoin(F.broadcast(cents)).select(
        query_id_col, "__q", "cid", l2sq(F.col("__q"), F.col("__c")).alias("__d")
    )
    wp = Window.partitionBy(query_id_col).orderBy(
        F.col("__d").asc(), F.col("cid").asc()
    )
    probes = (
        probe_scored.withColumn("__r", F.row_number().over(wp))
        .where(F.col("__r") <= nprobe)
        .select(query_id_col, "__q", "cid")
    )

    cands = assigned.join(F.broadcast(probes), "cid").where(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cands.select(
        query_id_col, id_col, cosine(F.col("__v"), F.col("__q")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def hard_negative_mine(
    emb: DataFrame,
    positives: DataFrame,
    k: int = 10,
    sim_ceiling: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pos_id_col: str = "pos_id",
) -> DataFrame:
    """Hard-negative mining for contrastive/retriever training (the DPR
    recipe, Karpukhin et al. 2020 §4.2): for each anchor in `positives`
    (query_id, pos_id) pairs, the k corpus vectors MOST similar to the
    anchor that are neither the anchor itself nor one of its labeled
    positives — the negatives that actually move a bi-encoder.

    `sim_ceiling` drops candidates with cos_sim ≥ ceiling first — the
    standard false-negative guard (an unlabeled near-duplicate of the
    positive is almost certainly a positive, not a negative; mining it
    poisons the batch).

    Scale shape: the labeled set is dimension-sized next to the corpus,
    so anchors are fished out with ONE broadcast equi-join and the
    corpus then streams ONCE through a broadcast nested-loop score
    against all |Q| anchors — no corpus shuffle; the per-anchor top-k
    window partitions by query_id over k·|Q| pre-ranked rows. At 10^12
    vectors swap the exact scan for the IVF/PQ candidate generators
    (`ivf_assign` cell filter or `kmeans.ivfpq_topk`'s probe pruning)
    and re-rank exactly here — the mining semantics (anti-join the
    positives, ceiling, top-k) are unchanged.

    Output: (query_id, vec_id, cos_sim 6dp, rank), ordered.
    """
    from pyspark.sql.window import Window

    qids = positives.select(query_id_col).distinct()
    anchors = (
        emb.join(F.broadcast(qids), F.col(id_col) == F.col(query_id_col))
        .select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("__q"))
    )
    e = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__v"), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    labeled = positives.select(
        F.col(query_id_col), F.col(pos_id_col).alias(id_col)
    )
    scored = scored.join(
        F.broadcast(labeled), [query_id_col, id_col], "left_anti"
    )
    if sim_ceiling is not None:
        scored = scored.where(F.col("cos_sim") < float(sim_ceiling))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def _np_unit_rows(mat):
    """Unit-normalize rows with similarity.dot's EXACT semantics: the
    squared norm is the sequential left fold acc+(x*x) in ascending
    element order, replicated as column-wise accumulation (each row's
    scalar op sequence is identical to the Catalyst fold), then one
    sqrt and one division per element — bit-identical IEEE doubles."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc += mat[:, j] * mat[:, j]
    return mat / np.sqrt(acc)[:, None]


def _brute_pair_cosines_arrow(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    vec_col: str,
    topk_prune: int | None = None,
) -> DataFrame:
    """(a_id, b_id, __cos) pair-cosine frame of the brute bitext
    baseline, computed in one mapInArrow stage instead of |A|·|B|
    interpreted Catalyst folds (guide §4.2: batches to vectorized
    native code). __cos is bit-identical to round-free
    dot(unit(a), unit(b)): float32→float64 widening is exact, and the
    pair dot accumulates column-by-column so every scalar sees the same
    multiply-then-add sequence as the sequential lambda fold.

    `topk_prune=K` emits, per pair block, only pairs that can reach
    either side's top-K under the DOWNSTREAM rounded ordering
    (round(cos, 6) DESC, id ASC) — the only rows bitext's rank /
    neighborhood-average windows ever read. Containment proof: if a
    pair p is in a side's rounded top-K, fewer than K pairs strictly
    beat it by rounded value; any pair q with raw(q) > raw(p) + 1e-6
    has round6(q) > round6(p), so p's raw cosine is within 1e-6 of the
    K-th largest raw cosine — the emitted set {raw >= kth_raw − 2e-6}
    (slack doubled for the two half-ulp rounding shifts) is a superset
    of the rounded top-K per row AND per column of every block, and a
    per-block superset union is a superset of the global per-side
    top-K. NaN cosines (zero-norm vectors) are always kept: Spark
    orders NaN above every double, so they can occupy top ranks.
    Extras cannot displace true top-K rows in a subset ranking, so the
    downstream windows produce bit-identical results (pinned by the
    pruned==exhaustive pytest). Emitted volume drops from |A|·|B| to
    ~K·(|A| + T·|B|).

    The B side rides a broadcast variable (ids + row matrix): the brute
    form is quadratic by definition, so B must be the bounded side —
    exactly the regime where the crossJoin baseline was usable at all;
    past that, callers pass `candidates` (LSH/IVF pairs) and never enter
    this path. Note: collecting B (a Spark job) happens at
    plan-CONSTRUCTION time, and the broadcast lives until Spark's
    ContextCleaner collects the returned frame — callers building many
    throwaway bitext plans in one long-lived driver should drop
    references promptly."""
    import numpy as np

    spark = a.sparkSession
    # NULL-vector rows are dropped on both sides — output-identical to
    # the retired crossJoin baseline: their NULL cosines ranked below
    # every real pair (DESC NULLS LAST), were skipped by the avg()
    # neighborhoods, and NULL margin never passed the threshold filter;
    # keeping them would only crash the matrix reshape.
    b_pdf = b.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("b_id"), _as_double(F.col(vec_col)).alias("__b")
    ).toPandas()
    # ids stay in their ORIGINAL type (long, string, ...): the id column
    # is opaque to the scoring kernel — it is only repeated/tiled via
    # Arrow `take`, never arithmetic — so any Spark id type round-trips
    # exactly (a long cast here would NULL string ids silently)
    b_ids = list(b_pdf["b_id"])
    if len(b_ids):
        b_mat = _np_unit_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["__b"]])
        )
    else:
        b_mat = np.zeros((0, 0), dtype=np.float64)
    bc = spark.sparkContext.broadcast((b_ids, b_mat))
    a_id_t = a.select(F.col(id_col).alias("a_id")).schema["a_id"].dataType
    b_id_t = b.select(F.col(id_col).alias("b_id")).schema["b_id"].dataType

    def score(batches):
        import pyarrow as pa

        ids_b, mat_b = bc.value
        n = len(ids_b)
        b_pa = pa.array(ids_b)
        for batch in batches:
            m_rows = batch.num_rows
            if m_rows == 0 or n == 0:
                continue
            tbl = batch.column(1)
            if isinstance(tbl, pa.ChunkedArray):
                tbl = tbl.combine_chunks()
            offs = tbl.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            lens = offs[1:] - offs[:-1]
            if lens.size and (lens != lens[0]).any():
                raise ValueError(
                    "bitext pair kernel: embedding rows must share one "
                    f"dimension (got ragged lengths {int(lens.min())}.."
                    f"{int(lens.max())})"
                )
            vals = tbl.values.to_numpy(zero_copy_only=False)[
                offs[0]:offs[-1]
            ]
            mat_a = _np_unit_rows(
                np.asarray(vals, dtype=np.float64).reshape(m_rows, -1)
            )
            a_pa = batch.column(0)
            if isinstance(a_pa, pa.ChunkedArray):
                a_pa = a_pa.combine_chunks()
            # chunk A so the m×n pair block stays ~32 MB
            step = max(1, 4_000_000 // n)
            for lo in range(0, m_rows, step):
                hi = min(lo + step, m_rows)
                ua = mat_a[lo:hi]
                acc = np.zeros((hi - lo, n), dtype=np.float64)
                for j in range(ua.shape[1]):
                    # multiply-then-add per scalar, ascending j — the
                    # same op sequence as the zip_with/aggregate fold
                    acc += np.outer(ua[:, j], mat_b[:, j])
                if topk_prune is not None:
                    K, slack = int(topk_prune), 2e-6
                    mc = hi - lo
                    keep = np.isnan(acc)  # NaN ranks TOP in Spark sorts
                    if n <= K:
                        keep[:] = True
                    else:
                        kth_a = np.partition(acc, n - K, axis=1)[:, n - K]
                        keep |= acc >= (kth_a - slack)[:, None]
                    if mc <= K:
                        keep[:] = True
                    else:
                        kth_b = np.partition(acc, mc - K, axis=0)[mc - K, :]
                        keep |= acc >= (kth_b - slack)[None, :]
                    ai, bi = np.nonzero(keep)
                    rep = (ai + lo).astype(np.int64)
                    til = bi.astype(np.int64)
                    vals = acc[ai, bi]
                else:
                    rep = np.repeat(np.arange(lo, hi, dtype=np.int64), n)
                    til = np.tile(np.arange(n, dtype=np.int64), hi - lo)
                    vals = acc.ravel()
                yield pa.RecordBatch.from_arrays(
                    [
                        a_pa.take(pa.array(rep)),
                        b_pa.take(pa.array(til)),
                        pa.array(vals, type=pa.float64()),
                    ],
                    names=["a_id", "b_id", "__cos"],
                )

    src = a.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("a_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    )
    # the A side usually arrives as a handful of scan partitions (one
    # small parquet file); spread it so the Arrow stage uses the cluster
    par = spark.sparkContext.defaultParallelism
    src = src.repartition(par, "a_id")
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("a_id", a_id_t),
            StructField("b_id", b_id_t),
            StructField("__cos", DoubleType()),
        ]
    )
    return src.mapInArrow(score, out_schema)


def bitext_margin_pairs(
    a: DataFrame,
    b: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    mutual: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk, ACL 2019; the
    CCMatrix/LASER alignment recipe): pair each vector of side `a` with
    its best match in side `b`, scored by the RATIO margin —
    cos(x, y) normalized by the mean of both vectors' k-NN
    neighborhoods — which cancels hubness (a y that is "close to
    everything" inflates its own neighborhood average and loses the
    margin it would win on raw cosine).

      margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2)

    Output: (a_id, b_id, cos_sim, margin) for a-side best matches with
    margin >= `margin_threshold`; `mutual=True` (the paper's
    'intersection' strategy) additionally requires x to be y's best
    a-side match. Ordered by a_id; every comparison runs on 6-dp-rounded
    cosines so ranking is bit-stable across engines.

    Scale shape: the pair frame is scored once; both per-side rank AND
    neighborhood-average windows share one hash partitioning per side
    (two exchanges total — the avg window declares no ORDER, so it
    reuses the rank window's partitioning). The brute cross-join pair
    frame (candidates=None) is the oracle-exact baseline; at 10^12 rows
    pass `candidates` — an (a_id, b_id) frame from the LSH/IVF modules
    (e.g. hyperplane co-bucketing, `ivf_topk` cells) — and ONLY those
    pairs are scored: the margin neighborhoods then run over each
    vector's candidate set (the CCMatrix/LASER approximation, where the
    FAISS k-NN list plays the same role), so recall follows the
    candidate generator while the margin windows and mutual-best
    semantics are unchanged."""
    from pyspark.sql.window import Window

    # normalize each side ONCE (|A|+|B| norms) so every pair pays a bare
    # dot product — cosine() per pair would recompute both norms |A|·|B|
    # times (measured 15.8 s -> ~6 s at sf0.1's 2.5k x 2.5k pairs)
    def unit(col: Column) -> Column:
        v = _as_double(col)
        n = norm(v)
        return F.transform(v, lambda x: x / n)

    if candidates is None:
        # Brute pair scoring through ONE vectorized Arrow stage: the
        # |A|·|B| interpreted lambda folds were the whole cost of the
        # exact baseline (6.9 s at sf0.1's 1000×1000 pairs; 100× that at
        # sf1.0), so the normalize+dot runs in NumPy with the exact fold
        # order replicated — bit-identical doubles, proven by the
        # candidates-path equality test. Rounding stays in Spark.
        # topk_prune: the rank/neighborhood windows below only ever
        # read each side's rounded top-k rows, so the kernel emits the
        # provable superset of those (see _brute_pair_cosines_arrow)
        # instead of the full quadratic frame — output bit-identical
        # (pruned==exhaustive pytest), window input drops from
        # |A|·|B| to ~k·(|A|+|B|) rows.
        pairs = _brute_pair_cosines_arrow(
            a, b, id_col, vec_col, topk_prune=max(int(k), 1)
        ).select(
            "a_id", "b_id", F.round(F.col("__cos"), 6).alias("cos_sim")
        )
    else:
        av = a.select(
            F.col(id_col).alias("a_id"), unit(F.col(vec_col)).alias("__a")
        )
        bv = b.select(
            F.col(id_col).alias("b_id"), unit(F.col(vec_col)).alias("__b")
        )
        raw = (
            candidates.select("a_id", "b_id")
            .distinct()
            .join(av, "a_id")
            .join(bv, "b_id")
        )
        pairs = raw.select(
            "a_id", "b_id",
            F.round(dot(F.col("__a"), F.col("__b")), 6).alias("cos_sim"),
        )
    wa = Window.partitionBy("a_id").orderBy(
        F.col("cos_sim").desc(), F.col("b_id").asc()
    )
    wa_all = Window.partitionBy("a_id")
    wb = Window.partitionBy("b_id").orderBy(
        F.col("cos_sim").desc(), F.col("a_id").asc()
    )
    wb_all = Window.partitionBy("b_id")
    ranked = (
        pairs.withColumn("__rka", F.row_number().over(wa))
        .withColumn(
            "__avga",
            F.avg(F.when(F.col("__rka") <= k, F.col("cos_sim"))).over(wa_all),
        )
        .withColumn("__rkb", F.row_number().over(wb))
        .withColumn(
            "__avgb",
            F.avg(F.when(F.col("__rkb") <= k, F.col("cos_sim"))).over(wb_all),
        )
    )
    denom = (F.col("__avga") + F.col("__avgb")) / F.lit(2.0)
    out = (
        ranked.where(F.col("__rka") == 1)
        .withColumn(
            "margin",
            F.round(
                F.when(denom != 0, F.col("cos_sim") / denom), 6
            ),
        )
        .where(F.col("margin") >= margin_threshold)
    )
    if mutual:
        out = out.where(F.col("__rkb") == 1)
    return out.select("a_id", "b_id", "cos_sim", "margin").orderBy("a_id")
