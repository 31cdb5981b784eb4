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
