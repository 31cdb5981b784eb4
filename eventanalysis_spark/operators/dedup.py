"""Deduplication suite for large-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard — all expressed with
JVM-side array/higher-order functions (zero Python UDFs: shingling,
hashing, banding, and verification are Catalyst expressions over Arrow-free
columnar data).

Scale shapes:
  - exact: one hash-groupBy on md5/xxhash of the normalized text;
  - MinHash LSH: signatures are per-row (narrow); candidate generation
    explodes to bands (rows × n_bands) and groups on (band, band_hash) —
    the only shuffle is on the band buckets, and identical docs co-locate;
  - verification joins only the candidate pairs (tiny vs n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus chosen so (a·x + b) stays
# below 2^62 — Spark 4 runs ANSI mode and raises on int64 overflow
_P = (1 << 31) - 1


def _tokens(text: Column) -> Column:
    """Lowercased word tokens; empty text → empty array (not [''])."""
    t = F.lower(F.trim(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as 64-bit hashes (distinct). Fewer than k words →
    one shingle of the whole text (so short docs still participate)."""
    toks = _tokens(text)
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return F.array_distinct(
        F.when(n == 0, F.array().cast("array<bigint>")).otherwise(windows)
    )


# ---- exact ---------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Hash-groupBy exact dedup: per content hash, canonical (min) id +
    copy count. First-wins semantics match ConflictMode.Ignore."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Keep one row per distinct text (the min-id canonical row)."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---- MinHash + LSH ---------------------------------------------------------

def _perm_coeffs(num_hashes: int, seed: int = 7):
    """Deterministic (a, b) pairs for h_i(x) = (a_i·x + b_i) mod p."""
    coeffs = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """id + MinHash signature array<long>[num_hashes]. Entirely JVM-side:
    array_min over a universal-hash transform of the shingle hashes."""
    sh = shingles(F.col(text_col), shingle_k).alias("__sh")
    out = df.select(F.col(id_col).alias("doc_id") if id_col != "doc_id" else F.col(id_col), sh)
    def _universal(a: int, b: int):
        # (a·x + b) mod p over non-negative x (pmod of xxhash64); factory
        # closure keeps the HOF lambda single-argument for Spark's arity check
        return lambda x: F.pmod(F.pmod(x, F.lit(_P)) * F.lit(a) + F.lit(b), F.lit(_P))

    mins = [
        F.array_min(F.transform(F.col("__sh"), _universal(a, b)))
        for a, b in _perm_coeffs(num_hashes)
    ]
    return out.select(
        "doc_id",
        F.when(F.size("__sh") == 0, F.array(*[F.lit(-1)] * num_hashes))
        .otherwise(F.array(*mins))
        .alias("sig"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int | None = None
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) sharing
    any band bucket. Shuffle key = (band_idx, band_hash): identical docs
    always co-bucket; bucket sizes stay small for non-pathological data."""
    # derive rows_per_band from the actual signature length
    first = sigs.select(F.size("sig").alias("n")).limit(1).collect()
    n_sig = first[0]["n"] if first else 0
    r = rows_per_band or max(1, n_sig // bands)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice("sig", bidx * r + 1, r),
                            lambda v: v.cast("string"),
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (the LSH postfilter).
    Joins the shingle sets twice (broadcast-eligible candidate side)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.select(
            "id_a",
            "id_b",
            F.when(union == 0, F.lit(1.0)).otherwise(inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → minhash → band →
    bucket-join → exact-Jaccard verify."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs, bands)
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    return jaccard_verify(base, cands, text_col, "doc_id", shingle_k, threshold)


# ---- SimHash ----------------------------------------------------------------

def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token stream, pure Catalyst expressions:
    per bit b, sign of Σ_tokens (±1 by bit b of xxhash64(token))."""
    hashes = F.transform(_tokens(text), lambda t: F.xxhash64(t))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
        ),
    )
    # assemble: OR of 2^b for bits with positive vote; bit 63 is the sign
    # bit of the two's-complement long (literal -(2^63))
    powers = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidates: block on 4 16-bit chunks (any doc pair
    within hamming distance ≤ 3 shares at least one identical chunk by
    pigeonhole with 4 blocks), verify exact hamming ≤ max_hamming."""
    h = df.select(F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sh"))
    blocked = h.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("sh"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sh", "b.blk", "b.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
