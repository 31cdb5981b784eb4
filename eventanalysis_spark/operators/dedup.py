"""Deduplication suite for large-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard. Shingling, hashing,
banding, and verification are JVM-side Catalyst expressions; the MinHash
h_i-minima fold has two value-identical forms — the prunable Catalyst
fold (`minhash_signatures`) and a vectorized int64 NumPy mapInArrow stage
(`minhash_signatures_arrow`, guide §4.2) used by the LSH index/candidate
paths where signatures are always materialized.

Scale shapes:
  - exact: one hash-groupBy on md5/xxhash of the normalized text;
  - MinHash LSH: signatures are per-row (narrow); candidate generation
    explodes to bands (rows × n_bands) and groups on (band, band_hash) —
    the only shuffle is on the band buckets, and identical docs co-locate;
  - verification joins only the candidate pairs (tiny vs n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def hash60_md5(c: Column) -> Column:
    """SQL-replicable 60-bit base hash: first 15 hex digits of md5, as a
    non-negative bigint. DuckDB twin: ('0x'||substr(md5(x),1,15))::BIGINT —
    used so minhash/fingerprint variants get EXACT cross-engine oracles.
    xxhash64 stays the production default (faster, full 64-bit)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _base_hasher(hash_fn: str):
    if hash_fn == "md5":
        return hash60_md5
    if hash_fn == "xxhash64":
        return F.xxhash64
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def shingles(text: Column, k: int = 3, hash_fn: str = "xxhash64") -> Column:
    """Word k-shingles as 64-bit hashes (distinct). Fewer than k words →
    one shingle of the whole text (so short docs still participate).

    Let-binding note (measured ~30× on the shingle hot path): the token
    array MUST be bound once per row. Referencing the `_tokens(text)`
    expression directly inside the window lambda inlines the full
    lower+trim+regex-split tree into EVERY `slice(toks, i+1, k)` — the
    tokenizer re-runs once per window, turning an O(tokens) pass into
    O(tokens²) regex work (4750 sf0.1 docs: 4.7 s → 0.15 s). Spark has no
    `let`, so the binding is the standard HOF trick: transform over a
    one-element array makes `t` a bound lambda VARIABLE, evaluated once."""
    hasher = _base_hasher(hash_fn)

    def _windows(t: Column) -> Column:
        n = F.size(t)
        return F.array_distinct(
            F.when(n == 0, F.array().cast("array<bigint>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
                    lambda i: hasher(F.concat_ws(" ", F.slice(t, i + 1, k))),
                )
            )
        )

    return F.get(F.transform(F.array(_tokens(text)), _windows), 0)


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
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """id + MinHash signature array<long>[num_hashes]. Entirely JVM-side:
    ONE aggregate() fold over the shingle array whose accumulator is the
    64-wide minima vector (zip_with + least per element), h_i(x) =
    (a_i·x + b_i) mod p. hash_fn='md5' selects the SQL-replicable 60-bit
    base hash (exact DuckDB oracle); 'xxhash64' (default) is the
    production fast path.

    Expression-shape note (measured, not cosmetic): the obvious form —
    64 separate array_min(transform(__sh, h_i)) projections — inlines the
    shingle expression tree 129× after CollapseProject, and the analyzer/
    codegen pays multi-second plan compiles for EVERY downstream plan that
    embeds a signature (banding, bucket joins). The fold form references
    __sh twice, compiles ~3-7× faster, and produces byte-identical
    signatures (min over the same h_i images; unit + oracle checked)."""
    coeffs = _perm_coeffs(num_hashes)
    ab = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in coeffs]
    )
    init = F.array(*[F.lit(_P).cast("long")] * num_hashes)

    def _sig(sh: Column) -> Column:
        # sh is a bound lambda variable (let-binding via transform over a
        # one-element array, same trick as shingles): the shingle tree is
        # evaluated ONCE per row even though referenced twice below
        fold = F.aggregate(
            sh,
            init,
            lambda acc, x: F.zip_with(
                acc,
                ab,
                lambda acci, c: F.least(
                    acci, F.pmod(F.pmod(x, F.lit(_P)) * c["a"] + c["b"], F.lit(_P))
                ),
            ),
        )
        return F.when(
            F.size(sh) == 0, F.array(*[F.lit(-1).cast("long")] * num_hashes)
        ).otherwise(fold)

    sig = F.get(
        F.transform(F.array(shingles(F.col(text_col), shingle_k, hash_fn)), _sig), 0
    )
    return df.select(
        F.col(id_col).alias("doc_id") if id_col != "doc_id" else F.col(id_col),
        sig.alias("sig"),
    )


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """`minhash_signatures` with the h_i-minima fold as vectorized int64
    NumPy in ONE mapInArrow stage — value-identical signatures (pure
    integer arithmetic: numpy's floored % equals Spark pmod for every
    int64, and (x%p)·a+b < 2^62 never overflows; pinned by a pytest
    equality over both forms). Shingling/hashing stay JVM-side; only
    (id, shingle hashes) cross Arrow.

    Why two forms exist: the Catalyst fold is a prunable expression —
    plans that never read `sig` skip it entirely — but it costs ~0.45 s
    of py4j literal construction per build and slows every analyzer/
    optimizer/codegen pass that embeds its 64-struct tree (measured
    ~0.55 s per localCheckpoint pin in the incremental-dedup path). The
    Arrow stage is a barrier node: nothing inlines into it, consumers
    that always materialize signatures (banding, bucket joins — the LSH
    index/candidate paths) plan fast and execute the fold ~10× faster.
    Use THIS form when signatures are always consumed; the Catalyst form
    when downstream plans may prune them."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    coeffs = _perm_coeffs(num_hashes)
    a_co = [a for a, _ in coeffs]
    b_co = [b for _, b in coeffs]
    p = _P
    nh = num_hashes

    sh_df = df.select(
        F.col(id_col).alias("doc_id") if id_col != "doc_id" else F.col(id_col),
        shingles(F.col(text_col), shingle_k, hash_fn).alias("__sh"),
    )
    schema = StructType(
        [sh_df.schema["doc_id"], StructField("sig", ArrayType(LongType()))]
    )

    def _sig_batches(batches):
        import numpy as np
        import pyarrow as pa

        a_np = np.asarray(a_co, dtype=np.int64)
        b_np = np.asarray(b_co, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            lst = batch.column(1)
            if lst.null_count:
                # rare null-text rows: per-row exact fallback
                sigs = []
                for row in lst.to_pylist():
                    if row is None:
                        sigs.append(None)
                    elif not row:
                        sigs.append([-1] * nh)
                    else:
                        xp = np.asarray(row, dtype=np.int64) % p
                        sigs.append([
                            int(((xp * a_np[j] + b_np[j]) % p).min())
                            for j in range(nh)
                        ])
                out = pa.array(sigs, type=pa.list_(pa.int64()))
            else:
                offs = lst.offsets.to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                vals = lst.values.to_numpy(zero_copy_only=False)[
                    offs[0]:offs[-1]
                ]
                starts = offs[:-1] - offs[0]
                comp = (offs[1:] - offs[:-1]) > 0
                sig_m = np.full((n, nh), -1, dtype=np.int64)
                if comp.any():
                    # % matches Spark pmod for every int64 (floored mod,
                    # non-negative); products stay < 2^62
                    xp = vals % p
                    st = starts[comp]
                    for j in range(nh):
                        sig_m[comp, j] = np.minimum.reduceat(
                            (xp * a_np[j] + b_np[j]) % p, st
                        )
                out = pa.ListArray.from_arrays(
                    (np.arange(n + 1, dtype=np.int64) * nh).astype(np.int32),
                    sig_m.ravel(),
                )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), out], names=["doc_id", "sig"]
            )

    return sh_df.mapInArrow(_sig_batches, schema)


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int | None = None,
    num_hashes: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) sharing
    any band bucket. Shuffle key = (band_idx, band_hash).

    Scale guards:
      - pass `num_hashes` (callers always know it) so no Spark job runs at
        plan-build time; the collect fallback exists only for ad-hoc use;
      - `max_bucket_size`: a (band, bucket) with b members emits b(b-1)/2
        pairs — one degenerate bucket (boilerplate/template text that
        survived exact-dup collapse) can emit 10^12 pairs at web scale.
        With a cap, oversized buckets instead emit O(b) pairs: STAR pairs
        to the bucket's min doc_id PLUS CHAIN pairs between neighbors in
        minhash-signature sort order (sorted-neighborhood method — docs
        with high Jaccard agree on leading minhash coordinates with
        probability ≥ threshold per coordinate, so true near-dups sort
        adjacently and their chain edge survives a downstream exact-
        Jaccard verify even when neither resembles the anchor). Pair
        completeness inside pathological buckets is still sacrificed;
        connectivity of verified near-dup runs is not."""
    if rows_per_band is None:
        if num_hashes is None:
            # back-compat fallback: derive from the data (runs a tiny job)
            first = sigs.select(F.size("sig").alias("n")).limit(1).collect()
            num_hashes = first[0]["n"] if first else 0
        rows_per_band = max(1, num_hashes // bands)
    r = rows_per_band
    # Pin the signatures: the 64-way array_min expression tree otherwise
    # INLINES into the banding projection AND both sides of the bucket
    # self-join (CollapseProject), so every signature is recomputed 2×
    # at runtime and the optimizer chews a multi-second plan. Lazy
    # localCheckpoint = computed once by the first action, shared by both
    # join sides; measured ~4× end-to-end on the LSH paths.
    sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id",
        # leading signature coords = sorted-neighborhood key for capped
        # buckets (Catalyst prunes them off the uncapped path)
        F.element_at("sig", 1).alias("__s0"),
        F.element_at("sig", 2).alias("__s1"),
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
    ).select("doc_id", "__s0", "__s1", "bb.band", "bb.bucket")
    if max_bucket_size is None:
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
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__bn"), F.min("doc_id").alias("__anchor")
    )
    bb = banded.join(sizes, ["band", "bucket"])
    small = bb.where(F.col("__bn") <= max_bucket_size)
    a, b = small.alias("a"), small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    big = bb.where(F.col("__bn") > max_bucket_size)
    big_star = big.where(F.col("doc_id") != F.col("__anchor")).select(
        F.col("__anchor").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    # chain edges in signature sort order: only big-bucket rows shuffle
    # into the window, O(b) output
    w = Window.partitionBy("band", "bucket").orderBy("__s0", "__s1", "doc_id")
    big_chain = (
        big.withColumn("__nxt", F.lead("doc_id").over(w))
        .where(F.col("__nxt").isNotNull())
        .select(
            F.least("doc_id", "__nxt").alias("id_a"),
            F.greatest("doc_id", "__nxt").alias("id_b"),
        )
    )
    return small_pairs.unionByName(big_star).unionByName(big_chain).distinct()


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


def containment_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT on candidate pairs:
    c_a = |A∩B| / |A| (how much of A lies inside B), c_b symmetric.
    Catches quote/sub-document relations Jaccard misses — a page that
    fully embeds a short document has high containment but low Jaccard
    (the Broder resemblance-vs-containment distinction). Keeps pairs
    where EITHER direction ≥ threshold.

    Same shape as jaccard_verify (candidate-pairs-only join — never
    all-pairs); ratios are reported through the midpoint-safe manual
    6-decimal round (|A| can be a power of two, e.g. 1/128 = 0.0078125
    sits exactly on a ROUND(,6) midpoint). Empty sets count as fully
    contained (consistent with jaccard_verify's empty==identical rule)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    j = (
        pairs.join(
            sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")

    def _contain(own: str) -> Column:
        n = F.size(F.col(own)).cast("double")
        ratio = F.when(n == 0, F.lit(1.0)).otherwise(inter / n)
        return F.floor(ratio * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return (
        j.select(
            "id_a",
            "id_b",
            _contain("sh_a").alias("containment_a"),
            _contain("sh_b").alias("containment_b"),
        )
        .where(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= F.lit(threshold)
        )
    )


def near_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    expand: str = "collapsed",
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: exact-dup collapse → shingle →
    minhash → band → bucket-join → exact-Jaccard verify → expand.

    `max_bucket_size` defaults ON (4096): even after exact-dup collapse a
    web-scale corpus contains templated near-identical (not identical)
    boilerplate families that co-bucket; the default keeps any one
    (band, bucket) from emitting more than O(b) star+chain pairs
    (see lsh_candidate_pairs). Pass None to explicitly opt out and get
    the exhaustive bucket self-join. Any cap ≥ the corpus's largest
    bucket leaves the result exactly equal to the uncapped relation.

    Exact duplicates are collapsed FIRST (groupBy md5(text), representative
    = min id): at web scale 10^6 identical boilerplate pages would
    otherwise co-bucket in EVERY band by construction and the bucket
    self-join would emit 10^12 candidate pairs. After collapse, LSH only
    ever sees distinct texts; exact-dup groups re-enter the output as
    linear-size star pairs.

    expand='collapsed' (default — the scale shape): output is
        (rep_a, rep_b, jaccard) near-dup pairs between group
        representatives, plus (rep, member, 1.0) star pairs inside each
        exact-dup group. O(candidates + n) rows; connected components over
        these edges give exactly the same dup clusters as the exhaustive
        relation.
    expand='pairs' (exhaustive parity): every (id_a < id_b) doc pair with
        jaccard ≥ threshold, identical to the naive all-docs pipeline —
        inherently quadratic in exact-dup group size (the OUTPUT is), so
        only for bounded data / oracle verification."""
    th = F.md5(F.col(text_col)).alias("__th")
    groups = df.groupBy(th).agg(
        F.min(F.col(id_col)).alias("doc_id"), F.count(F.lit(1)).alias("__gn")
    )
    rep_docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col)).join(
        groups.select("doc_id", "__th"), "doc_id"
    )
    sigs = minhash_signatures_arrow(
        rep_docs, text_col, "doc_id", num_hashes, shingle_k
    )
    cands = lsh_candidate_pairs(
        sigs, bands, num_hashes=num_hashes, max_bucket_size=max_bucket_size
    )
    rep_pairs = jaccard_verify(rep_docs, cands, text_col, "doc_id", shingle_k, threshold)

    members = df.select(
        F.col(id_col).alias("__mid"), F.md5(F.col(text_col)).alias("__th")
    )
    if expand == "collapsed":
        star = (
            members.join(groups.select("doc_id", "__th"), "__th")
            .where(F.col("__mid") != F.col("doc_id"))
            .select(
                F.col("doc_id").alias("id_a"),
                F.col("__mid").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        return rep_pairs.select("id_a", "id_b", "jaccard").unionByName(star)
    if expand != "pairs":
        raise ValueError(f"expand must be 'collapsed' or 'pairs', got {expand!r}")
    # exhaustive expansion (output-bound quadratic inside exact-dup groups)
    m1, m2 = members.alias("m1"), members.alias("m2")
    within = (
        m1.join(m2, (F.col("m1.__th") == F.col("m2.__th"))
                & (F.col("m1.__mid") < F.col("m2.__mid")))
        .select(
            F.col("m1.__mid").alias("id_a"),
            F.col("m2.__mid").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    rep_th = groups.select(F.col("doc_id"), F.col("__th"))
    cross = (
        rep_pairs
        .join(rep_th.select(F.col("doc_id").alias("id_a"), F.col("__th").alias("__tha")), "id_a")
        .join(rep_th.select(F.col("doc_id").alias("id_b"), F.col("__th").alias("__thb")), "id_b")
        .join(members.select(F.col("__mid").alias("__ma"), F.col("__th").alias("__tha")), "__tha")
        .join(members.select(F.col("__mid").alias("__mb"), F.col("__th").alias("__thb")), "__thb")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            F.col("jaccard"),
        )
    )
    return within.unionByName(cross)


# ---- SimHash ----------------------------------------------------------------

def simhash64(text: Column, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash of the token stream, pure Catalyst expressions:
    per bit b, sign of Σ_tokens (±1 by bit b of xxhash64(token)).
    hash_fn='md5' uses the 60-bit SQL-replicable base hash (bits 60-63
    then always vote negative — an exact-oracle variant, not bit-compatible
    with the xxhash64 production default)."""
    hasher = _base_hasher(hash_fn)
    hashes = F.transform(_tokens(text), lambda t: hasher(t))
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
    collapse_exact: bool = True,
) -> DataFrame:
    """SimHash near-dup candidates: block on 4 16-bit chunks (any doc pair
    within hamming distance ≤ 3 shares at least one identical chunk by
    pigeonhole with 4 blocks), verify exact hamming ≤ max_hamming.

    collapse_exact=True (default) collapses identical texts to their min-id
    representative BEFORE blocking (identical docs share every block key —
    the same mega-bucket hazard as MinHash LSH) and re-emits each exact-dup
    group as (rep, member, hamming=0) star pairs: O(n) output per group
    instead of O(n²), same connected components.

    Behavior change vs the pre-round-5 standalone form (this now routes
    through hamming64_near_pairs): max_hamming > 3 raises ValueError
    (the 4-block pigeonhole cannot guarantee recall there) where the old
    code silently returned reduced-recall results, and a default
    max_bucket_size=4096 posting cap + localCheckpoint pin apply to the
    block join — on degenerate constant-text corpora the cap can drop
    distinct-text candidates (correct pairs only, completeness capped)."""
    if collapse_exact:
        th = F.md5(F.col(text_col)).alias("__th")
        groups = df.groupBy(th).agg(F.min(F.col(id_col)).alias("doc_id"))
        rep_docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col)).join(
            groups.select("doc_id"), "doc_id", "left_semi"
        )
        rep_pairs = simhash_near_pairs(
            rep_docs, text_col, "doc_id", max_hamming, collapse_exact=False
        )
        members = df.select(
            F.col(id_col).alias("__mid"), F.md5(F.col(text_col)).alias("__th")
        )
        star = (
            members.join(groups.select("doc_id", "__th"), "__th")
            .where(F.col("__mid") != F.col("doc_id"))
            .select(
                F.col("doc_id").alias("id_a"),
                F.col("__mid").alias("id_b"),
                F.lit(0).alias("hamming"),
            )
        )
        return rep_pairs.unionByName(star)
    h = df.select(F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sh"))
    return hamming64_near_pairs(h, hash_col="sh", max_hamming=max_hamming, n_blocks=4)


def hamming64_near_pairs(
    hashes: DataFrame,
    hash_col: str = "sh",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_bucket_size: int | None = 4096,
    pin: str | None = "local",
    align_cols: list[str] | None = None,
) -> DataFrame:
    """Generic 64-bit Hamming near-pair search over a precomputed hash
    column — the blocking core shared by SimHash text dedup,
    perceptual-hash image dedup (multimodal.image_near_dups), and
    frame-aligned video dedup (multimodal.video_near_dups).

    `align_cols` (optional) names extra columns of `hashes` that must be
    EQUAL for two rows to pair (e.g. frame_idx for videos): they join
    into the block key and the bucket-cap partition, so candidates only
    form inside an alignment group. Output carries them alongside
    (id_a, id_b, hamming).

    `pin` (plans/pin.py strategy, None = off) materializes the
    (doc_id, hash) table ONCE before the self-join: both join sides
    otherwise re-execute the upstream hash computation — a 64-aggregate
    Catalyst tree for SimHash, a full image-decode UDF pass for dHash —
    doubling the dominant cost. The pinned frame is 16 bytes/row.

    Pigeonhole blocking: the hash splits into `n_blocks` equal-width bit
    blocks; any pair within Hamming distance < n_blocks shares at least
    one identical block, so an equi-join on (block_idx, block_key) has
    recall 1.0 for max_hamming ≤ n_blocks - 1 (asserted). Exact
    `bit_count(xor)` verification runs only on the candidate pairs.

    Scale shape: the only shuffle is the (blk, key) equi-join; per-bucket
    postings are capped at `max_bucket_size` smallest ids (same guard as
    the MinHash LSH path — a constant-image / constant-text corpus would
    otherwise make one bucket quadratic). Output: (id_a, id_b, hamming)
    with id_a < id_b, exact distances ≤ max_hamming."""
    if 64 % n_blocks != 0:
        raise ValueError(f"n_blocks must divide 64, got {n_blocks}")
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"pigeonhole recall needs max_hamming ≤ n_blocks-1 "
            f"({max_hamming} > {n_blocks - 1}): raise n_blocks"
        )
    width = 64 // n_blocks
    mask = (1 << width) - 1
    align = list(align_cols or [])
    hashes = hashes.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("sh"), *align
    )
    if pin is not None:
        from eventanalysis_spark.plans.pin import Pinner

        hashes = Pinner(pin)(hashes)
    blocked = hashes.select(
        F.col("doc_id"),
        F.col("sh"),
        *[F.col(c) for c in align],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("sh"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sh", *align, "b.blk", "b.key")
    if max_bucket_size is not None:
        w = Window.partitionBy("blk", "key", *align).orderBy("doc_id")
        blocked = (
            blocked.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_bucket_size)
            .drop("__rn")
        )
    a, b = blocked.alias("a"), blocked.alias("b")
    cond = (
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for c in align:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            *[F.col(f"a.{c}").alias(c) for c in align],
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


# ---- incremental (cross-crawl) dedup ---------------------------------------

def _cap_postings(index: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Per-(band, bucket) posting cap: keep the `max_bucket_size` smallest
    doc_ids of each bucket (deterministic). The window shuffles on the
    same (band, bucket) key the index is already organized by, and only
    oversized buckets lose rows. None = no cap."""
    if max_bucket_size is None:
        return index
    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    return (
        index.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_bucket_size)
        .drop("__rn")
    )


def lsh_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
    collapse_exact: bool = True,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """(band, bucket, doc_id) LSH posting table for a corpus — the
    PERSISTABLE index behind cross-crawl dedup. Build it once per crawl
    and append to a warehouse table keyed by (band, bucket); each new
    crawl then dedups against ALL history by joining its own (tiny)
    postings against the index instead of re-signaturing the history.
    bands × rows-per-band must match between index builds (the bucket
    hash embeds the slice), so treat (num_hashes, bands, shingle_k,
    hash_fn) as index-format metadata.

    Mega-bucket guards (both default ON — at web scale history WILL
    contain a boilerplate bucket with 10^6+ postings, and one hot bucket
    × every new crawl is the candidate blowup this module's LSH section
    warns about):
      - `collapse_exact`: identical texts co-bucket in EVERY band by
        construction, so only the min-id representative per distinct
        text is indexed (n identical docs → `bands` postings, not
        n × bands). Probers recover full membership by re-deriving the
        text-hash groups from the docs frame they already hold — see
        incremental_near_duplicates, which maps any posting id (rep or
        legacy member) back to its group representative before verify.
      - `max_bucket_size`: distinct-text collisions (templated
        boilerplate) are capped to the `max_bucket_size` smallest doc_ids
        per (band, bucket); candidate completeness inside pathological
        buckets is sacrificed, never correctness of emitted pairs."""
    if collapse_exact:
        reps = (
            df.groupBy(F.md5(F.col(text_col)).alias("__th"))
            .agg(F.min(F.col(id_col)).alias(id_col))
            .select(id_col)
        )
        df = df.select(F.col(id_col), F.col(text_col)).join(
            reps, id_col, "left_semi"
        )
    # Arrow signature stage: a barrier node, so no pin is needed — the
    # old Catalyst fold had to be localCheckpoint'ed to stop its 64-min
    # tree inlining into the banding explode, and that pin cost a full
    # planning+codegen pass at CONSTRUCTION time
    sigs = minhash_signatures_arrow(
        df, text_col, id_col, num_hashes, shingle_k, hash_fn
    )
    index = _band_explode(sigs, bands, num_hashes)
    return _cap_postings(index, max_bucket_size)


def _band_explode(
    sigs: DataFrame,
    bands: int,
    num_hashes: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(…extra_cols, band, bucket, doc_id) banding of a signature frame.
    The bucket hash — xxhash64 over the comma-joined signature slice —
    is INDEX-FORMAT metadata (lsh_index's docstring: it must match
    between builds), so it lives in exactly one place; both lsh_index
    and the fused ad-hoc build in incremental_near_duplicates call
    this."""
    r = max(1, num_hashes // bands)
    return sigs.select(
        *[F.col(c) for c in extra_cols],
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
    ).select(
        *extra_cols,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "doc_id",
    )


def incremental_near_duplicates(
    new_docs: DataFrame,
    old_docs: DataFrame,
    old_index: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int | None = 4096,
    index_is_collapsed: bool = False,
) -> DataFrame:
    """(new_id, old_id, jaccard) — new-crawl documents that near-duplicate
    the HISTORICAL corpus (the 'dedup this crawl against all previous
    crawls' path; within-crawl dedup is near_duplicate_pairs).

    Scale shape: the only history-sized inputs are the PRECOMPUTED index
    (pass `old_index` from the warehouse — when None it is built on the
    fly for ad-hoc use), a history-wide text-hash group pass (one narrow
    aggregate, no payload shuffle), and a LEFT-SEMI candidate fetch of
    old documents, so per-crawl cost is O(new postings + candidates),
    never a re-signature of history.

    Mega-bucket guards (the 10^6-identical-boilerplate hazard the LSH
    section documents — here it compounds: one hot history bucket ×
    EVERY future crawl):
      - both crawls are exact-collapsed to min-id representatives before
        any bucket join; LSH candidates, fetches, and shingle verifies
        run at rep level only, and verified rep pairs are expanded back
        over the text-hash memberships at the end. Jaccard depends only
        on text, so the expanded relation is EXACTLY the exhaustive
        (new_id, old_id) relation — identical docs simply stop paying
        quadratic candidate cost.
      - posting ids read from a persisted (possibly legacy, uncollapsed)
        index are mapped to their group representative via the history
        text-hash groups before verify, so per-crawl index appends with
        per-crawl reps, stale member postings, and uncollapsed round-4
        indexes all converge to the same rep-level candidates.
        `index_is_collapsed=True` SKIPS that history-wide mapping join —
        pass it ONLY when the index was built in one shot over exactly
        `old_docs` with `lsh_index(collapse_exact=True)` (the same
        min-id rule this function uses), where the mapping is provably
        the identity. Multi-crawl appended indexes (per-crawl reps) must
        keep the default False.
      - `max_bucket_size` caps postings per (band, bucket) on BOTH the
        probe side and any index read or built here (smallest doc_ids
        kept; None opts out)."""
    # Pinned: referenced by semi-fetch + expansion, and AQE does not
    # reliably reuse the duplicated subtrees (measured: unpinning moved
    # ~1.7 s from construction into ~1.7 s of re-executed stages). Each
    # pin costs one planning+codegen pass over a now-small tree — the
    # round-6 Arrow signature stage is what made these cheap (~0.55 s →
    # ~0.1 s each, since no 64-literal fold tree is planned).
    # The groups frames DERIVE from the pinned members (one md5 text
    # scan per crawl side, not two): members is the (id, text_hash)
    # projection both the group aggregate and the expansion join read.
    new_members = new_docs.select(
        F.col(id_col).alias("__mid"), F.md5(F.col(text_col)).alias("__th")
    ).localCheckpoint(eager=False)
    old_members = old_docs.select(
        F.col(id_col).alias("__mid"), F.md5(F.col(text_col)).alias("__th")
    ).localCheckpoint(eager=False)
    new_groups = (
        new_members.groupBy("__th")
        .agg(F.min(F.col("__mid")).alias("__rep"))
        .localCheckpoint(eager=False)
    )
    old_groups = (
        old_members.groupBy("__th")
        .agg(F.min(F.col("__mid")).alias("__rep"))
        .localCheckpoint(eager=False)
    )
    new_rep_docs = new_docs.select(F.col(id_col), F.col(text_col)).join(
        new_groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    old_index_built_here = old_index is None
    if old_index is None:
        # Ad-hoc mode: BOTH indexes from ONE fused signature pass. The
        # old side's exact-collapse reuses the pinned `old_groups`
        # (identical min-id rule to lsh_index's own collapse), the two
        # rep frames union under a side flag packed into a struct key
        # (type-agnostic: the key is opaque to the Arrow kernel), and
        # banding + the per-(side, band, bucket) posting cap run once
        # over the union — per-side groups are exactly the separate
        # windows' groups, so the capped postings are row-identical to
        # two independent lsh_index builds. One Arrow stage + one cap
        # window instead of two of each (measured ~0.23 s at sf0.1;
        # fewer stage barriers at any scale). Warehouse mode (old_index
        # passed) is unchanged — history is never re-signatured there.
        old_rep_docs = old_docs.select(F.col(id_col), F.col(text_col)).join(
            old_groups.select(F.col("__rep").alias(id_col)), id_col,
            "left_semi",
        )
        fused = (
            old_rep_docs.withColumn("__side", F.lit(0))
            .unionByName(new_rep_docs.withColumn("__side", F.lit(1)))
            .select(
                F.struct(
                    F.col("__side"), F.col(id_col).alias("__id")
                ).alias("__sid"),
                F.col(text_col),
            )
        )
        sigs = minhash_signatures_arrow(
            fused, text_col, "__sid", num_hashes, shingle_k
        ).select(
            F.col("doc_id.__side").alias("__side"),
            F.col("doc_id.__id").alias("doc_id"),
            "sig",
        )
        banded = _band_explode(
            sigs, bands, num_hashes, extra_cols=("__side",)
        )
        if max_bucket_size is not None:
            wcap = Window.partitionBy("__side", "band", "bucket").orderBy(
                "doc_id"
            )
            banded = (
                banded.withColumn("__rn", F.row_number().over(wcap))
                .where(F.col("__rn") <= max_bucket_size)
                .drop("__rn")
            )
        banded = banded.localCheckpoint(eager=False)
        old_index = banded.where(F.col("__side") == 0).drop("__side")
        new_index = banded.where(F.col("__side") == 1).drop("__side")
    else:
        old_index = _cap_postings(old_index, max_bucket_size)
        new_index = lsh_index(
            new_rep_docs, text_col, id_col, num_hashes, bands, shingle_k,
            collapse_exact=False,  # already rep-only
            max_bucket_size=max_bucket_size,
        )
    # NOT distinct here: `cands` below is the one dedup exchange — a
    # second distinct at posting grain would add a full extra shuffle
    # stage for the same result
    raw_cands = (
        new_index.alias("n")
        .join(
            old_index.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bucket") == F.col("o.bucket")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_pid")
        )
    )
    if index_is_collapsed or old_index_built_here:
        # posting ids ARE the min-id reps (same collapse rule as
        # old_groups) — the mapping join would be the identity; skip the
        # history-wide members ⋈ groups shuffle entirely
        mapped = raw_cands.select("new_id", F.col("old_pid").alias("old_id"))
    else:
        # posting id (rep or legacy member) -> group representative.
        # Dedup the posting-grain pairs BEFORE the history-wide mapping
        # join (on this branch the extra exchange pays for itself: band
        # collisions would otherwise multiply the join probe up to
        # `bands`-fold).
        old_rep_of = old_members.join(old_groups, "__th").select(
            F.col("__mid").alias("old_pid"), F.col("__rep").alias("old_id")
        )
        mapped = raw_cands.distinct().join(old_rep_of, "old_pid").select(
            "new_id", "old_id"
        )
    cands = (
        mapped.distinct()
        # referenced three times below (candidate fetches + verify join):
        # pin so the bucket join runs once, not per reference
        .localCheckpoint(eager=False)
    )
    # fetch ONLY candidate rep docs — on BOTH sides — before computing
    # their shingles: the verify join touches candidates alone, and
    # candidates are bucket-collisions (<< the crawl), so an unfiltered
    # new side would re-run the whole shingle pass the signatures paid
    # no .distinct() on the key frames: left_semi ignores right-side
    # duplicates, and each distinct would be one more exchange stage
    old_c = old_docs.join(
        cands.select(F.col("old_id").alias(id_col)), id_col, "left_semi"
    )
    new_c = new_docs.join(
        cands.select(F.col("new_id").alias(id_col)), id_col, "left_semi"
    )
    sh_new = new_c.select(
        F.col(id_col).alias("new_id"),
        shingles(F.col(text_col), shingle_k).alias("sh_n"),
    )
    sh_old = old_c.select(
        F.col(id_col).alias("old_id"),
        shingles(F.col(text_col), shingle_k).alias("sh_o"),
    )
    j = cands.join(sh_new, "new_id").join(sh_old, "old_id")
    inter = F.size(F.array_intersect("sh_n", "sh_o")).cast("double")
    union = F.size(F.array_union("sh_n", "sh_o")).cast("double")
    rep_pairs = (
        j.select(
            "new_id",
            "old_id",
            F.when(union == 0, F.lit(1.0)).otherwise(inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # expand verified rep pairs over both exact-dup memberships: output is
    # the full (new_id, old_id) relation, output-bound by construction
    return (
        rep_pairs
        .join(
            new_groups.select(F.col("__rep").alias("new_id"), "__th"), "new_id"
        )
        .join(
            new_members.select(F.col("__mid").alias("__new_m"), "__th"), "__th"
        )
        .drop("__th")
        .join(
            old_groups.select(F.col("__rep").alias("old_id"), "__th"), "old_id"
        )
        .join(
            old_members.select(F.col("__mid").alias("__old_m"), "__th"), "__th"
        )
        .select(
            F.col("__new_m").alias("new_id"),
            F.col("__old_m").alias("old_id"),
            "jaccard",
        )
    )
