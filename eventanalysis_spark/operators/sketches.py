"""Count-min sketch + exact heavy hitters: frequency estimation whose
state is O(depth × width), independent of corpus size.

At 100 TB the exact token/URL/host frequency table is itself huge and
reshuffles with every new crawl slice. A count-min sketch (Cormode &
Muthukrishnan 2005) compresses it to a fixed depth×width grid with a
one-sided guarantee (estimate >= true count; overshoot bounded by
n/width per row, min over depth rows): the right structure for "is this
n-gram/url/host frequent?" gates in dedup and filtering pipelines.

Spark-first shape: the sketch IS one hash aggregate. Each input row
expands to `depth` (row, cell) coordinates (a literal-sequence explode,
JVM-side and narrow); groupBy (d, idx) SUM collapses map-side, so the
shuffle carries at most depth×width rows per upstream partition no
matter how skewed the keys are — the classic hot-key problem the exact
count table has is absorbed by partial aggregation into bounded state.
Sketches are MERGEABLE by construction (cellwise sum): per-source /
per-crawl sketches union + re-aggregate into the corpus sketch, bit-equal
to sketching the union (tested).

Hashing: the d-th hash of key x is hash60_md5(d || ':' || x) mod width —
the same SQL-replicable 60-bit md5 family as dedup.hash60_md5, so the
whole sketch (and every estimate read from it) has an EXACT DuckDB
oracle. Estimates are exact when width >> distinct keys; always an
upper bound otherwise.

The reference has no sketch machinery (its totals are exact SQLite
aggregates, Lcl.EventLog/Jobs/EventJob.Queries.cs); this family is part
of the at-scale pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.operators.dedup import hash60_md5


def _cell(d: Column, key: Column, width: int) -> Column:
    """Row-d cell index of `key`: md5-60bit of 'd:key' mod width."""
    return F.pmod(
        hash60_md5(F.concat(d.cast("string"), F.lit(":"), key.cast("string"))),
        F.lit(width),
    )


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    weight_col: str | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build a count-min sketch of `key_col` (optionally weighted,
    optionally one sketch per `group_cols` value). Output rows
    (*group_cols, d, idx, cnt) — the sparse cell grid, at most
    depth×width rows per group.

    One narrow explode (each row → depth coordinates) + ONE hash
    aggregate with map-side partial — a mega-hot key contributes at
    most depth rows per upstream partition to the shuffle."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    coords = df.select(
        *group_cols,
        F.col(key_col).alias("__k"),
        w.alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        coords.select(
            *group_cols,
            "d",
            _cell(F.col("d"), F.col("__k"), width).alias("idx"),
            "__w",
        )
        .groupBy(*group_cols, "d", "idx")
        .agg(F.sum("__w").alias("cnt"))
    )


def countmin_merge(
    sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge per-source sketches (same depth/width) into one by cellwise
    sum — bit-equal to sketching the concatenated input. Pass the
    group columns that should SURVIVE the merge; any others (e.g. the
    source tag) must already be absent or they shard the result."""
    return sketches.groupBy(*group_cols, "d", "idx").agg(
        F.sum("cnt").alias("cnt")
    )


def countmin_lookup(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for every row of `items`: appends
    `cm_est` = min over the depth cells (0 when a cell is empty —
    count-min reads absent cells as zero). The sketch side is at most
    depth×width rows → broadcast join; items never shuffle."""
    probes = items.withColumn(
        "__d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn("__idx", _cell(F.col("__d"), F.col(key_col), width))
    joined = probes.join(
        F.broadcast(sketch),
        (probes["__d"] == sketch["d"]) & (probes["__idx"] == sketch["idx"]),
        "left",
    ).select(*[probes[c] for c in items.columns], F.coalesce(sketch["cnt"], F.lit(0)).alias("__c"))
    return joined.groupBy(*items.columns).agg(F.min("__c").alias("cm_est"))


def _bloom_pos(h: Column, key: Column, num_bits: int) -> Column:
    """h-th bloom bit position of `key`: md5-60bit of 'h|key' mod m."""
    return F.pmod(
        hash60_md5(F.concat(h.cast("string"), F.lit("|"), key.cast("string"))),
        F.lit(num_bits),
    )


# 32-bit words: masks stay in [1, 2^31], positive in BIGINT on both
# engines (a 64-bit word's bit 63 would need signed-overflow semantics
# that Spark's ANSI mode and DuckDB both reject)
_WORD = 32


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build a Bloom filter of `key_col` as a SPARSE word table
    (*group_cols, word, bits): word = bit_position // 32, bits = OR of
    the set bit masks. At most ceil(num_bits/32) rows per group — fixed
    size no matter how many keys went in; one-sided error (false
    positives only, never false negatives).

    One narrow explode (row → num_hashes positions) + ONE bit_or hash
    aggregate with map-side partial. Per-source filters merge by
    `bloom_merge` (cellwise OR) — bit-equal to building over the union.
    Probes broadcast the word table: this is the decontamination /
    membership-gate shape when the exact key set outgrows a broadcast
    array (sampling.decontaminate's documented limit)."""
    pos = df.select(
        *group_cols,
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("__h"),
    ).select(
        *group_cols,
        _bloom_pos(F.col("__h"), F.col("__k"), num_bits).alias("__pos"),
    )
    return (
        pos.select(
            *group_cols,
            F.floor(F.col("__pos") / _WORD).cast("long").alias("word"),
            # python shiftleft() wants a literal shift; the SQL form takes
            # a column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {_WORD} AS INT))")
            .alias("__m"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_merge(blooms: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge same-shape Bloom filters by cellwise OR — bit-equal to
    building one filter over the concatenated input."""
    return blooms.groupBy(*group_cols, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Membership-test every row of `items` against the filter: appends
    `maybe_present` (true = possibly in the set, false = DEFINITELY
    not). Each item expands to its num_hashes (word, bit) probes, the
    sparse word table joins as a broadcast, and all-bits-set reduces
    per item — items never shuffle for the join."""
    probes = (
        items.withColumn("__h", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
        .withColumn("__pos", _bloom_pos(F.col("__h"), F.col(key_col), num_bits))
        .withColumn("__word", F.floor(F.col("__pos") / _WORD).cast("long"))
        .withColumn("__bit", (F.col("__pos") % _WORD).cast("int"))
    )
    joined = probes.join(
        F.broadcast(bloom), probes["__word"] == bloom["word"], "left"
    ).select(
        *[probes[c] for c in items.columns],
        F.when(
            bloom["bits"].isNotNull()
            & (bloom["bits"].bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), __bit)")
            ) != 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__hit"),
    )
    return joined.groupBy(*items.columns).agg(
        (F.min("__hit") == 1).alias("maybe_present")
    )


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-gated benchmark decontamination: like
    sampling.decontaminate but the benchmark gram set is a fixed-size
    Bloom filter instead of an exact broadcast array — the shape for
    eval suites too big to broadcast exactly. One-sided error means
    possible OVER-flagging (safe direction: a false positive drops a
    clean doc, never leaks a contaminated one). Returns (id_col,
    n_flagged_ngrams, is_contaminated) counting DISTINCT doc grams the
    filter reports present."""
    from eventanalysis_spark.operators.sampling import word_shingles

    bench_grams = benchmark.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("gram")
    ).distinct()
    bloom = bloom_build(bench_grams, "gram", num_bits, num_hashes)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    )
    flagged = bloom_probe(bloom, doc_grams, "gram", num_bits, num_hashes)
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("maybe_present"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged_ngrams")
        )
        .withColumn("is_contaminated", F.col("n_flagged_ngrams") >= threshold)
    )


# ---- HyperLogLog -----------------------------------------------------------
#
# Flajolet et al. 2007. Completes the sketch family: count-min =
# frequency, bloom = membership, HLL = cardinality. KMV (corpus.py)
# also estimates cardinality but keeps k hash VALUES; HLL keeps one
# 6-bit register per bucket — the fixed-and-tiny (2^p rows) mergeable
# state that per-host / per-crawl distinct counters need at 100 TB.
#
# Cross-engine determinism: rho is derived from the binary-string
# LENGTH of the suffix (exact in both engines; floor(log2(w)) via
# doubles would flip at powers of two), and the register sum
# Σ 2^(-M_j) is computed as the exact INTEGER Σ 2^(52-M_j) — dyadic
# double addition order could round, integer addition cannot.

_HLL_BITS = 60  # usable bits of hash60_md5


def hll_sketch(
    df: DataFrame,
    key_col: str,
    p: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog registers of `key_col`: (*group_cols, bucket, mval)
    with bucket = low p bits of the md5-60bit hash and mval = max over
    keys of (1 + leading-zero count of the remaining 60-p bits). At
    most 2^p rows per group; ONE map-side-partial max aggregate;
    sketches merge with `hll_merge` (registerwise max, bit-equal to
    sketching the union)."""
    if not 4 <= p <= 11:
        raise ValueError("p must be in [4, 11] (register sum fits in long)")
    m = 1 << p
    h = hash60_md5(F.col(key_col))
    # high bits via INTEGER shift — h/m through double division would
    # round (h has up to 60 bits, doubles carry 53)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(_HLL_BITS - p + 1)).otherwise(
        F.lit(_HLL_BITS - p) - (F.length(F.bin(w)) - 1)
    )
    return (
        df.select(*group_cols, F.pmod(h, F.lit(m)).alias("bucket"), rho.alias("__r"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__r").cast("int").alias("mval"))
    )


def hll_merge(sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge same-p HLL sketches by registerwise max."""
    return sketches.groupBy(*group_cols, "bucket").agg(
        F.max("mval").alias("mval")
    )


def hll_estimate(
    sketch: DataFrame,
    p: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Cardinality estimate per group: the standard HLL harmonic-mean
    formula with linear-counting small-range correction. The register
    sum is the exact integer Σ 2^(52−M_j) (absent buckets contribute
    2^52), so the estimate is bit-identical across engines and
    partitionings; typical error ~1.04/√(2^p) ≈ 3.3% at p=10."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)  # valid for m >= 128
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__v"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - mval AS INT))"))
        .alias("__s_present"),
    )
    s = F.col("__s_present") + (F.lit(m) - F.col("__v")) * F.lit(1 << 52)
    zeros = (F.lit(m) - F.col("__v")).cast("double")
    e_raw = F.lit(alpha * m * m * float(1 << 52)) / s.cast("double")
    est = F.when(
        (F.col("__v") < m) & (e_raw <= 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 6).alias("est_distinct"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact top-k keys by (weighted) count: one hash aggregate with
    map-side partial, then TakeOrderedAndProject on (cnt DESC, key ASC)
    — k rows per partition move, never a global sort. Deterministic
    tie-break on the key."""
    w = F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(w.alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(k)
    )
