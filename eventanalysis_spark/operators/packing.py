"""Sequence packing — concat-and-chunk training-batch layout.

LLM pre-training consumes fixed-length token sequences built by
concatenating every document in a deterministic corpus order and slicing
the stream every `seq_len` tokens (the GPT/Llama data layout; documents
span chunk boundaries). The operator computes, for every document, its
coordinates in that virtual token stream: global token offset, the first
and last sequence it lands in, and how many sequences it spans — enough
for a loader to materialize any sequence by fetching exactly the
documents that intersect it.

Spark-first shape: the global running token sum is the same two-phase
construction as `enrich.assign_ids` (no single-partition window over
data): range-partition on the corpus order, per-partition token totals →
cumulative offsets (a window over ~numPartitions rows), broadcast the
offsets back, and a partition-LOCAL running sum. Offsets are exact at
any partition count, and only the (id, n_tokens) projection is ever
shuffled, never the text. Honest plan cost (verified via .explain, not
assumed): the ranged projection is materialized ONCE
(ranks.ranged_with_pid — a lazy localCheckpoint that pins one set of
range boundaries for both the counts and data branches; without it
Catalyst plans two independently-sampled range exchanges whose
boundaries can disagree at scale and misalign the offsets join), then
crosses ONE hash co-cluster Exchange on the partition id — Catalyst
inserts it because RangePartitioning does not satisfy the local
window's ClusteredDistribution(__pid). All exchanged frames are
~16 bytes/row; the construction stays shuffle-light because it is
narrow.

Arithmetic is all integer (`DIV`, not float division) so coordinates
stay exact past 2^53 tokens — a 10^12-doc corpus at ~10^3 tokens/doc is
a 10^15-token stream, where double-precision floor(x/L) would misplace
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("doc_id",),
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document packing coordinates for concat-and-chunk at
    `seq_len`: (…order_cols, n_tokens, tok_start, tok_end, seq_first,
    seq_last, n_seqs). Zero-token documents occupy no sequence:
    seq_first/seq_last = -1, n_seqs = 0 (a -1 sentinel, not NULL, so the
    columns stay int-typed end to end)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    cols = [F.col(c) for c in order_cols]
    npart = (
        num_partitions
        or docs.sparkSession.sparkContext.defaultParallelism
    )
    from eventanalysis_spark.operators.ranks import ranged_with_pid

    ranged = ranged_with_pid(
        docs.select(*order_cols, F.col(tokens_col).cast("long").alias("__tok")),
        cols,
        npart,
    )
    counts = ranged.groupBy("__pid").agg(F.sum("__tok").alias("__n"))
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w_cum), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("__tok").over(w_in), F.lit(0)) + F.col("__off")
    ).cast("long")
    out = (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn("tok_start", start)
        .withColumn("tok_end", (F.col("tok_start") + F.col("__tok")).cast("long"))
        .withColumn(
            "seq_first",
            F.when(F.col("__tok") == 0, F.lit(-1).cast("long")).otherwise(
                F.expr(f"tok_start DIV {int(seq_len)}")
            ),
        )
        .withColumn(
            "seq_last",
            F.when(F.col("__tok") == 0, F.lit(-1).cast("long")).otherwise(
                F.expr(f"(tok_end - 1) DIV {int(seq_len)}")
            ),
        )
        .withColumn(
            "n_seqs",
            F.when(F.col("__tok") == 0, F.lit(0).cast("long")).otherwise(
                F.col("seq_last") - F.col("seq_first") + 1
            ),
        )
    )
    return out.select(
        *order_cols,
        F.col("__tok").alias(tokens_col),
        "tok_start", "tok_end", "seq_first", "seq_last", "n_seqs",
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Corpus-level packing summary from pack_sequences output: total
    tokens, number of full sequences, tail tokens, and the fraction of
    documents that cross a chunk boundary (the loader's 'needs two
    fetches' rate). ONE map-side-partial aggregate."""
    return packed.agg(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("total_tokens"),
        F.expr(f"max(tok_end) DIV {int(seq_len)}").alias("n_full_seqs"),
        F.expr(f"max(tok_end) % {int(seq_len)}").alias("tail_tokens"),
        F.round(
            F.avg((F.col("n_seqs") > 1).cast("double")), 6
        ).alias("boundary_cross_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WITHIN-document fixed-size overlapping chunks — the RAG/embedding
    prep layout (pack_sequences is the complementary ACROSS-document
    pre-training layout). Each document's whitespace token stream is cut
    into windows of `chunk_size` tokens starting every
    `chunk_size - overlap` tokens; the trailing window may be short.
    Returns (id, chunk_idx, chunk_start, n_chunk_tokens, chunk_text) —
    chunk_text re-joined with single spaces (the same token rule every
    text operator here uses).

    Spark shape: pure Catalyst — one narrow projection, explode over a
    per-doc `sequence()` of chunk starts (bounded by the doc's own token
    count), `slice` for the window. No shuffle, no UDF; the explode
    amplifies rows by ~len/step per doc, which the caller prices exactly
    like the shingle explode in dedup. Empty documents yield no chunks.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap} vs {chunk_size}"
        )
    step = chunk_size - overlap
    toks = F.expr(f"split(trim({text_col}), '\\\\s+')")
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("__t")
    )
    n = F.size(F.col("__t"))
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    out = (
        base.select(F.col(id_col), "__t", F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            (F.col("chunk_start") / step).cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long"),
            F.least(F.lit(chunk_size), F.size("__t") - F.col("chunk_start"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice("__t", F.col("chunk_start") + 1, F.lit(chunk_size))
            ).alias("chunk_text"),
        )
    )
    return out
