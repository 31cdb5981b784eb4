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
