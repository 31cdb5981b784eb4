"""Content-defined chunking (CDC) — byte-level sub-object dedup for
binary blobs.

Fixed-size blocks cannot deduplicate shifted content: insert one byte at
the front of a WARC payload and every block boundary moves, so nothing
matches. CDC (Muthitacharoen et al., LBFS, SOSP 2001; Gear/FastCDC form:
Xia et al., USENIX ATC 2016) cuts where a rolling hash of the LOCAL byte
window hits a mask — boundaries travel WITH the content, so a shared
segment chunks identically wherever it sits. This is the storage-side
dedup primitive for blob columns (html/image/audio payloads), next to
the SEMANTIC near-dup families (MinHash for text, perceptual hashes for
media).

Gear hash: h = (h << 1 + gear[byte]) mod 2^64. Each byte's contribution
shifts left once per step, so h_i depends on only the last 64 bytes —
equivalently h_i = Σ_{k=0..63} gear[b_{i-k}] << k, which is how the UDF
VECTORIZES it: 64 shifted adds over numpy arrays instead of a per-byte
Python loop, then a sparse pass over mask-hit candidates to enforce
min/max chunk bounds (candidates are ~N/2^mask_bits of positions, so
the sequential part touches thousandths of the bytes).

Spark shape: one Arrow-batched UDF per blob emitting the chunk table
(id, chunk_idx, offset, length, chunk_hash) — rows multiply to chunk
count, never wider; every downstream question (shared chunks, dedupable
bytes) is a plain hash aggregate / join on chunk_hash with map-side
partials. The gear table is seeded and deterministic (the hyperplane
rule from similarity.py), so chunk hashes are stable across sessions,
partitions, and crawls — chunk tables from different crawls join
directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR_SEED = b"eventanalysis-cdc-gear-v1"


def _gear_table() -> np.ndarray:
    """256 deterministic 64-bit gear values (seeded SHA-256 expansion —
    no RNG state, identical on every executor)."""
    out = np.empty(256, dtype=np.uint64)
    for i in range(256):
        h = hashlib.sha256(_GEAR_SEED + bytes([i])).digest()
        out[i] = np.uint64(int.from_bytes(h[:8], "big"))
    return out


_GEAR = _gear_table()


def gear_hashes(data: bytes) -> np.ndarray:
    """Rolling gear hash at every position (uint64). Vectorized as 64
    shifted adds: h[i] = Σ_{k<64} gear[b[i-k]] << k (mod 2^64)."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = g.copy()
    n = len(b)
    for k in range(1, 64):
        if k >= n:
            break
        h[k:] += g[: n - k] << np.uint64(k)
    return h


def chunk_boundaries(
    data: bytes,
    mask_bits: int = 12,
    min_chunk: int = 256,
    max_chunk: int = 8192,
) -> list[int]:
    """Cut positions (exclusive ends) for one blob: a boundary after
    byte i where gear_hash & mask == 0, skipping cuts closer than
    `min_chunk` to the previous one and forcing a cut at `max_chunk`.
    The sparse candidate pass is the only sequential part."""
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << mask_bits) - 1)
    h = gear_hashes(data)
    cand = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER the hit byte
    ends = []
    prev = 0
    ci = 0
    m = len(cand)
    while prev < n:
        limit = prev + max_chunk
        while ci < m and cand[ci] < prev + min_chunk:
            ci += 1
        if ci < m and cand[ci] <= limit and cand[ci] < n:
            ends.append(int(cand[ci]))
        elif limit < n:
            ends.append(limit)
        else:
            ends.append(n)
        prev = ends[-1]
    return ends


_CHUNK_SCHEMA = (
    "doc_id string, chunk_idx long, offset long, length long, "
    "chunk_hash string"
)


def cdc_chunk_table(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    mask_bits: int = 12,
    min_chunk: int = 256,
    max_chunk: int = 8192,
) -> DataFrame:
    """(doc_id, chunk_idx, offset, length, chunk_hash) for every blob —
    chunk_hash is the md5 of the chunk BYTES (not the gear value: gear
    only places boundaries; identity comes from content). Arrow-batched
    iterator UDF; blob column pruned into it."""

    def gen(batches):
        for pdf in batches:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for rid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                if blob is None:
                    continue
                prev = 0
                for j, end in enumerate(
                    chunk_boundaries(blob, mask_bits, min_chunk, max_chunk)
                ):
                    ids.append(str(rid))
                    idxs.append(j)
                    offs.append(prev)
                    lens.append(end - prev)
                    hashes.append(hashlib.md5(blob[prev:end]).hexdigest())
                    prev = end
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="object"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        gen, _CHUNK_SCHEMA
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level CDC dedup report from a chunk table: one row —
    (n_chunks, n_unique_chunks, total_bytes, unique_bytes,
    dedup_ratio). `unique_bytes` keeps ONE copy per distinct
    chunk_hash; ratio = total/unique (>= 1, higher = more duplication).
    Two partial-aggregatable hash aggregates, no joins."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("length").alias("len"),
    )
    return per_hash.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_unique_chunks"),
        F.sum(F.col("n") * F.col("len")).cast("long").alias("total_bytes"),
        F.sum("len").cast("long").alias("unique_bytes"),
        F.round(
            F.sum(F.col("n") * F.col("len")).cast("double")
            / F.sum("len").cast("double"),
            6,
        ).alias("dedup_ratio"),
    )


def cdc_shared_pairs(
    chunks: DataFrame, min_shared_bytes: int = 1, max_postings: int = 4096
) -> DataFrame:
    """(doc_a, doc_b, n_shared_chunks, shared_bytes) for blob pairs
    sharing content — the mega-bucket rule applies verbatim: a chunk
    appearing in more than `max_postings` blobs (an empty-page template,
    a codec header) is dropped BEFORE the pair join, bounding fanout.
    Ordered, doc_a < doc_b."""
    # Pin the postings: the df cap + both pair-join sides consume them —
    # unpinned, the Arrow CDC chunking pass over every blob re-runs 3x
    # per action (the winnow-postings rule). Chunk-posting-sized, the
    # blob column is already gone.
    per = (
        chunks.select("doc_id", "chunk_hash", "length")
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_counts = per.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("__n"))
    eligible = per.join(
        df_counts.where(F.col("__n") <= max_postings).select("chunk_hash"),
        "chunk_hash",
    )
    a, b = eligible.alias("a"), eligible.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_chunks"),
            F.sum("a.length").cast("long").alias("shared_bytes"),
        )
        .where(F.col("shared_bytes") >= min_shared_bytes)
    )
    return pairs.orderBy("doc_a", "doc_b")
