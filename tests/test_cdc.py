"""Content-defined chunking (operators/cdc.py)."""

from __future__ import annotations

import hashlib
import random

from eventanalysis_spark.operators.cdc import (
    cdc_chunk_table,
    cdc_dedup_stats,
    cdc_shared_pairs,
    chunk_boundaries,
    gear_hashes,
)


def _blob(seed: int, n: int) -> bytes:
    return random.Random(seed).randbytes(n)


def test_gear_hash_window_locality():
    """h_i depends on only the last 64 bytes: different prefixes, same
    64-byte suffix -> same hash at the suffix end."""
    tail = _blob(1, 64)
    a = _blob(2, 500) + tail
    b = _blob(3, 900) + tail
    assert gear_hashes(a)[-1] == gear_hashes(b)[-1]
    # and a 63-byte suffix is NOT enough
    a2 = _blob(2, 500) + tail[1:]
    b2 = _blob(3, 900) + tail[1:]
    assert len(tail[1:]) == 63
    # last byte still differs in contribution from position -64
    # (can collide only with 2^-64 probability)
    assert gear_hashes(a2)[-1] != gear_hashes(b2)[-1]


def test_chunk_boundaries_invariants():
    data = _blob(7, 100_000)
    ends = chunk_boundaries(data, mask_bits=10, min_chunk=128, max_chunk=4096)
    assert ends[-1] == len(data)
    prev = 0
    for e in ends:
        size = e - prev
        assert 0 < size <= 4096
        assert size >= 128 or e == len(data)  # short final chunk allowed
        prev = e
    # deterministic
    assert ends == chunk_boundaries(data, 10, 128, 4096)
    assert chunk_boundaries(b"", 10, 128, 4096) == []


def test_cdc_shift_invariance():
    """THE property fixed-size blocks lack: prepend bytes and the
    shared tail still chunks identically (away from the splice)."""
    shared = _blob(11, 40_000)
    a = shared
    b = _blob(12, 137) + shared  # 137-byte insertion at the front
    ca = chunk_boundaries(a, mask_bits=10, min_chunk=128, max_chunk=4096)
    cb = chunk_boundaries(b, mask_bits=10, min_chunk=128, max_chunk=4096)

    def hashes(data, ends):
        prev, out = 0, set()
        for e in ends:
            out.add(hashlib.md5(data[prev:e]).hexdigest())
            prev = e
        return out

    ha, hb = hashes(a, ca), hashes(b, cb)
    # nearly all of a's chunks reappear in b despite the offset shift
    assert len(ha & hb) / len(ha) > 0.9


def test_cdc_chunk_table_and_stats(spark):
    shared = _blob(21, 30_000)
    rows = [
        ("d1", shared),
        ("d2", _blob(22, 200) + shared),          # shifted duplicate
        ("d3", _blob(23, 30_000)),                 # unrelated
        ("d4", None),                              # null blob skipped
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    chunks = cdc_chunk_table(df, mask_bits=10, min_chunk=128, max_chunk=4096)
    pdf = chunks.toPandas()
    assert set(pdf["doc_id"]) == {"d1", "d2", "d3"}
    # offsets/lengths reconstruct each blob exactly
    for did, blob in [("d1", rows[0][1]), ("d2", rows[1][1])]:
        sub = pdf[pdf.doc_id == did].sort_values("chunk_idx")
        assert sub["offset"].iloc[0] == 0
        assert (sub["offset"] + sub["length"]).iloc[-1] == len(blob)
        assert list((sub["offset"] + sub["length"]).iloc[:-1]) == list(
            sub["offset"].iloc[1:]
        )
    stats = cdc_dedup_stats(chunks).collect()[0]
    assert stats["n_chunks"] > stats["n_unique_chunks"]  # d1/d2 share
    assert stats["dedup_ratio"] > 1.2
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in cdc_shared_pairs(chunks, min_shared_bytes=1000).collect()
    }
    assert ("d1", "d2") in pairs
    assert pairs[("d1", "d2")]["shared_bytes"] > 20_000
    assert not any("d3" in k for k in pairs)


def test_cdc_mega_chunk_posting_cap(spark):
    # one chunk shared by MANY blobs (a template header): with the cap
    # below its posting count, no quadratic pair blowup
    header = _blob(31, 2000)
    rows = [(f"h{i}", header + _blob(100 + i, 3000)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    chunks = cdc_chunk_table(df, mask_bits=8, min_chunk=64, max_chunk=1024)
    capped = cdc_shared_pairs(chunks, max_postings=4)
    # every surviving pair's shared chunks exclude the 12-way template
    full = cdc_shared_pairs(chunks, max_postings=4096)
    assert full.count() >= 12 * 11 / 2  # template alone pairs everyone
    assert capped.count() < full.count()
