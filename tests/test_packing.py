"""Sequence packing (operators/packing.py): hand-computed coordinates,
partition invariance, stream contiguity, stats, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def docs(spark):
    # (doc_id, n_tokens): crafted so docs sit inside, exactly fill, and
    # cross chunk boundaries at seq_len=10, plus an empty doc
    rows = [(0, 4), (1, 6), (2, 0), (3, 25), (4, 1), (5, 10)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_hand_computed_coordinates(spark, docs):
    got = {r["doc_id"]: r for r in pack_sequences(docs, 10).collect()}
    # stream: d0 [0,4) d1 [4,10) d2 [10,10) d3 [10,35) d4 [35,36) d5 [36,46)
    want = {
        0: (0, 4, 0, 0, 1),
        1: (4, 10, 0, 0, 1),
        2: (10, 10, -1, -1, 0),  # empty doc occupies no sequence
        3: (10, 35, 1, 3, 3),    # spans seqs 1,2,3
        4: (35, 36, 3, 3, 1),
        5: (36, 46, 3, 4, 2),
    }
    for did, (s, e, sf_, sl, ns) in want.items():
        r = got[did]
        assert (
            r["tok_start"], r["tok_end"], r["seq_first"], r["seq_last"], r["n_seqs"]
        ) == (s, e, sf_, sl, ns), did


def test_partition_invariance(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs.repartition(1), 10).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(5), 10, num_partitions=3).collect()))
    c = sorted(map(tuple, pack_sequences(docs.repartition(2), 10, num_partitions=8).collect()))
    assert a == b == c


def test_stream_contiguity_on_fixture(spark, pages):
    """tok_start of each doc == tok_end of its predecessor in corpus
    order — the concatenation invariant, checked on 3000 real-ish rows."""
    docs = pages.select(
        F.col("url").alias("doc_id"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    rows = pack_sequences(docs, 512).orderBy("doc_id").collect()
    prev_end = 0
    for r in rows:
        assert r["tok_start"] == prev_end
        prev_end = r["tok_end"]
    assert prev_end == sum(r["n_tokens"] for r in rows)


def test_packing_stats(spark, docs):
    s = packing_stats(pack_sequences(docs, 10), 10).collect()[0]
    assert s["total_tokens"] == 46
    assert s["n_full_seqs"] == 4
    assert s["tail_tokens"] == 6
    assert s["boundary_cross_frac"] == pytest.approx(2 / 6, abs=1e-6)


def test_no_single_partition_window_over_data(spark):
    big = spark.range(20000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    got = pack_sequences(big, 64)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the ranged frame is a single checkpoint materialization (one set
    # of range boundaries for both branches — ranks.ranged_with_pid),
    # so the plan reads a Scan ExistingRDD, not a live range exchange
    assert "existingrdd" in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    lines = plan.split("\n")
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert sp, "expected the offsets rollup exchange"
    for i in sp:
        child = "\n".join(lines[i + 1 : i + 3])
        assert "__pid" in child, f"SinglePartition over data, not counts:\n{child}"
    # and the numbers are right at this size
    tail = got.orderBy(F.col("tok_end").desc()).limit(1).collect()[0]
    assert tail["tok_end"] == 20000 // 7 * (1 + 2 + 3 + 4 + 5 + 6 + 7) + sum(
        i % 7 + 1 for i in range(20000 // 7 * 7, 20000)
    )


def test_chunk_documents_windows_and_tail(spark):
    from eventanalysis_spark.operators.packing import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, toks), (2, "one two"), (3, "   "), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_size=4, overlap=1).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, step 3 -> starts 0,3,6,9
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[-1]["chunk_text"] == "t9"  # short tail, no padding
    # overlap: chunk i repeats the last token of chunk i-1
    assert c1[1]["chunk_text"].split()[0] == c1[0]["chunk_text"].split()[-1]
    # doc 2: single short chunk; whitespace-only/empty docs yield nothing
    assert [r["chunk_text"] for r in by_doc[2]] == ["one two"]
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_validation(spark):
    import pytest

    from eventanalysis_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)
