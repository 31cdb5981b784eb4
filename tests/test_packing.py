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
