"""Fault-tolerant pinning strategies for iterative operators (plans/pin.py).

localCheckpoint blocks live on executors with no recompute path — fine
locally, fatal for a 100-iteration job on a real cluster. These tests
prove the persist / reliable-checkpoint strategies produce bit-identical
results to the default, and that the checkpoint path actually writes to
the reliable checkpoint dir.
"""

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.cluster import connected_components
from eventanalysis_spark.operators.linkgraph import host_pagerank, host_trustrank
from eventanalysis_spark.plans.pin import Pinner


def test_pinner_validates_strategy():
    with pytest.raises(ValueError):
        Pinner("executor-roulette")
    with pytest.raises(ValueError):
        Pinner("checkpoint", checkpoint_every=0)


def test_connected_components_persist_matches_local(spark):
    # a 64-node path graph forces multiple pointer-jumping rounds
    pairs = spark.range(63).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    want = {(r["id"], r["comp"])
            for r in connected_components(pairs).collect()}
    got = {(r["id"], r["comp"])
           for r in connected_components(pairs, pin="persist").collect()}
    assert got == want
    assert {c for _, c in got} == {0}  # one component, min-label 0


def test_pagerank_checkpoint_strategy_matches_and_writes(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("d", "a", 1)],
        "src string, dst string, w long",
    )
    want = {(r["host"], r["rank"])
            for r in host_pagerank(edges, iterations=6).collect()}

    # no checkpoint dir set -> clear error, not a silent localCheckpoint
    sc = spark.sparkContext
    assert sc._jsc.sc().getCheckpointDir().isEmpty()
    with pytest.raises(Exception, match="setCheckpointDir"):
        host_pagerank(edges, iterations=6, pin="checkpoint",
                      checkpoint_every=2).collect()

    ckdir = str(tmp_path / "reliable")
    sc.setCheckpointDir(ckdir)  # session-wide; harmless for other tests
    got = {(r["host"], r["rank"])
           for r in host_pagerank(edges, iterations=6, pin="checkpoint",
                                  checkpoint_every=2).collect()}
    assert got == want
    # the reliable dir received actual checkpoint data
    import os
    files = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert files, "no checkpoint files written to the reliable dir"


def test_trustrank_persist_matches_local(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("spam1", "spam2", 9),
         ("spam2", "spam1", 9), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "host string")
    want = {(r["host"], r["rank"])
            for r in host_trustrank(edges, seeds, iterations=5).collect()}
    got = {(r["host"], r["rank"])
           for r in host_trustrank(edges, seeds, iterations=5,
                                   pin="persist").collect()}
    assert got == want
