"""Crawl-frontier politeness scheduling (operators/frontier.py)."""

from __future__ import annotations

import pytest


def test_frontier_schedule_politeness_and_cap(spark):
    from eventanalysis_spark.operators.frontier import (
        frontier_schedule,
        frontier_slot_report,
    )

    rows = (
        [(f"https://big.example/{i:02d}", "big.example", 100 - i) for i in range(10)]
        + [("https://small.example/a", "small.example", 5),
           ("https://small.example/b", "small.example", 9)]
    )
    urls = spark.createDataFrame(rows, "url string, host string, priority long")
    out = frontier_schedule(
        urls, per_host_slots=2, max_per_host=6, priority_col="priority"
    )
    got = {r["url"]: (r["host_rank"], r["slot"]) for r in out.collect()}
    # cap: only 6 of big.example's 10 survive — the HIGHEST-priority 6
    big = {u: v for u, v in got.items() if u.startswith("https://big")}
    assert len(big) == 6
    assert set(big) == {f"https://big.example/{i:02d}" for i in range(6)}
    # politeness: ≤ 2 per host per slot; ranks follow priority desc
    assert big["https://big.example/00"] == (1, 0)
    assert big["https://big.example/01"] == (2, 0)
    assert big["https://big.example/02"] == (3, 1)
    assert big["https://big.example/05"] == (6, 2)
    # small host: priority desc → /b first
    assert got["https://small.example/b"] == (1, 0)
    assert got["https://small.example/a"] == (2, 0)
    # per-slot capacity report
    rep = {r["slot"]: (r["n_urls"], r["n_hosts"])
           for r in frontier_slot_report(out).collect()}
    assert rep == {0: (4, 2), 1: (2, 1), 2: (2, 1)}
    # deterministic under repartitioning
    out13 = frontier_schedule(
        urls.repartition(13), per_host_slots=2, max_per_host=6,
        priority_col="priority",
    )
    assert {r["url"]: (r["host_rank"], r["slot"]) for r in out13.collect()} == got
    with pytest.raises(ValueError):
        frontier_schedule(urls, per_host_slots=0)
