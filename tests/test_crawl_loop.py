"""End-to-end crawl-ops loop: every planning verb chained on real files.

The workflow a crawl operator actually runs between two crawls:

  crawl N pages ──link-rank──> host priorities ─┐
  crawl N urls ───traps──────> trap report ─────┤
  crawl N-1 vs N ─churn───────> (alt. priority) │
  robots fetches ────────────────────────────┐  │
  sitemap fetches ───────────────────────────┤  │
                                             v  v
  frontier --sitemaps --traps --robots --slot-seconds --ranks
                → politeness-scheduled, trap-capped, REP-clean,
                  delay-budgeted, priority-ordered fetch plan
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def test_full_crawl_loop_cli(tmp_path, spark, capsys):
    import spark_submit_main as cli

    d = str(tmp_path)

    # --- crawl N artifacts -------------------------------------------
    # pages: hub.example links to both others; leaf pages link back to hub
    def page(url, hrefs):
        html = "".join(f'<a href="{h}">x</a>' for h in hrefs).encode()
        return (url, html)

    pages = [
        page("https://hub.example/", ["https://a.example/p0",
                                      "https://b.example/p0"]),
        page("https://a.example/p0", ["https://hub.example/"]),
        page("https://b.example/p0", ["https://hub.example/"]),
    ]
    spark.createDataFrame(pages, "url string, html binary").write.parquet(
        d + "/pages"
    )

    # crawl-N url inventory: a.example has a calendar trap
    urls = [(f"https://a.example/cal/2024-05-{i:02d}",) for i in range(1, 13)]
    urls += [("https://a.example/about",), ("https://b.example/p0",),
             ("https://hub.example/",)]
    spark.createDataFrame(urls, "url string").write.parquet(d + "/urls")

    # robots: b.example declares a crawl delay and blocks /private
    spark.createDataFrame(
        [("b.example",
          "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n")],
        "host string, content string",
    ).write.parquet(d + "/robots")

    # sitemaps: b.example declares a page link discovery never saw,
    # plus a blocked one that must not survive REP gating
    sm = ("<urlset><url><loc>https://b.example/declared</loc></url>"
          "<url><loc>https://b.example/private/x</loc></url></urlset>")
    spark.createDataFrame(
        [("b.example", sm)], "host string, content string"
    ).write.parquet(d + "/sitemaps")

    capsys.readouterr()

    # --- planning verbs ----------------------------------------------
    assert cli.main(["--master", "local[4]", "link-rank",
                     "--source", d + "/pages", "--out", d + "/ranks",
                     "--iterations", "3"]) == 0
    assert cli.main(["--master", "local[4]", "traps",
                     "--source", d + "/urls", "--out", d + "/traps",
                     "--min-urls", "10", "--min-share", "0.5"]) == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    trap_rep = json.loads(out_lines[-1])
    assert trap_rep["flagged"] == 1

    # --- the scheduled frontier --------------------------------------
    assert cli.main([
        "--master", "local[4]", "frontier",
        "--source", d + "/urls", "--out", d + "/plan",
        "--sitemaps", d + "/sitemaps",
        "--traps", d + "/traps", "--trap-cap", "2",
        "--robots", d + "/robots", "--slot-seconds", "1",
        "--ranks", d + "/ranks",
        "--per-host-slots", "2",
    ]) == 0
    plan = {r["url"]: r for r in spark.read.parquet(d + "/plan").collect()}

    # trap capped to 2; legit a.example page survives
    assert {u for u in plan if "/cal/" in u} == {
        "https://a.example/cal/2024-05-01", "https://a.example/cal/2024-05-02"
    }
    assert "https://a.example/about" in plan
    # sitemap-declared page joined the frontier; REP-blocked one did not
    assert "https://b.example/declared" in plan
    assert "https://b.example/private/x" not in plan
    # crawl-delay 2 with 1s slots: b.example fetches stride 2 slots apart
    b_slots = sorted(r["slot"] for u, r in plan.items()
                     if u.startswith("https://b.example/"))
    assert b_slots == [0, 2]
    # hub (highest PageRank) fetches first within its host
    assert plan["https://hub.example/"]["slot"] == 0
    # every surviving URL got a deterministic (host_rank, slot)
    assert all(r["host_rank"] >= 1 and r["slot"] >= 0 for r in plan.values())
