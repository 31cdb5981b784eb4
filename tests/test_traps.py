"""Crawler-trap detection (operators/traps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventanalysis_spark.operators.traps import (
    trap_filter,
    trap_stats,
    url_template,
    url_templates,
)


def _tmpl(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["t"]
        for r in df.select(url_template("url").alias("t"))
        .collect()
    ]


def test_url_template_generalization(spark):
    got = _tmpl(
        spark,
        [
            "https://h.example/blog/2024-03-07/post?page=3&sort=asc",
            "https://h.example/item/12345",
            "https://h.example/s/DEADBEEFDEADBEEF42/x",
            "https://h.example/plain/page",
            "https://h.example",
            "https://h.example/?b=2&a=1",
            "https://h.example/?a=9&b=",
        ],
    )
    assert got == [
        "/blog/{d}/post?page&sort",
        "/item/{n}",
        "/s/{h}/x",
        "/plain/page",
        "/",
        "/?a&b",
        "/?a&b",  # param VALUES and order never split a template
    ]


def test_url_template_date_beats_hex_and_short_hex_stays(spark):
    # YYYY-MM-DD is digits+dashes: must hit {d}, not {h}; 8-char hex is
    # below the 16-char session-id floor and stays literal.
    got = _tmpl(
        spark,
        ["https://h/x/2024-01-02", "https://h/x/2024-01", "https://h/x/cafe1234"],
    )
    assert got == ["/x/{d}", "/x/{d}", "/x/cafe1234"]


def test_url_templates_host_derivation(spark):
    df = spark.createDataFrame(
        [("https://User@WWW.Example.COM:8443/a/1",)], "url string"
    )
    row = url_templates(df).collect()[0]
    assert row["host"] == "www.example.com"
    assert row["template"] == "/a/{n}"


def _frontier(spark):
    # trap.example: 30 calendar URLs (one template) + 5 legit pages;
    # ok.example: 8 distinct static pages (8 templates).
    rows = [(f"https://trap.example/cal/2024-01-{d:02d}",) for d in range(1, 31)]
    rows += [(f"https://trap.example/about/p{c}",) for c in "abcde"]
    rows += [(f"https://ok.example/page-{c}",) for c in "abcdefgh"]
    return spark.createDataFrame(rows, "url string")


def test_trap_stats_flags_calendar_not_legit(spark):
    st = trap_stats(_frontier(spark), min_urls=10, min_share=0.5)
    rows = {(r["host"], r["template"]): r for r in st.collect()}
    cal = rows[("trap.example", "/cal/{d}")]
    assert cal["n_urls"] == 30 and cal["n_host_urls"] == 35
    assert cal["trapped"] and abs(cal["share"] - 30 / 35) < 1e-12
    assert not any(
        r["trapped"] for k, r in rows.items() if k[0] == "ok.example"
    )
    assert not rows[("trap.example", "/about/pa")]["trapped"]


def test_trap_stats_static_template_never_trapped(spark):
    # same static URL repeated: big count + share 1.0, but no variable
    # part -> cannot be an infinite subspace -> not flagged.
    df = spark.createDataFrame(
        [("https://h.example/home",)] * 20, "url string"
    )
    st = trap_stats(df, min_urls=5, min_share=0.1).collect()
    assert len(st) == 1 and not st[0]["trapped"]


def test_trap_filter_caps_and_passes_through(spark):
    fr = _frontier(spark)
    out = trap_filter(fr, min_urls=10, min_share=0.5, keep_per_template=3)
    kept = sorted(r["url"] for r in out.collect())
    # 3 lexicographically-first calendar URLs survive; everything else intact
    assert [u for u in kept if "/cal/" in u] == [
        f"https://trap.example/cal/2024-01-{d:02d}" for d in (1, 2, 3)
    ]
    assert len(kept) == 3 + 5 + 8
    assert out.columns == fr.columns  # helper cols dropped


def test_trap_filter_precomputed_report(spark):
    # gate a FRESH frontier with last crawl's trap table: new calendar
    # URLs beyond the cap are dropped even though the fresh frontier
    # alone wouldn't meet min_urls.
    traps = trap_stats(_frontier(spark), min_urls=10, min_share=0.5)
    fresh = spark.createDataFrame(
        [(f"https://trap.example/cal/2025-06-{d:02d}",) for d in range(1, 6)]
        + [("https://trap.example/contact",)],
        "url string",
    )
    out = trap_filter(fresh, traps=traps, keep_per_template=2)
    kept = sorted(r["url"] for r in out.collect())
    assert kept == [
        "https://trap.example/cal/2025-06-01",
        "https://trap.example/cal/2025-06-02",
        "https://trap.example/contact",
    ]


def test_trap_filter_partition_invariance(spark):
    fr = _frontier(spark)
    a = sorted(
        r["url"]
        for r in trap_filter(
            fr.repartition(13), min_urls=10, min_share=0.5, keep_per_template=4
        ).collect()
    )
    b = sorted(
        r["url"]
        for r in trap_filter(
            fr.coalesce(1), min_urls=10, min_share=0.5, keep_per_template=4
        ).collect()
    )
    assert a == b


def test_traps_verb_feeds_frontier(tmp_path, spark, capsys):
    """traps verb → trap report parquet → frontier --traps gates a
    FRESH frontier with last crawl's report (no re-mining)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as cli

    rows = [(f"https://t.example/cal/2024-03-{d:02d}",) for d in range(1, 21)]
    rows += [("https://t.example/home",)]
    src = str(tmp_path / "crawl1")
    spark.createDataFrame(rows, "url string").write.parquet(src)
    rep_path = str(tmp_path / "traps")
    capsys.readouterr()
    assert cli.main([
        "--master", "local[4]", "traps", "--source", src, "--out", rep_path,
        "--min-urls", "10", "--min-share", "0.5",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["flagged"] == 1
    assert rep["top_traps"][0]["template"] == "/cal/{d}"

    # fresh crawl: 4 new calendar urls (below min_urls alone) + 1 page
    fresh = [(f"https://t.example/cal/2025-01-{d:02d}",) for d in range(1, 5)]
    fresh += [("https://t.example/fresh",)]
    src2 = str(tmp_path / "crawl2")
    spark.createDataFrame(fresh, "url string").write.parquet(src2)
    out = str(tmp_path / "sched")
    assert cli.main([
        "--master", "local[4]", "frontier", "--source", src2, "--out", out,
        "--traps", rep_path, "--trap-cap", "2",
    ]) == 0
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {
        "https://t.example/cal/2025-01-01",
        "https://t.example/cal/2025-01-02",
        "https://t.example/fresh",
    }
