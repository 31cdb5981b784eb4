"""robots.txt parse + longest-match filtering (operators/robots.py)."""

from __future__ import annotations


ROBOTS = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: evilbot
Disallow: /

User-agent: otherbot
User-agent: *
Disallow: /mixed/
"""


def test_robots_rules_parse(spark):
    from eventanalysis_spark.operators.robots import robots_rules

    df = spark.createDataFrame(
        [("h.example", ROBOTS)], "host string, content string"
    )
    r = robots_rules(df).collect()[0]
    # star groups: the first block AND the stacked otherbot/* block;
    # the evilbot-only block is ignored
    assert r["disallow"] == ["/private/", "/tmp", "/mixed/"]
    assert r["allow"] == ["/private/ok/"]


def test_robots_filter_longest_match(spark):
    from eventanalysis_spark.operators.robots import (
        robots_filter,
        robots_rules,
    )

    rules = robots_rules(
        spark.createDataFrame(
            [("h.example", ROBOTS)], "host string, content string"
        )
    )
    urls = spark.createDataFrame(
        [
            ("https://h.example/", "h.example"),              # allowed
            ("https://h.example/private/x", "h.example"),     # blocked
            ("https://h.example/private/ok/x", "h.example"),  # re-allowed
            ("https://h.example/tmpfile", "h.example"),       # '/tmp' prefix
            ("https://h.example/mixed/a", "h.example"),       # stacked group
            ("https://other.example/private/x", "other.example"),  # no rules
        ],
        "url string, host string",
    )
    kept = {r["url"] for r in robots_filter(urls, rules).collect()}
    assert kept == {
        "https://h.example/",
        "https://h.example/private/ok/x",
        "https://other.example/private/x",
    }
    flags = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, rules, keep_blocked=True).collect()
    }
    assert flags["https://h.example/private/x"] is False
    assert flags["https://h.example/tmpfile"] is False
    assert flags["https://h.example/private/ok/x"] is True
    # deterministic under repartitioning
    kept13 = {
        r["url"]
        for r in robots_filter(urls.repartition(13), rules).collect()
    }
    assert kept13 == kept


def test_robots_crawl_delay_and_sitemaps(spark):
    from eventanalysis_spark.operators.robots import robots_rules

    body = (
        "Sitemap: https://h.example/sm-top.xml\n"
        "User-agent: other\n"
        "Crawl-delay: 99\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "Crawl-delay: 2.5\n"
        "Crawl-delay: 7\n"          # first valid *-group value wins
        "Sitemap: https://h.example/sm-a.xml\n"
        "User-agent: b\n"            # new group (sitemap broke adjacency)
        "Crawl-delay: 41\n"
    )
    df = spark.createDataFrame(
        [("h.example", body), ("plain.example", "User-agent: *\nDisallow:\n")],
        "host string, content string",
    )
    rows = {r["host"]: r for r in robots_rules(df).collect()}
    h = rows["h.example"]
    assert h["crawl_delay"] == 2.5
    assert h["sitemaps"] == [
        "https://h.example/sm-top.xml", "https://h.example/sm-a.xml"
    ]
    assert h["disallow"] == ["/x"]
    p = rows["plain.example"]
    assert p["crawl_delay"] is None and p["sitemaps"] == []


def test_robots_crawl_delay_non_numeric_ignored(spark):
    from eventanalysis_spark.operators.robots import robots_rules

    body = "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 3\n"
    df = spark.createDataFrame(
        [("h", body)], "host string, content string"
    )
    assert robots_rules(df).collect()[0]["crawl_delay"] == 3.0
