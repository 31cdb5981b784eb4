"""Sitemap parsing (operators/sitemaps.py)."""

from __future__ import annotations

from eventanalysis_spark.operators.sitemaps import (
    sitemap_coverage,
    sitemap_entries,
    sitemap_frontier_urls,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example/p1 </loc>
    <lastmod>2024-05-01</lastmod>
    <changefreq>Daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/p2?x=1&amp;y=2</loc></url>
  <url><loc></loc></url>
</urlset>
"""

_INDEX = """<sitemapindex>
  <sitemap>
    <loc>https://b.example/sitemap-1.xml</loc>
    <lastmod>2024-06-02T10:00:00Z</lastmod>
  </sitemap>
  <sitemap><loc>https://b.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark):
    return spark.createDataFrame(
        [("a.example", _URLSET), ("b.example", _INDEX)],
        "host string, content string",
    )


def test_sitemap_entries_urlset_and_index(spark):
    rows = sorted(
        (tuple(r) for r in sitemap_entries(_df(spark)).collect())
    )
    assert rows == [
        # changefreq lowercased, priority cast to double
        ("a.example", "url", "https://a.example/p1", "2024-05-01",
         "daily", 0.8),
        # entity-unescaped loc; missing optionals -> NULL; empty loc dropped
        ("a.example", "url", "https://a.example/p2?x=1&y=2", None, None,
         None),
        ("b.example", "sitemap", "https://b.example/sitemap-1.xml",
         "2024-06-02T10:00:00Z", None, None),
        ("b.example", "sitemap", "https://b.example/sitemap-2.xml", None,
         None, None),
    ]


def test_sitemap_frontier_urls_rehosts_and_dedupes(spark):
    # loc on a sibling subdomain keys on ITS host; duplicate loc keeps
    # the freshest lastmod claim.
    xml = (
        "<urlset>"
        "<url><loc>https://cdn.c.example/img</loc></url>"
        "<url><loc>https://c.example/p</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://c.example/p</loc><lastmod>2024-03-01</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("c.example", xml)], "host string, content string"
    )
    rows = {r["url"]: r for r in sitemap_frontier_urls(df).collect()}
    assert rows["https://cdn.c.example/img"]["host"] == "cdn.c.example"
    assert rows["https://c.example/p"]["lastmod"] == "2024-03-01"
    assert len(rows) == 2


def test_sitemap_coverage_gap_report(spark):
    frontier = spark.createDataFrame(
        [("https://a.example/p1",), ("https://a.example/only-linked",)],
        "url string",
    )
    sm = sitemap_frontier_urls(
        spark.createDataFrame(
            [("a.example", _URLSET)], "host string, content string"
        )
    )
    row = sitemap_coverage(frontier, sm).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_frontier"], r["n_sitemap"], r["n_both"]) == (2, 2, 1)
    assert (r["n_frontier_only"], r["n_sitemap_only"]) == (1, 1)


def test_sitemap_entries_whitespace_tolerant_tags(spark):
    xml = "<url ><loc >https://d.example/x</loc ></url >"
    df = spark.createDataFrame(
        [("d.example", xml)], "host string, content string"
    )
    rows = sitemap_entries(df).collect()
    assert len(rows) == 1 and rows[0]["loc"] == "https://d.example/x"


def test_sitemap_priority_dedup_and_bad_values(spark):
    xml = (
        "<urlset>"
        "<url><loc>https://e.example/p</loc><priority>0.3</priority></url>"
        "<url><loc>https://e.example/p</loc><priority>0.9</priority></url>"
        "<url><loc>https://e.example/q</loc><priority>high</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("e.example", xml)], "host string, content string"
    )
    rows = {r["url"]: r for r in sitemap_frontier_urls(df).collect()}
    assert rows["https://e.example/p"]["priority"] == 0.9  # strongest claim
    assert rows["https://e.example/q"]["priority"] is None  # non-numeric
