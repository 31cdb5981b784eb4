"""Sitemap ingestion: XML urlset / sitemapindex parsing into frontier rows.

The discovery side of the crawl loop that link extraction can't see:
sites publish their canonical URL inventory (sitemaps.org protocol, RFC
referenced by robots.txt `Sitemap:` lines) as `<urlset><url><loc>...`
documents, optionally nested one level behind a `<sitemapindex>`. This
module parses fetched sitemap bodies into (host, kind, loc, lastmod)
rows entirely with Catalyst expressions — `regexp_extract_all` with the
(?s) DOTALL flag over the block structure, then per-block field pulls —
no XML library, no Python, so a 10^8-sitemap fetch table parses inside
whole-stage codegen.

Scope (documented, tested): `<url>` entries and `<sitemapindex>`
children (`kind='sitemap'` rows — feed them back to the fetcher for the
next round; recursion is a fetch-loop concern, not a parse concern),
`<loc>`/`<lastmod>` fields with surrounding whitespace tolerated,
missing `<lastmod>` -> NULL. Entity-encoded locs are unescaped for the
five XML predefined entities (sitemaps.org requires escaping them).

Scale shape: sitemap bodies are a per-host dimension table against a
10^12-row frontier — the parse is a narrow projection + one explode
(rows multiply to entry count, never wider), and the downstream merge
into frontier candidates is a url-keyed union+distinct the planner
hash-partitions once. `sitemap_coverage` reduces both sides to url
hashes BEFORE the full outer join, so payloads never cross the
exchange (the snapshot_delta rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .webfilter import url_parts

_URL_BLOCK = r"(?s)<url\s*>(.*?)</url\s*>"
_SM_BLOCK = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC = r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD = r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
_CHANGEFREQ = r"(?s)<changefreq\s*>\s*(.*?)\s*</changefreq\s*>"
_PRIORITY = r"(?s)<priority\s*>\s*(.*?)\s*</priority\s*>"


def _xml_unescape(c: Column) -> Column:
    # the five predefined entities, &amp; last so '&amp;lt;' stays '&lt;'
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _entries(content: Column, block_re: str, kind: str) -> Column:
    blocks = F.regexp_extract_all(content, F.lit(block_re), F.lit(1))
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.lit(kind).alias("kind"),
            _xml_unescape(F.regexp_extract(b, _LOC, 1)).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
            F.nullif(
                F.lower(F.regexp_extract(b, _CHANGEFREQ, 1)), F.lit("")
            ).alias("changefreq"),
            # non-numeric priority -> NULL via try_cast (ANSI-safe; the
            # protocol default 0.5 is the CALLER's business — the parser
            # reports what was declared)
            F.nullif(F.regexp_extract(b, _PRIORITY, 1), F.lit(""))
            .try_cast("double")
            .alias("priority"),
        ),
    )


def sitemap_entries(
    sitemaps: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """(host, kind, loc, lastmod, changefreq, priority) rows from raw
    sitemap XML bodies.

    kind='url' for `<urlset>` page entries, kind='sitemap' for
    `<sitemapindex>` children; entries with an empty `<loc>` are
    dropped (the protocol makes loc required). Optional fields are NULL
    when absent; changefreq is lowercased, priority cast to double
    (non-numeric declarations -> NULL). One scan of each body: both
    block kinds are extracted into arrays in the same projection and
    exploded together."""
    both = F.concat(
        _entries(F.col(content_col), _URL_BLOCK, "url"),
        _entries(F.col(content_col), _SM_BLOCK, "sitemap"),
    )
    return (
        sitemaps.select(
            F.col(host_col).alias("host"), F.explode(both).alias("e")
        )
        .select(
            "host", "e.kind", "e.loc", "e.lastmod", "e.changefreq",
            "e.priority",
        )
        .where(F.length("loc") > 0)
    )


def sitemap_frontier_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """Distinct (url, host, lastmod, priority) page candidates from
    sitemap bodies, ready to union into a frontier: kind='url' entries
    only, host re-derived FROM THE LOC (a sitemap may list URLs on a
    sibling subdomain; politeness budgets key on the fetch host, not
    the sitemap's). Duplicate locs keep the max lastmod / max declared
    priority (freshest and strongest claims win, deterministic)."""
    e = sitemap_entries(sitemaps, host_col=host_col, content_col=content_col)
    return (
        e.where(F.col("kind") == "url")
        .select(
            F.col("loc").alias("url"),
            url_parts(F.col("loc"))["host"].alias("host"),
            F.col("lastmod"),
            F.col("priority"),
        )
        .groupBy("url", "host")
        .agg(
            F.max("lastmod").alias("lastmod"),
            F.max("priority").alias("priority"),
        )
    )


def sitemap_coverage(
    frontier: DataFrame,
    sitemap_urls: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host discovery-gap report between a link-derived frontier and
    the sitemap inventory: (host, n_frontier, n_sitemap, n_both,
    n_frontier_only, n_sitemap_only), ordered by host. `n_sitemap_only`
    is the crawl's blind spot (pages the site declares that link
    discovery never found); `n_frontier_only` is sitemap staleness.

    Both sides reduce to distinct (host, url) BEFORE the full outer
    join, so the join moves key projections only."""
    a = (
        frontier.select(
            url_parts(F.col(url_col))["host"].alias("host"),
            F.col(url_col).alias("url"),
        )
        .distinct()
        .withColumn("in_f", F.lit(1))
    )
    b = (
        sitemap_urls.select("host", "url")
        .distinct()
        .withColumn("in_s", F.lit(1))
    )
    j = a.join(b, ["host", "url"], "full_outer")
    return (
        j.groupBy("host")
        .agg(
            F.sum(F.coalesce(F.col("in_f"), F.lit(0)))
            .cast("long")
            .alias("n_frontier"),
            F.sum(F.coalesce(F.col("in_s"), F.lit(0)))
            .cast("long")
            .alias("n_sitemap"),
            F.sum(
                F.when(
                    F.col("in_f").isNotNull() & F.col("in_s").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
        )
        .withColumn(
            "n_frontier_only", (F.col("n_frontier") - F.col("n_both"))
        )
        .withColumn("n_sitemap_only", (F.col("n_sitemap") - F.col("n_both")))
        .orderBy("host")
    )
