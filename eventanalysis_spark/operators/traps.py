"""Crawler-trap detection: URL-template explosion mining.

Web crawls die in "traps" — URL subspaces that are effectively infinite
(calendar pages, session-id rewrites, faceted-search permutations,
print/sort/locale parameter crosses). The classic defence (Heydon &
Najork, "Mercator: A scalable, extensible Web crawler", WWW 1999;
Castillo, "Effective Web Crawling", 2004) is to GENERALIZE each URL to
a template — variable path segments wildcarded, query-parameter names
kept but values dropped — and flag templates whose URL population
explodes relative to their host. This module is that defence as a
first-class frontier pre-pass, feeding `frontier_schedule` the same way
robots gating does.

Template rule (pure Catalyst, one projection, no Python):
  - path segments that are all digits        -> ``{n}``   (ids, years)
  - date-shaped segments YYYY-MM[-DD]        -> ``{d}``   (calendar traps)
  - long hex/uuid-ish segments (>=16 chars)  -> ``{h}``   (session ids)
  - query string reduced to its SORTED parameter names (values dropped,
    order-insensitive: ``?b=2&a=1`` and ``?a=9&b=`` share a template)

Scale shape: the per-URL template is a narrow projection; trap mining is
ONE (host, template) hash aggregate with map-side partial combine, then
a host-total re-aggregate OF THAT AGGREGATE (|host x template| rows, far
below URL count — the fine-grain-rollup rule from pipeline.py). The
flagged-trap table is dimension-sized, so `trap_filter` gates a 10^12-row
frontier with a broadcast join; only rows in flagged templates enter the
per-template capping window (bounded by the trap report, not the corpus).

Reference parity note: the reference engine has no crawler; this module
belongs to the training-data-pipeline surface the mission brief makes
first-class (it composes with operators/frontier.py and
operators/robots.py into the crawl-planning loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .webfilter import url_parts

# Segment generalization, applied in order (first match wins). The date
# rule must precede the hex rule: '2024-01-02' is digits+dashes and
# would otherwise need the 16-char floor to miss it by accident.
_SEG_NUM = r"^[0-9]+$"
_SEG_DATE = r"^[0-9]{4}-[0-9]{2}(-[0-9]{2})?$"
_SEG_HEX = r"^[0-9A-Fa-f\-]{16,}$"

_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_template(url: Column | str) -> Column:
    """The URL generalized to its trap-mining template (string).

    '/blog/2024-03-07/x?page=3&sort=asc' -> '/blog/{d}/x?page&sort'.
    A URL with no path yields '/'; parameter names are sorted so value
    order never splits a template."""
    url = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(url, _PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: F.length(s) > 0)
    gen = F.transform(
        segs,
        lambda s: F.when(s.rlike(_SEG_NUM), F.lit("{n}"))
        .when(s.rlike(_SEG_DATE), F.lit("{d}"))
        .when(s.rlike(_SEG_HEX), F.lit("{h}"))
        .otherwise(s),
    )
    q = F.regexp_extract(url, _QUERY_RE, 1)
    names = F.array_sort(
        F.transform(
            F.filter(F.split(q, "&"), lambda p: F.length(p) > 0),
            lambda p: F.regexp_extract(p, r"^([^=]*)", 1),
        )
    )
    tmpl = F.concat(F.lit("/"), F.concat_ws("/", gen))
    return F.when(
        F.size(names) > 0,
        F.concat(tmpl, F.lit("?"), F.concat_ws("&", names)),
    ).otherwise(tmpl)


def url_templates(
    urls: DataFrame, url_col: str = "url", host_col: str | None = None
) -> DataFrame:
    """Input columns + (host, template). `host_col=None` derives the
    host from the URL authority (userinfo/port-stripped, lowercased —
    webfilter.url_parts rules)."""
    out = urls
    if host_col is None:
        out = out.withColumn("host", url_parts(F.col(url_col))["host"])
    elif host_col != "host":
        out = out.withColumn("host", F.col(host_col))
    return out.withColumn("template", url_template(F.col(url_col)))


def trap_stats(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    min_urls: int = 1000,
    min_share: float = 0.10,
) -> DataFrame:
    """Per-(host, template) explosion report:
    (host, template, n_urls, n_host_urls, share, trapped).

    A template is `trapped` when it holds >= `min_urls` URLs AND owns
    >= `min_share` of its host's frontier AND actually generalizes
    (contains a wildcard or a query signature — a fully-static template
    cannot be an infinite subspace). Deterministic order host, template.

    Scale: one fine hash aggregate over (host, template), host totals by
    re-aggregating the fine rows (never a second corpus scan), one
    aggregate-to-aggregate join on host."""
    t = url_templates(urls, url_col=url_col, host_col=host_col)
    fine = t.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )
    totals = fine.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("n_host_urls")
    )
    share = (
        F.col("n_urls").cast("double") / F.col("n_host_urls").cast("double")
    )
    return (
        fine.join(totals, "host")
        .withColumn("share", share)
        .withColumn(
            "trapped",
            (F.col("n_urls") >= F.lit(int(min_urls)))
            & (F.col("share") >= F.lit(float(min_share)))
            & (
                F.col("template").contains("{")
                | F.col("template").contains("?")
            ),
        )
        .orderBy("host", "template")
    )


def trap_filter(
    urls: DataFrame,
    traps: DataFrame | None = None,
    url_col: str = "url",
    host_col: str | None = None,
    keep_per_template: int = 100,
    min_urls: int = 1000,
    min_share: float = 0.10,
) -> DataFrame:
    """Cap each flagged trap template to its `keep_per_template`
    lexicographically-first URLs; everything outside a flagged template
    passes through untouched. `traps=None` mines the trap table from
    `urls` itself via `trap_stats`; pass a precomputed report (e.g. from
    the previous crawl) to gate a fresh frontier without re-mining.

    Output: input columns only (host/template helpers dropped),
    deterministic under any partitioning.

    Scale: the trap table is dimension-sized -> broadcast; untouched
    rows never shuffle (broadcast anti join), and the capping window
    shuffles ONLY rows inside flagged templates — bounded by the trap
    report itself, not the corpus."""
    if keep_per_template < 0:
        raise ValueError("keep_per_template must be >= 0")
    if traps is None:
        traps = trap_stats(
            urls,
            url_col=url_col,
            host_col=host_col,
            min_urls=min_urls,
            min_share=min_share,
        )
    flagged = traps.where(F.col("trapped")).select("host", "template")
    t = url_templates(urls, url_col=url_col, host_col=host_col)
    helper_cols = [c for c in ("host", "template") if c not in urls.columns]
    keep = t.join(F.broadcast(flagged), ["host", "template"], "left_anti")
    w = Window.partitionBy("host", "template").orderBy(F.col(url_col).asc())
    capped = (
        t.join(F.broadcast(flagged), ["host", "template"], "left_semi")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= keep_per_template)
        .drop("__rk")
    )
    return keep.unionByName(capped).drop(*helper_cols)
