"""robots.txt parsing and URL filtering — the crawl-frontier companion.

`robots_rules` parses fetched robots.txt bodies into per-host
allow/disallow prefix lists entirely with Catalyst expressions (a
single aggregate() fold over the lines — no Python); `robots_filter`
applies them to candidate URLs with the longest-match rule (an Allow
prefix at least as long as the longest matching Disallow wins —
Google/RFC 9309 precedence, minus wildcards).

Scope (documented, tested): groups addressed to `User-agent: *` only
(a crawl pipeline resolves its own UA offline by rewriting the group
filter), prefix matching only (no `*`/`$` wildcard extension — the
original 1994 REP), comments (#) and blank lines stripped, keys
case-insensitive, multiple stacked UA lines form one group per RFC
9309 §2.2.1.

Scale shape: rules are one row per HOST (dimension-sized against a
10^12-URL frontier) → broadcast join; the per-URL match is two bounded
array folds over that host's prefix lists. No shuffle beyond the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_rules(lines: Column) -> Column:
    """Fold robots.txt lines into struct(allow array, dis array,
    delay double, sitemaps array).

    State: (in_star, after_rule, allow, dis, delay, sitemaps). A
    User-agent line STARTS a new group when the previous line was a
    rule (after_rule), otherwise it stacks onto the current group's UA
    set; Allow/Disallow/Crawl-delay lines apply when the current group
    includes '*' (first Crawl-delay wins; non-numeric values ignored).
    `Sitemap:` lines are GLOBAL per the protocol — collected from any
    group position."""
    init = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(False).alias("after_rule"),
        F.array().cast("array<string>").alias("allow"),
        F.array().cast("array<string>").alias("dis"),
        F.lit(None).cast("double").alias("delay"),
        F.array().cast("array<string>").alias("sitemaps"),
    )

    def step(acc: Column, raw: Column) -> Column:
        ln = F.trim(F.regexp_replace(raw, r"#.*$", ""))
        key = F.lower(F.regexp_extract(ln, r"^([A-Za-z\-]+)\s*:", 1))
        val = F.trim(F.regexp_extract(ln, r"^[A-Za-z\-]+\s*:\s*(.*)$", 1))
        is_ua = key == "user-agent"
        is_allow = (key == "allow") & (F.length(val) > 0)
        is_dis = (key == "disallow") & (F.length(val) > 0)
        is_delay = (key == "crawl-delay") & (F.length(val) > 0)
        is_map = (key == "sitemap") & (F.length(val) > 0)
        star = val == "*"
        new_in_star = F.when(
            is_ua,
            F.when(acc["after_rule"], star).otherwise(acc["in_star"] | star),
        ).otherwise(acc["in_star"])
        return F.struct(
            new_in_star.alias("in_star"),
            # any non-UA directive (incl. the global Sitemap line) breaks
            # UA-line adjacency, so the next UA starts a NEW group
            # (RFC 9309 §2.2.1: stacked UA lines must be consecutive)
            F.when(is_ua, F.lit(False))
            .when(is_allow | is_dis | is_delay | is_map, F.lit(True))
            .otherwise(acc["after_rule"])
            .alias("after_rule"),
            F.when(
                is_allow & acc["in_star"], F.array_append(acc["allow"], val)
            )
            .otherwise(acc["allow"])
            .alias("allow"),
            F.when(is_dis & acc["in_star"], F.array_append(acc["dis"], val))
            .otherwise(acc["dis"])
            .alias("dis"),
            F.when(
                is_delay & acc["in_star"],
                F.coalesce(acc["delay"], val.try_cast("double")),
            )
            .otherwise(acc["delay"])
            .alias("delay"),
            F.when(is_map, F.array_append(acc["sitemaps"], val))
            .otherwise(acc["sitemaps"])
            .alias("sitemaps"),
        )

    folded = F.aggregate(lines, init, step)
    return F.struct(
        folded["allow"].alias("allow"),
        folded["dis"].alias("dis"),
        folded["delay"].alias("delay"),
        folded["sitemaps"].alias("sitemaps"),
    )


def robots_rules(
    robots: DataFrame, host_col: str = "host", content_col: str = "content"
) -> DataFrame:
    """(host, allow array<string>, disallow array<string>,
    crawl_delay double, sitemaps array<string>) from raw robots.txt
    text — `User-agent: *` groups only (crawl_delay: first valid value
    in a *-group, NULL when undeclared; sitemaps: every global
    `Sitemap:` line, for the robots → sitemap-fetch discovery loop).
    One narrow projection; duplicate hosts collapse to the first fetch
    (min content) deterministically."""
    body = F.col(content_col).cast("string")
    one = robots.groupBy(host_col).agg(F.min(body).alias("__body"))
    rules = one.select(
        F.col(host_col).alias("host"),
        _fold_rules(F.split(F.col("__body"), "\r?\n")).alias("__r"),
    )
    return rules.select(
        "host",
        F.col("__r.allow").alias("allow"),
        F.col("__r.dis").alias("disallow"),
        F.col("__r.delay").alias("crawl_delay"),
        F.col("__r.sitemaps").alias("sitemaps"),
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    keep_blocked: bool = False,
) -> DataFrame:
    """Longest-match REP filtering: a URL is allowed unless some
    Disallow prefix matches its path AND no Allow prefix of equal or
    greater length matches. Hosts with no rules row are fully allowed.
    Adds `allowed` boolean; drops blocked rows unless keep_blocked."""
    path0 = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(.*)$", 1
    )
    path = F.when(F.length(path0) == 0, F.lit("/")).otherwise(path0)

    def max_match(prefixes: Column) -> Column:
        return F.aggregate(
            F.coalesce(prefixes, F.array().cast("array<string>")),
            F.lit(-1),
            lambda acc, p: F.greatest(
                acc,
                F.when(path.startswith(p), F.length(p)).otherwise(F.lit(-1)),
            ),
        )

    # explicit aliases: rules often DERIVES from urls (same lineage), so
    # frame-qualified columns would be ambiguous in the self-join
    u, r = urls.alias("__u"), rules.alias("__r")
    joined = u.join(
        F.broadcast(r), F.col(f"__u.{host_col}") == F.col("__r.host"), "left"
    )
    out = joined.select(
        *[F.col(f"__u.{c}") for c in urls.columns],
        (
            max_match(F.col("__r.allow")) >= max_match(F.col("__r.disallow"))
        ).alias("allowed"),
    )
    return out if keep_blocked else out.where(F.col("allowed")).drop("allowed")
