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
    """Fold robots.txt lines into struct(allow array, dis array).

    State: (in_star, after_rule, allow, dis). A User-agent line STARTS a
    new group when the previous line was a rule (after_rule), otherwise
    it stacks onto the current group's UA set; Allow/Disallow lines
    apply when the current group includes '*'."""
    init = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(False).alias("after_rule"),
        F.array().cast("array<string>").alias("allow"),
        F.array().cast("array<string>").alias("dis"),
    )

    def step(acc: Column, raw: Column) -> Column:
        ln = F.trim(F.regexp_replace(raw, r"#.*$", ""))
        key = F.lower(F.regexp_extract(ln, r"^([A-Za-z\-]+)\s*:", 1))
        val = F.trim(F.regexp_extract(ln, r"^[A-Za-z\-]+\s*:\s*(.*)$", 1))
        is_ua = key == "user-agent"
        is_allow = (key == "allow") & (F.length(val) > 0)
        is_dis = (key == "disallow") & (F.length(val) > 0)
        star = val == "*"
        new_in_star = F.when(
            is_ua,
            F.when(acc["after_rule"], star).otherwise(acc["in_star"] | star),
        ).otherwise(acc["in_star"])
        return F.struct(
            new_in_star.alias("in_star"),
            F.when(is_ua, F.lit(False))
            .when(is_allow | is_dis, F.lit(True))
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
        )

    folded = F.aggregate(lines, init, step)
    return F.struct(folded["allow"].alias("allow"), folded["dis"].alias("dis"))


def robots_rules(
    robots: DataFrame, host_col: str = "host", content_col: str = "content"
) -> DataFrame:
    """(host, allow array<string>, disallow array<string>) from raw
    robots.txt text — `User-agent: *` groups only. One narrow
    projection; duplicate hosts collapse to the first fetch (min
    content) deterministically."""
    body = F.col(content_col).cast("string")
    one = robots.groupBy(host_col).agg(F.min(body).alias("__body"))
    rules = one.select(
        F.col(host_col).alias("host"),
        _fold_rules(F.split(F.col("__body"), "\r?\n")).alias("__r"),
    )
    return rules.select(
        "host", F.col("__r.allow").alias("allow"), F.col("__r.dis").alias("disallow")
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
