"""Randomized cross-checks of the crawl-ops Catalyst expressions against
pure-python twins — one Spark action over hundreds of generated cases
(the batched analog of the hypothesis tests; seeded, fully
deterministic)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F


# ---- python twin of operators/traps.py::url_template ------------------

def url_template_py(url: str) -> str:
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/[^?#]*)", url)
    path = m.group(1) if m else ""
    segs = [s for s in path.split("/") if s]

    def gen(s: str) -> str:
        if re.fullmatch(r"[0-9]+", s):
            return "{n}"
        if re.fullmatch(r"[0-9]{4}-[0-9]{2}(-[0-9]{2})?", s):
            return "{d}"
        if re.fullmatch(r"[0-9A-Fa-f\-]{16,}", s):
            return "{h}"
        return s

    t = "/" + "/".join(gen(s) for s in segs)
    q = re.search(r"\?([^#]*)", url)
    parts = [p for p in (q.group(1).split("&") if q else []) if p]
    names = sorted(re.match(r"^([^=]*)", p).group(1) for p in parts)
    return t + ("?" + "&".join(names) if names else "")


def _gen_urls(n: int) -> list[str]:
    rng = random.Random(20260820)
    seg_pool = [
        lambda: str(rng.randint(0, 10**9)),
        lambda: f"{rng.randint(1990, 2030)}-{rng.randint(1, 12):02d}",
        lambda: (f"{rng.randint(1990, 2030)}-{rng.randint(1, 12):02d}"
                 f"-{rng.randint(1, 28):02d}"),
        lambda: "".join(rng.choices("0123456789abcdefABCDEF-", k=rng.randint(16, 40))),
        lambda: "".join(rng.choices("0123456789abcdef", k=rng.randint(1, 15))),
        lambda: rng.choice(["blog", "item", "page", "x", "a-b_c", "v2"]),
        lambda: rng.choice(["2024", "007", "1"]) + rng.choice(["a", ""]),
    ]
    urls = []
    for _ in range(n):
        host = rng.choice(["h.example", "www.shop.co.uk", "x.y.z.example"])
        segs = [rng.choice(seg_pool)() for _ in range(rng.randint(0, 4))]
        path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
        params = [
            rng.choice(["page", "sort", "q", "id", "ref"]) +
            rng.choice(["", "=" + str(rng.randint(0, 99)), "="])
            for _ in range(rng.randint(0, 3))
        ]
        rng.shuffle(params)
        query = "?" + "&".join(params) if params else ""
        urls.append(f"https://{host}{path}{query}")
    return urls


def test_url_template_matches_python_twin(spark):
    from eventanalysis_spark.operators.traps import url_template

    urls = _gen_urls(400)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["t"]
        for r in df.coalesce(1)
        .select(url_template("url").alias("t"))
        .collect()
    ]
    expected = [url_template_py(u) for u in urls]
    assert got == expected


# ---- python twin of operators/robots.py::robots_filter ----------------

def rep_allowed_py(path: str, allow: list[str], dis: list[str]) -> bool:
    best_a = max((len(p) for p in allow if path.startswith(p)), default=-1)
    best_d = max((len(p) for p in dis if path.startswith(p)), default=-1)
    return best_a >= best_d


def test_robots_filter_matches_python_twin(spark):
    from eventanalysis_spark.operators.robots import robots_filter

    rng = random.Random(42)
    prefixes = ["/", "/a", "/a/", "/a/b", "/ab", "/b", "/a/b/c", "/c?x", "/a/b/cd"]
    cases = []
    for i in range(300):
        allow = rng.sample(prefixes, rng.randint(0, 4))
        dis = rng.sample(prefixes, rng.randint(0, 4))
        path = rng.choice(prefixes) + rng.choice(["", "d", "/e", "?x=1"])
        cases.append((f"h{i}", f"https://h{i}{path}", path, allow, dis))
    urls = spark.createDataFrame(
        [(c[0], c[1]) for c in cases], "host string, url string"
    )
    rules = spark.createDataFrame(
        [(c[0], c[3], c[4]) for c in cases],
        "host string, allow array<string>, disallow array<string>",
    )
    got = {
        r["host"]: r["allowed"]
        for r in robots_filter(urls, rules, keep_blocked=True).collect()
    }
    for host, _url, path, allow, dis in cases:
        assert got[host] == rep_allowed_py(path, allow, dis), (
            host, path, allow, dis
        )
