"""Hyperlink-graph operators (operators/linkgraph.py): href extraction
rules, host edge aggregation, PageRank semantics (dangling mass, mass
conservation, analytic fixed points), degree/reciprocity stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.linkgraph import (
    extract_links,
    host_degree_stats,
    host_edges,
    host_pagerank,
    host_trustrank,
)


def _seeds(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], "host string")


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


class TestExtractLinks:
    def test_resolution_rules(self, spark):
        html = (
            b'<html><body>'
            b'<a class="x" href="HTTPS://WWW.Other.ORG/a">abs</a>'
            b"<a href='/rel/path'>rel</a>"
            b'<a href="//cdn.Example.com/x.js">proto-rel</a>'
            b'<a href="mailto:a@b.c">mail</a>'
            b'<a href="javascript:void(0)">js</a>'
            b'<a href="#frag">frag</a>'
            b"</body></html>"
        )
        df = _pages(spark, [("https://SRC.example/p?q=1", html.decode())])
        got = {
            (r["href"], r["dst_host"])
            for r in extract_links(df).collect()
        }
        assert got == {
            ("HTTPS://WWW.Other.ORG/a", "www.other.org"),  # abs, host lowered
            ("/rel/path", "src.example"),  # relative → source host
            ("//cdn.Example.com/x.js", "cdn.example.com"),  # protocol-relative
        }
        # href keeps the original bytes; mailto/javascript/#frag dropped

    def test_src_host_rides_every_row(self, spark):
        df = _pages(
            spark,
            [("https://a.example/1", '<a href="/x">x</a><a href="/y">y</a>')],
        )
        rows = extract_links(df).collect()
        assert [r["src_host"] for r in rows] == ["a.example", "a.example"]
        assert {r["href"] for r in rows} == {"/x", "/y"}

    def test_no_links_no_rows(self, spark):
        df = _pages(spark, [("https://a.example/1", "<html><body>t</body></html>")])
        assert extract_links(df).count() == 0


def test_extract_links_randomized_shapes(spark):
    """300 seeded random pages × random link shapes (quote style,
    attribute order, whitespace around =, scheme case, fragments,
    unicode noise between tags) — expected rows are computed BY
    CONSTRUCTION from the resolution rules, one Spark job compares
    exactly. Catches regex breakage the fixed fixtures can't."""
    import random

    rnd = random.Random(42)
    noise_chars = "abc XYZ 0189 .,;:!?()-_ äöü λ 汉字 "

    def noise():
        return "".join(rnd.choice(noise_chars) for _ in range(rnd.randrange(12)))

    rows, expected = [], set()
    for i in range(300):
        src_host = f"s{i % 17}.example"
        url = f"https://{src_host}/p/{i}"
        parts = [noise()]
        for j in range(rnd.randrange(4)):
            q = rnd.choice(['"', "'"])
            sp = rnd.choice(["", " ", "  "])
            attr = rnd.choice(["", 'class="x" ', "data-k=v "])
            host = f"wWw.T{rnd.randrange(40)}.ORG"
            kind = rnd.choice(
                ["https", "HTTPS", "http", "proto", "rel", "mailto",
                 "js", "frag", "absfrag"]
            )
            if kind in ("https", "HTTPS", "http"):
                href = f"{kind}://{host}/p{j}"
                exp = (url, src_host, href, host.lower())
            elif kind == "absfrag":
                href = f"https://{host}/p{j}#sec{j}"
                # the capture stops at '#': href comes back truncated
                exp = (url, src_host, f"https://{host}/p{j}", host.lower())
            elif kind == "proto":
                href = f"//{host}/lib.js"
                exp = (url, src_host, href, host.lower())
            elif kind == "rel":
                href = f"/rel/{i}/{j}"
                exp = (url, src_host, href, src_host)
            elif kind == "mailto":
                href = f"mailto:a{j}@b.c"
                exp = None
            elif kind == "js":
                href = "javascript:void(0)"
                exp = None
            else:  # frag-only: no capturable char before '#'
                href = f"#sec{j}"
                exp = None
            parts.append(f"<a {attr}href{sp}={sp}{q}{href}{q}>t{j}</a>")
            parts.append(noise())
            if exp is not None:
                expected.add(exp)
        rows.append((url, "".join(parts).encode("utf-8")))

    from eventanalysis_spark.operators.linkgraph import extract_links

    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r["url"], r["src_host"], r["href"], r["dst_host"])
        for r in extract_links(df).collect()
    }
    assert got == expected


class TestHostEdges:
    def test_weights_and_self_edge_drop(self, spark):
        links = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")],
            "src_host string, dst_host string",
        )
        got = {
            (r["src"], r["dst"]): r["w"] for r in host_edges(links).collect()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 1}
        with_self = host_edges(links, keep_self=True)
        assert {
            (r["src"], r["dst"]): r["w"] for r in with_self.collect()
        } == {("a", "b"): 2, ("a", "a"): 1, ("b", "a"): 1}


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w long")


class TestHostPagerank:
    def test_two_node_analytic_fixed_point(self, spark):
        # a ⇄ b: symmetric, no dangling → rank stays exactly 1.0 forever
        e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
        got = {r["host"]: r["rank"] for r in host_pagerank(e, 5).collect()}
        assert got == {"a": 1.0, "b": 1.0}

    def test_dangling_mass_redistributes(self, spark):
        # a → b, b has no out-edges: b is dangling. One iteration:
        #   dshare = 1.0/2; r(a) = .15 + .85*(0 + .5) = .575
        #   r(b)   = .15 + .85*(1 + .5) = 1.425
        e = _edges(spark, [("a", "b", 1)])
        got = {r["host"]: r["rank"] for r in host_pagerank(e, 1).collect()}
        assert got["a"] == pytest.approx(0.575, abs=1e-9)
        assert got["b"] == pytest.approx(1.425, abs=1e-9)

    def test_mass_conservation_with_dangling(self, spark):
        # Uniform dangling redistribution conserves total mass: Σrank = N
        # after every iteration (modulo the 1e-9 per-node rounding).
        e = _edges(
            spark,
            [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "sink", 3)],
        )
        total = (
            host_pagerank(e, 4)
            .agg(F.sum("rank").alias("s"))
            .collect()[0]["s"]
        )
        assert total == pytest.approx(4.0, abs=1e-6)

    def test_star_center_wins(self, spark):
        e = _edges(
            spark, [("l1", "hub", 1), ("l2", "hub", 1), ("l3", "hub", 1)]
        )
        rows = host_pagerank(e, 3).collect()
        ranks = {r["host"]: r["rank"] for r in rows}
        assert ranks["hub"] == max(ranks.values())
        assert ranks["l1"] == ranks["l2"] == ranks["l3"]

    def test_zero_iterations_and_negative(self, spark):
        e = _edges(spark, [("a", "b", 1)])
        got = {r["host"]: r["rank"] for r in host_pagerank(e, 0).collect()}
        assert got == {"a": 1.0, "b": 1.0}
        with pytest.raises(ValueError):
            host_pagerank(e, -1)

    def test_weighted_edges_split_mass_proportionally(self, spark):
        # a sends 3/4 of its mass to b, 1/4 to c (w=3 vs w=1); one
        # iteration from rank 1, no dangling (b,c link back to a).
        e = _edges(
            spark,
            [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        )
        got = {r["host"]: r["rank"] for r in host_pagerank(e, 1).collect()}
        assert got["b"] == pytest.approx(0.15 + 0.85 * 0.75, abs=1e-9)
        assert got["c"] == pytest.approx(0.15 + 0.85 * 0.25, abs=1e-9)
        assert got["a"] == pytest.approx(0.15 + 0.85 * 2.0, abs=1e-9)


class TestHostTrustrank:
    def test_unreached_hosts_score_zero(self, spark):
        # seed → a → b, plus an island c→d no seed can reach: the island
        # must score EXACTLY 0 (trust only flows out of seeds).
        e = _edges(
            spark,
            [("seed", "a", 1), ("a", "b", 1), ("c", "d", 1)],
        )
        got = {
            r["host"]: r["rank"]
            for r in host_trustrank(e, _seeds(spark, ["seed"]), 4).collect()
        }
        assert got["c"] == 0.0 and got["d"] == 0.0
        assert got["seed"] > 0 and got["a"] > 0 and got["b"] > 0

    def test_mass_is_one(self, spark):
        e = _edges(
            spark,
            [("s1", "a", 2), ("a", "b", 1), ("b", "s1", 1), ("a", "sink", 1)],
        )
        total = (
            host_trustrank(e, _seeds(spark, ["s1", "a"]), 5)
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
        )
        assert total == pytest.approx(1.0, abs=1e-6)

    def test_one_iteration_analytic(self, spark):
        # seed → x, x dangling. t(seed)=1, r0=(1,0).
        #   dangling_0 = r0(x) = 0
        #   r1(seed) = .15*1 + .85*(0 + 0*1) = .15
        #   r1(x)    = .15*0 + .85*(1*1)     = .85
        e = _edges(spark, [("seed", "x", 1)])
        got = {
            r["host"]: r["rank"]
            for r in host_trustrank(e, _seeds(spark, ["seed"]), 1).collect()
        }
        assert got["seed"] == pytest.approx(0.15, abs=1e-9)
        assert got["x"] == pytest.approx(0.85, abs=1e-9)

    def test_seeds_not_in_graph_ignored(self, spark):
        e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
        got = {
            r["host"]: r["rank"]
            for r in host_trustrank(
                e, _seeds(spark, ["a", "ghost.example"]), 3
            ).collect()
        }
        assert set(got) == {"a", "b"}
        assert got["a"] > 0 and got["b"] > 0
        # total mass 1 proves t(a)=1: had the absent ghost counted in
        # |seeds|, t(a) would be 0.5 and total mass would stay at 0.5
        assert got["a"] + got["b"] == pytest.approx(1.0, abs=1e-6)


class TestHostHits:
    def test_star_fixed_point(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        # l1,l2,l3 → hub: hub is the only authority (score 1), the
        # leaves are the only hubs (score 1). Sup-norm makes this the
        # exact fixed point from iteration 1 onward.
        e = _edges(
            spark, [("l1", "hub", 1), ("l2", "hub", 1), ("l3", "hub", 1)]
        )
        got = {
            r["host"]: (r["authority"], r["hub"])
            for r in host_hits(e, iterations=3).collect()
        }
        assert got["hub"] == (1.0, 0.0)
        assert got["l1"] == got["l2"] == got["l3"] == (0.0, 1.0)

    def test_symmetric_pair_all_ones(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
        got = {
            r["host"]: (r["authority"], r["hub"])
            for r in host_hits(e, iterations=4).collect()
        }
        assert got == {"a": (1.0, 1.0), "b": (1.0, 1.0)}

    def test_weighted_one_iteration_analytic(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        # a →(w=3) b, a →(w=1) c. Authority raw: b=3, c=1 → sup-norm
        # b=1, c=1/3 (9-dp floor-round). Hub raw: a = 1·3 + (1/3)·1 →
        # a=1 after norm; b,c have no out-links → hub 0.
        e = _edges(spark, [("a", "b", 3), ("a", "c", 1)])
        got = {
            r["host"]: (r["authority"], r["hub"])
            for r in host_hits(e, iterations=1).collect()
        }
        assert got["b"][0] == 1.0
        assert got["c"][0] == pytest.approx(1 / 3, abs=1e-9)
        assert got["a"] == (0.0, 1.0)
        assert got["b"][1] == got["c"][1] == 0.0

    def test_directory_vs_content_split(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        # Two directory hosts each link to the same three content
        # hosts; content hosts also link lightly to each other. HITS
        # must rank the directories as the top hubs and the content
        # hosts as the top authorities — the signal PageRank conflates.
        e = _edges(
            spark,
            [(d, c, 2) for d in ("dir1", "dir2") for c in ("c1", "c2", "c3")]
            + [("c1", "c2", 1), ("c2", "c3", 1)],
        )
        rows = host_hits(e, iterations=5).collect()
        auth = {r["host"]: r["authority"] for r in rows}
        hub = {r["host"]: r["hub"] for r in rows}
        assert hub["dir1"] == hub["dir2"] == max(hub.values())
        assert max(auth["c1"], auth["c2"], auth["c3"]) == max(auth.values())
        assert auth["dir1"] == auth["dir2"] == 0.0  # nobody links to dirs

    def test_partition_invariance_and_persist_pin(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        e = _edges(
            spark,
            [("a", "b", 3), ("b", "c", 2), ("c", "a", 1), ("a", "c", 5)],
        )
        base = {
            (r["host"], r["authority"], r["hub"])
            for r in host_hits(e, iterations=4).collect()
        }
        again = {
            (r["host"], r["authority"], r["hub"])
            for r in host_hits(
                e.repartition(7), iterations=4, pin="persist"
            ).collect()
        }
        assert base == again

    def test_bad_iterations(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_hits

        with pytest.raises(ValueError):
            host_hits(_edges(spark, [("a", "b", 1)]), iterations=0)


class TestCommunities:
    def test_two_clusters_with_weak_bridge(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_communities

        # two triangles (w=5 internal) joined by one w=1 bridge: LPA must
        # put each triangle in its own community
        tri1 = [("a", "b", 5), ("b", "c", 5), ("c", "a", 5)]
        tri2 = [("x", "y", 5), ("y", "z", 5), ("z", "x", 5)]
        e = _edges(spark, tri1 + tri2 + [("c", "x", 1)])
        got = {r["host"]: r["community"] for r in
               host_communities(e, iterations=4).collect()}
        assert got["a"] == got["b"] == got["c"]
        assert got["x"] == got["y"] == got["z"]
        assert got["a"] != got["x"]

    def test_tie_breaks_to_smallest_label(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_communities

        # p ⇄ q, equal weight: after round 1 each adopts the OTHER's
        # label... except the tie rule has only one neighbor each, so
        # p→q's label 'q'? No: p's single neighbor is q (label 'q'),
        # so p adopts 'q' and q adopts 'p'; round 2 swaps back. With a
        # third node anchored to both, the smallest label must win ties.
        e = _edges(spark, [("p", "m", 1), ("q", "m", 1), ("p", "q", 1)])
        got = {r["host"]: r["community"] for r in
               host_communities(e, iterations=4).collect()}
        # all three end in one community (fully connected-ish); the
        # invariant under test: deterministic output regardless of
        # partitioning — rerun must match exactly
        again = {r["host"]: r["community"] for r in
                 host_communities(e.repartition(7), iterations=4).collect()}
        assert got == again

    def test_zero_iterations_identity(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_communities

        e = _edges(spark, [("a", "b", 1)])
        got = {r["host"]: r["community"] for r in
               host_communities(e, iterations=0).collect()}
        assert got == {"a": "a", "b": "b"}


class TestCocitation:
    def test_shared_inlinkers_and_jaccard(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_cocitation

        # linkers l1,l2 both cite {a,b}; l3 cites {a,c}
        e = _edges(
            spark,
            [
                ("l1", "a", 1), ("l1", "b", 1),
                ("l2", "a", 3), ("l2", "b", 1),
                ("l3", "a", 1), ("l3", "c", 1),
            ],
        )
        got = {
            (r["host_a"], r["host_b"]): (r["n_common"], r["jaccard"])
            for r in host_cocitation(e, min_common=1).collect()
        }
        # a: in-linkers {l1,l2,l3}; b: {l1,l2}; c: {l3}
        assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
        assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
        assert ("b", "c") not in got  # no shared linker
        # min_common=2 keeps only the (a, b) pair
        only = host_cocitation(e, min_common=2).collect()
        assert [(r["host_a"], r["host_b"]) for r in only] == [("a", "b")]

    def test_mega_hub_dropped_by_fanout_cap(self, spark):
        from eventanalysis_spark.operators.linkgraph import host_cocitation

        hub = [("hub", f"t{i}", 1) for i in range(10)]  # fanout 10
        real = [("l1", "t0", 1), ("l1", "t1", 1), ("l2", "t0", 1), ("l2", "t1", 1)]
        e = _edges(spark, hub + real)
        got = host_cocitation(e, max_fanout=5, min_common=1).collect()
        # only the l1/l2 co-citations survive; the hub's 45 pairs are gone
        assert {(r["host_a"], r["host_b"]) for r in got} == {("t0", "t1")}
        r = got[0]
        # jaccard over CAPPED postings: in-linkers t0={l1,l2}, t1={l1,l2}
        assert (r["n_common"], r["jaccard"]) == (2, 1.0)


class TestDegreeStats:
    def test_degrees_and_reciprocity(self, spark):
        e = _edges(
            spark,
            [("a", "b", 5), ("b", "a", 1), ("a", "c", 2), ("d", "a", 1)],
        )
        got = {r["host"]: r.asDict() for r in host_degree_stats(e).collect()}
        assert set(got) == {"a", "b", "c", "d"}
        a = got["a"]
        assert (a["out_deg"], a["in_deg"], a["out_links"], a["in_links"]) == (
            2, 2, 7, 2,
        )
        assert a["reciprocity"] == 0.5  # of {b, c}, only b links back
        assert got["b"]["reciprocity"] == 1.0
        # c: pure sink → sentinel; d: out-only, no reciprocation
        assert got["c"]["out_deg"] == 0 and got["c"]["reciprocity"] == -1.0
        assert got["d"]["reciprocity"] == 0.0


class TestAnchors:
    def test_extract_anchor_text(self, spark):
        from eventanalysis_spark.operators.linkgraph import extract_anchors

        html = (
            "<html><body>"
            '<a class="x" href="HTTPS://Shop.example/p">Buy Cheap</a>'
            "<a href='/rel/path'>home nav</a>"
            '<a href="//cdn.example/x.js">cdn script</a>'
            '<a href="mailto:a@b.c">contact</a>'
            '<a href="#frag">skip</a>'
            "</body></html>"
        )
        rows = extract_anchors(
            _pages(spark, [("https://me.example/a", html)])
        ).collect()
        got = {(r.dst_host, r.anchor) for r in rows}
        assert got == {
            ("shop.example", "Buy Cheap"),
            ("me.example", "home nav"),
            ("cdn.example", "cdn script"),
        }
        # src_host rides along for the self-link filter downstream
        assert {r.src_host for r in rows} == {"me.example"}

    def test_term_profile_topk_and_selflink_filter(self, spark):
        from eventanalysis_spark.operators.linkgraph import (
            anchor_term_profile,
            extract_anchors,
        )

        def page(i):
            return (
                f"https://src{i}.example/p",
                (
                    f'<a href="https://hub.example/x">great hub site</a>'
                    f'<a href="https://hub.example/y">great  Site</a>'
                    f'<a href="/self">me me me</a>'
                ),
            )

        anchors = extract_anchors(_pages(spark, [page(1), page(2)]))
        prof = anchor_term_profile(anchors, k=2).collect()
        by_host = {}
        for r in prof:
            by_host.setdefault(r.host, []).append((r.rank, r.term, r.n))
        # self-links (me me me -> srcN) are excluded entirely
        assert set(by_host) == {"hub.example"}
        # counts: great=4, site=4 (case-folded), hub=2; k=2 keeps the
        # two count-4 terms, tie broken term-asc
        assert sorted(by_host["hub.example"]) == [
            (1, "great", 4),
            (2, "site", 4),
        ]

    def test_term_profile_min_count(self, spark):
        from eventanalysis_spark.operators.linkgraph import (
            anchor_term_profile,
        )

        anchors = spark.createDataFrame(
            [("a.example", "b.example", "rare seen seen")],
            "src_host string, dst_host string, anchor string",
        )
        prof = anchor_term_profile(anchors, k=5, min_count=2).collect()
        assert [(r.term, r.n) for r in prof] == [("seen", 2)]


def test_host_crawl_depth_bfs(spark):
    from eventanalysis_spark.operators.linkgraph import host_crawl_depth

    # seed -> a -> b -> c chain; d isolated; x links INTO seed only
    edges = spark.createDataFrame(
        [("seed.example", "a.example", 1), ("a.example", "b.example", 1),
         ("b.example", "c.example", 1), ("x.example", "seed.example", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("Seed.Example",)], "host string")
    got = {r["host"]: r["depth"]
           for r in host_crawl_depth(edges, seeds, max_depth=6).collect()}
    # direction matters: x links in but is never reached
    assert got == {"seed.example": 0, "a.example": 1,
                   "b.example": 2, "c.example": 3}
    # depth cap truncates the frontier
    got2 = {r["host"]: r["depth"]
            for r in host_crawl_depth(edges, seeds, max_depth=1).collect()}
    assert got2 == {"seed.example": 0, "a.example": 1}
    # graph-absent seed still reports depth 0
    lone = spark.createDataFrame([("nowhere.example",)], "host string")
    got3 = {r["host"]: r["depth"]
            for r in host_crawl_depth(edges, lone).collect()}
    assert got3 == {"nowhere.example": 0}


def test_host_crawl_depth_shortest_path_and_persist_pin(spark):
    from eventanalysis_spark.operators.linkgraph import host_crawl_depth

    # two routes to t: seed->t (1 hop) and seed->m->t (2 hops): BFS
    # must record the SHORTEST depth
    edges = spark.createDataFrame(
        [("s", "t", 1), ("s", "m", 1), ("m", "t", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    for pin in ("local", "persist"):
        got = {r["host"]: r["depth"]
               for r in host_crawl_depth(edges, seeds, pin=pin).collect()}
        assert got == {"s": 0, "t": 1, "m": 1}
