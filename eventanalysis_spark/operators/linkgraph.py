"""Hyperlink graph analytics — href extraction, host graph, PageRank.

The web-crawl counterpart of textrank.py's word graph: extract anchor
links from the raw html payload (JVM regexp, zero Python), collapse them
to a weighted host→host edge list, and score hosts by PageRank (Page,
Brin, Motwani & Winograd 1999, "The PageRank Citation Ranking") — the
classic crawl-prioritization / source-quality signal every web-scale
training-data pipeline computes (host authority feeds both crawl
frontiers and quality-weighted mixture sampling).

Differences from textrank.textrank, which this deliberately does NOT
reuse: a real link graph is DIRECTED and has DANGLING nodes (hosts that
are linked to but have no outgoing links, or whose pages we never
crawled). textrank's symmetric word graph guarantees every node has
out-edges, so it can skip dangling handling entirely; here dangling mass
is redistributed uniformly each iteration (the standard random-surfer
fix):

    r_{i+1}(v) = (1 - d) + d * (Σ_{u→v} r_i(u) · w(u,v)/out(u)
                                + dangling_i / N)
    dangling_i = Σ_{u: out(u)=0} r_i(u)

Scale notes (10^12-page crawl → ~10^8 hosts):
  - The edge list is built by ONE hash aggregate at (src_host, dst_host)
    grain — Zipf-bounded far below the page count — and pinned with a
    lazy localCheckpoint so the unrolled iteration plan reuses it instead
    of re-running extraction per iteration (the canonical "cache the
    links" Spark PageRank move).
  - Each iteration is one shuffle: join ranks⋈edges on src (AQE
    broadcasts the rank vector while it fits, shuffles when it does
    not), one partial-aggregatable sum by dst. The dangling term is a
    1-row aggregate crossJoin-broadcast — never a collect.
  - Hub skew (everyone links to the same CDN host) lands on the SUM
    side, which partial-aggregates map-side; the divide-by-out-strength
    is pre-applied per edge so hub out-mass spreads in one map pass.
  - Per-iteration ranks are floor-rounded at ROUND_DP decimals — the
    same policy that makes kmeans.kmeans_fit exactly SQL-replicable:
    double-sum partition-order noise (last-ULP) is absorbed by the
    rounding, so a fixed iteration count is a deterministic,
    cross-engine-exact recurrence.

The reference engine has no comparable operator; this extends the
web-scale analysis surface the brief makes first-class (its closest
analog is the provider/task classification maps the reference joins
against — here the "dimension" is learned from the data itself).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.plans.pin import Pinner

# href="..." with an optional single/double quote, capturing the target.
# Deliberately tolerant: attribute order varies, but ALL extraction stays
# in one JVM regexp_extract_all pass over the decoded payload.
_HREF_RE = r'<a\s[^>]*href\s*=\s*["\']([^"\'#]+)'
_ABS_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_SRC_HOST_RE = r"^[a-z]+://([^/?#]+)"

# Per-iteration rank rounding (see module docstring). 9 dp keeps ~3
# guard digits above the 6-dp reporting grain.
ROUND_DP = 9


def _floor_round(c, dp: int):
    # HALF_UP at dp decimals, identical in Spark and DuckDB (NOTES.md
    # rounding rule: never ROUND() a rational-valued double cross-engine).
    scale = F.lit(float(10**dp))
    return F.floor(c * scale + F.lit(0.5)) / scale


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) → exploded (url, src_host, href, dst_host) link rows.

    Zero-Python path: decode + regexp_extract_all + explode. Absolute
    http(s)/protocol-relative hrefs resolve to their own host; relative
    hrefs (path-only) resolve to the source host; mailto:/javascript:/
    data: and fragment-only targets are dropped. Host comparison is
    case-insensitive (lowered both sides)."""
    doc = F.decode(F.col(html_col), "utf-8")
    src_host = F.lower(F.regexp_extract(F.col(url_col), _SRC_HOST_RE, 1))
    links = pages.select(
        F.col(url_col).alias("url"),
        src_host.alias("src_host"),
        F.explode(F.regexp_extract_all(doc, F.lit(_HREF_RE), F.lit(1))).alias(
            "href"
        ),
    )
    dst = _resolve_dst(F.col("href"), F.col("src_host"))
    return links.withColumn("dst_host", dst).where(
        F.col("dst_host").isNotNull() & (F.col("dst_host") != "")
    )


def host_edges(
    links: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    keep_self: bool = False,
) -> DataFrame:
    """Link rows → weighted host edge list (src, dst, w). One hash
    aggregate at the (src, dst) grain; self-edges (intra-host nav links)
    are dropped by default — they only recycle rank mass."""
    e = links.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not keep_self:
        e = e.where(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def host_pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    round_dp: int = ROUND_DP,
    pin: str = "local",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Directed weighted PageRank with uniform dangling-mass
    redistribution over an (src, dst, w) edge list; fixed iteration
    count, rank_0 = 1.0 for every node. Returns (host, rank), rank
    floor-rounded at `round_dp` (the recurrence's own grain; callers
    re-round for reporting).

    `pin` picks the materialization strategy for the per-iteration rank
    vector AND the loop-invariant frames (plans/pin.py): 'local'
    (default) = localCheckpoint, fastest but not executor-loss-safe;
    'persist' = MEMORY_AND_DISK with recomputable lineage; 'checkpoint'
    = reliable checkpoint every `checkpoint_every` iterations (requires
    setCheckpointDir) so a 100-iteration run on a real cluster survives
    losing an executor."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    pinner = Pinner(pin, checkpoint_every)
    # Pin the edge list FIRST: the node/dangling union (2 refs), outw
    # and ef each re-derive from `edges`, so an unpinned edge list
    # re-executes whatever built it (typically a corpus-scale
    # extract+aggregate) 4x per action. The (src, dst, w) grain is
    # host-pair-sized — tiny next to one corpus pass.
    edges = pinner(edges)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ef = pinner(
        edges.join(outw, "src")
        .select(
            "src", "dst", (F.col("w").cast("double") / F.col("ow")).alias("frac")
        )
    )
    # node set (src ∪ dst) + dangling flag in ONE union-aggregate:
    # has_out = "appears as a src" = max over the flagged union — the
    # same rows as the former distinct-nodes ⋈ outw LEFT JOIN, minus
    # one pin and one join. Pinned: it re-enters the plan every
    # iteration as the (1-d) floor left side AND the dangling filter.
    node_out = pinner(
        edges.select(F.col("src").alias("host"), F.lit(True).alias("has_out"))
        .unionByName(
            edges.select(F.col("dst").alias("host"), F.lit(False).alias("has_out"))
        )
        .groupBy("host")
        .agg(F.max("has_out").alias("has_out"))
    )

    n_nodes = F.lit(1.0) * F.count(F.lit(1))  # used inside the agg below
    ranks = node_out.select("host", "has_out").withColumn("rank", F.lit(1.0))
    base = F.lit(1.0 - damping)
    d = F.lit(damping)
    for it in range(iterations):
        # dangling_i / N as a 1-row frame, broadcast by the crossJoin
        dang = ranks.agg(
            (
                F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(F.lit(0.0)))
                / n_nodes
            ).alias("dshare")
        )
        contrib = (
            ef.join(ranks.select(F.col("host").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("s"))
        )
        ranks = (
            node_out.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                "has_out",
                _floor_round(
                    base
                    + d * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dshare")),
                    round_dp,
                ).alias("rank"),
            )
        )
        # Pin each iteration's rank vector: it is referenced TWICE by the
        # next iteration (dangling aggregate + contribution join), so an
        # unpinned loop doubles the plan per iteration (2^k subtree
        # copies, each re-executed). One node-sized materialization per
        # iteration instead — the standard Spark PageRank
        # persist-per-iteration. The FINAL iteration is never
        # re-referenced, so it stays unpinned (and plan-auditable).
        if it < iterations - 1:
            ranks = pinner(ranks)
    return ranks.select("host", "rank")


def host_trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    round_dp: int = ROUND_DP,
    pin: str = "local",
    checkpoint_every: int = 4,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004, "Combating Web
    Spam with TrustRank"): PageRank personalized to a trusted seed set —
    teleport (and dangling) mass flows ONLY to seeds, so trust decays
    with link distance from them; spam farms that inflate plain PageRank
    by linking to each other get ~0 unless a trusted host links in.

        t(v)     = 1/|seeds ∩ nodes| for seeds, else 0
        r_0      = t
        r_{i+1}(v) = (1-d)·t(v) + d·(Σ_{u→v} r_i(u)·w(u,v)/out(u)
                                     + dangling_i·t(v))

    Total mass is exactly 1 every iteration (modulo the per-iteration
    floor-round — same recurrence-pinning policy as host_pagerank).
    `seeds` is a 1-column (host) frame; seeds not present in the graph
    are ignored. Same per-iteration shape and scale notes as
    host_pagerank; the teleport column rides the pinned node list, so
    the seed set is joined ONCE, not per iteration. `pin` /
    `checkpoint_every`: same fault-tolerance knob as host_pagerank."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    pinner = Pinner(pin, checkpoint_every)
    # pin the edge list first — same 4-consumer re-execution argument as
    # host_pagerank (nodes x2, outw, ef)
    edges = pinner(edges)
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    seed_hosts = seeds.select(F.col(seeds.columns[0]).alias("host")).distinct()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ef = pinner(
        edges.join(outw, "src")
        .select(
            "src", "dst", (F.col("w").cast("double") / F.col("ow")).alias("frac")
        )
    )
    # node list with teleport share + out-edge flag, pinned once:
    # t = 1/|seeds∩nodes| via a 1-row count crossJoin-broadcast
    marked = (
        nodes.join(
            F.broadcast(seed_hosts.withColumn("__seed", F.lit(True))),
            "host",
            "left",
        )
        .join(outw.withColumnRenamed("src", "host"), "host", "left")
        .select(
            "host",
            F.coalesce("__seed", F.lit(False)).alias("is_seed"),
            F.col("ow").isNotNull().alias("has_out"),
        )
    )
    n_seed = marked.where("is_seed").agg(
        F.count(F.lit(1)).cast("double").alias("ns")
    )
    node_t = (
        marked.crossJoin(F.broadcast(n_seed))
        .select(
            "host",
            "has_out",
            F.when(F.col("is_seed"), F.lit(1.0) / F.col("ns"))
            .otherwise(F.lit(0.0))
            .alias("t"),
        )
    )
    node_t = pinner(node_t)
    ranks = node_t.withColumn("rank", F.col("t"))
    base, d = F.lit(1.0 - damping), F.lit(damping)
    for it in range(iterations):
        dang = ranks.agg(
            F.sum(
                F.when(~F.col("has_out"), F.col("rank")).otherwise(F.lit(0.0))
            ).alias("dmass")
        )
        contrib = (
            ef.join(ranks.select(F.col("host").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("s"))
        )
        ranks = (
            node_t.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                "has_out",
                "t",
                _floor_round(
                    base * F.col("t")
                    + d
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dmass") * F.col("t")
                    ),
                    round_dp,
                ).alias("rank"),
            )
        )
        if it < iterations - 1:  # same two-consumer pinning as host_pagerank
            ranks = pinner(ranks)
    return ranks.select("host", "rank")


def host_hits(
    edges: DataFrame,
    iterations: int = 5,
    round_dp: int = ROUND_DP,
    pin: str = "local",
    checkpoint_every: int = 4,
) -> DataFrame:
    """HITS (Kleinberg 1999, "Authoritative sources in a hyperlinked
    environment"): mutual-reinforcement hub/authority scores over the
    directed weighted host graph — the complementary signal to
    host_pagerank (an authority is linked BY good hubs; a hub links TO
    good authorities; PageRank conflates the two). Used to tell
    directory/aggregator hosts (high hub) from content hosts (high
    authority) when planning crawl frontiers and source mixtures.

        a_{i+1}(v) ∝ Σ_{u→v} h_i(u)·w(u,v)
        h_{i+1}(u) ∝ Σ_{u→v} a_{i+1}(v)·w(u,v)
        h_0 = 1 for every node

    Normalization: each half-step divides by the step's max (sup-norm
    — a 1-row aggregate crossJoin-broadcast, never a collect) and
    floor-rounds at `round_dp`, the same policy that makes
    host_pagerank's recurrence cross-engine exact: the max node is
    exactly 1.0 each step, so magnitudes cannot grow and the fixed
    iteration count is a deterministic recurrence. (Classic HITS uses
    the 2-norm; any norm yields the same ranking — sup-norm avoids a
    partition-order-dependent sum-of-squares.)

    Returns (host, authority, hub) at `round_dp`. Hosts nobody links to
    have authority 0; pure sinks have hub 0.

    Scale shape — identical to host_pagerank: the edge list is pinned
    once; each half-step is one rank⋈edges join (AQE broadcasts the
    node-sized vector while it fits) + one partial-aggregatable sum, so
    CDN-style in-link skew combines map-side. Both per-iteration
    vectors have two consumers (the max aggregate and the next
    half-step), hence the same per-iteration `pin=` materialization
    policy (plans/pin.py)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    pinner = Pinner(pin, checkpoint_every)
    ef = pinner(edges.select("src", "dst", F.col("w").cast("double").alias("w")))
    nodes = pinner(
        ef.select(F.col("src").alias("host"))
        .unionByName(ef.select(F.col("dst").alias("host")))
        .distinct()
    )
    hubs = nodes.withColumn("hub", F.lit(1.0))

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # raw: (host, s) partial sums over one half-step; missing hosts
        # score 0. Divide by max BEFORE rounding — sup-norm keeps the
        # recurrence in [0, 1] so floor_round's grain is uniform.
        mx = raw.agg(F.max("s").alias("mx"))
        return (
            nodes.join(raw, "host", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "host",
                _floor_round(
                    F.coalesce(F.col("s"), F.lit(0.0)) / F.col("mx"), round_dp
                ).alias(col),
            )
        )

    auth = None
    for it in range(iterations):
        auth = _normalize(
            ef.join(hubs.select(F.col("host").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("hub") * F.col("w")).alias("s")),
            "authority",
        )
        # auth is consumed by the hub half-step's max agg + join, AND by
        # the final output — pin every iteration.
        auth = pinner(auth)
        hubs = _normalize(
            ef.join(auth.select(F.col("host").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("host"))
            .agg(F.sum(F.col("authority") * F.col("w")).alias("s")),
            "hub",
        )
        if it < iterations - 1:  # two consumers next round (max + join)
            hubs = pinner(hubs)
    return (
        nodes.join(auth, "host", "left")
        .join(hubs, "host", "left")
        .select(
            "host",
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )


def host_communities(
    edges: DataFrame,
    iterations: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007): every host starts as its own community, and
    each round adopts the label with the largest WEIGHTED support among
    its (undirected) neighbors — ties to the lexicographically smallest
    label, so the whole recurrence is deterministic and, being pure
    integer/string arithmetic, cross-engine exact with NO rounding
    policy at all. Fixed iteration count (synchronous LPA may oscillate;
    determinism is the contract, convergence is the caller's budget).

    The topical-domain clustering counterpart of host_pagerank's
    centrality: groups hosts for mixture planning / crawl partitioning.

    Per iteration: one join of the label vector against the pinned
    symmetrized edge list + two hash aggregates (label support, then a
    struct-min argmax: min(struct(-support, label)) = max support, then
    min label). The label vector is referenced ONCE per iteration, so —
    unlike the pagerank loop — no per-iteration pinning is needed."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    # pin the edge list first: the symmetric union references it twice,
    # re-running whatever built it (e.g. corpus-scale href extraction)
    edges = edges.localCheckpoint(eager=False)
    both = edges.select("src", "dst", "w").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    sym = (
        both.groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("src").alias("host")).distinct().withColumn(
        "label", F.col("host")
    )
    for _ in range(iterations):
        support = (
            sym.join(
                labels.select(F.col("host").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("host"), "label")
            .agg(F.sum("w").alias("s"))
        )
        labels = support.groupBy("host").agg(
            F.min(
                F.struct((-F.col("s")).alias("ns"), F.col("label").alias("lab"))
            )["lab"].alias("label")
        )
    return labels.select("host", F.col("label").alias("community"))


def host_cocitation(
    edges: DataFrame,
    max_fanout: int = 256,
    min_common: int = 2,
) -> DataFrame:
    """Co-citation similarity (Small 1973): two hosts are related when
    the same third hosts link to BOTH — the related-domain signal used
    for crawl seed expansion and domain clustering. Returns
    (host_a, host_b, n_common, jaccard) for unordered pairs with at
    least `min_common` shared in-linkers; jaccard = |A∩B|/|A∪B| over
    the (capped) in-linker sets, floor-rounded 6 dp.

    Scale shape — the LSH mega-bucket lesson applied to graphs:
      - The pair generator is a self-join of the DISTINCT (linker, host)
        posting list on linker. A directory hub linking to 10⁵ hosts
        would alone emit ~10¹⁰/2 pairs, so linkers with out-degree >
        `max_fanout` are dropped ENTIRELY first (standard co-citation
        practice: a page that cites everything relates nothing). After
        the cap, each linker emits ≤ max_fanout²/2 pairs — the join is
        bounded per key, and the (a, b) aggregate partial-combines
        map-side.
      - In-degrees for the Jaccard denominator are counted over the SAME
        capped postings, so the ratio is internally consistent.
    """
    posts = edges.select(
        F.col("src").alias("linker"), F.col("dst").alias("host")
    ).distinct()
    fan = posts.groupBy("linker").agg(F.count(F.lit(1)).alias("fanout"))
    capped = (
        posts.join(
            fan.where(F.col("fanout") <= max_fanout).select("linker"),
            "linker",
            "left_semi",
        )
        # pinned: three consumers (two pair-join sides + in-degree counts)
        .localCheckpoint(eager=False)
    )
    indeg = capped.groupBy("host").agg(F.count(F.lit(1)).alias("ind"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.linker") == F.col("b.linker"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    return (
        pairs.join(indeg.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("ind", "ind_a")
        .join(indeg.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("ind", "ind_b")
        .select(
            "host_a",
            "host_b",
            "n_common",
            _floor_round(
                F.col("n_common").cast("double")
                / (F.col("ind_a") + F.col("ind_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def host_degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host link-graph degrees: out_deg/in_deg (distinct neighbor
    hosts), out_links/in_links (weighted), and reciprocity — the
    fraction of a host's out-neighbors that link back (floor-rounded
    6 dp; -1.0 sentinel for hosts with no out-edges, per the NOTES
    nullable-double rule). Two hash aggregates + one full outer join;
    the reciprocal-pair probe is a self-join of the DISTINCT host-pair
    edge list against its transpose — edge-list-sized, never row-sized."""
    # Pin the edge list first: three consumers below (out agg, in agg,
    # pair probe) would otherwise each inline and re-run whatever built
    # it (e.g. the full href extraction over the page payloads).
    edges = edges.localCheckpoint(eager=False)
    pairs = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    recip = (
        pairs.alias("a")
        .join(
            pairs.select(
                F.col("src").alias("dst"), F.col("dst").alias("src")
            ).alias("b"),
            ["src", "dst"],
            "left_semi",
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    out = edges.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("w").alias("out_links")
    )
    inn = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("w").alias("in_links")
    )
    deg = out.join(inn, "host", "full_outer").join(
        recip.withColumnRenamed("src", "host"), "host", "left"
    )
    return deg.select(
        "host",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("out_links", F.lit(0)).alias("out_links"),
        F.coalesce("in_links", F.lit(0)).alias("in_links"),
        F.when(
            F.coalesce("out_deg", F.lit(0)) == 0, F.lit(-1.0)
        )
        .otherwise(
            _floor_round(
                F.coalesce("n_recip", F.lit(0)).cast("double")
                / F.col("out_deg"),
                6,
            )
        )
        .alias("reciprocity"),
    )


# ---- anchor text ------------------------------------------------------------

# Same href grammar as _HREF_RE plus the closing quote and the visible
# text up to the next tag. Group 1 = target, group 2 = anchor text.
_ANCHOR_RE = r'<a\s[^>]*href\s*=\s*["\']([^"\'#]+)["\'][^>]*>([^<]*)</a>'


def _resolve_dst(href: Column, src_host: Column) -> Column:
    """href → destination host under extract_links' resolution rules:
    absolute http(s) → own host, protocol-relative → its host, relative
    path → source host, other schemes (mailto:, javascript:, data:) →
    NULL (caller drops)."""
    abs_host = F.lower(F.regexp_extract(href, _ABS_HOST_RE, 1))
    proto_rel_host = F.lower(F.regexp_extract(href, r"^//([^/?#]+)", 1))
    scheme = F.regexp_extract(href, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    return (
        F.when(href.startswith("//"), proto_rel_host)
        .when(F.lower(scheme).isin("http", "https"), abs_host)
        .when(scheme == "", src_host)
        .otherwise(F.lit(None))
    )


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, src_host, href, dst_host, anchor) — extract_links plus the
    VISIBLE anchor text, the classic off-page relevance/label signal
    (what the web calls the target page; feeds query-independent doc
    labeling and anchor-vs-title quality checks in a training-data
    pipeline).

    One decode + two regexp_extract_all passes over the payload (one
    per capture group — regexp_extract_all returns a single group), zip
    + explode; still zero Python and linear in payload bytes. Anchors
    whose href does not resolve to a host (mailto:, fragment-only) are
    dropped, matching extract_links."""
    doc = F.decode(F.col(html_col), "utf-8")
    zipped = F.arrays_zip(
        F.regexp_extract_all(doc, F.lit(_ANCHOR_RE), F.lit(1)),
        F.regexp_extract_all(doc, F.lit(_ANCHOR_RE), F.lit(2)),
    )
    rows = pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(F.col(url_col), _SRC_HOST_RE, 1)).alias(
            "src_host"
        ),
        F.explode(zipped).alias("__a"),
    ).select(
        "url",
        "src_host",
        F.col("__a.0").alias("href"),
        F.col("__a.1").alias("anchor"),
    )
    dst = _resolve_dst(F.col("href"), F.col("src_host"))
    return rows.withColumn("dst_host", dst).where(
        F.col("dst_host").isNotNull() & (F.col("dst_host") != "")
    )


def anchor_term_profile(
    anchors: DataFrame, k: int = 3, min_count: int = 1
) -> DataFrame:
    """Per-destination-host top-k anchor TERMS: (host, term, n, rank) —
    how the rest of the web describes each host. Rank is (count desc,
    term asc), ties deterministic.

    Scale shape: terms collapse to (host, term) counts in ONE
    map-side-partial hash aggregate before any window — the window
    sorts each host's DISTINCT term vocabulary (Zipf-bounded), never
    its raw in-link volume. Off-host anchors only: a site's self-links
    describe navigation, not reputation."""
    terms = (
        anchors.where(F.col("dst_host") != F.col("src_host"))
        .select(
            F.col("dst_host").alias("host"),
            F.explode(
                F.split(F.trim(F.lower(F.col("anchor"))), r"\s+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
    )
    counts = terms.groupBy("host", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    if min_count > 1:
        counts = counts.where(F.col("n") >= min_count)
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("host", "term", "n", "rank")
    )


def host_crawl_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    pin: str = "local",
    checkpoint_every: int = 4,
) -> DataFrame:
    """BFS crawl depth from seed hosts over the host graph: (host,
    depth) for every host reachable within `max_depth` hops — the input
    depth-capped crawling policies key on (how many link hops from the
    trusted seed list is this host?), and the quantitative companion to
    TrustRank (depth is the discrete "trust distance" its damping
    smooths).

    Semantics: seeds are depth 0 (lowercased, deduped; seeds absent
    from the graph still report 0 — a seed you plan to fetch is at
    distance 0 whether or not anyone links it). Unreached hosts are
    ABSENT from the output. Deterministic, ordered by (depth, host).

    Scale shape: classic frontier BFS — per round ONE join of the
    CURRENT frontier against the pinned edge list plus a left_anti
    against the visited set; the frontier is pinned per round (the 2^k
    plan-growth rule), with the `pin=` fault-tolerance ladder of the
    other iterative operators. Early-stops on an empty frontier, so the
    per-round driver count doubles as the convergence check. Visited
    grows monotonically; at web scale it is (host, depth) pairs —
    dimension-sized next to the page corpus."""
    from eventanalysis_spark.plans.pin import Pinner

    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    pinner = Pinner(pin, checkpoint_every)
    e = pinner(edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct())
    visited = pinner(
        seeds.select(F.lower(F.col("host")).alias("host"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("int"))
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = pinner(
            frontier.select(F.col("host").alias("src"))
            .join(e, "src")
            .select(F.col("dst").alias("host"))
            .distinct()
            .join(visited.select("host"), "host", "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
        )
        if nxt.count() == 0:
            break
        visited = pinner(visited.unionByName(nxt))
        pinner.rotate(keep=visited)
        frontier = nxt
    return visited.orderBy("depth", "host")
