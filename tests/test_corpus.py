"""Corpus-level analytics: operators/corpus.py vs pure-Python references."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.corpus import (
    corpus_report,
    source_overlap,
    source_shingles,
)

DOCS = [
    # source A and B share the shingle "x y z"; C is disjoint
    (1, "x y z w", "A", "en"),
    (2, "x y z q", "B", "en"),
    (3, "p q r s", "C", "de"),
    (4, "x y z w", "A", "en"),   # exact repeat inside A: distinct collapses
    (5, "ab", "A", None),        # shorter than k: contributes no shingles
]


def _ref_sets(k=3):
    sets: dict[str, set] = {}
    for _, text, src, _ in DOCS:
        toks = text.split()
        for i in range(len(toks) - k + 1):
            sets.setdefault(src, set()).add(" ".join(toks[i : i + k]))
    return sets


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string, lang string"
    )


def test_source_shingles_distinct(spark, docs):
    got = source_shingles(docs, k=3).groupBy("source").count().collect()
    sizes = {r.source: r["count"] for r in got}
    ref = {s: len(v) for s, v in _ref_sets().items()}
    assert sizes == ref  # doc 4's repeat collapsed; doc 5 absent


def test_source_overlap_jaccard(spark, docs):
    rows = source_overlap(docs, k=3).collect()
    ref = _ref_sets()
    got = {(r.source_a, r.source_b): r for r in rows}
    # only (A, B) intersects
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    inter = len(ref["A"] & ref["B"])
    union = len(ref["A"] | ref["B"])
    assert (r.n_a, r.n_b, r.n_common) == (len(ref["A"]), len(ref["B"]), inter)
    assert r.jaccard == pytest.approx(round(inter / union, 6))


def test_corpus_report(spark, docs):
    rows = {r.lang: r for r in corpus_report(docs).collect()}
    assert set(rows) == {"en", "de", "?", "ALL"}
    assert rows["en"].n_docs == 3
    assert rows["de"].n_docs == 1
    assert rows["?"].n_docs == 1  # real NULL lang is NOT the rollup total
    assert rows["ALL"].n_docs == 5
    assert rows["ALL"].n_tokens == sum(len(t.split()) for _, t, _, _ in DOCS)
    assert rows["en"].min_chars == len("x y z q")
    assert rows["ALL"].avg_tokens == pytest.approx(
        round(sum(len(t.split()) for _, t, _, _ in DOCS) / 5, 6)
    )


def test_no_python_in_plans(spark, docs):
    for df in (source_overlap(docs, k=3), corpus_report(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


# ---- inverted_index --------------------------------------------------

def test_inverted_index_hand_computed(spark, docs):
    from eventanalysis_spark.operators.corpus import inverted_index

    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs).collect()
    }
    # "x" appears in docs 1, 2, 4; "ab" only in doc 5
    assert got["x"] == (3, "1,2,4")
    assert got["ab"] == (1, "5")
    assert got["p"] == (1, "3")
    # within-doc repeats collapse: df counts documents, not occurrences
    assert got["q"] == (2, "2,3")


def test_inverted_index_caps_hot_terms(spark, docs):
    from eventanalysis_spark.operators.corpus import inverted_index

    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs, max_postings=2).collect()
    }
    # df stays exact for hot terms; postings only for df <= 2
    assert got["x"] == (3, None)
    assert got["q"] == (2, "2,3")


def test_inverted_index_numeric_posting_order(spark):
    from eventanalysis_spark.operators.corpus import inverted_index

    rows = [(i, "tok") for i in (2, 10, 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = inverted_index(df).collect()
    assert got[0]["postings"] == "1,2,10"  # numeric, not lexicographic


def test_inverted_index_partition_invariance(spark, docs):
    from eventanalysis_spark.operators.corpus import inverted_index

    a = sorted(map(tuple, inverted_index(docs.repartition(1)).collect()))
    b = sorted(map(tuple, inverted_index(docs.repartition(7)).collect()))
    assert a == b


# ---- source_overlap_sketch -------------------------------------------

def test_sketch_identical_sources_estimate_one(spark):
    from eventanalysis_spark.operators.corpus import source_overlap_sketch

    rows = [(1, "x y z w q r", "A"), (2, "x y z w q r", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = source_overlap_sketch(df, num_hashes=16).collect()
    assert len(got) == 1
    assert got[0]["jaccard_est"] == 1.0


def test_sketch_disjoint_sources_estimate_near_zero(spark):
    from eventanalysis_spark.operators.corpus import source_overlap_sketch

    rows = [(1, "a b c d e f g h", "A"), (2, "q r s t u v w x", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = source_overlap_sketch(df, num_hashes=32).collect()[0]
    assert got["jaccard_est"] <= 0.1


def test_sketch_tracks_exact_jaccard(spark, docs):
    """Estimate within 2/num_hashes-ish of the exact overlap on the
    module fixture (A∩B share 'x y z'; C disjoint)."""
    from eventanalysis_spark.operators.corpus import (
        source_overlap,
        source_overlap_sketch,
    )

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_overlap(docs).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in source_overlap_sketch(docs, num_hashes=64).collect()
    }
    for pair, j in exact.items():
        assert abs(est[pair] - j) <= 0.25, (pair, j, est[pair])
    # pairs absent from exact have ~zero overlap
    for pair, e in est.items():
        if pair not in exact:
            assert e <= 0.15, (pair, e)


def test_sketch_merge_invariant_to_partitioning(spark, docs):
    from eventanalysis_spark.operators.corpus import source_overlap_sketch

    a = sorted(map(tuple, source_overlap_sketch(docs).collect()))
    b = sorted(map(tuple, source_overlap_sketch(docs.repartition(7)).collect()))
    assert a == b


def test_sketch_sentinels_never_poison_the_merge(spark, docs):
    """Short docs contribute a whole-text shingle (dedup.shingles), and
    empty docs are filtered before the union min — either way no -1
    sentinel reaches the merge, so estimates stay in [0, 1]."""
    from eventanalysis_spark.operators.corpus import source_overlap_sketch

    for r in source_overlap_sketch(docs).collect():
        assert 0.0 <= r["jaccard_est"] <= 1.0


# ---- snapshot_delta --------------------------------------------------

def test_snapshot_delta_statuses(spark):
    from eventanalysis_spark.operators.corpus import (
        snapshot_delta,
        snapshot_delta_stats,
    )

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string",
    )
    got = {r["key"]: r["status"] for r in snapshot_delta(old, new).collect()}
    assert got == {"u2": "changed", "u3": "removed", "u4": "added"}
    stats = {
        r["status"]: r["n"] for r in snapshot_delta_stats(old, new).collect()
    }
    assert stats == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_delta_hashes_present_only_where_defined(spark):
    from eventanalysis_spark.operators.corpus import snapshot_delta

    old = spark.createDataFrame([("u1", "x")], "url string, text string")
    new = spark.createDataFrame([("u2", "y")], "url string, text string")
    rows = {r["key"]: r for r in snapshot_delta(old, new).collect()}
    assert rows["u1"]["old_hash"] and rows["u1"]["new_hash"] is None
    assert rows["u2"]["new_hash"] and rows["u2"]["old_hash"] is None


def test_snapshot_delta_identical_snapshots_empty(spark, docs):
    from eventanalysis_spark.operators.corpus import snapshot_delta

    d = docs.select(F.col("doc_id").cast("string").alias("url"), "text")
    assert snapshot_delta(d, d).count() == 0


def test_snapshot_delta_null_content_is_presence_not_absence(spark):
    """md5(NULL) is NULL: a present row with NULL content must not be
    classified by hash-nullness — NULL vs 'x' is 'changed', NULL vs
    NULL is 'unchanged', and a NULL-content row missing from the other
    side is still 'removed'/'added'."""
    from eventanalysis_spark.operators.corpus import (
        snapshot_delta,
        snapshot_delta_stats,
    )

    old = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "x"), ("u2", None), ("u4", None)],
        "url string, text string",
    )
    got = {r["key"]: r["status"] for r in snapshot_delta(old, new).collect()}
    assert got == {"u1": "changed", "u3": "removed", "u4": "added"}
    stats = {
        r["status"]: r["n"] for r in snapshot_delta_stats(old, new).collect()
    }
    assert stats == {"changed": 1, "unchanged": 1, "removed": 1, "added": 1}


def test_snapshot_churn_per_group(spark):
    """Grouped churn rollup: per-host status counts and ratio; hosts
    with no churn report ratio 0.0; ratio is exact long division."""
    from eventanalysis_spark.operators.corpus import snapshot_churn

    old = spark.createDataFrame(
        [("https://a.ex/1", "same"), ("https://a.ex/2", "v1"),
         ("https://a.ex/3", "gone"), ("https://b.ex/1", "same")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("https://a.ex/1", "same"), ("https://a.ex/2", "v2"),
         ("https://a.ex/4", "fresh"), ("https://b.ex/1", "same")],
        "url string, text string",
    )
    host = F.regexp_extract(F.col("key"), r"https://([^/]+)/", 1)
    got = {
        r["host"]: r
        for r in snapshot_churn(old, new, host, group_name="host").collect()
    }
    a = got["a.ex"]
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"], a["n_total"]) == (1, 1, 1, 1, 4)
    assert a["churn_ratio"] == 3 / 4
    b = got["b.ex"]
    assert (b["n_total"], b["churn_ratio"]) == (1, 0.0)


def test_snapshot_churn_payload_never_crosses_the_join(spark):
    """Scale invariant shared with snapshot_delta: the optimized plan
    hashes the content column BELOW the full-outer join, so only
    (key, md5) attributes ride the exchange."""
    from eventanalysis_spark.operators.corpus import snapshot_churn

    old = spark.createDataFrame([("u1", "x")], "url string, text string")
    new = spark.createDataFrame([("u1", "y")], "url string, text string")
    plan = (
        snapshot_churn(old, new, F.lit("all"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    join_at = plan.index("Join FullOuter")
    assert "md5(" in plan[join_at:], "hash projection must sit below the join"


def test_kmv_sketch_exact_below_k_and_estimator_above(spark):
    from eventanalysis_spark.operators.corpus import kmv_distinct_sketch

    rows = (
        # small: 5 distinct keys, heavy repetition -> exact path
        [("small", f"k{i % 5}") for i in range(200)]
        # big: 500 distinct keys -> estimator path
        + [("big", f"k{i}") for i in range(500)]
        # nulls are excluded entirely
        + [("small", None)] * 3
    )
    sk = {
        r["source"]: r
        for r in kmv_distinct_sketch(
            spark.createDataFrame(rows, "source string, url string"),
            key_col="url", group_col="source", k=32,
        ).collect()
    }
    assert sk["small"]["n_minima"] == 5
    assert sk["small"]["distinct_est"] == 5.0  # exact when < k minima
    assert sk["big"]["n_minima"] == 32
    # (k-1)/h_k estimator: within 50% of truth at k=32 (se ~ 18%)
    assert 250 < sk["big"]["distinct_est"] < 1000


def test_kmv_sketch_is_mergeable(spark):
    """Union-then-re-k-min of two half-corpus sketches equals the whole
    corpus sketch — the property that makes KMV per-source cardinality
    fold across crawls/partitions."""
    from eventanalysis_spark.operators.corpus import kmv_distinct_sketch
    from eventanalysis_spark.operators.dedup import hash60_md5
    from pyspark.sql import functions as F

    rows = [("s", f"k{i % 97}") for i in range(400)]
    df = spark.createDataFrame(rows, "source string, url string")
    whole = kmv_distinct_sketch(df, key_col="url", group_col="source", k=16).collect()[0]

    # merge by hand: k-min hash SETS from each half, union, re-take k min
    h = df.select(hash60_md5(F.col("url")).alias("h"), F.col("url"))
    half_a = {r["h"] for r in h.where(F.crc32(F.col("url")) % 2 == 0).select("h").distinct().collect()}
    half_b = {r["h"] for r in h.where(F.crc32(F.col("url")) % 2 == 1).select("h").distinct().collect()}
    merged = sorted(sorted(half_a)[:16] + sorted(half_b)[:16])
    kmin = sorted(set(merged))[:16]
    assert kmin[-1] == whole["kth_min"]
    assert len(kmin) == whole["n_minima"]


def test_corpus_divergence_properties(spark):
    from eventanalysis_spark.operators.corpus import corpus_divergence

    a = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog ran",)], "text string"
    )
    b = spark.createDataFrame(
        [("quantum flux capacitor array",), ("the tensor",)], "text string"
    )
    # identical corpora -> all divergences exactly zero
    same = corpus_divergence(a, a).collect()[0]
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0 and same["js_div"] == 0.0
    assert same["n_tokens_a"] == same["n_tokens_b"] == 9

    d_ab = corpus_divergence(a, b).collect()[0]
    d_ba = corpus_divergence(b, a).collect()[0]
    # KL > 0 for different corpora; JS is symmetric and bounded by ln 2
    assert d_ab["kl_ab"] > 0 and d_ab["kl_ba"] > 0
    assert d_ab["js_div"] == d_ba["js_div"]
    assert 0 < d_ab["js_div"] < 0.6931472
    # KL directions swap under argument swap
    assert d_ab["kl_ab"] == d_ba["kl_ba"] and d_ab["kl_ba"] == d_ba["kl_ab"]
    # empty side degrades to the +1 floor, never NULL/inf
    empty = spark.createDataFrame([("",)], "text string")
    e = corpus_divergence(a, empty).collect()[0]
    assert e["n_tokens_b"] == 0 and e["kl_ab"] is not None and e["js_div"] > 0


def test_kmv_merge_equals_whole_corpus_sketch(spark):
    """First-class merge API: folding per-slice sketches (emit_minima)
    equals sketching the concatenated corpus — bit-exact, including the
    estimate."""
    from eventanalysis_spark.operators.corpus import kmv_distinct_sketch, kmv_merge
    from pyspark.sql import functions as F

    rows = [("s%d" % (i % 2), "k%d" % (i % 151)) for i in range(600)]
    df = spark.createDataFrame(rows, "source string, url string")
    whole = kmv_distinct_sketch(
        df, key_col="url", group_col="source", k=16, emit_minima=True
    )
    crawl_a = df.where(F.crc32(F.col("url")) % 3 != 0)
    crawl_b = df.where(F.crc32(F.col("url")) % 3 == 0)
    parts = kmv_distinct_sketch(
        crawl_a, key_col="url", group_col="source", k=16, emit_minima=True
    ).unionByName(
        kmv_distinct_sketch(
            crawl_b, key_col="url", group_col="source", k=16, emit_minima=True
        )
    )
    merged = kmv_merge(parts, k=16)
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


# ---- PMI collocations --------------------------------------------------------

from eventanalysis_spark.operators.corpus import pmi_collocations  # noqa: E402


def test_pmi_collocations_ranks_exclusive_pair_first(spark):
    # 'zyx wvu' always co-occur exclusively (5x); 'the cat'/'the dog' share
    # 'the' with everything -> lower PMI. Fillers push totals up.
    rows = (
        [("zyx wvu",)] * 5
        + [("the cat",)] * 5
        + [("the dog",)] * 5
        + [("the end of the line",)] * 10
    )
    docs = spark.createDataFrame(rows, "text string")
    got = pmi_collocations(docs, min_count=5, k=3).collect()
    assert (got[0].term_a, got[0].term_b) == ("zyx", "wvu")
    assert got[0].pair_cnt == 5
    assert got[0].pmi > got[1].pmi


def test_pmi_min_count_prunes(spark):
    docs = spark.createDataFrame([("aa bb",)] * 3 + [("cc dd",)] * 7, "text string")
    got = pmi_collocations(docs, min_count=5, k=10).collect()
    assert [(r.term_a, r.term_b) for r in got] == [("cc", "dd")]


def test_pmi_math_matches_hand_formula(spark):
    import math
    docs = spark.createDataFrame([("aa bb",)] * 4 + [("aa cc",)] * 4, "text string")
    got = {(r.term_a, r.term_b): (r.pair_cnt, r.pmi) for r in
           pmi_collocations(docs, min_count=1, k=10).collect()}
    # tokens: aa=8, bb=4, cc=4, n_uni=16; pairs: (aa,bb)=4,(aa,cc)=4, n_pairs=8
    want = round(math.log(4) - math.log(8) - math.log(4) + 2 * math.log(16) - math.log(8), 6)
    assert got[("aa", "bb")] == (4, want)


def test_host_quality_profile(spark):
    from eventanalysis_spark.operators.corpus import host_quality_profile

    good = " ".join(
        ["the cat and the dog sat with that hat of fun"] * 6
    )  # 60 words, stopword-rich → passes the Gopher gate
    docs = spark.createDataFrame(
        [
            (0, "h1", "en", good),
            (1, "h1", "en", good),          # exact dup of doc 0
            (2, "h1", "de", "short junk"),  # fails gopher (word count)
            (3, "h2", "en", "zzz"),
        ],
        "doc_id int, source string, lang string, text string",
    )
    rows = {r.host: r for r in host_quality_profile(docs).collect()}
    h1 = rows["h1"]
    assert h1.n_docs == 3 and h1.n_langs == 2
    assert h1.n_dup_docs == 1 and h1.dup_frac == 0.333333
    assert h1.n_gopher_keep == 2 and h1.gopher_keep_frac == 0.666667
    assert h1.mean_chars == round((2 * len(good) + len("short junk")) / 3, 6)
    h2 = rows["h2"]
    assert h2.n_docs == 1 and h2.n_dup_docs == 0 and h2.n_gopher_keep == 0


# ---- phrase_matches --------------------------------------------------

def test_phrase_matches_hand_computed(spark):
    from eventanalysis_spark.operators.corpus import phrase_matches

    rows = [
        (1, "a b c a b c"),     # "a b c" twice (pos 0 and 3)
        (2, "a b x c"),         # terms present, sequence broken
        (3, "c b a"),           # reversed: no match
        (4, "z a b c z"),       # one match at pos 1
        (5, ""),                # empty doc ignored
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(docs, "a b c").collect()
    }
    assert got == {1: (2, 0), 4: (1, 1)}


def test_phrase_matches_repeated_term_in_phrase(spark):
    from eventanalysis_spark.operators.corpus import phrase_matches

    docs = spark.createDataFrame(
        [(1, "go go go stop"), (2, "go stop go")],
        "doc_id long, text string",
    )
    # phrase with a repeated term: overlapping occurrences both count
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(docs, "go go").collect()
    }
    assert got == {1: (2, 0)}


def test_phrase_matches_single_token_and_errors(spark):
    from eventanalysis_spark.operators.corpus import phrase_matches

    docs = spark.createDataFrame(
        [(1, "q w q"), (2, "w")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(docs, "q").collect()
    }
    assert got == {1: (2, 0)}
    with pytest.raises(ValueError):
        phrase_matches(docs, "   ")


def test_phrase_matches_partition_invariance(spark):
    from eventanalysis_spark.operators.corpus import phrase_matches

    rows = [(i, "t a b c s a b c e") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = phrase_matches(docs.repartition(11), "a b c").collect()
    b = phrase_matches(docs.coalesce(1), "a b c").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a[0]["n_matches"] == 2


# ---- change_rate_estimates -------------------------------------------

def _snapshots(spark):
    # hot.example/a changes every crawl (r=1, censored); hot/b changes
    # 2 of 3 intervals; cold.example/c never changes
    rows = []
    for crawl in range(4):
        rows.append((crawl, "https://hot.example/a", f"v{crawl}"))
        rows.append((crawl, "https://hot.example/b",
                     "vX" if crawl in (1, 3) else "v0"))
        rows.append((crawl, "https://cold.example/c", "same"))
    return spark.createDataFrame(
        rows, "crawl_id long, url string, text string"
    )


def test_change_rate_hand_computed(spark):
    import math

    from eventanalysis_spark.operators.corpus import change_rate_estimates
    from eventanalysis_spark.operators.webfilter import url_parts

    got = {
        r["host"]: r
        for r in change_rate_estimates(
            _snapshots(spark),
            group=url_parts(F.col("key"))["host"],
            group_name="host",
        ).collect()
    }
    hot, cold = got["hot.example"], got["cold.example"]
    # hot: 6 pairs, a changes 3/3, b changes 3/3 (v0→vX→v0→vX)
    assert (hot["n_pairs"], hot["n_changed"]) == (6, 6)
    assert hot["change_ratio"] == 1.0
    assert hot["lambda_hat"] is None          # fully censored
    assert hot["revisit_interval"] is None
    assert (cold["n_pairs"], cold["n_changed"]) == (3, 0)
    assert cold["change_ratio"] == 0.0
    assert cold["lambda_hat"] == 0.0          # never changes: rate 0...
    assert cold["revisit_interval"] is None   # ...revisit never due
    # per-url grouping: b alone has r = 1.0 (changed every interval)
    by_url = {
        r["grp"]: r for r in change_rate_estimates(_snapshots(spark)).collect()
    }
    assert by_url["https://hot.example/b"]["change_ratio"] == 1.0
    # partial change rate: 1 change in 3 intervals → λ = -ln(2/3)
    snaps2 = spark.createDataFrame(
        [(c, "u", "A" if c < 2 else "B") for c in range(4)],
        "crawl_id long, url string, text string",
    )
    r2 = change_rate_estimates(snaps2).collect()[0]
    assert (r2["n_pairs"], r2["n_changed"]) == (3, 1)
    lam = -math.log(1 - 1 / 3)
    assert abs(r2["lambda_hat"] - round(lam, 6)) < 1e-9
    assert abs(r2["revisit_interval"] - round(1 / lam, 6)) < 1e-9


def test_change_rate_null_text_and_partition_invariance(spark):
    from eventanalysis_spark.operators.corpus import change_rate_estimates

    snaps = spark.createDataFrame(
        [(0, "u", None), (1, "u", None), (2, "u", "x")],
        "crawl_id long, url string, text string",
    )
    r = change_rate_estimates(snaps).collect()[0]
    # NULL→NULL is unchanged (null-safe hash), NULL→x is a change
    assert (r["n_pairs"], r["n_changed"]) == (2, 1)
    big = spark.createDataFrame(
        [(c, f"u{i}", f"v{(c * 7 + i) % 3}") for i in range(50)
         for c in range(5)],
        "crawl_id long, url string, text string",
    )
    a = sorted(map(tuple, change_rate_estimates(big.repartition(11)).collect()))
    b = sorted(map(tuple, change_rate_estimates(big.coalesce(1)).collect()))
    assert a == b
