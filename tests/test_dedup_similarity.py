"""Dedup (exact / MinHash-LSH / SimHash / Jaccard) and similarity search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicate_pairs,
    simhash64,
    simhash_near_pairs,
)
from eventanalysis_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucket_ann,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra"),  # near dup of 1
        (4, base.replace("quick", "fast")),  # near dup
        (5, "completely different content about spark partitions and shuffles"),
        (6, ""),  # empty
        (7, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup(spark, dup_docs):
    groups = exact_duplicates(dup_docs, "text", "doc_id")
    dup_groups = groups.where(F.col("n_copies") > 1).collect()
    assert len(dup_groups) == 1
    assert dup_groups[0].keep_id == 1 and dup_groups[0].n_copies == 2
    kept = drop_exact_duplicates(dup_docs, "text", "doc_id")
    assert kept.count() == 6
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1, 3, 4, 5, 6, 7}


def test_minhash_identical_signatures(spark, dup_docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(
        dup_docs, "text", "doc_id", num_hashes=32).collect()}
    assert sigs[1] == sigs[2]  # identical docs → identical signatures
    assert sigs[1] != sigs[5]
    assert sigs[6] == [-1] * 32  # empty doc sentinel
    # near-dup should agree on most hashes
    agree = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree >= 16


def test_lsh_finds_near_dups(spark, dup_docs):
    pairs = near_duplicate_pairs(
        dup_docs, "text", "doc_id", num_hashes=32, bands=16, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always found
    assert (1, 3) in got or (2, 3) in got  # near dup found
    assert not any(5 in p for p in got)  # unrelated doc never pairs


def test_lsh_no_python_udf_in_plan(spark, dup_docs):
    sigs = minhash_signatures(dup_docs, "text", "doc_id", num_hashes=16)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


def test_minhash_arrow_form_bit_identical(spark, dup_docs):
    """Round-6 contract: minhash_signatures_arrow (the vectorized NumPy
    fold the LSH paths run on) must produce EXACTLY the Catalyst fold's
    signatures — integer arithmetic, so equality is bit-level, across
    empty docs, short docs, and both base hashes."""
    from eventanalysis_spark.operators.dedup import minhash_signatures_arrow

    for hash_fn in ("xxhash64", "md5"):
        cat = {r.doc_id: r.sig for r in minhash_signatures(
            dup_docs, "text", "doc_id", 32, 3, hash_fn).collect()}
        arw = {r.doc_id: r.sig for r in minhash_signatures_arrow(
            dup_docs, "text", "doc_id", 32, 3, hash_fn).collect()}
        assert cat == arw
    # the arrow form is exactly one Python map stage fed (id, shingles)
    plan = minhash_signatures_arrow(
        dup_docs, "text", "doc_id", 16
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1 and "BatchEvalPython" not in plan


def test_simhash(spark, dup_docs):
    h = dup_docs.select(
        "doc_id", simhash64(F.col("text")).alias("sh")
    ).collect()
    by_id = {r.doc_id: r.sh for r in h}
    assert by_id[1] == by_id[2]
    # near-dup hamming distance small, unrelated large
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(by_id[1], by_id[3]) <= 12
    assert ham(by_id[1], by_id[5]) > 12
    pairs = simhash_near_pairs(dup_docs, "text", "doc_id", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got


def test_mega_bucket_exact_dup_collapse(spark):
    """10^4 identical docs: the exhaustive pair relation is C(10^4,2) ≈
    5·10^7, but the default (collapsed) LSH pipeline must emit O(n) rows —
    exact dups collapse to one representative before LSH, then re-enter as
    (rep, member, 1.0) star pairs."""
    n = 10_000
    docs = (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("doc_id"),
            F.lit("same boilerplate page text repeated across the crawl").alias("text"),
        )
        .unionByName(
            spark.createDataFrame(
                [(n + 1, "one genuinely different document about spark")],
                "doc_id int, text string",
            )
        )
    )
    pairs = near_duplicate_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=8, threshold=0.5
    )
    rows = pairs.collect()
    assert len(rows) == n - 1  # star pairs only: (0, 1..n-1)
    assert all(r.id_a == 0 and r.jaccard == 1.0 for r in rows)
    # the unrelated doc never pairs
    assert all(r.id_b != n + 1 for r in rows)


def test_lsh_bucket_cap_star_fallback(spark, dup_docs):
    """max_bucket_size: oversized (band, bucket) groups emit star pairs to
    the bucket min instead of all-pairs — output linear in bucket size,
    connectivity preserved."""
    sigs = minhash_signatures(dup_docs, "text", "doc_id", num_hashes=16)
    capped = lsh_candidate_pairs(sigs, bands=8, num_hashes=16, max_bucket_size=1)
    uncapped = lsh_candidate_pairs(sigs, bands=8, num_hashes=16)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # with cap=1 every multi-member bucket collapses to anchor stars: each
    # doc that shared any bucket is still connected to that bucket's min id
    assert (1, 2) in got  # identical docs stay connected
    # star form never emits MORE pairs than the exhaustive form
    assert len(got) <= uncapped.count()


def test_simhash_collapse_modes(spark, dup_docs):
    """collapse_exact keeps identical-doc connectivity (star pairs) and
    matches the exhaustive form's connected components."""
    collapsed = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(dup_docs, "text", "doc_id", 3).collect()
    }
    exhaustive = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            dup_docs, "text", "doc_id", 3, collapse_exact=False
        ).collect()
    }
    assert (1, 2) in collapsed
    assert collapsed <= exhaustive | {(1, 2)}


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk(spark, embeddings):
    q = embeddings.where(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(embeddings, q, k=5).collect()
    assert len(out) == 10  # 5 per query
    for qid in (0, 1):
        rows = [r for r in out if r.query_id == qid]
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != qid for r in rows)
        assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_lsh_ann_recall(spark, embeddings):
    """LSH ANN recall on the sf0.001 embeddings. These vectors are
    near-random (best cosine ≈ 0.33 ≈ 71°): P(bit agree) ≈ 0.61, so the
    honest parameterization is few bits / many tables — bits=3, tables=12
    gives per-neighbor candidate probability ≈ 1-(1-0.61³)^12 ≈ 0.95.
    High-cosine near-dups (the production use) are covered by
    test_embedding_near_duplicates_self_identity."""
    q = embeddings.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r.vec_id for r in brute_force_topk(embeddings, q, k=10).collect()}
    approx = {
        r.vec_id
        for r in lsh_bucket_ann(
            embeddings, q, dim=64, k=10, bits=3, tables=12
        ).collect()
    }
    assert len(approx) <= 10
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"recall {recall}"


def test_embedding_near_duplicates_self_identity(spark, embeddings):
    """Duplicate an embedding row under a new id: the pair must be found
    with cos_sim ≈ 1."""
    clone = embeddings.where(F.col("vec_id") == 7).select(
        F.lit(100007).cast("long").alias("vec_id"), "embedding", "label"
    )
    aug = embeddings.unionByName(clone)
    pairs = embedding_near_duplicates(aug, dim=64, threshold=0.999, bits=8, tables=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (7, 100007) in got


def test_lsh_bucket_cap_chain_preserves_neardup_connectivity(spark):
    """Inside a capped bucket whose min-id anchor is NOT similar to the
    others, star edges alone would be dropped by jaccard_verify and true
    near-dups would disconnect; the signature-sorted chain edge (1,2)
    keeps them paired."""
    sigs = spark.createDataFrame(
        [
            (0, [5, 7, 9, 11]),   # shares band 0 with 1 and 2, else distinct
            (1, [5, 7, 1, 2]),
            (2, [5, 7, 3, 4]),
        ],
        "doc_id long, sig array<long>",
    )
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            sigs, bands=2, num_hashes=4, max_bucket_size=2
        ).collect()
    }
    # star to anchor 0 AND the chain edge between sort-adjacent members
    assert {(0, 1), (0, 2), (1, 2)} == got


def test_ivf_assign_is_argmin_and_covers_all(spark, embeddings):
    from eventanalysis_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        l2sq,
    )

    cents = ivf_centroids(embeddings, n_centroids=8)
    codebook = [(r["cid"], list(r["__c"])) for r in cents.collect()]
    assigned = ivf_assign(embeddings, codebook)
    n = embeddings.count()
    assert assigned.count() == n  # every vector lands in exactly one list
    # cross-check argmin on a sample against the exploded form
    rows = assigned.orderBy("vec_id").limit(20).collect()
    import numpy as np

    emb_pd = (
        embeddings.orderBy("vec_id").limit(20).toPandas().set_index("vec_id")
    )
    for r in rows:
        v = np.array(emb_pd.loc[r.vec_id, "embedding"], dtype=np.float64)
        dists = {
            cid: float(((v - np.array(c, dtype=np.float64)) ** 2).sum())
            for cid, c in codebook
        }
        best = min(dists, key=lambda cid: (dists[cid], cid))
        assert r.cid == best, (r.vec_id, r.cid, best)


def test_ivf_topk_recall_and_shape(spark, embeddings):
    """IVF candidates come only from probed lists; recall vs brute force
    is bounded by nprobe/n_centroids coverage. With nprobe == n_centroids
    IVF degenerates to exact search — assert equality there, and sane
    recall at partial probe."""
    from eventanalysis_spark.operators.similarity import ivf_topk

    q = embeddings.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r.vec_id for r in brute_force_topk(embeddings, q, k=10).collect()}
    full = ivf_topk(embeddings, q, k=10, n_centroids=8, nprobe=8)
    assert {r.vec_id for r in full.collect()} == exact
    part = ivf_topk(embeddings, q, k=10, n_centroids=8, nprobe=3).collect()
    assert len(part) <= 10
    recall = len(exact & {r.vec_id for r in part}) / 10
    assert recall >= 0.2, f"recall {recall}"  # random vectors spread lists


def test_ivf_assignment_plan_is_narrow(spark, embeddings):
    """The 100 TB shape: assignment is ONE projection — no Exchange, no
    Python, no join — and ivf_topk's corpus side reaches the candidate
    join without shuffling (broadcast probes)."""
    from eventanalysis_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(embeddings, n_centroids=8)
    codebook = [(r["cid"], list(r["__c"])) for r in cents.collect()]
    assigned = ivf_assign(embeddings, codebook)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    assert "Join" not in plan

    q = embeddings.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk_plan = (
        ivf_topk(embeddings, q, k=5, n_centroids=8, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in topk_plan
    assert "SortMergeJoin" not in topk_plan


def test_containment_asymmetric_quote(spark):
    """A short doc fully embedded in a long one: containment sees it,
    Jaccard (at any usual threshold) does not."""
    from eventanalysis_spark.operators.dedup import (
        containment_verify,
        jaccard_verify,
    )

    quote = "alpha beta gamma delta epsilon"
    host = quote + " " + " ".join(f"filler{i} word{i} more{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, "totally unrelated text body here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_verify(df, pairs, threshold=0.5).collect()
    }
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got
    # every 3-shingle of the quote appears in the host
    assert got[(1, 2)]["containment_a"] == 1.0
    assert got[(1, 2)]["containment_b"] < 0.2
    # jaccard at 0.5 misses the same relation
    assert jaccard_verify(df, pairs, threshold=0.5).count() == 0


def test_incremental_near_duplicates_with_persisted_index(spark, tmp_path):
    """Cross-crawl dedup: the LSH index round-trips through parquet (the
    warehouse path) and finds new->old near-dups without touching
    non-candidate history text."""
    from eventanalysis_spark.operators.dedup import (
        incremental_near_duplicates,
        lsh_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    old_rows = [(i, base + f"old tail {i}") for i in range(10)] + [
        (i, f"history only document {i} with its own words " * 3)
        for i in range(10, 20)
    ]
    new_rows = [(100, base + "old tail 3"), (101, "fresh unseen content " * 5)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    idx_path = str(tmp_path / "lsh_index")
    lsh_index(old, id_col="doc_id", num_hashes=32, bands=16).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    got = incremental_near_duplicates(
        new, old, old_index=idx, id_col="doc_id",
        num_hashes=32, bands=16, threshold=0.5,
    ).collect()
    pairs = {(r["new_id"], r["old_id"]) for r in got}
    # doc 100 duplicates the base-family history; 101 matches nothing
    assert (100, 3) in pairs
    assert all(n != 101 for n, _ in pairs)
    assert all(o < 20 for _, o in pairs)
    # exact duplicate of old doc 3 scores jaccard 1.0
    j = {p: r["jaccard"] for p, r in zip(pairs, got)}
    full = [r["jaccard"] for r in got if r["new_id"] == 100 and r["old_id"] == 3]
    assert full and full[0] == 1.0


def test_tokenizer_evaluated_once_in_window_generators(spark):
    """Regression guard for the O(tokens²) inlining bug (NOTES rule):
    the regex tokenizer must appear exactly once in each window
    generator's optimized plan — lambda-body references inline the whole
    upstream tree, and codegen CSE does not cross HOF boundaries."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.dedup import minhash_signatures, shingles
    from eventanalysis_spark.operators.sampling import word_shingles
    from eventanalysis_spark.operators.spans import ngram_windows
    from eventanalysis_spark.operators.webfilter import top_ngram_stats

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")

    def n_splits(frame):
        # Aliases below keep Spark's auto-generated column names (which
        # embed the pretty-printed expression) out of the count.
        return frame._jdf.queryExecution().optimizedPlan().toString().count("split(")

    assert n_splits(df.select(shingles(F.col("text"), 3).alias("s"))) == 1
    assert n_splits(minhash_signatures(df, "text", "doc_id", 16, 3)) == 1
    assert n_splits(df.select(word_shingles(F.col("text"), 3).alias("w"))) == 1
    assert n_splits(ngram_windows(df, 3, "text", "doc_id")) == 1
    # top_ngram_stats runs two gram passes (counts + mode) — once each
    assert n_splits(top_ngram_stats(df, 2, id_col="doc_id")) <= 2


def test_lsh_index_collapses_exact_dups_and_caps_buckets(spark):
    """Mega-bucket guards on the persistable index (VERDICT r4 item 2):
    10^4 identical history docs must index as ONE rep posting per band —
    not 10^4 × bands — and distinct-text bucket collisions are capped to
    the max_bucket_size smallest doc_ids."""
    from eventanalysis_spark.operators.dedup import lsh_index

    n, bands = 10_000, 8
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate cookie banner accept terms " * 3).alias("text"),
    )
    idx = lsh_index(dup, id_col="doc_id", num_hashes=16, bands=bands)
    rows = idx.collect()
    assert len(rows) == bands  # one rep (min id = 0) per band
    assert {r["doc_id"] for r in rows} == {0}

    # distinct TEXTS with identical token streams (whitespace differs, so
    # md5(text) differs but every shingle — hence every bucket — agrees):
    # exact-collapse keeps them all, so only the cap can bound the bucket
    near = spark.createDataFrame(
        [(i, "alpha beta gamma delta" + " " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    capped = lsh_index(near, id_col="doc_id", num_hashes=16, bands=bands,
                       max_bucket_size=2)
    per_bucket = capped.groupBy("band", "bucket").count().collect()
    assert per_bucket and all(r["count"] <= 2 for r in per_bucket)
    # the kept postings are the smallest doc_ids (deterministic cap)
    assert {r["doc_id"] for r in capped.collect()} == {0, 1}


def test_incremental_dedup_identical_history_is_candidate_bounded(spark):
    """Adversarial cross-crawl case: a large block of identical docs in
    history must NOT blow up the bucket join — candidates stay at rep
    level (O(1) here) while the OUTPUT still expands to full membership
    with jaccard 1.0 for every (new, old-member) pair."""
    from eventanalysis_spark.operators.dedup import (
        incremental_near_duplicates,
        lsh_index,
    )

    n_hist = 500
    boiler = "every page has this exact cookie banner text " * 4
    old = spark.range(n_hist).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    new = spark.createDataFrame(
        [(10_000, boiler), (10_001, "genuinely novel content " * 6)],
        "doc_id long, text string",
    )
    idx = lsh_index(old, id_col="doc_id", num_hashes=16, bands=8)
    # index itself is rep-only: 8 postings, not 500 × 8
    assert idx.count() == 8
    got = incremental_near_duplicates(
        new, old, old_index=idx, id_col="doc_id",
        num_hashes=16, bands=8, threshold=0.8,
    ).collect()
    pairs = {(r["new_id"], r["old_id"]) for r in got}
    assert pairs == {(10_000, i) for i in range(n_hist)}
    assert all(r["jaccard"] == 1.0 for r in got)


def test_incremental_dedup_legacy_uncollapsed_index_same_result(spark):
    """A round-4-era persisted index (uncollapsed, uncapped member
    postings) probed by the new rep-mapping path yields the same pairs
    as a freshly built collapsed index."""
    from eventanalysis_spark.operators.dedup import (
        incremental_near_duplicates,
        lsh_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    old = spark.createDataFrame(
        [(i, base + "shared tail") for i in range(5)]          # exact dups
        + [(i, f"unique history doc {i} words " * 3) for i in range(5, 10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base + "shared tail"), (101, "novel " * 10)],
        "doc_id long, text string",
    )
    legacy_idx = lsh_index(
        old, id_col="doc_id", num_hashes=32, bands=16,
        collapse_exact=False, max_bucket_size=None,
    )
    fresh_idx = lsh_index(old, id_col="doc_id", num_hashes=32, bands=16)
    assert legacy_idx.count() > fresh_idx.count()  # legacy really uncollapsed

    def run(idx):
        return {
            (r["new_id"], r["old_id"], r["jaccard"])
            for r in incremental_near_duplicates(
                new, old, old_index=idx, id_col="doc_id",
                num_hashes=32, bands=16, threshold=0.5,
            ).collect()
        }

    got_legacy, got_fresh = run(legacy_idx), run(fresh_idx)
    assert got_legacy == got_fresh
    assert {(100, i, 1.0) for i in range(5)} <= got_fresh
    assert all(n != 101 for n, _, _ in got_fresh)


def test_near_duplicate_pairs_default_cap_bounds_degenerate_cluster(spark):
    """The LSH bucket cap is ON by default (VERDICT r4 item 3): a
    degenerate NEAR-dup (not exact-dup) family — identical token streams,
    distinct raw texts — stays O(n·cap) through the bucket join while the
    verified pair set remains connected (star+chain edges all verify at
    jaccard 1.0)."""
    from eventanalysis_spark.operators.dedup import near_duplicate_pairs

    n = 40
    fam = [(i, "omega psi chi phi upsilon tau" + " " * (i + 1)) for i in range(n)]
    df = spark.createDataFrame(fam, "doc_id long, text string")
    # tiny cap forces the star+chain path; token-identical docs verify 1.0
    pairs = near_duplicate_pairs(
        df, id_col="doc_id", num_hashes=16, bands=8, threshold=0.8,
        max_bucket_size=4,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # star+chain, deduped across bands: ≤ 2n edges, never n(n-1)/2
    assert len(got) <= 2 * n
    # connectivity: union-find over emitted edges joins the whole family
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_hard_negative_mine_excludes_self_and_positives(spark, embeddings):
    """Mined negatives = brute-force top-k minus the anchor and its labeled
    positives — verified against a pure recompute from brute_force_topk."""
    from eventanalysis_spark.operators.similarity import hard_negative_mine

    positives = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 5)], "query_id long, pos_id long"
    )
    out = hard_negative_mine(embeddings, positives, k=5).collect()
    assert len(out) == 10
    banned = {0: {0, 1, 2}, 1: {1, 5}}
    for qid in (0, 1):
        rows = [r for r in out if r.query_id == qid]
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(r.vec_id not in banned[qid] for r in rows)
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)

    # cross-check vs brute_force_topk with the positives dropped by hand
    q = embeddings.where(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = brute_force_topk(embeddings, q, k=5 + 3).collect()
    for qid in (0, 1):
        want = [r.vec_id for r in brute
                if r.query_id == qid and r.vec_id not in banned[qid]][:5]
        got = [r.vec_id for r in out if r.query_id == qid]
        assert got == want


def test_hard_negative_mine_sim_ceiling(spark, embeddings):
    """The false-negative guard: candidates at/above the ceiling vanish and
    the ranking re-closes over the remainder."""
    from eventanalysis_spark.operators.similarity import hard_negative_mine

    positives = spark.createDataFrame([(0, 1)], "query_id long, pos_id long")
    full = hard_negative_mine(embeddings, positives, k=3).collect()
    ceiling = full[0].cos_sim  # knock out exactly the top candidate
    capped = hard_negative_mine(
        embeddings, positives, k=3, sim_ceiling=ceiling
    ).collect()
    assert [r.vec_id for r in capped] == [r.vec_id for r in full[1:]] + \
        [r.vec_id for r in hard_negative_mine(embeddings, positives, k=4)
         .collect()][3:]
    assert all(r.cos_sim < ceiling for r in capped)


def test_incremental_dedup_collapsed_flag_identity(spark):
    """index_is_collapsed=True (skip the rep-mapping join) must give
    byte-identical pairs to the default mapping path when the index was
    built one-shot collapsed over exactly old_docs — incl. expansion
    over exact-duplicate memberships on BOTH crawls."""
    from eventanalysis_spark.operators.dedup import (
        incremental_near_duplicates,
        lsh_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    old = spark.createDataFrame(
        [(i, base + "shared tail") for i in range(4)]
        + [(i, f"history only {i} filler words here " * 3) for i in range(4, 8)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base + "shared tail"), (101, base + "shared tail"),
         (102, "unrelated fresh page " * 5)],
        "doc_id long, text string",
    )
    idx = lsh_index(old, id_col="doc_id", num_hashes=32, bands=16)

    def run(flag):
        return sorted(
            (r["new_id"], r["old_id"], round(r["jaccard"], 9))
            for r in incremental_near_duplicates(
                new, old, old_index=idx, id_col="doc_id",
                num_hashes=32, bands=16, threshold=0.5,
                index_is_collapsed=flag,
            ).collect()
        )

    fast, safe = run(True), run(False)
    assert fast == safe
    # full expansion: both new dups pair with ALL four old dups
    assert {(n, o) for n, o, _ in fast} == {
        (n, o) for n in (100, 101) for o in range(4)
    }


def test_incremental_fused_adhoc_equals_prebuilt_index(spark):
    """The round-6 fused ad-hoc build (old_index=None: one signature
    pass + one cap window over both sides under a struct side key) must
    emit EXACTLY the rows of the explicit lsh_index(collapse_exact=True)
    prebuilt path — same postings, same candidates, same verified pairs.
    Also exercises exact-dup groups on both sides (expansion) and a
    string id column (the struct key must be id-type-agnostic)."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.dedup import (
        incremental_near_duplicates,
        lsh_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    old_rows = (
        [(f"o{i}", base + f"old tail {i}") for i in range(8)]
        + [("o8dup", base + "old tail 3"), ("o9dup", base + "old tail 3")]
        + [(f"h{i}", f"history only document {i} with its own words " * 3)
           for i in range(6)]
    )
    new_rows = [
        ("n0", base + "old tail 3"),
        ("n0dup", base + "old tail 3"),
        ("n1", "fresh unseen content " * 5),
    ]
    old = spark.createDataFrame(old_rows, "doc_id string, text string")
    new = spark.createDataFrame(new_rows, "doc_id string, text string")

    idx = lsh_index(old, id_col="doc_id", num_hashes=32, bands=16)
    via_prebuilt = sorted(
        map(tuple, incremental_near_duplicates(
            new, old, old_index=idx, id_col="doc_id",
            num_hashes=32, bands=16, threshold=0.5,
            index_is_collapsed=True,
        ).select("new_id", "old_id", F.round("jaccard", 6)).collect())
    )
    via_fused = sorted(
        map(tuple, incremental_near_duplicates(
            new, old, old_index=None, id_col="doc_id",
            num_hashes=32, bands=16, threshold=0.5,
        ).select("new_id", "old_id", F.round("jaccard", 6)).collect())
    )
    assert via_fused == via_prebuilt
    # the exact-dup expansion really fired: every (new dup, old dup)
    # combination of the base-family group is present
    pairs = {(a, b) for a, b, _ in via_fused}
    for nn in ("n0", "n0dup"):
        for oo in ("o3", "o8dup", "o9dup"):
            assert (nn, oo) in pairs
