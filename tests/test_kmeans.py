"""k-means / SemDeDup / prototypicality pruning (operators/kmeans.py)
against pure-Python replicas on deterministic synthetic vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
    prototypicality_prune,
    semdedup,
)

DIM = 8
N = 120


def _vec(i: int) -> list[float]:
    # counter-mode deterministic pseudo-random-ish vectors with three
    # coarse directions so the clustering has structure
    base = [0.0] * DIM
    base[i % 3] = 3.0
    return [
        round(base[j] + math.sin(0.7 * i + 1.3 * j) * 0.9, 6)
        for j in range(DIM)
    ]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _py_fit(vecs: dict[int, list[float]], k: int, iters: int):
    import hashlib

    seeds = sorted(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:k]
    cents = {cid: list(vecs[cid]) for cid in seeds}

    def assign_all():
        out = {}
        for i, v in vecs.items():
            best = None
            for cid in sorted(cents):
                c = cents[cid]
                vv = 0.0
                for x in v:
                    vv += x * x
                vc = 0.0
                for x, y in zip(v, c):
                    vc += x * y
                cc = 0.0
                for y in c:
                    cc += y * y
                d = vv - 2 * vc + cc
                if best is None or (d, cid) < best:
                    best = (d, cid)
            out[i] = best
        return out

    for _ in range(iters):
        a = assign_all()
        sums = {cid: [0.0] * len(next(iter(vecs.values()))) for cid in cents}
        counts = {cid: 0 for cid in cents}
        for i, (_, cid) in a.items():
            counts[cid] += 1
            for j, x in enumerate(vecs[i]):
                sums[cid][j] += x
        for cid in cents:
            if counts[cid]:
                cents[cid] = [
                    round(s / counts[cid], 6) for s in sums[cid]
                ]
    return cents, assign_all()


def test_fit_matches_pure_python(spark, emb):
    got = dict(kmeans_fit(emb, k=3, iterations=2))
    vecs = {i: _vec(i) for i in range(N)}
    want, _ = _py_fit(vecs, k=3, iters=2)
    assert set(got) == set(want)
    for cid in want:
        assert got[cid] == pytest.approx(want[cid], abs=1e-9)


def test_fit_partition_invariant(spark, emb):
    """Rounded per-iteration centroids pin the fit across partitionings
    (raw float sums would differ in the last ULP)."""
    a = kmeans_fit(emb.repartition(1), k=3, iterations=2)
    b = kmeans_fit(emb.repartition(7), k=3, iterations=2)
    assert a == b


def test_assign_matches_pure_python(spark, emb):
    cents = kmeans_fit(emb, k=3, iterations=2)
    got = {
        r["vec_id"]: (r["cid"], r["__d"])
        for r in kmeans_assign(emb, cents).collect()
    }
    vecs = {i: _vec(i) for i in range(N)}
    _, a = _py_fit(vecs, k=3, iters=2)
    for i, (d, cid) in a.items():
        assert got[i][0] == cid
        assert got[i][1] == pytest.approx(d, abs=1e-9)


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two identical seed vectors -> after the first update both
    centroids coincide and every point tie-breaks to the smaller cid,
    so the other cluster goes empty and must keep its centroid."""
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = dict(kmeans_fit(df, k=3, iterations=3))
    assert len(cents) == 3  # k never shrinks
    a = kmeans_assign(df, sorted(cents.items())).collect()
    assert all(r["__d"] >= 0 or abs(r["__d"]) < 1e-9 for r in a)


def test_semdedup_matches_brute_force(spark, emb):
    tau = 0.97
    cents = kmeans_fit(emb, k=3, iterations=2)
    got = {r["vec_id"]: r["keep"] for r in semdedup(emb, tau, centroids=cents).collect()}
    vecs = {i: _vec(i) for i in range(N)}
    _, a = _py_fit(vecs, k=3, iters=2)

    def cos(u, v):
        num = sum(x * y for x, y in zip(u, v))
        return num / (
            math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(y * y for y in v))
        )

    dropped = 0
    for i in vecs:
        want_keep = not any(
            j < i and a[j][1] == a[i][1] and cos(vecs[i], vecs[j]) >= tau
            for j in vecs
        )
        assert got[i] == want_keep, i
        dropped += 0 if want_keep else 1
    assert 0 < dropped < N  # threshold actually bites, but not everything


def test_prune_keeps_exact_per_cluster_fraction(spark, emb):
    cents = kmeans_fit(emb, k=3, iterations=2)
    out = prototypicality_prune(emb, keep_fraction=0.5, centroids=cents)
    per = (
        out.groupBy("cid")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
        )
        .collect()
    )
    assert per
    for r in per:
        assert r["kept"] == math.ceil(0.5 * r["n"])
    # kept rows are the FARTHEST ones: min kept dist >= max dropped dist
    kept_min = out.where("keep").groupBy("cid").agg(F.min("dist_sq").alias("m"))
    drop_max = out.where("NOT keep").groupBy("cid").agg(F.max("dist_sq").alias("x"))
    joined = kept_min.join(drop_max, "cid").collect()
    for r in joined:
        assert r["m"] >= r["x"]


def test_prune_quantile_method_close_to_rank(spark, emb):
    cents = kmeans_fit(emb, k=3, iterations=2)
    rank = prototypicality_prune(emb, 0.5, centroids=cents, method="rank")
    quant = prototypicality_prune(emb, 0.5, centroids=cents, method="quantile")
    nr = rank.where("keep").count()
    nq = quant.where("keep").count()
    assert abs(nr - nq) <= 0.1 * N  # sketch-accurate at the boundary


# ---- product quantization ---------------------------------------------------


def _py_pq_encode(v, books, sub):
    codes = []
    for j, cb in enumerate(books):
        s = v[j * sub:(j + 1) * sub]
        best = None
        for cid, c in cb:
            dot = 0.0
            cc = 0.0
            for x, y in zip(s, c):
                dot += float(x) * float(y)
            for x in c:
                cc += float(x) * float(x)
            score = -2 * dot + cc
            if best is None or (score, cid) < best:
                best = (score, cid)
        codes.append(best[1])
    return tuple(codes)


def test_pq_encode_matches_python_replica(spark, emb):
    from eventanalysis_spark.operators.kmeans import pq_encode, pq_fit

    books = pq_fit(emb, m=2, k_sub=4, iterations=2, dim=DIM)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    sub = DIM // 2
    got = {r.vec_id: (r.code_0, r.code_1) for r in pq_encode(emb, books).collect()}
    for i in range(N):
        assert got[i] == _py_pq_encode(_vec(i), books, sub), f"vec {i}"


def test_pq_topk_adc_matches_python_replica(spark, emb):
    from eventanalysis_spark.operators.kmeans import pq_fit, pq_topk

    books = pq_fit(emb, m=2, k_sub=4, iterations=2, dim=DIM)
    sub = DIM // 2
    q = _vec(7)

    def adc(v):
        codes = _py_pq_encode(v, books, sub)
        d = 0.0
        terms = []
        for j, code in enumerate(codes):
            qs = q[j * sub:(j + 1) * sub]
            c = dict(books[j])[code]
            dq = 0.0
            for x in qs:
                dq += x * x
            dqc = 0.0
            for x, y in zip(qs, c):
                dqc += x * y
            cc = 0.0
            for x in c:
                cc += x * x
            terms.append(dq - 2.0 * dqc + cc)
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        return round(d, 6)

    expect = sorted(((adc(_vec(i)), i) for i in range(N)))[:10]
    got = [(r.approx_dist, r.vec_id) for r in pq_topk(emb, books, q, k=10).collect()]
    assert got == expect


def test_pq_topk_overlaps_exact_topk(spark, emb):
    """ADC is approximate; on the 3-cluster fixture the PQ top-10 must
    still share most of the exact squared-L2 top-10."""
    from eventanalysis_spark.operators.kmeans import pq_fit, pq_topk

    books = pq_fit(emb, m=2, k_sub=4, iterations=2, dim=DIM)
    q = _vec(7)

    def l2(v):
        return sum((x - y) ** 2 for x, y in zip(v, q))

    exact = {i for _, i in sorted(((l2(_vec(i)), i) for i in range(N)))[:10]}
    approx = {r.vec_id for r in pq_topk(emb, books, q, k=10).collect()}
    assert len(exact & approx) >= 5


def test_ivfpq_equals_pq_when_probing_all_cells(spark, emb):
    """nprobe == n_centroids means no pruning: IVFADC must return exactly
    the full-scan ADC top-k (same codebooks, same query)."""
    from eventanalysis_spark.operators.kmeans import ivfpq_topk, pq_fit, pq_topk

    q = _vec(0)
    books = pq_fit(emb, m=2, k_sub=4, iterations=2, dim=DIM)
    full = [(r.vec_id, r.approx_dist)
            for r in pq_topk(emb, books, q, k=10).collect()]
    got = [(r.vec_id, r.approx_dist)
           for r in ivfpq_topk(
               emb, q, k=10, n_centroids=6, nprobe=6,
               m=2, k_sub=4, iterations=2, dim=DIM, codebooks=books,
           ).collect()]
    assert got == full


def test_ivfpq_matches_python_replica_on_probed_cells(spark, emb):
    """nprobe < n_centroids: result must equal the pure-Python IVFADC —
    hash-sampled coarse codebook, argmin-L2 cell assignment, driver probe
    ranking, ADC over probed cells only."""
    import hashlib

    from eventanalysis_spark.operators.kmeans import (
        _fold_dot, ivfpq_topk, pq_fit,
    )

    vecs = {i: _vec(i) for i in range(N)}
    q = _vec(7)
    n_cent, nprobe = 6, 2

    # coarse codebook: smallest md5(id) ranks (similarity.ivf_centroids)
    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    coarse = [(i, vecs[i]) for i in sorted(ids[:n_cent])]

    def l2(a, b):
        return _fold_dot(a, a) - 2.0 * _fold_dot(a, b) + _fold_dot(b, b)

    probes = [cid for _, cid in sorted((l2(q, c), cid) for cid, c in coarse)][:nprobe]
    cell = {i: min(((l2(v, c), cid) for cid, c in coarse))[1]
            for i, v in vecs.items()}
    members = [i for i in vecs if cell[i] in probes]
    assert 0 < len(members) < N  # pruning actually happened

    books = pq_fit(emb, m=2, k_sub=4, iterations=2, dim=DIM)
    sub = DIM // 2

    def adc(i):
        v = vecs[i]
        total = 0.0
        for j, cb in enumerate(books):
            qs = q[j * sub:(j + 1) * sub]
            vsub = v[j * sub:(j + 1) * sub]
            best = min(((l2(vsub, c), cid) for cid, c in cb))[1]
            c = dict(cb)[best]
            total += l2(qs, c)
        return round(total, 6)

    want = sorted(((adc(i), i) for i in members))[:10]
    got = [(r.approx_dist, r.vec_id)
           for r in ivfpq_topk(
               emb, q, k=10, n_centroids=n_cent, nprobe=nprobe,
               m=2, k_sub=4, iterations=2, dim=DIM, codebooks=books,
           ).collect()]
    assert got == want


# ---- bitext margin mining (similarity.py) ----------------------------

def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_bitext_margin_hand_computed(spark):
    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    # a0 ~ b0 (strong aligned pair, margin 1.59); a1 has only a weak
    # match (margin 1.32) -> a threshold between them keeps just a0
    a = _emb(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
    b = _emb(spark, [(100, [0.999, 0.01, 0.0]),
                     (101, [0.5, 0.5, 0.7]),
                     (102, [0.0, 0.0, 1.0])])
    all_best = {r["a_id"]: r for r in bitext_margin_pairs(
        a, b, k=2, margin_threshold=0.0, mutual=False
    ).collect()}
    assert all_best[0]["b_id"] == 100 and all_best[0]["cos_sim"] > 0.99
    assert all_best[1]["b_id"] == 101
    assert all_best[0]["margin"] > all_best[1]["margin"]
    gated = {r["a_id"] for r in bitext_margin_pairs(
        a, b, k=2, margin_threshold=1.4, mutual=False
    ).collect()}
    assert gated == {0}


def test_bitext_margin_mutual_and_k1_degenerate(spark):
    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    # k=1 degenerates BY CONSTRUCTION: for a mutual best pair both
    # neighborhood averages equal the pair cosine, so margin == 1.0
    a = _emb(spark, [(0, [1.0, 0.2, 0.0]), (1, [0.0, 1.0, 0.0])])
    b = _emb(spark, [(100, [0.7, 0.7, 0.1]), (101, [0.0, 1.0, 0.0])])
    rows = bitext_margin_pairs(a, b, k=1, margin_threshold=0.0,
                               mutual=True).collect()
    assert {r["a_id"]: r["b_id"] for r in rows} == {0: 100, 1: 101}
    assert all(r["margin"] == 1.0 for r in rows)
    # k=2 discriminates: the exact a1-b101 match (weak 2nd neighbor)
    # out-margins the hub pair a0-b100
    m = {r["a_id"]: r["margin"] for r in bitext_margin_pairs(
        a, b, k=2, margin_threshold=0.0, mutual=True
    ).collect()}
    assert m[1] > m[0]


def test_bitext_margin_partition_invariance(spark):
    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    import random
    rng = random.Random(7)
    a = _emb(spark, [(i, [rng.uniform(-1, 1) for _ in range(8)])
                     for i in range(30)])
    b = _emb(spark, [(100 + i, [rng.uniform(-1, 1) for _ in range(8)])
                     for i in range(30)])
    r1 = bitext_margin_pairs(a.repartition(7), b.coalesce(1), k=3,
                             margin_threshold=1.0).collect()
    r2 = bitext_margin_pairs(a.coalesce(1), b.repartition(5), k=3,
                             margin_threshold=1.0).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert len(r1) > 0


def test_bitext_margin_candidates_path(spark):
    """candidates= restricts scoring to the given pairs; with the FULL
    pair set it reproduces the brute result exactly, and with a pruned
    set only surviving pairs are considered."""
    import random

    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    rng = random.Random(3)
    a = _emb(spark, [(i, [rng.uniform(-1, 1) for _ in range(8)])
                     for i in range(20)])
    b = _emb(spark, [(100 + i, [rng.uniform(-1, 1) for _ in range(8)])
                     for i in range(20)])
    brute = bitext_margin_pairs(a, b, k=3, margin_threshold=1.0)
    full_cands = spark.createDataFrame(
        [(i, 100 + j) for i in range(20) for j in range(20)],
        "a_id long, b_id long",
    )
    via_cands = bitext_margin_pairs(
        a, b, k=3, margin_threshold=1.0, candidates=full_cands
    )
    assert sorted(map(tuple, brute.collect())) == sorted(
        map(tuple, via_cands.collect())
    )
    # prune to pairs with matching parity: only those can be mined
    pruned = full_cands.where("(a_id % 2) = (b_id % 2)")
    got = bitext_margin_pairs(
        a, b, k=3, margin_threshold=0.0, candidates=pruned
    ).collect()
    assert len(got) > 0
    assert all((r["a_id"] % 2) == (r["b_id"] % 2) for r in got)


def test_pq_fit_fused_equals_per_subspace_kmeans(spark, emb):
    """The round-6 fused pq_fit (one seed collect + one assign/means job
    per iteration across all subspaces) must reproduce the per-subspace
    kmeans_fit codebooks EXACTLY — same seeds, same argmin, same
    round(avg, 6) updates per (subspace, cid) group."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.kmeans import kmeans_fit, pq_fit

    m, sub = 2, DIM // 2
    fused = pq_fit(emb, m=m, k_sub=4, iterations=2, dim=DIM)
    for j in range(m):
        sliced = emb.select(
            F.col("vec_id"),
            F.expr(
                f"slice(CAST(`embedding` AS ARRAY<DOUBLE>), {j * sub + 1}, {sub})"
            ).alias("__sub"),
        )
        ref = kmeans_fit(
            sliced, k=4, iterations=2, id_col="vec_id", vec_col="__sub"
        )
        assert fused[j] == ref, f"subspace {j}"


def test_bitext_brute_arrow_preserves_string_ids(spark):
    """The Arrow brute-pair kernel must be id-type-agnostic: ids are
    repeated/tiled via Arrow take, never cast — a long cast would NULL
    string ids silently (regression: the explain-audit's url-keyed
    bitext section crashed on int64 coercion)."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    a = spark.createDataFrame(
        [("u/a0", [1.0, 0.2, 0.0]), ("u/a1", [0.0, 1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    b = spark.createDataFrame(
        [("u/b0", [0.7, 0.7, 0.1]), ("u/b1", [0.0, 1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    rows = bitext_margin_pairs(
        a, b, k=1, margin_threshold=0.0, mutual=True
    ).collect()
    assert {r["a_id"]: r["b_id"] for r in rows} == {
        "u/a0": "u/b0", "u/a1": "u/b1"
    }
    # brute (Arrow) path equals the candidates (Catalyst) path on the
    # same full pair set — same cosines, same margins, string ids intact
    full = (
        a.select(F.col("vec_id").alias("a_id"))
        .crossJoin(b.select(F.col("vec_id").alias("b_id")))
    )
    via_cands = bitext_margin_pairs(
        a, b, k=1, margin_threshold=0.0, mutual=True, candidates=full
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, via_cands))


def test_bitext_brute_prune_equals_exhaustive(spark):
    """topk_prune must be output-invisible: the pruned brute kernel
    feeds the margin windows a provable superset of each side's rounded
    top-k rows, so results equal the exhaustive candidates path —
    stressed with exact cosine ties (duplicate vectors) and k larger
    than a side. (Zero-norm vectors are covered by the containment test
    below: the Catalyst candidates path cannot score them at all under
    ANSI division, so no cross-path equality is definable there.)"""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    a_rows = (
        [(i, [1.0, float(i % 3), 0.5]) for i in range(8)]
        + [(8, [1.0, 0.0, 0.5]), (9, [1.0, 0.0, 0.5])]
    )
    b_rows = (
        [(100 + i, [1.0, float(i % 4), 0.25]) for i in range(12)]
        + [(112, [1.0, 0.0, 0.25]), (113, [1.0, 0.0, 0.25])]
    )
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    full = (
        a.select(F.col("vec_id").alias("a_id"))
        .crossJoin(b.select(F.col("vec_id").alias("b_id")))
    )
    for k in (1, 2, 4, 50):  # 50 > |B|: prune must keep everything
        for mutual in (True, False):
            got = sorted(map(tuple, bitext_margin_pairs(
                a, b, k=k, margin_threshold=0.0, mutual=mutual
            ).collect()))
            ref = sorted(map(tuple, bitext_margin_pairs(
                a, b, k=k, margin_threshold=0.0, mutual=mutual,
                candidates=full,
            ).collect()))
            assert got == ref, (k, mutual)


def test_bitext_prune_containment_with_nan(spark):
    """The pruned kernel's emitted set must contain, per side, every
    row of the unpruned kernel's rounded top-K under Spark's ordering
    (round6 DESC, NaN greatest, id ASC) — including NaN cosines from a
    zero-norm vector, which Spark ranks above every double."""
    import math

    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.similarity import (
        _brute_pair_cosines_arrow,
    )

    a_rows = [(i, [1.0, float(i % 3), 0.5]) for i in range(6)] + [
        (6, [0.0, 0.0, 0.0])  # zero vector -> NaN cosines
    ]
    b_rows = [(100 + i, [1.0, float(i % 4), 0.25]) for i in range(9)] + [
        (109, [0.0, 0.0, 0.0])
    ]
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    K = 3

    def key(cos, other):  # Spark ordering: NaN greatest, then id asc
        big = float("inf") if (cos is not None and math.isnan(cos)) else (
            round(cos, 6) if cos is not None else -float("inf"))
        return (-big, other)

    fullr = _brute_pair_cosines_arrow(a, b, "vec_id", "embedding").collect()
    pruned = {(r["a_id"], r["b_id"]) for r in _brute_pair_cosines_arrow(
        a, b, "vec_id", "embedding", topk_prune=K).collect()}
    by_a, by_b = {}, {}
    for r in fullr:
        by_a.setdefault(r["a_id"], []).append(r)
        by_b.setdefault(r["b_id"], []).append(r)
    for aid, rows in by_a.items():
        rows.sort(key=lambda r: key(r["__cos"], r["b_id"]))
        for r in rows[:K]:
            assert (r["a_id"], r["b_id"]) in pruned, ("a-side", aid, r)
    for bid, rows in by_b.items():
        rows.sort(key=lambda r: key(r["__cos"], r["a_id"]))
        for r in rows[:K]:
            assert (r["a_id"], r["b_id"]) in pruned, ("b-side", bid, r)


def test_pq_kernel_preserves_string_ids_and_null_vectors(spark):
    """The PQ/kmeans Arrow kernel must carry ids opaquely (no long
    cast: string ids crashed under ANSI) and must reproduce the retired
    Catalyst argmin's NULL handling — a NULL embedding row yields NULL
    codes (and is dropped by the IVF probe filter), never a reshape
    crash or silent row misalignment."""
    from pyspark.sql import functions as F

    from eventanalysis_spark.operators.kmeans import (
        pq_assign_codes_arrow, pq_encode,
    )

    cb = [[(0, [0.0, 0.0]), (1, [1.0, 1.0])],
          [(0, [0.0, 0.0]), (1, [2.0, 2.0])]]
    emb = spark.createDataFrame(
        [("u/a", [0.1, 0.2, 1.9, 2.1]), ("u/b", [0.9, 1.1, 0.1, 0.0]),
         ("u/null", None)],
        "vec_id string, embedding array<double>",
    )
    got = {r["vec_id"]: (r["code_0"], r["code_1"])
           for r in pq_assign_codes_arrow(emb, cb, "vec_id").collect()}
    assert set(got) == {"u/a", "u/b", "u/null"}
    assert got["u/null"] == (None, None)
    ref = {r["vec_id"]: (r["code_0"], r["code_1"])
           for r in pq_encode(emb.where(F.col("embedding").isNotNull()),
                              cb, id_col="vec_id").collect()}
    for k, v in ref.items():
        assert got[k] == v, k
    # coarse mode drops the null row (a NULL cell never matches probes)
    coarse = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])]
    probed = {r["vec_id"] for r in pq_assign_codes_arrow(
        emb, cb, "vec_id", coarse=coarse, probes=[0, 1]).collect()}
    assert probed == {"u/a", "u/b"}


def test_bitext_null_vectors_dropped_like_baseline(spark):
    """NULL embedding rows must not crash the pair kernel; they are
    dropped — identical output to the old crossJoin baseline, where
    their NULL cosines ranked last and NULL margins never passed the
    threshold."""
    from eventanalysis_spark.operators.similarity import bitext_margin_pairs

    a = spark.createDataFrame(
        [(0, [1.0, 0.2, 0.0]), (1, [0.0, 1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(100, [0.7, 0.7, 0.1]), (101, [0.0, 1.0, 0.0]), (102, None)],
        "vec_id long, embedding array<double>",
    )
    rows = bitext_margin_pairs(a, b, k=1, margin_threshold=0.0,
                               mutual=True).collect()
    assert {r["a_id"]: r["b_id"] for r in rows} == {0: 100, 1: 101}
