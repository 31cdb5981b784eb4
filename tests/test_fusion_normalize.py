"""Tests: RRF fusion (operators/fusion.py), unicode normalization
(operators/normalize.py), leakage-safe split (cluster.split_leakage_safe)."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.fusion import rrf_fuse
from eventanalysis_spark.operators.normalize import normalize_py, normalize_text


def _lists(spark):
    # two tiny retrieval lists with a shared doc (7), a bm25-only doc (1)
    # and a dense-only doc (9)
    bm = spark.createDataFrame(
        [(7, 3.5), (1, 2.0), (4, 1.0)], "doc_id long, bm25 double"
    )
    dn = spark.createDataFrame(
        [(7, 0.99), (9, 0.55), (4, 0.10)], "doc_id long, cos double"
    )
    return bm, dn


def test_rrf_fuse_matches_hand_formula(spark):
    bm, dn = _lists(spark)
    out = rrf_fuse({"bm25": bm, "dense": dn}, id_col="doc_id", k=60)
    got = {r["doc_id"]: r for r in out.collect()}
    # ranks: bm25 7→1, 1→2, 4→3; dense 7→1, 9→2, 4→3
    import math

    def rrf(*ranks):
        raw = sum(1.0 / (60 + r) for r in ranks)
        return math.floor(raw * 1e6 + 0.5) / 1e6

    assert got[7]["rrf_score"] == rrf(1, 1)
    assert got[4]["rrf_score"] == rrf(3, 3)
    assert got[1]["rrf_score"] == rrf(2)
    assert got[9]["rrf_score"] == rrf(2)
    # missing-list sentinel, never NULL
    assert got[1]["dense_rank"] == -1 and got[9]["bm25_rank"] == -1
    assert got[7]["bm25_rank"] == 1 and got[7]["dense_rank"] == 1
    # shared docs outrank single-list docs; output ordered (score desc, id)
    ids = [r["doc_id"] for r in out.collect()]
    assert ids[0] == 7
    assert ids == sorted(
        ids, key=lambda i: (-got[i]["rrf_score"], i)
    )


def test_rrf_topk_and_validation(spark):
    bm, dn = _lists(spark)
    assert rrf_fuse({"a": bm, "b": dn}, id_col="doc_id", topk=2).count() == 2
    with pytest.raises(ValueError):
        rrf_fuse({}, id_col="doc_id")
    with pytest.raises(ValueError):
        rrf_fuse({"a": bm}, id_col="doc_id", k=0)


def test_normalize_text_nfc(spark):
    rows = [
        (0, "plain ascii"),
        (1, "cafe\u0301"),      # decomposed -> composed e-acute
        (2, "caf\u00e9"),       # already NFC
        (3, "A\u030a \ufb01ne"),  # ring composes; fi ligature survives NFC
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["nfc_changed"])
        for r in normalize_text(df).collect()
    }
    assert got[0] == ("plain ascii", False)
    assert got[1] == ("caf\u00e9", True)
    assert got[2] == ("caf\u00e9", False)
    assert got[3] == ("\u00c5 \ufb01ne", True)
    assert got[4] == (None, None)
    # python twin agrees (same unicodedata tables)
    by_id = dict(rows)
    for _id, (text, _ch) in got.items():
        if text is not None:
            assert text == normalize_py(by_id[_id])
            assert unicodedata.is_normalized("NFC", text)


def test_normalize_form_validation():
    from eventanalysis_spark.operators.normalize import unicode_normalize

    with pytest.raises(ValueError):
        unicode_normalize(F.col("x"), form="NFX")


def test_split_leakage_safe_clusters_stay_together(spark):
    from eventanalysis_spark.operators.cluster import split_leakage_safe

    # 3 near-dup families (identical texts) + singletons
    rows = []
    for i in range(30):
        fam = i % 3
        if i < 24:
            rows.append((i, f"family {fam} body text repeated tokens " * 5))
        else:
            rows.append((i, f"unique singleton document number {i} " * 4))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_safe(
        df, {"train": 0.5, "test": 0.5}, text_col="text", id_col="doc_id",
        num_hashes=32, bands=16, shingle_k=3, threshold=0.5,
    ).collect()
    assert len(out) == 30
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # every cluster lands wholly in ONE split — the leakage property
    assert all(len(s) == 1 for s in by_cluster.values())
    # the three families really did cluster (24 docs, 3 clusters)
    fam_clusters = [c for c, _ in by_cluster.items() if c < 3]
    assert len(fam_clusters) == 3
    # determinism: same input → same assignment
    out2 = split_leakage_safe(
        df, {"train": 0.5, "test": 0.5}, text_col="text", id_col="doc_id",
        num_hashes=32, bands=16, shingle_k=3, threshold=0.5,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
