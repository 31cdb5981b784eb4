"""Classifier-evaluation / drift metrics vs independent numpy oracles.

The numpy side recomputes each metric from first principles (sorted
arrays, average tie ranks, explicit confusion counts) — no shared code
with the Spark implementation, so agreement is evidence, not tautology.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.evalmetrics import (
    calibration_bins,
    chi2_drift,
    classification_report,
    ks_statistic,
    psi_drift,
    roc_auc,
    spearman_rho,
    threshold_sweep,
)

N = 800


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """1-based average tie ranks, the classic way: sort, then average
    the rank range of each tie group."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _round6(x: float) -> float:
    return np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def scored(spark):
    """Deterministic (score, label, score2, group) rows with heavy
    ties: scores are small integers so every tie path is exercised."""
    rng = np.random.default_rng(42)
    score = rng.integers(0, 40, N)
    label = (rng.random(N) < 0.35 + 0.01 * (score > 20)).astype(int)
    score2 = score + rng.integers(-5, 6, N)
    group = np.where(rng.random(N) < 0.5, "a", "b")
    import pandas as pd

    pdf = pd.DataFrame(
        {"score": score, "label": label, "score2": score2, "grp": group}
    )
    return spark.createDataFrame(pdf).repartition(7), pdf


def test_roc_auc_matches_mann_whitney(scored):
    df, pdf = scored
    out = roc_auc(df, "score", "label", num_partitions=5).collect()[0]
    r = _avg_ranks(pdf["score"].to_numpy())
    pos = pdf["label"].to_numpy() == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = r[pos].sum() - n_pos * (n_pos + 1) / 2.0
    assert out["n_pos"] == n_pos and out["n_neg"] == n_neg
    assert out["auc"] == pytest.approx(_round6(u / (n_pos * n_neg)), abs=1e-9)


def test_roc_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, label int")
    row = roc_auc(df, "score", "label").collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0


def test_roc_auc_perfect_separation(spark):
    rows = [(float(i), int(i >= 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert roc_auc(df, "score", "label").collect()[0]["auc"] == 1.0


def test_threshold_sweep_confusion_counts(scored):
    df, pdf = scored
    rows = threshold_sweep(df, "score", "label", num_partitions=5).collect()
    s, lab = pdf["score"].to_numpy(), pdf["label"].to_numpy()
    assert len(rows) == len(np.unique(s))
    # thresholds descending
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths, reverse=True)
    for r in rows[:: max(1, len(rows) // 7)]:
        t = r["threshold"]
        pred = s >= t
        tp = int((pred & (lab == 1)).sum())
        fp = int((pred & (lab == 0)).sum())
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["fn"] == int(((~pred) & (lab == 1)).sum())
        assert r["tn"] == int(((~pred) & (lab == 0)).sum())
        assert r["precision"] == pytest.approx(_round6(tp / (tp + fp)), abs=1e-9)
        assert r["recall"] == pytest.approx(_round6(tp / lab.sum()), abs=1e-9)


def test_spearman_matches_pearson_on_avg_ranks(scored):
    df, pdf = scored
    row = spearman_rho(df, "score", "score2", num_partitions=5).collect()[0]
    rx = _avg_ranks(pdf["score"].to_numpy())
    ry = _avg_ranks(pdf["score2"].to_numpy())
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row["n"] == N
    assert row["rho"] == pytest.approx(_round6(rho), abs=1e-9)


def test_spearman_constant_column_is_null(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x int, y int")
    assert spearman_rho(df, "x", "y").collect()[0]["rho"] is None


def test_spearman_exact_monotone(spark):
    rows = [(i, i * i) for i in range(50)]
    df = spark.createDataFrame(rows, "x int, y long")
    assert spearman_rho(df, "x", "y").collect()[0]["rho"] == 1.0


def test_ks_statistic_matches_numpy(scored):
    df, pdf = scored
    row = ks_statistic(df, "score", "grp", "a", "b", num_partitions=5).collect()[0]
    va = np.sort(pdf.loc[pdf.grp == "a", "score"].to_numpy())
    vb = np.sort(pdf.loc[pdf.grp == "b", "score"].to_numpy())
    grid = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(va, grid, side="right") / len(va)
    fb = np.searchsorted(vb, grid, side="right") / len(vb)
    ks = np.abs(fa - fb).max()
    assert (row["n_a"], row["n_b"]) == (len(va), len(vb))
    assert row["ks"] == pytest.approx(_round6(ks), abs=1e-9)


def test_ks_identical_distributions_zero(spark):
    rows = [(v, g) for v in range(20) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v int, g string")
    assert ks_statistic(df, "v", "g", "a", "b").collect()[0]["ks"] == 0.0


def test_calibration_bins_partition_input(scored):
    df, pdf = scored
    # scale score into [0,1) so default bounds apply
    scaled = df.select(
        (F.col("score") / 40.0).alias("p"), F.col("label")
    )
    rows = calibration_bins(scaled, "p", "label", n_bins=8).collect()
    assert sum(r["n"] for r in rows) == N
    s = pdf["score"].to_numpy() / 40.0
    lab = pdf["label"].to_numpy()
    for r in rows:
        b = r["bin"]
        mask = np.clip(np.floor(s * 8), 0, 7).astype(int) == b
        assert r["n"] == int(mask.sum())
        assert r["n_pos"] == int(lab[mask].sum())
        assert r["frac_pos"] == pytest.approx(
            _round6(lab[mask].sum() / mask.sum()), abs=1e-9
        )


def test_calibration_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-0.5, 0), (0.5, 1), (1.5, 1)], "p double, label int"
    )
    rows = {r["bin"]: r for r in calibration_bins(df, "p", "label", n_bins=2).collect()}
    assert rows[0]["n"] == 1 and rows[1]["n"] == 2  # edges absorb


def test_classification_report_counts(spark):
    # 3-class toy with known confusion
    data = (
        [("en", "en")] * 10
        + [("en", "de")] * 3
        + [("de", "de")] * 6
        + [("de", "fr")] * 2
        + [("fr", "fr")] * 5
        + [("fr", "en")] * 1
    )
    df = spark.createDataFrame(data, "actual string, predicted string").repartition(4)
    rows = {r["label"]: r for r in classification_report(df, "actual", "predicted").collect()}
    assert (rows["en"]["tp"], rows["en"]["fp"], rows["en"]["fn"]) == (10, 1, 3)
    assert (rows["de"]["tp"], rows["de"]["fp"], rows["de"]["fn"]) == (6, 3, 2)
    assert (rows["fr"]["tp"], rows["fr"]["fp"], rows["fr"]["fn"]) == (5, 2, 1)
    assert rows["en"]["precision"] == pytest.approx(_round6(10 / 11), abs=1e-9)
    assert rows["en"]["recall"] == pytest.approx(_round6(10 / 13), abs=1e-9)
    assert rows["de"]["f1"] == pytest.approx(_round6(2 * 6 / (2 * 6 + 3 + 2)), abs=1e-9)


def test_classification_report_unseen_class_on_one_side(spark):
    df = spark.createDataFrame(
        [("en", "xx"), ("en", "en")], "actual string, predicted string"
    )
    rows = {r["label"]: r for r in classification_report(df, "actual", "predicted").collect()}
    assert rows["xx"]["tp"] == 0 and rows["xx"]["fp"] == 1 and rows["xx"]["fn"] == 0
    assert rows["xx"]["recall"] is None  # never actual


def test_partition_invariance(scored):
    """Exact metrics must not depend on physical partitioning."""
    df, _ = scored
    a = roc_auc(df.repartition(1), "score", "label", num_partitions=2).collect()[0]
    b = roc_auc(df.repartition(13), "score", "label", num_partitions=11).collect()[0]
    assert a == b
    ka = ks_statistic(df.repartition(1), "score", "grp", "a", "b", 2).collect()[0]
    kb = ks_statistic(df.repartition(13), "score", "grp", "a", "b", 7).collect()[0]
    assert ka == kb


def test_psi_matches_numpy(scored):
    df, pdf = scored
    scaled = df.select(
        (F.col("score") / 40.0).alias("p"), F.col("grp")
    )
    row = psi_drift(scaled, "p", "grp", "a", "b", n_bins=8).collect()[0]
    s = pdf["score"].to_numpy() / 40.0
    grp = pdf["grp"].to_numpy()
    bins = np.clip(np.floor(s * 8), 0, 7).astype(int)
    ca = np.bincount(bins[grp == "a"], minlength=8)
    cb = np.bincount(bins[grp == "b"], minlength=8)
    pa = (ca + 1) / (ca.sum() + 8)
    pb = (cb + 1) / (cb.sum() + 8)
    psi = float(((pa - pb) * np.log(pa / pb)).sum())
    assert (row["n_a"], row["n_b"]) == (int(ca.sum()), int(cb.sum()))
    assert row["psi"] == pytest.approx(_round6(psi), abs=2e-6)


def test_psi_identical_distributions_zero(spark):
    rows = [(v / 20.0, g) for v in range(20) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    assert psi_drift(df, "v", "g", "a", "b").collect()[0]["psi"] == 0.0


def test_psi_counts_empty_bins(spark):
    # group b concentrated in one bin, a uniform: empty-bin smoothing
    # must enter the sum (all 10 bins contribute, not just occupied)
    rows = [(v / 10.0, "a") for v in range(10)] + [(0.05, "b")] * 10
    df = spark.createDataFrame(rows, "v double, g string")
    row = psi_drift(df, "v", "g", "a", "b", n_bins=10).collect()[0]
    ca = np.ones(10)
    cb = np.zeros(10)
    cb[0] = 10
    pa = (ca + 1) / (ca.sum() + 10)
    pb = (cb + 1) / (cb.sum() + 10)
    expected = float(((pa - pb) * np.log(pa / pb)).sum())
    assert row["psi"] == pytest.approx(_round6(expected), abs=2e-6)


def test_chi2_matches_numpy(scored):
    df, pdf = scored
    labeled = df.select(
        F.when(F.col("score") < 13, "lo")
        .when(F.col("score") < 27, "mid")
        .otherwise("hi")
        .alias("band"),
        F.col("grp"),
    )
    row = chi2_drift(labeled, "band", "grp", "a", "b").collect()[0]
    s = pdf["score"].to_numpy()
    band = np.where(s < 13, "lo", np.where(s < 27, "mid", "hi"))
    grp = pdf["grp"].to_numpy()
    cats = np.unique(band)
    obs = np.array(
        [
            [(band[grp == g] == c).sum() for c in cats]
            for g in ("a", "b")
        ],
        dtype=float,
    )
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert row["n_categories"] == len(cats)
    assert row["chi2"] == pytest.approx(_round6(chi2), abs=2e-6)
    assert row["cramers_v"] == pytest.approx(_round6(np.sqrt(chi2 / n)), abs=2e-6)


def test_chi2_degenerate(spark):
    one_cat = spark.createDataFrame(
        [("x", "a"), ("x", "b")], "c string, g string"
    )
    row = chi2_drift(one_cat, "c", "g", "a", "b").collect()[0]
    assert row["chi2"] is None and row["n_categories"] == 1
    empty_b = spark.createDataFrame(
        [("x", "a"), ("y", "a")], "c string, g string"
    )
    assert chi2_drift(empty_b, "c", "g", "a", "b").collect()[0]["chi2"] is None


def test_chi2_independent_is_zero(spark):
    # identical category mix in both groups -> exp == obs -> chi2 == 0
    rows = [(c, g) for c in ("x", "y", "z") for g in ("a", "b") for _ in range(7)]
    df = spark.createDataFrame(rows, "c string, g string")
    assert chi2_drift(df, "c", "g", "a", "b").collect()[0]["chi2"] == 0.0


# ---- ndcg_at_k -------------------------------------------------------

def test_ndcg_hand_computed(spark):
    import math

    from eventanalysis_spark.operators.evalmetrics import ndcg_at_k

    # q1: system ranks rel=[3,2,0] (by score); ideal is [3,2,0] -> ndcg<1
    rows = [
        ("q1", "a", 0.9, 3), ("q1", "b", 0.8, 2), ("q1", "c", 0.7, 0),
        # q2: system puts the irrelevant doc first -> penalized
        ("q2", "x", 0.9, 0), ("q2", "y", 0.8, 2),
        # q3: nothing relevant -> NULL ndcg
        ("q3", "m", 0.5, 0), ("q3", "n", 0.4, 0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id string, score double, rel int"
    )
    got = {r["query_id"]: r for r in ndcg_at_k(df, k=10).collect()}

    def dcg(rels):
        return sum((2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(rels))

    assert abs(got["q1"]["dcg"] - round(dcg([3, 2, 0]), 6)) < 1e-9
    assert abs(got["q1"]["ndcg"] - 1.0) < 1e-9  # system order IS ideal
    exp2 = dcg([0, 2]) / dcg([2, 0])
    assert abs(got["q2"]["ndcg"] - round(exp2, 6)) < 1e-9
    assert got["q3"]["ndcg"] is None and got["q3"]["idcg"] == 0.0


def test_ndcg_k_cutoff_and_partition_invariance(spark):
    from eventanalysis_spark.operators.evalmetrics import ndcg_at_k

    # rel-3 doc ranked at position 3: k=2 misses it in DCG but IDCG@2
    # counts it first -> ndcg drops vs k=3
    rows = [("q", "a", 0.9, 1), ("q", "b", 0.8, 1), ("q", "c", 0.7, 3)]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id string, score double, rel int"
    )
    n2 = ndcg_at_k(df, k=2).collect()[0]["ndcg"]
    n3 = ndcg_at_k(df, k=3).collect()[0]["ndcg"]
    assert n2 < n3
    big = spark.createDataFrame(
        [(f"q{i % 7}", f"d{i}", float((i * 37) % 101), (i * 13) % 4)
         for i in range(200)],
        "query_id string, doc_id string, score double, rel int",
    )
    a = ndcg_at_k(big.repartition(9), k=5).collect()
    b = ndcg_at_k(big.coalesce(1), k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_retrieval_metrics_hand_computed(spark):
    from eventanalysis_spark.operators.evalmetrics import retrieval_metrics

    rows = [
        # q1 ranking: rel, irrel, rel -> rr=1, ap=(1/1 + 2/3)/2
        ("q1", "a", 0.9, 1), ("q1", "b", 0.8, 0), ("q1", "c", 0.7, 2),
        # q2: first relevant at rank 2 of 2
        ("q2", "x", 0.9, 0), ("q2", "y", 0.8, 1),
        # q3: nothing relevant
        ("q3", "m", 0.5, 0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id string, score double, rel int"
    )
    got = {r["query_id"]: r for r in retrieval_metrics(df, k=2).collect()}
    q1 = got["q1"]
    assert q1["n_relevant"] == 2 and q1["rr"] == 1.0
    assert abs(q1["ap"] - round((1.0 + 2 / 3) / 2, 6)) < 1e-9
    assert q1["precision_k"] == 0.5 and q1["recall_k"] == 0.5  # top-2 has 1 rel
    q2 = got["q2"]
    assert q2["rr"] == 0.5 and q2["ap"] == 0.5
    assert q2["precision_k"] == 0.5 and q2["recall_k"] == 1.0
    q3 = got["q3"]
    assert q3["rr"] == 0.0 and q3["ap"] is None and q3["recall_k"] is None
    assert q3["precision_k"] == 0.0
