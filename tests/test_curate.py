"""Corpus-curation composition tests (operators/curate.py)."""

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.operators.curate import (
    CurationConfig,
    curate_corpus,
    curation_report,
)

GOOD = " ".join(["the", "and", "with"] + ["word%d" % i for i in range(60)])
GOOD2 = " ".join(["the", "and", "with"] + ["word%d" % i for i in range(59)] + ["tail"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),                     # keeper, representative of {1,2,3}
        (2, GOOD),                     # exact dup of 1
        (3, GOOD2),                    # near dup of 1
        (4, "too short"),              # fails quality
        (5, "the and with secret eval answer key " +
            " ".join("filler%02d" % i for i in range(55))),   # contaminated
        (6, "the and with " + " ".join("unique%02d" % i for i in range(60))),  # keeper
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [(100, "the secret eval answer key is hidden")],
        "doc_id long, text string",
    )


def test_curate_flags_and_keep(spark, corpus, bench_df):
    cfg = CurationConfig(
        jaccard_threshold=0.5, decontaminate_k=3, decontaminate_threshold=2
    )
    got = {
        r["doc_id"]: r
        for r in curate_corpus(corpus, benchmark=bench_df, config=cfg).collect()
    }
    assert got[1]["keep"] is True and got[1]["is_representative"] is True
    assert got[2]["keep"] is False and got[2]["cluster_id"] == 1
    assert got[3]["keep"] is False and got[3]["cluster_id"] == 1
    assert got[4]["keep"] is False and got[4]["ok_quality"] is False
    assert got[5]["keep"] is False and got[5]["is_contaminated"] is True
    assert got[5]["n_contaminated_ngrams"] >= 2
    assert got[6]["keep"] is True


def test_curation_report(spark, corpus, bench_df):
    cfg = CurationConfig(
        jaccard_threshold=0.5, decontaminate_k=3, decontaminate_threshold=2
    )
    flagged = curate_corpus(corpus, benchmark=bench_df, config=cfg)
    rep = curation_report(flagged).collect()[0]
    assert rep["n_total"] == 6
    assert rep["n_kept"] == 2
    assert rep["n_dropped_quality"] == 1      # doc 4
    assert rep["n_dropped_duplicate"] == 2    # docs 2, 3
    assert rep["n_dropped_contaminated"] == 1 # doc 5
    assert rep["n_dropped_sampled_out"] == 0
    # attribution partitions the drops exactly
    assert (
        rep["n_kept"] + rep["n_dropped_quality"] + rep["n_dropped_duplicate"]
        + rep["n_dropped_contaminated"] + rep["n_dropped_sampled_out"]
    ) == rep["n_total"]


def test_curate_sampling_gate(spark, corpus):
    cfg = CurationConfig(quality=False, dedup=False, sample_rate=0.5)
    flagged = curate_corpus(corpus, config=cfg)
    rows = flagged.collect()
    # no benchmark / quality / dedup: keep == in_sample
    assert all(r["keep"] == r["in_sample"] for r in rows)
    # determinism: same sample on re-run
    again = {r["doc_id"]: r["in_sample"] for r in curate_corpus(corpus, config=cfg).collect()}
    assert {r["doc_id"]: r["in_sample"] for r in rows} == again


def test_curate_defaults_no_benchmark(spark, corpus):
    flagged = curate_corpus(corpus, config=CurationConfig(jaccard_threshold=0.5))
    got = {r["doc_id"]: r for r in flagged.collect()}
    assert all(r["is_contaminated"] is False for r in got.values())
    assert got[5]["keep"] is True  # nothing to contaminate against
