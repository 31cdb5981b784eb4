"""End-to-end training-corpus curation: the composition every web-scale
data pipeline runs — quality gate → duplicate-cluster collapse →
benchmark decontamination → deterministic sampling — expressed as ONE
flagged pass over the corpus.

Design for 100 TB:
  - every stage contributes a FLAG column instead of materializing an
    intermediate corpus: quality is a narrow projection, dedup joins a
    component table bounded by the number of duplicated docs,
    decontamination is a broadcast gram-set intersect, sampling is a
    narrow hash filter — the corpus itself is scanned once and never
    cached;
  - the audit report (docs dropped per reason) is ONE map-side-partial
    aggregate over the flags, not a count() per stage;
  - everything is deterministic (md5-bucket sampling, min-id cluster
    labels, seeded minhash), so retries, resumes, and cluster resizes
    reproduce the same curated corpus bit for bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    """Knobs for curate_corpus. Defaults mirror the published heuristics
    (Gopher quality windows, 0.8 near-dup Jaccard, 13-gram contamination,
    no sampling)."""

    quality: bool = True
    min_words: int = 50
    min_stopword_hits: int = 2
    dedup: bool = True
    num_hashes: int = 64
    bands: int = 16
    shingle_k: int = 3
    jaccard_threshold: float = 0.8
    decontaminate_k: int = 13
    decontaminate_threshold: int = 1
    sample_rate: float | None = None


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    config: CurationConfig | None = None,
) -> DataFrame:
    """Per-doc curation verdict: the input plus
      - `ok_quality`     composite Gopher gate (config.quality)
      - `cluster_id` / `is_representative`  duplicate cluster (config.dedup;
        non-representatives are the rows a dedup pass drops)
      - `is_contaminated`  shares ≥ threshold word k-grams with `benchmark`
      - `in_sample`      deterministic md5-bucket sample (config.sample_rate)
      - `keep`           AND of all enabled gates
    Filter on `keep` for the curated corpus; aggregate the flags with
    `curation_report` for the audit trail."""
    from eventanalysis_spark.operators.cluster import dedup_cluster_assignments
    from eventanalysis_spark.operators.sampling import decontaminate, sample_bucket
    from eventanalysis_spark.operators.webfilter import gopher_quality_flags

    cfg = config or CurationConfig()
    out = docs

    if cfg.quality:
        out = out.withColumn(
            "ok_quality",
            gopher_quality_flags(
                F.col(text_col),
                min_words=cfg.min_words,
                min_stopword_hits=cfg.min_stopword_hits,
            )["keep"],
        )
    else:
        out = out.withColumn("ok_quality", F.lit(True))

    if cfg.dedup:
        comps = dedup_cluster_assignments(
            docs,
            text_col=text_col,
            id_col=id_col,
            num_hashes=cfg.num_hashes,
            bands=cfg.bands,
            shingle_k=cfg.shingle_k,
            threshold=cfg.jaccard_threshold,
        ).withColumnRenamed("id", id_col)
        out = out.join(comps, id_col, "left")
    else:
        out = out.withColumn("cluster_id", F.col(id_col)).withColumn(
            "is_representative", F.lit(True)
        )

    if benchmark is not None:
        out = decontaminate(
            out,
            benchmark,
            k=cfg.decontaminate_k,
            threshold=cfg.decontaminate_threshold,
            text_col=text_col,
            id_col=id_col,
        )
    else:
        out = out.withColumn(
            "n_contaminated_ngrams", F.lit(0).cast("long")
        ).withColumn("is_contaminated", F.lit(False))

    if cfg.sample_rate is not None:
        from eventanalysis_spark.operators.sampling import BUCKETS

        out = out.withColumn(
            "in_sample",
            sample_bucket(F.col(id_col).cast("string"))
            < int(cfg.sample_rate * BUCKETS),
        )
    else:
        out = out.withColumn("in_sample", F.lit(True))

    return out.withColumn(
        "keep",
        F.col("ok_quality")
        & F.col("is_representative")
        & ~F.col("is_contaminated")
        & F.col("in_sample"),
    )


def curation_report(flagged: DataFrame) -> DataFrame:
    """One-row audit of a curate_corpus result: total, kept, and dropped-by
    -reason counts (first-failing-gate attribution in gate order quality →
    dedup → contamination → sample). One map-side-partial aggregate."""
    q = ~F.col("ok_quality")
    d = F.col("ok_quality") & ~F.col("is_representative")
    c = (
        F.col("ok_quality")
        & F.col("is_representative")
        & F.col("is_contaminated")
    )
    s = (
        F.col("ok_quality")
        & F.col("is_representative")
        & ~F.col("is_contaminated")
        & ~F.col("in_sample")
    )
    one = F.lit(1)
    return flagged.agg(
        F.count(one).alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(q.cast("long")).alias("n_dropped_quality"),
        F.sum(d.cast("long")).alias("n_dropped_duplicate"),
        F.sum(c.cast("long")).alias("n_dropped_contaminated"),
        F.sum(s.cast("long")).alias("n_dropped_sampled_out"),
    )
