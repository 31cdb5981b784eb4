"""Hashed-bag-of-words Naive-Bayes text classifier (fasttext-style).

The model-based quality-scoring step of public web pipelines: CCNet /
GPT-3 / LLaMA filter Common-Crawl text with a cheap linear classifier
over hashed token features (fasttext supervised with the hashing
trick). This is the Spark-native equivalent for the binomial case —
multinomial Naive Bayes over hashed unigram buckets, which is a linear
model with analytically-computable weights, so *training is one
distributed aggregation* (no SGD, no driver-side iteration, bit-exact
deterministic and SQL-replicable for the oracle).

Model: log P(pos|doc) − log P(neg|doc)
     = prior + Σ_tokens w[bucket(token)]
  w_b   = ln((cnt_pos_b + α)/(tot_pos + αB)) − ln((cnt_neg_b + α)/(tot_neg + αB))
  prior = ln((n_pos_docs + α)/(n_neg_docs + α))
with B hash buckets and Laplace α. Hash collisions are the standard
hashing-trick trade: two tokens sharing a bucket share a weight.

Spark-first shape (reference engine has no comparable operator; part of
the training-data-pipeline surface the mission brief makes first-class):
  - TRAIN is explode → pmod(hash(token), B) → ONE hash aggregate keyed
    by bucket (map-side partial; key space bounded by B, so the shuffle
    is ≤ B rows per upstream partition regardless of corpus size),
    then a B-row weight table densified against spark.range(B);
  - SCORE is explode → broadcast-join the B-row weight table → per-doc
    sum. Tokens of a doc stay partition-local through the explode, so
    the partial aggregate collapses map-side to ~one row per doc before
    the shuffle — the corpus itself never shuffles;
  - everything is JVM-side Catalyst (no Python in either plan).

At B = 2^20 the weight table is ~16 MB — broadcastable on any sane
executor. Scores are rounded to 6 decimals at the output edge: the sum
of ln() terms is float-order-dependent across partitionings, and 1e-6
rounding absorbs the ULP noise (same contract as textstats'
unigram_logprob_scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.operators.dedup import _base_hasher, _tokens


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Train on `docs` where `label_col` is a boolean column (true =
    positive class). Returns the dense B+1-row model table:

      (bucket, weight)   for bucket ∈ [0, B)   — token log-odds
      (-1, prior)                              — doc-class log prior

    One artifact so the model broadcasts as a unit; pmod never yields
    -1, so the sentinel cannot collide with a real bucket."""
    lbl = F.col(label_col).cast("boolean")
    # carry the label through the explode so no re-join is needed
    toks = (
        docs.select(F.col(id_col), F.col(text_col), lbl.alias("__y"))
        .select(
            F.col(id_col),
            F.col("__y"),
            F.explode(_tokens(F.col(text_col))).alias("__tok"),
        )
        .select(
            "__y",
            F.pmod(
                _base_hasher(hash_fn)(F.col("__tok")), F.lit(num_buckets)
            ).alias("bucket"),
        )
    )
    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    )
    dense = (
        docs.sparkSession.range(num_buckets)
        .withColumnRenamed("id", "bucket")
        # counts is ≤ B rows — broadcast both small sides so the model
        # build never sort-merge-shuffles
        .join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("c_pos", F.lit(0)) + F.lit(alpha))
                    / (F.col("t_pos") + F.lit(alpha * num_buckets))
                )
                - F.log(
                    (F.coalesce("c_neg", F.lit(0)) + F.lit(alpha))
                    / (F.col("t_neg") + F.lit(alpha * num_buckets))
                )
            ).alias("weight"),
        )
    )
    ndocs = docs.agg(
        F.sum(F.when(lbl, 1).otherwise(0)).alias("np"),
        F.sum(F.when(lbl, 0).otherwise(1)).alias("nn"),
    )
    prior = ndocs.select(
        F.lit(-1).cast("long").alias("bucket"),
        F.log(
            (F.col("np") + F.lit(alpha)) / (F.col("nn") + F.lit(alpha))
        ).alias("weight"),
    )
    return dense.unionByName(prior)


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Score every doc: (id, nb_score, nb_pred). nb_score is the rounded
    log-odds (prior + Σ token weights); nb_pred = score > 0. Docs with
    no tokens score the bare prior — explode_outer keeps them as one
    null-bucket row, so no second join over the corpus is needed. The
    model table is broadcast; the corpus never shuffles except the
    ~1-row-per-doc partial-aggregate output."""
    weights = model.where(F.col("bucket") >= 0)
    prior = model.where(F.col("bucket") < 0).select(
        F.col("weight").alias("__prior")
    )
    hasher = _base_hasher(hash_fn)
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(_tokens(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        F.pmod(hasher(F.col("__tok")), F.lit(num_buckets)).alias("bucket"),
    )
    return (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("__sumw"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            F.round(F.col("__sumw") + F.col("__prior"), 6).alias("nb_score"),
            (F.col("__sumw") + F.col("__prior") > 0).alias("nb_pred"),
        )
    )


def nb_train_score(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Train on the labeled corpus and score the same corpus
    (resubstitution) — the one-call form used by the driver query and
    by curation flows that filter on a classifier fit to a seed set."""
    model = nb_train(
        docs, label_col, text_col, id_col, num_buckets, alpha, hash_fn
    )
    return nb_score(docs, model, text_col, id_col, num_buckets, hash_fn)
