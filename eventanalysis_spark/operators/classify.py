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

from pyspark.sql import Column, DataFrame
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


# ---- distributed logistic regression (batch gradient, broadcast weights) ----

def _lr_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_buckets: int,
    hash_fn: str,
) -> DataFrame:
    """Hashed tf features per doc: (id, bucket, x) with x = round(cnt /
    n_tokens, 6), plus a bias row (id, -1, 1.0) per doc — so z = Σ w·x
    treats the intercept uniformly and token-less docs stay total. The
    6-dp quantization at the feature edge is what lets the DuckDB oracle
    replay the whole gradient recurrence bit-for-bit."""
    toks = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        F.pmod(
            _base_hasher(hash_fn)(F.col("__tok")), F.lit(num_buckets)
        ).alias("bucket"),
    )
    cnt = toks.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("__c"))
    lens = cnt.groupBy(id_col).agg(F.sum("__c").alias("__n"))
    tf = cnt.join(lens, id_col).select(
        id_col,
        "bucket",
        F.round(F.col("__c") / F.col("__n").cast("double"), 6).alias("x"),
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return tf.unionByName(bias)


def _int_dot(a: str, b: str) -> "Column":
    """Engine-portable 6-dp dot product: both 6-dp-grid operands scale
    to exact integers, the product sum runs in LONG (exact, order-free,
    |sum| << 2^63 for any realistic doc), and the half-up-to-6-dp edge
    is integer floor((s + 5e5)/1e6) — no float summation drift, no
    decimal-midpoint round() divergence between engines."""
    ai = F.round(F.col(a) * 1e6).cast("long")
    bi = F.round(F.col(b) * 1e6).cast("long")
    s = F.sum(ai * bi)
    return F.floor((s + F.lit(500000)) / F.lit(1000000.0)) / F.lit(1e6)


def lr_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    learning_rate: float = 0.5,
    iterations: int = 3,
    hash_fn: str = "xxhash64",
    pin: str | None = "persist",
) -> DataFrame:
    """Distributed batch-gradient logistic regression over hashed tf
    features — the TRAINABLE upgrade to the analytic `nb_train` (same
    fasttext-style hashing trick, but a discriminative objective):

        w ← round(w + lr/N · Σ_i x_i · round(y_i − σ(round(z_i, 6)), 6), 6)

    Each iteration is (1) one doc-keyed partial-agg for z = Σ w·x with
    the ≤(B+1)-row weight table BROADCAST, (2) one doc-keyed join for the
    residual, (3) one bucket-keyed aggregate for the gradient (shuffle
    bounded by B rows per upstream partition). The feature frame is
    pinned ONCE (plans/pin.py; it is consumed twice per iteration), the
    weight table re-pinned per iteration (two consumers next round — the
    PageRank 2^k plan-growth rule). Every recurrence edge is rounded to
    6 dp so the fixed-iteration model is bit-replicable in SQL (same
    convention as host_hits' per-half-step floor; NOTES.md round-5).

    Returns the (bucket, weight) table, bias at bucket -1."""
    from eventanalysis_spark.plans.pin import Pinner

    feat = _lr_features(docs, text_col, id_col, num_buckets, hash_fn)
    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    if pin is not None:
        p = Pinner(pin)
        feat = p(feat)
        labels = p(labels)
    n_docs = labels.count()
    w = feat.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("weight")
    )
    wpin = Pinner(pin) if pin is not None else None
    for _ in range(iterations):
        z = (
            feat.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            # EXACT integer dot product (the daily_trend long-moments
            # rule): 6-dp operands scale to integers, the summed LONG is
            # order-independent and midpoint-free, so the 6-dp edge is
            # bit-identical across engines at any SF. Float-product sums
            # drift ~1e-12 between engines and flip a 6-dp boundary on
            # ~1 in 10^4 values (observed at sf0.1); per-term 6-dp
            # rounding is WORSE — grid×grid products land exactly on
            # decimal midpoints where Spark (BigDecimal HALF_UP) and
            # DuckDB (float-scaled) round() disagree.
            .agg(_int_dot("x", "weight").alias("__z"))
        )
        resid = labels.join(z, id_col).select(
            F.col(id_col),
            F.round(
                F.col("__y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))),
                6,
            ).alias("__r"),
        )
        grad = (
            feat.join(resid, id_col)
            .groupBy("bucket")
            .agg(_int_dot("x", "__r").alias("__g"))
        )
        w = (
            w.join(F.broadcast(grad), "bucket", "left")
            .select(
                "bucket",
                F.round(
                    F.col("weight")
                    + F.lit(learning_rate)
                    * F.coalesce("__g", F.lit(0.0))
                    / F.lit(float(n_docs)),
                    6,
                ).alias("weight"),
            )
        )
        if wpin is not None:
            w = wpin(w)
    return w


def lr_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Score docs under an lr_train model: (id, lr_score, lr_pred) with
    lr_score = round(σ(round(z, 6)), 6). Broadcast weight probe — the
    corpus never shuffles beyond the per-doc partial aggregate."""
    feat = _lr_features(docs, text_col, id_col, num_buckets, hash_fn)
    # exact integer dot product — see lr_train's z edge for why
    z = (
        feat.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(_int_dot("x", "weight").alias("__z"))
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))), 6)
    return z.select(
        F.col(id_col), p.alias("lr_score"), (F.col("__z") > 0).alias("lr_pred")
    )
