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


def _round_half_up(v: float, scale: int) -> float:
    """Driver-side replica of Spark's `round(double, scale)`: shortest
    decimal repr of the double (java BigDecimal.valueOf == python repr),
    HALF_UP quantize at `scale`, back to double. Bit-identical to
    F.round for every finite double."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(v))).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )
    )


def _int6(v: float) -> int:
    """Driver-side replica of `F.round(col * 1e6).cast("long")` on a
    double: the SAME IEEE multiply, then HALF_UP at scale 0."""
    return int(_round_half_up(float(v) * 1e6, 0))


def _lr_feature_arrays(
    docs: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
    num_buckets: int,
    hash_fn: str,
) -> DataFrame:
    """Per-doc hashed-tf feature VECTOR (id, __y, __bs, __xi): the same
    (bucket, x) rows as `_lr_features` — bias (-1, 1.0) included —
    grouped into aligned arrays, with x pre-scaled to the exact 6-dp
    integer `_int_dot` uses (xi = round(x·1e6) as long). Built once and
    pinned by the caller: every gradient round and the final scoring
    pass are then NARROW projections over this frame instead of
    re-joining/re-shuffling the exploded (id, bucket, x) stream per
    iteration (guide §2.4 — remove shuffles outright).

    Build shape: explode_outer keeps token-less docs alive (their only
    entry is the bias), the label rides the token stream (no labels
    join), and n_tokens/x come from an IN-ROW fold over the collected
    (bucket, cnt) list (no lens aggregate + join). Two shuffles total —
    (id, bucket) counts, then (id) collect — against `_lr_features`'s
    two aggregates plus two joins. x is the identical round(cnt/n, 6)
    division per entry, so xi matches the old form bit-for-bit."""
    toks = docs.select(
        F.col(id_col),
        F.col(label_col).cast("double").alias("__y"),
        F.explode_outer(_tokens(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        "__y",
        # guard the null token row explode_outer keeps for token-less
        # docs: md5(NULL) is NULL (bucket null -> dropped by the
        # collect_list filter below), but xxhash64(NULL) is the SEED
        # (42) — unguarded, every empty/null-text doc would grow a
        # phantom feature in bucket pmod(42, B) under the production
        # hash and train different weights than `_lr_features`
        F.when(
            F.col("__tok").isNotNull(),
            F.pmod(
                _base_hasher(hash_fn)(F.col("__tok")), F.lit(num_buckets)
            ),
        ).alias("bucket"),
    )
    cnt = toks.groupBy(id_col, "bucket").agg(
        F.count(F.col("bucket")).alias("__c"),
        F.first("__y").alias("__y"),
    )
    # final grain is id ALONE (not (id, label)): the cached frame then
    # reports hash(id) output partitioning, which the per-round window
    # and the scoring aggregate both reuse — zero exchanges per round
    # beyond the tiny bucket-keyed gradient shuffle
    grouped = cnt.groupBy(id_col).agg(
        F.first("__y").alias("__y"),
        F.collect_list(
            F.when(
                F.col("bucket").isNotNull(),
                F.struct(F.col("bucket").alias("b"), F.col("__c")),
            )
        ).alias("__cs"),
    )
    # n = Σ cnt (in-row), xi = round(round(c/n, 6)·1e6) per entry — the
    # exact _lr_features x edge — then the bias entry (-1, 1e6) appended
    fs = (
        "transform(__cs, e -> named_struct('b', e.b, 'xi', "
        "CAST(ROUND(ROUND(e.__c / CAST(aggregate(__cs, 0L, (acc, t) -> "
        "acc + t.__c) AS DOUBLE), 6) * 1000000.0, 0) AS BIGINT)))"
    )
    return grouped.select(
        F.col(id_col),
        "__y",
        F.expr(
            f"concat({fs}, array(named_struct('b', CAST(-1 AS BIGINT), "
            f"'xi', 1000000L)))"
        ).alias("__fs"),
    ).select(
        id_col,
        "__y",
        F.col("__fs").getField("b").alias("__bs"),
        F.col("__fs").getField("xi").alias("__xi"),
    )


def _lr_z_from_s() -> "Column":
    """z = floor((__s + 5e5)/1e6)/1e6 — the `_int_dot` rounding edge
    applied to the Arrow-computed LONG sum `__s` (bigint → double cast
    and float division are the identical op sequence to _int_dot's)."""
    return F.expr(
        "CAST(FLOOR((__s + 500000) / 1000000.0) AS DOUBLE) / 1.0E6"
    )


def _lr_weight_ints(
    w: dict[int, float], num_buckets: int
) -> list[int]:
    """Dense literal-array image of the weight dict: index 0 ↔ bias
    bucket -1, index b+1 ↔ bucket b; unobserved buckets get 0 (their
    entries are never looked up — no doc carries them)."""
    arr = [0] * (num_buckets + 1)
    for b, v in w.items():
        arr[b + 1] = _int6(v)
    return arr


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

    Returns the (bucket, weight) table, bias at bucket -1.

    Round-6 shape change (same values — pytest pins exact equality to
    the old join-per-edge form): features are grouped into per-doc
    arrays ONCE (`_lr_feature_arrays`, pinned), each round computes
    z/residual IN-ROW with the weight vector inlined as a constant
    literal (zero joins, zero doc-keyed shuffles), and the only shuffle
    per round is the bucket-keyed gradient partial-aggregate whose
    ≤(B+1)-row result is collected and applied driver-side with Spark's
    exact round() semantics (`_round_half_up`). EXACT integer dot
    products throughout (the daily_trend long-moments rule): 6-dp
    operands scale to integers, LONG sums are order-independent and
    midpoint-free, so every recurrence edge is bit-identical across
    engines, partitionings, and this plan change. At scale the collect
    is B+1 rows per round (a model, not data) and the broadcast-side
    literal is the same B+1 doubles the old broadcast join shipped."""
    feat_arr = _lr_feature_arrays(
        docs, label_col, text_col, id_col, num_buckets, hash_fn
    )
    w = _lr_gradient_rounds(
        feat_arr, num_buckets, learning_rate, iterations,
        id_col=id_col, pin=pin,
    )
    return docs.sparkSession.createDataFrame(
        sorted(w.items()), "bucket long, weight double"
    )


def _lr_entries(feat_arr: DataFrame, id_col: str) -> DataFrame:
    """Exploded (id, __y, b, xi) entry stream of a feature-array frame —
    the one pass each gradient round and the scoring aggregate run
    over. Explode preserves the parent's hash(id) partitioning, so
    per-doc windows/aggregates over this stream need NO exchange."""
    return feat_arr.select(
        F.col(id_col),
        "__y",
        F.explode(F.arrays_zip("__bs", "__xi")).alias("__e"),
    ).select(
        id_col,
        "__y",
        F.col("__e.__bs").alias("__b"),
        F.col("__e.__xi").alias("__xi"),
    )


def _lr_z_of(s: Column) -> Column:
    """z = floor((s + 5e5)/1e6)/1e6 — `_int_dot`'s rounding edge applied
    to an exact LONG product sum (bigint→double cast + float division,
    the identical op sequence)."""
    return (
        F.floor((s + F.lit(500000)) / F.lit(1000000.0)).cast("double")
        / F.lit(1e6)
    )


def _lr_gradient_rounds(
    feat_arr: DataFrame,
    num_buckets: int,
    learning_rate: float,
    iterations: int,
    id_col: str = "doc_id",
    pin: str | None = "persist",
) -> dict[int, float]:
    """Run the fixed gradient rounds over a `_lr_feature_arrays` frame;
    returns the weight dict (observed buckets only, bias at -1).

    One Spark job per round, all whole-stage-codegen JVM work: explode
    the cached entry stream, look each entry's weight up in a LITERAL
    long array (a true Literal — codegen'd element_at, unlike the
    interpreter-only aggregate/zip_with fold), per-doc LONG sum via a
    window that REUSES the cache's hash(id) partitioning (no exchange),
    residual in-row, then the bucket-keyed partial aggregate whose
    ≤(B+1)-row result is collected and applied driver-side with Spark's
    exact round() semantics (`_round_half_up`). Every recurrence edge
    stays on the exact integer grid (LONG sums are order-free), so the
    plan change is value-identical to the old join-per-edge form —
    pinned by pytest against the pure-python reference and the DuckDB
    oracle. At scale the per-round collect is B+1 rows (a model, not
    data) and the literal weight array is the same B+1 doubles the old
    broadcast join shipped."""
    import math as _math

    from pyspark.sql.window import Window

    from pyspark.storagelevel import StorageLevel

    if pin is not None:
        # plain persist (NOT an RDD-rebase pin): the plan is re-referenced
        # a fixed ~5 times, never self-referenced, so there is no 2^k
        # growth — and keeping the logical plan intact preserves the
        # hash(id) output partitioning, so the per-round window and the
        # scoring aggregate run with NO exchange (measured faster than
        # the LogicalRDD-leaf pin whose lost partitioning re-shuffles
        # the entry stream every round)
        feat_arr = feat_arr.persist(StorageLevel.MEMORY_AND_DISK)
    # n_docs rides round 1's gradient collect instead of a separate
    # count() job: every doc carries exactly one bias entry (b = -1,
    # appended unconditionally, even for token-less docs), so the bias
    # bucket's entry count IS the doc count — one fewer job barrier,
    # and round 1's job is what materializes the cache.
    n_docs: int | None = None
    entries = _lr_entries(feat_arr, id_col)
    w: dict[int, float] | None = None
    for _ in range(iterations):
        if w is None:
            # round 1: all-zero weights — the integer dot is exactly 0,
            # so z = floor(0.5)/1e6 = 0.0 with no per-entry work
            zed = entries.withColumn("__z", F.lit(0.0))
        else:
            warr = F.lit(_lr_weight_ints(w, num_buckets))
            prod = F.col("__xi") * F.element_at(
                warr, (F.col("__b") + 2).cast("int")
            )
            s = F.sum(prod).over(Window.partitionBy(id_col))
            zed = entries.withColumn("__z", _lr_z_of(s))
        ri = (
            F.round(
                F.round(
                    F.col("__y")
                    - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))),
                    6,
                )
                * 1e6
            )
            .cast("long")
        )
        grad_rows = (
            zed.select(F.col("__b"), (F.col("__xi") * ri).alias("__t"))
            .groupBy("__b")
            .agg(F.sum("__t").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        if w is None:
            w = {int(r["__b"]): 0.0 for r in grad_rows}
        if n_docs is None:
            # empty/fully-filtered corpus -> no bias row collected; the
            # update comprehension below is then over zero rows, so the
            # division never runs and the model stays all-zero weights
            n_docs = next(
                (int(r["c"]) for r in grad_rows if int(r["__b"]) == -1), 0
            )
        w = {
            b: _round_half_up(
                w[b]
                + (
                    learning_rate
                    * (_math.floor((g + 500000) / 1000000.0) / 1e6)
                )
                / float(n_docs),
                6,
            )
            for b, g in ((int(r["__b"]), int(r["s"])) for r in grad_rows)
        }
    if w is None:  # iterations == 0: zero weights over observed buckets
        w = {
            int(r["bucket"]): 0.0
            for r in feat_arr.select(
                F.explode("__bs").alias("bucket")
            ).distinct().collect()
        }
    return w


def lr_train_score(
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
    """Train on the labeled corpus and score the same corpus
    (resubstitution), sharing ONE cached feature pass: the corpus is
    tokenized/hashed once instead of twice (`lr_train` + `lr_score`
    each rebuilt `_lr_features`), and scoring aggregates the cached
    entry stream with the final weights inlined as a literal — the
    hash(id) partitioning is reused, so scoring adds no exchange.
    Values are bit-identical to the two-call form (same `_int_dot` z
    edge, same final rounding)."""
    from pyspark.storagelevel import StorageLevel

    feat_arr = _lr_feature_arrays(
        docs, label_col, text_col, id_col, num_buckets, hash_fn
    )
    if pin is not None:
        feat_arr = feat_arr.persist(StorageLevel.MEMORY_AND_DISK)
    w = _lr_gradient_rounds(
        feat_arr, num_buckets, learning_rate, iterations,
        id_col=id_col, pin=None,
    )
    warr = F.lit(_lr_weight_ints(w, num_buckets))
    prod = F.col("__xi") * F.element_at(
        warr, (F.col("__b") + 2).cast("int")
    )
    z = _lr_z_of(F.sum(prod))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        _lr_entries(feat_arr, id_col)
        .groupBy(id_col)
        .agg(p.alias("lr_score"), (z > 0).alias("lr_pred"))
    )


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
