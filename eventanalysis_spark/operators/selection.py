"""Training-data selection: token-budget prefix selection, DSIR-style
importance weighting, and deterministic weighted sampling.

A pre-training corpus is rarely "everything that survived filtering" —
the last step picks a SUBSET to a token budget ("the best 1T tokens")
or resamples toward a target distribution (DSIR, Xie et al. 2023:
importance weights from an n-gram LM ratio between a small target
corpus and the raw source pool). These operators are that step.

Spark-first shapes:
  - `budget_select` is the same two-phase exact running sum as
    `packing.pack_sequences` (range-partition on the selection order,
    per-partition totals -> broadcast offsets -> partition-local
    window). No single-partition window ever sees data, and the
    result is exact at any partition count. The honest plan cost
    (read the generated PLANS.md, not the wish): the ranged frame is
    materialized ONCE (ranks.ranged_with_pid — one set of range
    boundaries for both branches), then crosses a second narrow
    exchange: the ENSURE_REQUIREMENTS hash co-cluster on the
    partition id that the window's ClusteredDistribution demands
    (range partitioning does not satisfy it). So pass a NARROW
    (keys, weight) frame and join wide payloads back by key; never
    ship documents through this operator.
  - `dsir_logweights` builds the token->log-ratio dictionary with two
    partial-aggregatable token counts (target side is tiny by
    construction; DSIR's whole point is a small exemplar corpus), then
    scores docs with ONE explode + broadcast join + per-doc sum. The
    optional `hash_buckets` bounds the dictionary (DSIR's hashed
    features) so the broadcast stays small at any vocabulary size.
  - `gumbel_topk` turns weights into a deterministic sample: Gumbel
    top-k (Kool et al. 2019) with the uniform drawn from the
    SQL-replicable md5 bucket (sampling.sample_bucket), so the SAME k
    rows are chosen at any parallelism, on task retry, and by the
    DuckDB oracle. Selection is orderBy(key).limit(k) -> Spark plans
    TakeOrderedAndProject (per-partition heap + driver merge of k).

The reference engine has no comparable operator family; this extends
the training-data surface the brief makes first-class (capped batch
selection O5 `/root/reference/Lcl.EventLog/Jobs/Database/OpenDbV2.cs:887-908`
is the closest spirit: a bounded, resumable "take this much" step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eventanalysis_spark.operators.sampling import BUCKETS, sample_bucket


def budget_select(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    order_cols: list[Column] | None = None,
    tie_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy prefix selection: walk `df` in `order_cols` order and keep
    rows while the running `weight_col` total is still below `budget`
    (the row that crosses the budget IS kept, so the budget is always
    reached when the corpus can fill it — "select docs until we have
    1T tokens"). Returns the selected rows plus `cum_before` (exact
    running total of everything ordered earlier).

    `order_cols` defaults to weight DESC; pass e.g.
    `[F.col("quality").desc(), F.col("doc_id").asc()]` for
    quality-ranked selection. The full order must be total (add a
    unique tie-break column) or the selected SET is still deterministic
    only up to ties. All arithmetic is integer-exact (no float cumsum).

    Scale shape: the input crosses the range exchange and the window's
    partition-id co-cluster exchange (see module docstring) — both
    narrow when the caller passes a (keys, weight) projection; the
    only unpartitioned window runs over ~numPartitions rows
    (per-partition totals), never over data."""
    if budget < 0:
        raise ValueError("budget must be non-negative")
    order_cols = order_cols or [F.col(weight_col).desc()]
    if tie_cols:
        order_cols = order_cols + [F.col(c).asc() for c in tie_cols]
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    from eventanalysis_spark.operators.ranks import ranged_with_pid

    ranged = ranged_with_pid(
        df.withColumn("__w", F.col(weight_col).cast("long")),
        order_cols,
        npart,
    )
    counts = ranged.groupBy("__pid").agg(F.sum("__w").alias("__n"))
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w_cum), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.coalesce(F.sum("__w").over(w_in), F.lit(0)) + F.col("__off")
    ).cast("long")
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn("cum_before", cum_before)
        .where(F.col("cum_before") < F.lit(int(budget)))
        .drop("__w", "__pid", "__off")
    )


def _tokens(text_col: str) -> Column:
    """Whitespace tokenization shared with textstats/spans (trim + split
    on whitespace runs); empty/blank text yields zero tokens."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    hash_buckets: int | None = None,
) -> DataFrame:
    """DSIR-style unigram importance log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per document, logw = sum over tokens of
    ln p_target(tok) - ln p_source(tok), with each corpus a Laplace
    (+1) unigram LM over the SHARED vocabulary (union of both corpora;
    a token unseen in one corpus still gets the +1 floor there, so OOV
    mass is handled without a special path). High logw = looks like the
    target; resample with `gumbel_topk` on logw.

    Returns (id_cols..., n_tokens, logw) with logw rounded to 6
    decimals (cross-engine float reproducibility, same policy as
    tfidf_topk_terms).

    Scale shape: two token-count aggregates (map-side partial; the
    target corpus is small by design — DSIR uses an exemplar set), one
    dictionary join. With `hash_buckets` set, tokens fold into
    md5-bucket features first (DSIR's hashed n-gram trick): the
    dictionary is at most `hash_buckets` rows regardless of vocabulary,
    so it always broadcasts; md5 keeps it SQL-replicable. Without it
    the dictionary is vocab-sized and the join is left to AQE."""
    id_cols = id_cols or ["doc_id"]

    def feat(col: Column) -> Column:
        if hash_buckets:
            return (
                F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
                % hash_buckets
            ).cast("string")
        return col

    def counts(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(_tokens(text_col)).alias("__t"))
            .select(feat(F.col("__t")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    src_c = counts(docs)
    tgt_c = counts(target)
    vocab = (
        src_c.select("tok").unionByName(tgt_c.select("tok")).distinct()
    )
    # corpus sizes + shared vocab size: one tiny cross-joinable row.
    # sum() over an empty side is NULL — coalesce to 0 (same guard the
    # DuckDB oracle carries) so an empty/all-blank target degrades to
    # the +1-floor LM instead of poisoning every logw with NULL.
    totals = (
        src_c.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("ns"))
        .crossJoin(tgt_c.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("nt")))
        .crossJoin(vocab.agg(F.count(F.lit(1)).alias("v")))
    )
    ratio = (
        vocab.join(src_c.withColumnRenamed("c", "cs"), "tok", "left")
        .join(tgt_c.withColumnRenamed("c", "ct"), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                      / (F.col("nt") + F.col("v")))
                - F.log((F.coalesce(F.col("cs"), F.lit(0)) + 1).cast("double")
                        / (F.col("ns") + F.col("v")))
            ).alias("lr"),
        )
    )
    per_tok = docs.select(
        *id_cols, F.explode(_tokens(text_col)).alias("__t")
    ).select(*id_cols, feat(F.col("__t")).alias("tok"))
    join_fn = F.broadcast if hash_buckets else (lambda d: d)
    return (
        per_tok.join(join_fn(ratio), "tok", "left")
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("logw"),
        )
    )


def gumbel_topk(
    df: DataFrame,
    k: int,
    logweight_col: str = "logw",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample of k rows WITHOUT replacement,
    probabilities proportional to exp(logweight): Gumbel top-k — rank
    by logw + g where g = -ln(-ln(u)) and u is the uniform derived from
    the SQL-replicable md5 sample bucket of `key_col` (u = (bucket +
    0.5) / BUCKETS, exactly representable, never 0 or 1). Same sample
    at any parallelism / on retry / in the DuckDB oracle; distinct
    `salt` values draw independent samples.

    Plan shape: orderBy(desc).limit(k) -> TakeOrderedAndProject
    (per-partition top-k heaps, driver merges k rows; no global sort).
    Output adds `gumbel_key` rounded to 6 decimals."""
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat(F.lit(salt + "\x1f"), key)
    u = (sample_bucket(key) + F.lit(0.5)) / F.lit(float(BUCKETS))
    gkey = F.col(logweight_col) - F.log(-F.log(u))
    return (
        df.withColumn("gumbel_key", F.round(gkey, 6))
        .orderBy(F.col("gumbel_key").desc(), F.col(key_col).asc())
        .limit(k)
    )


def score_tiers(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    tiers: int = 3,
    ascending: bool = True,
    labels: list[str] | None = None,
    tier_col: str = "tier",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020 §4.3):
    every row gets its GLOBAL rank by (round(score, 6), id) and a tier
    index floor(rank · tiers / n) — equal-population buckets by score
    order (CCNet keeps the "head" perplexity third of each language and
    discards or down-weights the tail). ascending=True ranks low scores
    best (CCNet: low perplexity = fluent); `labels` (len == tiers) maps
    tier indices to names.

    Scale shape: the rank is the assign_ids two-phase global rank (range
    partitions + broadcast per-partition offsets) — no single-partition
    window over data at any corpus size; n rides a broadcast 1-row
    count. ROUND(,6) makes float score noise TIE (then id breaks it)
    instead of rank-flip — the tfidf_topk cross-engine determinism rule.
    Pass a NARROW (id, score) frame and join payloads back by id."""
    from eventanalysis_spark.operators.enrich import assign_ids

    key = F.round(F.col(score_col), 6)
    t = scored.withColumn("__ord", key if ascending else -key)
    ranked = assign_ids(t, "__rank", ["__ord", id_col], start_after=-1)
    # count over the PINNED ranked frame (assign_ids range-materializes
    # its input), not over `scored`: a second reference to `scored`
    # would re-run the caller's whole scoring subtree just to count rows
    cnt = ranked.agg(F.count(F.lit(1)).alias("__n"))
    out = (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumn(
            tier_col,
            F.floor(F.col("__rank") * tiers / F.col("__n")).cast("int"),
        )
        .withColumn("__rank", F.col("__rank").cast("long"))
    )
    if labels is not None:
        if len(labels) != tiers:
            raise ValueError(f"labels must have {tiers} entries, got {len(labels)}")
        out = out.withColumn(
            tier_col,
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col(tier_col) + 1
            ),
        )
    return out.drop("__ord", "__n").withColumnRenamed("__rank", "score_rank")


def score_tiers_by_group(
    scored: DataFrame,
    score_col: str,
    group_col: str,
    tiers: int = 3,
    ascending: bool = True,
    labels: list[str] | None = None,
    tier_col: str = "tier",
) -> DataFrame:
    """Per-group CCNet tiers (Wenzek et al. 2020 run head/middle/tail PER
    LANGUAGE): a row's tier is floor(cum_before · tiers / n_g), where
    cum_before counts the group's rows with strictly better (ROUND(score,
    6)) values — all ties share a tier, so the result is deterministic
    and partition-invariant with no id tie-break needed.

    Scale shape — the reason this is NOT `Window.partitionBy(group)` over
    rows: that puts all of 'en' (most of a web corpus) through one
    reducer chain. Instead the corpus collapses to a (group, score)
    HISTOGRAM first (one partial-aggregatable count — bounded by distinct
    rounded scores per group, not rows), the cumulative runs over the
    tiny histogram, and tiers come back via a (group, score) equi-join
    that AQE can broadcast. The corpus shuffles once, on the join key."""
    from pyspark.sql import Window

    key = F.round(F.col(score_col), 6)
    ordk = key if ascending else -key
    # pinned: consumed by the histogram AND the tier re-attach join —
    # unpinned, the caller's scoring subtree runs twice. Callers pass a
    # narrow (id, score, group) frame (module docstring), so the
    # materialization is a slim projection of the corpus.
    t = scored.withColumn("__k", ordk).localCheckpoint(eager=False)
    hist = t.groupBy(group_col, "__k").agg(F.count(F.lit(1)).alias("__c"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(group_col)
    ranked = hist.select(
        group_col,
        "__k",
        F.coalesce(F.sum("__c").over(w_cum), F.lit(0)).alias("__before"),
        F.sum("__c").over(w_all).alias("__ng"),
    ).withColumn(
        tier_col,
        F.floor(F.col("__before") * tiers / F.col("__ng")).cast("int"),
    )
    if labels is not None:
        if len(labels) != tiers:
            raise ValueError(f"labels must have {tiers} entries, got {len(labels)}")
        ranked = ranked.withColumn(
            tier_col,
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col(tier_col) + 1
            ),
        )
    return t.join(
        ranked.select(group_col, "__k", tier_col), [group_col, "__k"]
    ).drop("__k")


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    method: str = "broadcast",
) -> DataFrame:
    """Per-document n-gram novelty vs an existing reference corpus — the
    inverse of `sampling.decontaminate`: instead of flagging overlap with
    an eval set, score how much of each candidate document is NEW
    relative to what the corpus already holds. The standard
    diversity-selection signal when mixing a fresh crawl into an existing
    training set (keep the novel tail, downweight the re-crawled mass).

    novelty_frac = |distinct doc k-grams ∉ reference grams|
                   / |distinct doc k-grams|

    Scale shapes (same two as decontaminate, same reasons):
      - method='broadcast': the DISTINCT reference gram set aggregates to
        one array and ships to executors; each doc scores in a single
        narrow `size(array_intersect(...))` pass — the candidate corpus
        never shuffles. Right while the reference gram set fits a
        broadcast (prune it upstream by doc-frequency if needed).
      - method='join': docs explode to (id, gram) and left-semi-count
        against the reference grams — both sides shuffle on the gram
        hash; use when the reference outgrows broadcast. AQE handles the
        'of the'-grade skew.

    Output: docs + (n_grams, n_novel, novelty_frac); empty docs score
    novelty_frac 0.0 over 0 grams."""
    from eventanalysis_spark.operators.sampling import word_shingles

    ref_text_col = ref_text_col or text_col
    ref_grams = (
        reference.select(
            F.explode(word_shingles(F.col(ref_text_col), k)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.withColumn("__grams", word_shingles(F.col(text_col), k))
    if method == "broadcast":
        ref_arr = ref_grams.agg(F.collect_set("gram").alias("__ref"))
        scored = (
            doc_grams.crossJoin(F.broadcast(ref_arr))
            .withColumn(
                "__n_seen",
                F.size(F.array_intersect("__grams", "__ref")).cast("long"),
            )
            .drop("__ref")
        )
    elif method == "join":
        exploded = doc_grams.select(
            F.col(id_col).alias("__did"), F.explode("__grams").alias("gram")
        )
        seen = (
            exploded.join(ref_grams, "gram")
            .groupBy("__did")
            .agg(F.count(F.lit(1)).alias("__n_seen"))
        )
        scored = (
            doc_grams.join(
                seen, doc_grams[id_col] == seen["__did"], "left"
            )
            .drop("__did")
            .withColumn("__n_seen", F.coalesce(F.col("__n_seen"), F.lit(0)))
        )
    else:
        raise ValueError(f"method must be 'broadcast' or 'join', got {method!r}")
    n_grams = F.size("__grams").cast("long")
    n_novel = (n_grams - F.col("__n_seen")).cast("long")
    return (
        scored.withColumn("n_grams", n_grams)
        .withColumn("n_novel", n_novel)
        .withColumn(
            "novelty_frac",
            F.round(n_novel / F.greatest(n_grams, F.lit(1)), 6),
        )
        .drop("__grams", "__n_seen")
    )
