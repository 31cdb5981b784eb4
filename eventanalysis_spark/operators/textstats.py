"""Text analysis operators: language-ID (stopword n-gram heuristic),
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split/regexp/arrays) — no Python UDFs.
These run over the `documents`/`pages` text column at ingest time in a
training-data pipeline and are grouped with the parse stage in the plan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small closed stopword lists (public, trivial) for the heuristic lang-id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "las", "que", "es", "por", "con", "una", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; '' → 0 (not 1 — split('') gives [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: count of word-piece matches by a
    BPE-flavored regex (letters runs, digit runs, single punctuation) —
    a cheap stand-in for a real tokenizer at scale."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]{1,8}|[0-9]{1,4}|[^\sA-Za-z0-9])"), 1)
    )


def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch Reading Ease per document (Flesch 1948; the classic
    surface-readability gate quality pipelines stack next to Gopher
    rules): 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words).

    Heuristics (documented, oracle-replicable): words = whitespace
    tokens; sentences = runs of [.!?], floored at 1 (crawled fragments
    often carry no terminal punctuation); syllables = vowel-group count
    per lowercased text ([aeiouy]+ runs — the standard cheap proxy,
    within ~10% of dictionary syllabification on English prose). Empty
    docs yield NULL flesch. Pure Catalyst, one narrow projection, no
    shuffle; 6-dp round at the output edge."""
    t = F.col(text_col)
    n_words = token_count(t).cast("long")
    n_sent = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
        6,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.when(n_words > 0, flesch).alias("flesch"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composed score
    in [0,1]. Deterministic, vectorized, one projection."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    words = F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(t)), r"\s+")
    )
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), en_stop))
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    avg_word_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_hit = F.when(n_tok > 0, n_stop.cast("double") / F.lit(10.0)).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_hit * 2, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(upper_ratio * 5, F.lit(1.0))) * 0.1
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(avg_word_len, 6).alias("q_avg_word_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(upper_ratio, 6).alias("q_upper_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic stopword-vote lang-id: the lang whose stopword list hits
    the most distinct tokens; ties and zero hits → 'und' (undetermined)."""
    words = F.array_distinct(
        F.when(
            F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    )
    votes = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(words, F.array(*[F.lit(w) for w in ws]))
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in STOPWORDS.items()
        ]
    )
    best = F.array_max(votes)
    # array_max on struct compares field-by-field: (hits, lang) — ties break
    # by lang descending; treat hits==0 as undetermined
    return df.withColumn(
        "lang_detected",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(text: Column, hash_fn: str = "xxhash64") -> Column:
    """Order-sensitive rolling document fingerprint: polynomial rolling
    hash over token hashes, h = (h·1000003 + hash(tok) mod m) mod 2^31-1 —
    stable under any partitioning (pure function of text). hash_fn='md5'
    swaps the token hash for the 60-bit md5 prefix so DuckDB can replicate
    the value exactly (oracle variant); 'xxhash64' is the default."""
    from eventanalysis_spark.operators.dedup import _base_hasher

    hasher = _base_hasher(hash_fn)
    toks = F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))
    # modular arithmetic keeps products < 2^52 (ANSI mode forbids overflow)
    m = F.lit((1 << 31) - 1)
    return F.aggregate(
        toks,
        F.lit(2166136261).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(1000003) + F.pmod(hasher(t), m), m),
    )


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("doc_fingerprint", fingerprint(F.col(text_col)))


def corpus_token_counts(
    docs: DataFrame, text_col: str = "text", parallelism: int | None = None
) -> DataFrame:
    """Unigram counts over the corpus: (token, cnt). One explode + one
    map-side-partial hash aggregate; in-doc repetition collapses before
    the shuffle, so the shuffled volume is per-task DISTINCT tokens
    (Zipf makes that tiny relative to the token stream)."""
    if parallelism:
        docs = docs.repartition(parallelism)
    toks = docs.select(
        F.explode(
            F.when(
                F.length(F.trim(F.col(text_col))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("token")
    )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


def zipf_stats(
    docs: DataFrame, k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Corpus-health diagnostic: ln-ln OLS fit of the rank-frequency
    head (Zipf 1949 — natural text shows slope ≈ -1; heavily templated
    or deduplicated-to-death corpora drift away, so the slope is a
    one-number corpus smell test).

    One row: (n_terms, n_tokens, k_fit, zipf_slope, zipf_intercept)
    where the fit runs over the top `k_fit = min(k, n_terms)` terms by
    frequency (rank ties broken by term for determinism), x = ln rank,
    y = ln freq, closed-form OLS. 6-dp round at the output edge.

    Scale shape: term counts are one explode + map-side-partial hash
    aggregate (in-doc repetition collapses before the shuffle); the
    global totals are a second 1-row aggregate of that table; only the
    TOP-K head (k rows, driver-bounded) passes through the rank window
    — the fit never globally sorts the full vocabulary."""
    counts = corpus_token_counts(docs, text_col=text_col)
    counts = counts.localCheckpoint(eager=False)  # totals + head consumers
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    xy = head.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    fit = m.select(
        F.col("n").cast("long").alias("k_fit"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )
    return totals.crossJoin(fit).select(
        "n_terms", "n_tokens", "k_fit", "zipf_slope", "zipf_intercept"
    )


def vocab_topk(docs: DataFrame, k: int = 1000, text_col: str = "text") -> DataFrame:
    """Top-k corpus vocabulary by frequency → (rank, token, cnt),
    deterministic order (cnt DESC, token ASC). The only row-scale work is
    corpus_token_counts' map-side-partial aggregate; the top-k itself is
    a TakeOrderedAndProject (per-partition heaps, no full sort) and the
    rank window runs over the k-row result only."""
    from pyspark.sql import Window

    counts = corpus_token_counts(docs, text_col)
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return top.select(
        F.row_number().over(w).alias("rank"), "token", "cnt"
    )


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a top-k corpus
    vocabulary — the tokenizer-prep diagnostic (how much of each doc a
    k-entry word vocab would cover; high OOV → gibberish, rare langs, or
    a vocab trained on the wrong mix). Returns (id, n_tokens, n_oov,
    oov_rate); empty docs get oov_rate 0.0 (not NULL) so downstream
    aggregates never trip on NULL ratios.

    Scale shape: the vocab side is k rows → broadcast hash join against
    the exploded token stream; the only row-scale shuffle is the final
    per-doc aggregate keyed by id. Pass `vocab` (any frame with a
    `token` column, e.g. a persisted vocab_topk) to score against a
    FIXED vocabulary — the cross-corpus form (train-vocab vs new crawl)."""
    if vocab is None:
        vocab = vocab_topk(docs, k=k, text_col=text_col)
    vocab = vocab.select("token").distinct().withColumn("__in_v", F.lit(1))
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(F.trim(F.col(text_col))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("token"),
    )
    scored = toks.join(F.broadcast(vocab), "token", "left")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    # left join back so token-less docs appear with zeros
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.coalesce("n_oov", F.lit(0))
                    / F.coalesce("n_tokens", F.lit(0)).cast("double")
                ),
                6,
            ).alias("oov_rate"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    broadcast_counts: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document unigram-LM score — the perplexity-proxy quality
    signal (the CCNet/CC-100 recipe uses a KenLM 5-gram; a unigram model
    is the degenerate case with the same plumbing: train counts on a
    reference corpus, score every doc by mean negative log-probability;
    low = fluent/common, high = gibberish/rare-token soup).

    `counts` defaults to counts over `docs` itself (self-scoring).
    Additive (Laplace) smoothing: p(tok) = (cnt + alpha) / (N + alpha·V).

    Scale shape: with broadcast_counts=True the vocabulary ships to every
    executor and the corpus NEVER shuffles — right whenever the vocab is
    ≪ corpus (always, by Zipf; CCNet prunes its LM vocab anyway). The
    per-token logprob lookup is a broadcast hash join keyed by token —
    skew-free because the probe side streams. For a vocabulary too big
    to broadcast, pass broadcast_counts=False (shuffle join; enable AQE
    skew handling — 'the' lands on one reducer otherwise).

    Output: (id, n_tokens, avg_neg_logprob) — avg_neg_logprob null for
    empty docs."""
    if counts is None:
        # pin the self-built model: the totals collect below AND the lp
        # broadcast both consume it — unpinned, the corpus token pass
        # runs twice per scoring job. Vocab-sized materialization.
        counts = corpus_token_counts(docs, text_col, parallelism)
        counts = counts.localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, vocab = totals["n"] or 0, totals["v"] or 0
    denom = float(n_total) + alpha * float(vocab)
    lp = counts.select(
        "token",
        (-F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom))).alias("__nlp"),
    )
    if parallelism:
        docs = docs.repartition(parallelism)
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.when(
                F.length(F.trim(F.col(text_col))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("token"),
    )
    joined = exploded.join(
        F.broadcast(lp) if broadcast_counts else lp, "token", "left"
    )
    oov_nlp = -math.log(alpha / denom) if denom > 0 else 0.0
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("token").alias("n_tokens"),
            # the explode_outer null row (empty doc) must not score as OOV:
            # avg over zero non-null terms → null
            F.round(
                F.avg(
                    F.when(
                        F.col("token").isNotNull(),
                        F.coalesce("__nlp", F.lit(oov_nlp)),
                    )
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document top-k salient terms by TF-IDF — the cheap keyword /
    feature-extraction step used to tag, cluster, or domain-mix a
    training corpus. tf = in-doc term count, idf = ln(N / df) with df =
    number of docs containing the term.

    Scale shape (all Catalyst, no Python):
      - the tf aggregate keys on (doc, term) — the key embeds the doc
        id, so corpus-hot terms ('the') can never concentrate load, and
        in-doc repetition collapses map-side before the shuffle;
      - df aggregates the tf OUTPUT (already one row per doc-term), so
        the second shuffle is bounded by distinct doc-terms, and its
        result (the document-frequency dictionary ≈ vocabulary) is
        broadcast back — the doc-term stream never shuffles again;
      - ranking is a PER-DOC window (no global sort). Ranking key is
        (round(tfidf, 6) DESC, term ASC): the rounding makes cross-
        engine float ULP noise tie instead of rank-flip, and the term
        tie-break makes the output fully deterministic.

    Output: (id, term, tf, tfidf, rank), rank 1..k; docs with no tokens
    emit no rows. Empty-text docs are a curation concern, not a keyword
    one."""
    if parallelism:
        docs = docs.repartition(parallelism)
    exploded = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(F.trim(F.col(text_col))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("term"),
    )
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    byd = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(byd))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", F.col("rank").cast("long"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval: top-k documents for a bag of query terms
    (Robertson/Spärck Jones; the standard first-stage ranker) — the
    corpus-search primitive behind near-match decontamination and
    "find documents like this" curation triage.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)),
    idf = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene non-negative
    form). ROUND(,6) + id tie-break for cross-engine rank determinism.

    Scale shape (all Catalyst): ONE token pass total — a per-doc
    aggregate computes the doc length AND a conditional tf count per
    query term in the same hash aggregate (the query is literal-sized,
    so per-term columns beat a (doc, term) posting shuffle), pinned at
    the narrow (id, len, tf…) grain; df for every term and N/avglen
    then come from a single 1-row rollup of that frame, broadcast back,
    and the score is an in-row Σ over the term columns. The previous
    four-consumer form (lens, tf, df, stats) re-ran the corpus token
    explode per consumer. Final ranking is TakeOrdered top-k, no global
    sort."""
    from eventanalysis_spark.operators.dedup import _tokens

    # dedup (order-preserving): the old posting-stream form scored a
    # repeated query term once (distinct (doc, term) grain) — the
    # per-term-column form must too
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        # empty query -> empty result (the old posting-stream form's
        # isin([]) behavior), not an index error on the term columns
        return (
            docs.select(
                F.col(id_col), F.lit(0.0).alias("bm25")
            ).limit(0)
        )
    tf_cols = [f"__tf{i}" for i in range(len(terms))]
    per_doc = (
        docs.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__t")
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__len"),
            *[
                F.count(F.when(F.col("__t") == t, 1)).alias(c)
                for t, c in zip(terms, tf_cols)
            ],
        )
        .localCheckpoint(eager=False)
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__len").alias("__avglen"),
        *[
            F.count(F.when(F.col(c) > 0, 1)).alias(f"__df{i}")
            for i, c in enumerate(tf_cols)
        ],
    )

    def _term_score(i: int):
        tf, df_ = F.col(tf_cols[i]), F.col(f"__df{i}")
        idf = F.log((F.col("__n") - df_ + 0.5) / (df_ + 0.5) + 1.0)
        norm = tf * (k1 + 1) / (
            tf + k1 * (1.0 - b + b * F.col("__len") / F.col("__avglen"))
        )
        # absent terms contribute exactly 0, matching the old inner-join
        # posting stream (which simply had no row for them)
        return F.when(tf > 0, idf * norm).otherwise(F.lit(0.0))

    total = _term_score(0)
    for i in range(1, len(terms)):
        total = total + _term_score(i)
    match_any = None
    for c in tf_cols:
        cond = F.col(c) > 0
        match_any = cond if match_any is None else (match_any | cond)
    scored = (
        per_doc.where(match_any)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(total, 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "bm25")
    )


def _bigram_pairs(text_col: str) -> Column:
    """Adjacent-token pair stream as an array<struct<w1,w2>> column,
    built JVM-side with zip_with over two slices of the token array (no
    posexplode self-join, no Python)."""
    t = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    n = F.size(t)
    return F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def corpus_bigram_counts(
    docs: DataFrame, text_col: str = "text", parallelism: int | None = None
) -> DataFrame:
    """Bigram counts over the corpus: (w1, w2, cnt). The adjacent-pair
    stream comes from `_bigram_pairs` (pure Catalyst), then ONE
    map-side-partial hash aggregate — exactly the `corpus_token_counts`
    shape one order up. The shuffled volume is per-task DISTINCT bigrams,
    which Zipf keeps far below the pair stream; the aggregate key is
    (w1, w2) so even 'of the' is a single partial row per task."""
    if parallelism:
        docs = docs.repartition(parallelism)
    exploded = docs.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    return exploded.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))


def bigram_logprob_scores(
    docs: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    broadcast_counts: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document bigram-LM fluency score — one order up from
    `unigram_logprob_scores` and one order down from the KenLM 5-gram the
    CCNet recipe uses; the same train-counts-then-score plumbing with a
    conditional model:

        p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)

    with additive smoothing over V = |distinct successor vocabulary|.
    Context counts c(w1) are the row sums of the bigram table itself
    (contexts are counted only where a successor exists), so a single
    `counts` frame fully determines the model — persist it once, score
    any number of crawls against it.

    Unseen (w1,w2) with a KNOWN context backs off to alpha/(c(w1)+alpha*V);
    an unknown context scores the flat 1/V. Self-scoring (counts=None)
    never hits either path.

    Scale shape: with broadcast_counts=True the model ships to executors
    and the corpus never shuffles — the per-pair lookup is two broadcast
    hash joins (bigram row, then context row), probe side streaming, so
    there is no hot-key reducer for 'of the'-scale bigrams. For a model
    too big to broadcast pass broadcast_counts=False (shuffle join; AQE
    skew handling applies). The score is avg(-ln p) rounded to 6 dp —
    the same fixed-point convention the sibling operators use so the
    DuckDB oracle can replay it bit-for-bit.

    Output: (id, n_bigrams, avg_neg_logprob) — null score for docs with
    fewer than two tokens."""
    if counts is None:
        # pin the self-built model: consumed by the vocab collect, the
        # bigram broadcast AND the ctx broadcast — 3 corpus pair passes
        # without the pin. Bigram-vocab-sized materialization.
        counts = corpus_bigram_counts(docs, text_col, parallelism)
        counts = counts.localCheckpoint(eager=False)
    totals = counts.agg(
        F.count_distinct("w2").alias("v")
    ).collect()[0]
    vocab = float(totals["v"] or 0)
    ctx = counts.groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    if parallelism:
        docs = docs.repartition(parallelism)
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_pairs(text_col)).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bcast = F.broadcast if broadcast_counts else (lambda d: d)
    joined = exploded.join(
        bcast(counts), ["w1", "w2"], "left"
    ).join(bcast(ctx), ["w1"], "left")
    # three tiers: seen bigram / unseen-in-known-context / unknown context
    denom = F.col("ctx_cnt") + F.lit(alpha) * F.lit(vocab)
    nlp = F.when(
        F.col("ctx_cnt").isNull(),
        F.lit(-math.log(1.0 / vocab) if vocab > 0 else 0.0),
    ).otherwise(
        -F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha)) / denom)
    )
    return joined.groupBy(id_col).agg(
        F.count("w1").alias("n_bigrams"),
        F.round(
            F.avg(F.when(F.col("w1").isNotNull(), nlp)), 6
        ).alias("avg_neg_logprob"),
    )


def kneser_ney_bigram_scores(
    docs: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_counts: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document fluency under an interpolated Kneser-Ney bigram LM —
    the smoothing the additive sibling (`bigram_logprob_scores`) trades
    away, and the one real n-gram toolkits (KenLM/SRILM; Kneser & Ney
    1995, Chen & Goodman 1999) default to. KN fixes the additive model's
    core bias: "Francisco" is frequent but only ever follows "San", so
    its UNIGRAM fallback weight should be tiny — continuation probability
    counts distinct CONTEXTS, not raw frequency.

        p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1) + λ(w1)·p_cont(w2)
        λ(w1)    = D · N1+(w1·)/c(w1)        (mass freed by discounting)
        p_cont   = (N1+(·w2) + 1)/(T + V)    (add-1 over bigram TYPES,
                                              T = Σ types, V = |succ vocab|)

    Unseen pair in a known context → the λ·p_cont term alone; unknown
    context → p_cont(w2) directly; unknown w2 → 1/(T+V) floor, so every
    score is finite. Self-scoring (counts=None) only exercises the seen
    path. All three model frames (bigram counts, per-context totals +
    successor-type counts, per-word continuation) derive from the ONE
    persisted `counts` table.

    Scale shape: identical to the sibling — model frames broadcast
    (broadcast_counts=False for shuffle join + AQE), the corpus pair
    stream only probes, per-doc aggregate is the one row-scale shuffle.
    avg(-ln p) rounded to 6 dp for the cross-engine oracle.

    Output: (id, n_bigrams, avg_neg_logprob) — null score below 2 tokens."""
    if counts is None:
        # pin the self-built model: consumed by the T/V collect + the
        # counts/ctx/pcont broadcasts — 4 corpus pair passes without it.
        counts = corpus_bigram_counts(docs, text_col, parallelism)
        counts = counts.localCheckpoint(eager=False)
    tot = counts.agg(
        F.count(F.lit(1)).alias("t"), F.count_distinct("w2").alias("v")
    ).collect()[0]
    tv = float((tot["t"] or 0) + (tot["v"] or 0))
    ctx = counts.groupBy("w1").agg(
        F.sum("cnt").alias("ctx_cnt"), F.count(F.lit(1)).alias("n_succ")
    )
    pcont = counts.groupBy("w2").agg(
        ((F.count(F.lit(1)) + F.lit(1.0)) / F.lit(tv)).alias("p_cont")
    )
    if parallelism:
        docs = docs.repartition(parallelism)
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_pairs(text_col)).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bcast = F.broadcast if broadcast_counts else (lambda d: d)
    joined = (
        exploded.join(bcast(counts), ["w1", "w2"], "left")
        .join(bcast(ctx), ["w1"], "left")
        .join(bcast(pcont), ["w2"], "left")
    )
    pc = F.coalesce(F.col("p_cont"), F.lit(1.0 / tv if tv > 0 else 1.0))
    lam = F.lit(discount) * F.col("n_succ") / F.col("ctx_cnt")
    p_known = (
        F.greatest(
            F.coalesce(F.col("cnt"), F.lit(0)) - F.lit(discount), F.lit(0.0)
        )
        / F.col("ctx_cnt")
        + lam * pc
    )
    nlp = -F.log(F.when(F.col("ctx_cnt").isNull(), pc).otherwise(p_known))
    return joined.groupBy(id_col).agg(
        F.count("w1").alias("n_bigrams"),
        F.round(
            F.avg(F.when(F.col("w1").isNotNull(), nlp)), 6
        ).alias("avg_neg_logprob"),
    )
