"""Corpus-level analytics: source-overlap matrix and the corpus card.

Training-data curation works at three zoom levels — per-doc (quality,
dedup flags), per-pair (near-duplicate candidates), and per-CORPUS:
"how much does crawl A overlap crawl B?", "what is the lang/source
composition and token budget of this snapshot?". These two operators
are that third level; their outputs are tiny (|sources|² and
|langs|+1 rows) regardless of corpus size.

The reference engine has no comparable operator; this is part of the
training-data-pipeline surface the mission brief makes first-class.

Spark-first shape:
  - `source_overlap` reduces the corpus to DISTINCT (source, shingle)
    pairs first — one map-side-partial distinct aggregate keyed by the
    8-byte shingle hash (in-source repetition collapses before the
    shuffle; Zipf makes the distinct set ≪ the token stream). The
    pairwise intersection is a self-join ON THE SHINGLE HASH: a shingle
    held by m sources emits m(m-1)/2 pair rows, and m is bounded by the
    source count (a dimension, not data) — so no mega-bucket risk.
  - `corpus_report` is ONE pass with ROLLUP(lang): Spark expands
    grouping sets map-side and every aggregate is partial-aggregatable.

At 100 TB you would swap the exact distinct-shingle set for the
per-source MinHash union (operators/dedup.py signatures are mergeable:
elementwise min across docs) — same API, sketched instead of exact;
the exact form here IS the oracle-checkable semantics definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def source_shingles(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    parallelism: int | None = None,
) -> DataFrame:
    """DISTINCT (group, shingle_hash) pairs — the per-source content
    set. Tokenization matches spans.ngram_windows (trim + split on
    whitespace runs); docs shorter than k tokens contribute nothing.
    Entirely JVM-side."""
    if parallelism:
        docs = docs.repartition(parallelism)
    toks = docs.select(
        F.col(group_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    )
    grams = toks.select(
        group_col,
        F.explode(
            F.expr(
                f"CASE WHEN size(t) >= {k} THEN"
                f" transform(sequence(1, size(t) - {k - 1}),"
                f" i -> xxhash64(concat_ws(' ', slice(t, i, {k}))))"
                f" ELSE array() END"
            )
        ).alias("sh"),
    )
    return grams.distinct()


def source_overlap(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    parallelism: int | None = None,
) -> DataFrame:
    """Pairwise content overlap between sources: one row per unordered
    source pair (a < b) with exact shingle-set sizes and Jaccard.

    Output: (source_a, source_b, n_a, n_b, n_common, jaccard) with
    jaccard = |A∩B| / (|A|+|B|−|A∩B|), rounded to 6 decimals. Pairs
    with no common shingles are absent (a 0-overlap row carries no
    information and would force an |S|² generate step)."""
    sh = source_shingles(docs, k, text_col, group_col, parallelism)
    sizes = sh.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{group_col}") < F.col(f"b.{group_col}")),
        )
        .groupBy(
            F.col(f"a.{group_col}").alias("source_a"),
            F.col(f"b.{group_col}").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz = F.broadcast(sizes)
    return (
        common.join(
            sz.select(F.col(group_col).alias("source_a"), F.col("n").alias("n_a")),
            "source_a",
        )
        .join(
            sz.select(F.col(group_col).alias("source_b"), F.col("n").alias("n_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The corpus card: per-language composition plus an ALL total, in
    one ROLLUP pass (map-side grouping-set expansion, all aggregates
    partial). Output per row: (lang — 'ALL' for the grand total,
    n_docs, n_tokens, n_chars, avg_tokens, min_chars, max_chars)."""
    t = F.trim(F.col(text_col))
    ntok = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    return (
        docs.select(
            F.col(lang_col).alias("lang"),
            ntok.alias("__ntok"),
            F.length(F.col(text_col)).alias("__nchr"),
        )
        .rollup("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__ntok").alias("n_tokens"),
            F.sum("__nchr").alias("n_chars"),
            F.round(F.avg("__ntok"), 6).alias("avg_tokens"),
            F.min("__nchr").alias("min_chars"),
            F.max("__nchr").alias("max_chars"),
            # grouping() distinguishes the rollup total from a real NULL
            # lang value (which stays its own '?' group, P8 semantics)
            F.grouping("lang").alias("__g"),
        )
        .select(
            F.when(F.col("__g") == 1, F.lit("ALL"))
            .otherwise(F.coalesce("lang", F.lit("?")))
            .alias("lang"),
            "n_docs",
            "n_tokens",
            "n_chars",
            "avg_tokens",
            "min_chars",
            "max_chars",
        )
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """Corpus inverted index: (term, df, postings) — exact document
    frequency for EVERY term, plus the sorted posting list (comma-joined
    doc ids) for terms whose list is small enough to materialize.

    Scale shape (the honest one): df comes from a count aggregate over
    DISTINCT (term, doc) pairs — fully partial-aggregatable, safe for
    stopwords with 10^11-doc posting lists. The posting LIST, by
    contrast, is a per-term collect: a hot term's list cannot fit one
    reducer at web scale, so lists are only built for terms with
    df <= `max_postings` (hot terms keep exact df, postings NULL). The
    df pre-pass bounds every collected group BEFORE collect_list runs —
    there is no "collect then truncate" step that would still
    materialize the mega-list. With max_postings=None every list is
    built (small-corpus / test mode).

    Posting order is numeric by id (sort_array on the typed column,
    stringified after sorting), so '10' sorts after '2'."""
    pairs = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .distinct()
    )
    dfc = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    eligible = (
        dfc.where(F.col("df") <= max_postings) if max_postings is not None else dfc
    )
    posts = (
        pairs.join(eligible.select("term"), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.expr("transform(sort_array(collect_list(__id)), x -> CAST(x AS STRING))"),
                ",",
            ).alias("postings")
        )
    )
    return dfc.join(posts, "term", "left").select("term", "df", "postings")


def phrase_matches(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search via the positional-index anchor trick:
    (doc_id, n_matches, first_pos) for every document containing the
    token sequence `phrase` (whitespace tokenization — the same rule as
    inverted_index, so the two share a vocabulary).

    Algorithm (Manning/Raghavan/Schütze IR ch. 2, positional
    intersection recast as ONE aggregate): each posting (doc, pos) of
    phrase term i votes for anchor = pos - i; an anchor that collects
    ALL k distinct offsets is a phrase occurrence. Repeated terms in the
    phrase are handled for free — offsets stay distinct even when terms
    don't.

    Scale shape: the (term, offset) phrase frame is literal-sized →
    broadcast; the corpus explode is filtered to PHRASE TERMS ONLY by
    that join before anything shuffles, so the aggregate moves
    |postings of k terms| rows, not the corpus. No self-joins, no
    windows, no Python."""
    toks = phrase.split()
    if not toks:
        raise ValueError("phrase must contain at least one token")
    k = len(toks)
    spark = docs.sparkSession
    ph = spark.createDataFrame(
        [(t, i) for i, t in enumerate(toks)], "term string, off int"
    )
    postings = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "term"
        ),
    )
    anchors = (
        postings.join(F.broadcast(ph), "term")
        .groupBy("doc_id", (F.col("pos") - F.col("off")).alias("anchor"))
        .agg(F.count_distinct("off").alias("nf"))
        .where((F.col("nf") == k) & (F.col("anchor") >= 0))
    )
    return (
        anchors.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("anchor").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def source_overlap_sketch(
    docs: DataFrame,
    num_hashes: int = 16,
    k: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sketched `source_overlap` — the 100 TB path this module's
    docstring promises: each source keeps a UNION MinHash (elementwise
    min of its documents' signatures — mergeable and fully
    partial-aggregatable, so a source's sketch is `num_hashes` longs no
    matter how many petabytes it holds), and pairwise overlap is the
    Jaccard ESTIMATE = fraction of matching signature positions
    (standard MinHash identity, E[match frac] = J). Standard error
    ≈ sqrt(J(1-J)/num_hashes).

    Output: (source_a, source_b, jaccard_est) for every unordered pair
    of sources that contain at least one shingle (unlike the exact
    form, 0-overlap pairs ARE present — the sketch join is |S|², a
    dimension-sized frame). Shingling follows dedup.shingles (short
    docs yield one whole-text shingle); only EMPTY documents are
    dropped (their -1 sentinel signature would poison the union min).

    Scale shape: ONE corpus pass (narrow signature projection), one
    tiny groupBy(source) with per-position min aggregates, and a
    |S|²-row nested-loop join of two broadcast-sized sketch frames.
    The distinct shingle set of `source_overlap` is never built.
    hash_fn='md5' selects the SQL-replicable base hash (exact DuckDB
    oracle of the full sketch pipeline)."""
    from eventanalysis_spark.operators.dedup import minhash_signatures

    # Drop empty documents on the RAW text, not via `sig[0] != -1`: a
    # post-signature filter gets predicate-pushed below the projection,
    # and Catalyst inlines the ENTIRE 16-transform signature expression
    # (shingling re-inlined into every transform) into the Filter — each
    # row then re-shingles ~17x in interpreted (non-codegen) HOF eval.
    # Measured 86s -> ~2s at 5k docs. Semantics identical: sig==[-1]*
    # iff the tokenizer yields nothing iff trim(text) is empty/null.
    sigs = minhash_signatures(
        docs.where(F.length(F.trim(F.col(text_col))) > 0),
        text_col=text_col, id_col=group_col,
        num_hashes=num_hashes, shingle_k=k, hash_fn=hash_fn,
    )
    union = (
        sigs.groupBy(F.col("doc_id").alias(group_col))
        .agg(*[
            F.min(F.col("sig")[i]).alias(f"__m{i}")
            for i in range(num_hashes)
        ])
        # |S| rows x num_hashes longs — dimension-sized. Pin it so the
        # a x b self-join below reads the sketch once instead of running
        # the full corpus signature pass on BOTH join sides (ranks.py
        # pattern: lazy localCheckpoint, materialized by the first
        # action, shared by both aliases).
        .localCheckpoint(eager=False)
    )
    a, b = union.alias("a"), union.alias("b")
    matches = None
    for i in range(num_hashes):
        m = (F.col(f"a.__m{i}") == F.col(f"b.__m{i}")).cast("int")
        matches = m if matches is None else matches + m
    return (
        a.join(b, F.col(f"a.{group_col}") < F.col(f"b.{group_col}"))
        .select(
            F.col(f"a.{group_col}").alias("source_a"),
            F.col(f"b.{group_col}").alias("source_b"),
            F.round(matches / F.lit(float(num_hashes)), 6).alias("jaccard_est"),
        )
    )


def _statused_delta(
    old: DataFrame, new: DataFrame, key_col: str, content_col: str
) -> DataFrame:
    """Shared core of snapshot_delta/_stats: hash-projected full outer
    join + status column. Presence is tracked with explicit flags, NOT
    hash-IS-NULL — a row whose content is NULL is still PRESENT (its
    hash is NULL because md5(NULL) is NULL), and NULL-vs-NULL content
    compares 'unchanged' via the null-safe equality."""
    o = old.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(content_col)).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(content_col)).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    return o.join(n, "key", "full_outer").select(
        "key",
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Crawl-over-crawl diff: compare two corpus snapshots by key and
    report every row whose state changed — status 'added' (key only in
    the new snapshot), 'removed' (only in the old), 'changed' (present
    in both, content hash differs; NULL content is null-safely compared,
    not conflated with absence). UNCHANGED rows are deliberately
    absent: at web scale they dominate the corpus and carry no
    information (use `snapshot_delta_stats` for their count).

    Output: (key, status, old_hash, new_hash), deterministic.

    Scale shape: content reduces to an md5 BEFORE the join, so the full
    outer join shuffles two (key, 32-byte hash) projections — never the
    payload. On Iceberg both snapshots are the same table's partitions:
    bucket both sides by the key and the join is co-located (no
    shuffle); incremental-scan metadata can pre-prune files shared by
    both snapshots."""
    return _statused_delta(old, new, key_col, content_col).where(
        F.col("status") != "unchanged"
    )


def snapshot_delta_stats(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Corpus-level churn summary of `snapshot_delta`, unchanged
    included: (status, n) — one partial-aggregatable count over the
    hash-projected full outer join."""
    return (
        _statused_delta(old, new, key_col, content_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def snapshot_churn(
    old: DataFrame,
    new: DataFrame,
    group: Column | str,
    key_col: str = "url",
    content_col: str = "text",
    group_name: str = "grp",
) -> DataFrame:
    """Per-group churn rollup of the crawl-over-crawl diff — the
    grouped companion to `snapshot_delta_stats` (which is corpus-level
    only). `group` is any expression over the diff's `key` column
    (a plain column name is accepted and wrapped, matching the
    str-or-Column convention of the sibling snapshot_delta* operators),
    typically the url host: which hosts are volatile between crawls,
    which are frozen.

    Output: (group_name, n_added, n_removed, n_changed, n_unchanged,
    n_total, churn_ratio) with churn_ratio = (added+removed+changed) /
    total as an IEEE double (exact long division — oracle-replicable
    bit-for-bit).

    Scale shape: inherits `_statused_delta`'s hash-before-join
    projection (payloads never cross the exchange), then ONE
    conditional-SUM hash aggregate with map-side partial combine — no
    pivot, no per-status shuffle, result rows = |hosts|."""
    if isinstance(group, str):
        group = F.col(group)
    d = _statused_delta(old, new, key_col, content_col)

    def n_of(s: str) -> Column:
        return (
            F.sum(F.when(F.col("status") == s, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{s}")
        )

    agg = d.groupBy(group.alias(group_name)).agg(
        *[n_of(s) for s in ("added", "removed", "changed", "unchanged")],
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    churn = (
        F.col("n_added") + F.col("n_removed") + F.col("n_changed")
    ).cast("double") / F.col("n_total").cast("double")
    return agg.withColumn("churn_ratio", churn)


def change_rate_estimates(
    snapshots: DataFrame,
    group: Column | str = "key",
    crawl_col: str = "crawl_id",
    key_col: str = "url",
    content_col: str = "text",
    group_name: str = "grp",
) -> DataFrame:
    """Per-group page-change-rate estimation over a MULTI-crawl history
    (Cho & Garcia-Molina, "Estimating frequency of change", ACM TOIT
    2003) — the statistical upgrade of the two-snapshot `snapshot_churn`:
    given k observations of each url, estimate the Poisson change rate
    and the revisit interval a crawler should schedule.

    Per consecutive same-url observation pair, the page "changed" when
    the content hash differs (null-safe). Per group (typically the url
    host, via any expression over `key`):

      (group_name, n_pairs, n_changed, change_ratio r,
       lambda_hat = -ln(1 - r), revisit_interval = 1/lambda_hat)

    -ln(1-r) is the paper's consistent estimator for sync-access
    sampling (observed change is a CENSORED signal — two changes
    between visits look like one; the log un-censors it under the
    Poisson model). r = 1 (changed every single visit) censors
    completely: lambda_hat/revisit_interval are NULL — the caller
    schedules such hosts at the crawl cadence floor. Ratios and rates
    round to 6 dp at the output edge (engine-portable libm rule).

    Scale shape: content reduces to an md5 hash in the scan projection,
    ONE url-keyed shuffle for the lag window (the sessionize shape —
    urls are near-unique keys, no skew), then one partial-aggregatable
    group rollup. Payloads never cross an exchange."""
    from pyspark.sql import Window

    # `group` is any expression over the observation frame's `key`
    # column (the snapshot_churn convention); a plain string is wrapped.
    if isinstance(group, str):
        group = F.col(group)
    h = F.md5(F.coalesce(F.col(content_col), F.lit("\x00null")))
    # hash tie-break: a duplicated (key, crawl) observation still yields
    # a deterministic lag order instead of a partitioning-dependent one
    w = Window.partitionBy("key").orderBy("crawl", "h")
    obs = snapshots.select(
        F.col(key_col).alias("key"),
        F.col(crawl_col).alias("crawl"),
        h.alias("h"),
    ).withColumn("prev_h", F.lag("h").over(w))
    pairs = obs.where(F.col("prev_h").isNotNull()).select(
        group.alias(group_name),
        F.when(F.col("h") != F.col("prev_h"), 1).otherwise(0).alias("chg"),
    )
    agg = pairs.groupBy(group_name).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("chg").cast("long").alias("n_changed"),
    )
    r = F.col("n_changed").cast("double") / F.col("n_pairs").cast("double")
    lam = F.when(
        F.col("n_changed") < F.col("n_pairs"), -F.log(F.lit(1.0) - r)
    )
    return (
        agg.withColumn("change_ratio", F.round(r, 6))
        .withColumn("lambda_hat", F.round(lam, 6))
        .withColumn(
            "revisit_interval",
            F.round(F.when(lam > 0, F.lit(1.0) / lam), 6),
        )
        .orderBy(group_name)
    )


def kmv_distinct_sketch(
    df: DataFrame,
    key_col: str = "url",
    group_col: str = "source",
    k: int = 64,
    emit_minima: bool = False,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et
    al., RANDOM 2002): keep the k smallest DISTINCT 60-bit hash values
    of the key; when a group holds >= k distinct hashes the cardinality
    estimate is the standard (k-1) * SPACE / h_k, otherwise the count of
    minima IS the exact distinct count. The k-min set is a monoid —
    union two sketches and re-take the k smallest — so per-source
    distinct-url cardinality over a 10^12-row crawl is k longs per
    source, mergeable across crawls and partitions (the same shape that
    makes source_overlap_sketch scale).

    Scale shape: the (group, hash) pre-aggregate is partial-aggregatable
    (map-side combine collapses repeated keys BEFORE the shuffle — a
    hot url never travels more than once per task), the rank window
    orders only the distinct hashes within each group, and the final
    per-group rollup is a tiny hash aggregate. No COUNT(DISTINCT)
    expansion, no unbounded collect_set. Null keys are excluded (a null
    hash would rank below/above real minima differently per engine).

    Output: (group_col, n_minima, kth_min, distinct_est) — one row per
    group; relative error ~ 1/sqrt(k-2). 60-bit md5 hash keeps the
    whole sketch DuckDB-replicable (dedup.hash60_md5). With
    emit_minima=True the row also carries the k-min SET itself
    (array<long>, ≤ k elements by construction — collect_list runs on
    the already-rank-capped frame, so it is bounded, not a mega-list),
    which is what `kmv_merge` folds across crawls/partitions."""
    from pyspark.sql import Window

    from eventanalysis_spark.operators.dedup import hash60_md5

    dh = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("__g"), hash60_md5(F.col(key_col)).alias("__h"))
        .groupBy("__g", "__h")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("__g").orderBy("__h")
    topk = dh.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    aggs = [
        F.count(F.lit(1)).alias("__m"),
        F.max("__h").alias("__hk"),
    ]
    if emit_minima:
        aggs.append(F.array_sort(F.collect_list("__h")).alias("__minima"))
    out_cols = [
        F.col("__g").alias(group_col),
        F.col("__m").cast("long").alias("n_minima"),
        F.col("__hk").cast("long").alias("kth_min"),
        _kmv_estimate(F.col("__m"), F.col("__hk"), k).alias("distinct_est"),
    ]
    if emit_minima:
        out_cols.append(F.col("__minima").alias("minima"))
    return topk.groupBy("__g").agg(*aggs).select(*out_cols)


def _kmv_estimate(m: Column, hk: Column, k: int) -> Column:
    """(k-1)*2^60/h_k when the group reached k minima, else exact m."""
    return F.when(m < k, m.cast("double")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(2**60)) / hk.cast("double"), 4
        )
    )


def kmv_merge(sketches: DataFrame, k: int, group_col: str = "source") -> DataFrame:
    """Fold KMV sketches (rows from `kmv_distinct_sketch(...,
    emit_minima=True)`, possibly from different crawls/partitions of the
    same group universe) into one sketch per group: union the k-min
    sets, dedupe, re-take the k smallest, re-estimate. The k-min set is
    a monoid, so merging per-crawl sketches equals sketching the
    concatenated corpus — distinct-count tracking across 10^12-row
    snapshots without ever rescanning old data.

    Shape: explode of ≤k-element arrays → the same bounded
    (group, hash) distinct + rank-window + rollup as the base sketch;
    input is dimension-sized (|groups| × k), never corpus-sized."""
    from pyspark.sql import Window

    dh = (
        sketches.select(
            F.col(group_col).alias("__g"), F.explode("minima").alias("__h")
        )
        .distinct()
    )
    w = Window.partitionBy("__g").orderBy("__h")
    topk = (
        dh.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    )
    return (
        topk.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.max("__h").alias("__hk"),
            F.array_sort(F.collect_list("__h")).alias("__minima"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__m").cast("long").alias("n_minima"),
            F.col("__hk").cast("long").alias("kth_min"),
            _kmv_estimate(F.col("__m"), F.col("__hk"), k).alias("distinct_est"),
            F.col("__minima").alias("minima"),
        )
    )


def corpus_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-distribution divergence between two corpora — the
    domain-shift / drift measurement run before mixing a new crawl or
    source into a training set (the corpus-level companion of
    selection.dsir_logweights, which scores per-document): KL(A‖B),
    KL(B‖A) and the symmetric bounded Jensen-Shannon divergence of the
    two Laplace(+1)-smoothed unigram LMs over the SHARED vocabulary
    (union; a token unseen on one side still gets the +1 floor there,
    so no special OOV path and every log is finite).

    Output: ONE row — (n_tokens_a, n_tokens_b, vocab_size, kl_ab,
    kl_ba, js_div), divergences in nats, ROUND(,6) for cross-engine
    float reproducibility (sum order differs between engines; with
    O(10^5)-term sums of O(1) addends the error is ~1e-11 ≪ 1e-6).

    Scale shape: two map-side-partial token-count aggregates collapse
    each corpus to its dictionary BEFORE any join; one full-outer
    dictionary⋈dictionary join; totals ride a broadcast 1-row frame;
    final reduction is a single global aggregate. The corpora
    themselves are never joined or shuffled."""
    from eventanalysis_spark.operators.dedup import _tokens

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(name))
        )

    joined = (
        counts(docs_a, "ca")
        .join(counts(docs_b, "cb"), "tok", "full_outer")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = joined.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    j = joined.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")).cast("double")
    m = (pa + pb) / F.lit(2.0)
    return j.agg(
        F.max("na").cast("long").alias("n_tokens_a"),
        F.max("nb").cast("long").alias("n_tokens_b"),
        F.max("v").cast("long").alias("vocab_size"),
        F.round(F.sum(pa * F.log(pa / pb)), 6).alias("kl_ab"),
        F.round(F.sum(pb * F.log(pb / pa)), 6).alias("kl_ba"),
        F.round(
            F.sum(pa * F.log(pa / m)) * 0.5 + F.sum(pb * F.log(pb / m)) * 0.5, 6
        ).alias("js_div"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over ADJACENT
    token pairs: PMI = ln(p(a,b) / (p(a)·p(b))) with pair probability
    over the bigram stream and unigram probabilities over the token
    stream. The corpus-level association miner (phrase detection,
    tokenizer-merge candidates) next to the per-doc top-ngram stats
    (webfilter.top_ngram_stats) and per-doc TF-IDF keywords.

    Scale shape: bigram generation is a JVM-side transform/explode
    (narrow); pair counts are ONE hash aggregate keyed by (a, b) — the
    key embeds both tokens, so hot single tokens do not concentrate;
    the unigram dictionary and the two 1-row totals join as broadcasts
    (the corpus never reshuffles for scoring); min_count prunes the
    long tail BEFORE the joins; top-k is TakeOrderedAndProject on the
    6dp-rounded score with (term_a, term_b) tie-break — float noise at
    the boundary TIES across engines instead of rank-flipping.
    """
    from eventanalysis_spark.operators.dedup import _tokens

    td = docs.select(_tokens(F.col(text_col)).alias("__t")).where(
        F.size("__t") > 0
    )
    uni = (
        td.select(F.explode("__t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    # let-binding (NOTES rule): __t's tokenizer tree inlines into every
    # lambda-body reference after filter pushdown + project collapse —
    # bind once so the split doesn't re-run per bigram position
    def _bigrams(t):
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("term_a"),
                F.element_at(t, i + 1).alias("term_b"),
            ),
        )

    pairs = (
        td.where(F.size("__t") >= 2)
        .select(
            F.explode(
                F.get(F.transform(F.array(F.col("__t")), _bigrams), 0)
            ).alias("p")
        )
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    n_pairs = pairs.agg(F.sum("pair_cnt").alias("n_pairs"))
    ua, ub = uni.alias("ua"), uni.alias("ub")
    scored = (
        pairs.where(F.col("pair_cnt") >= min_count)
        .join(F.broadcast(ua), F.col("term_a") == F.col("ua.term"))
        .join(F.broadcast(ub), F.col("term_b") == F.col("ub.term"))
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "term_a",
            "term_b",
            "pair_cnt",
            F.round(
                F.log("pair_cnt")
                - F.log(F.col("ua.c"))
                - F.log(F.col("ub.c"))
                + 2 * F.log("n_uni")
                - F.log("n_pairs"),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "term_a", "term_b").limit(k)


def host_quality_profile(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host quality profile — the crawl-planning rollup that decides
    which hosts deserve recrawl budget: document volume, language spread,
    exact-duplicate rate (md5 text identity), Gopher-gate pass rate, and
    mean document length, in ONE host-keyed aggregate.

    Every metric is integer-derived (counts, exact distinct counts, long
    sums) with exactly one float division per ratio under the 6-dp round,
    so the result is partition-order independent and SQL-replicable.

    Scale shape: one hash aggregate keyed by host. The two exact distinct
    counts (lang, text-md5) expand the input ×2 before the partial
    aggregate, but partials collapse per (host, value) map-side, so the
    shuffle carries per-task distinct values, not rows. Hot hosts are
    bounded by their own distinct-value counts; there is no row-scale
    skew key. Output is host-cardinality — small enough to broadcast
    into routing decisions downstream."""
    from eventanalysis_spark.operators.webfilter import gopher_quality_flags

    g = gopher_quality_flags(F.col(text_col))
    per = docs.select(
        F.col(host_col).alias("host"),
        F.col(lang_col).alias("__lang"),
        F.md5(F.col(text_col)).alias("__h"),
        F.length(F.col(text_col)).cast("long").alias("__len"),
        g["keep"].cast("long").alias("__keep"),
    )
    n = F.count(F.lit(1))
    agg = per.groupBy("host").agg(
        n.alias("n_docs"),
        F.count_distinct("__lang").alias("n_langs"),
        (n - F.count_distinct("__h")).alias("n_dup_docs"),
        F.sum("__keep").alias("n_gopher_keep"),
        F.sum("__len").alias("__chars"),
    )
    return agg.select(
        "host",
        "n_docs",
        "n_langs",
        "n_dup_docs",
        F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias("dup_frac"),
        "n_gopher_keep",
        F.round(F.col("n_gopher_keep") / F.col("n_docs"), 6).alias(
            "gopher_keep_frac"
        ),
        F.round(F.col("__chars") / F.col("n_docs"), 6).alias("mean_chars"),
    )
