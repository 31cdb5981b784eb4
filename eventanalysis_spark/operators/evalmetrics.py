"""Classifier-evaluation and distribution-drift metrics, exactly.

Every filtering decision in a web-corpus pipeline is a threshold on a
score (quality, language confidence, toxicity, perplexity tier), and
every scorer upgrade is a drift question ("did the distribution move
between crawls?"). Auditing those decisions at corpus scale needs
metrics that are exact and partition-order independent, or two runs of
the same audit disagree in the 7th decimal and nobody trusts either:

  - ``roc_auc``            Mann-Whitney AUC with average tie ranks
  - ``threshold_sweep``    per-threshold TP/FP/FN/TN + precision /
                           recall / FPR (the full PR and ROC curves)
  - ``spearman_rho``       rank correlation between two scorers,
                           average-rank tie handling
  - ``ks_statistic``       two-sample Kolmogorov-Smirnov distance
                           (drift between crawls / sources / slices)
  - ``calibration_bins``   reliability-curve bins (predicted score
                           band vs observed positive rate)
  - ``classification_report``  per-class TP/FP/FN + precision /
                           recall / F1 for a label-vs-label comparison

The reference has no evaluation machinery (its analytics stop at
count/min/max rollups, Lcl.EventLog/Jobs/EventJob.Queries.cs); this is
at-scale pipeline surface the engine adds on top of its scorers
(classify.py, textstats.py, webfilter.py).

Scale design (the same shape as quantiles.exact_quantiles):

  1. collapse rows to DISTINCT score values with one map-side-partial
     hash aggregate — at web scale the value domain (scores, lengths,
     integer votes) is tiny next to row count, so this is the big
     reduction and the ONLY pass over the full table;
  2. the only ordered step is a cumulative sum over the collapsed
     values, done with the two-phase ranged cumsum
     (ranks.ranged_with_pid): per-partition totals feed broadcast
     offsets, so no single task ever holds the whole value domain;
  3. rank arithmetic is carried in DOUBLED integer units (the average
     tie rank cum_before + (cnt+1)/2 becomes the integer
     2·cum_before + cnt + 1), and corpus-scale sums are accumulated in
     decimal(38,0) so a 10^12-row input cannot overflow a long and the
     result stays bit-identical under any partitioning; each metric
     performs exactly ONE floating division (plus sqrt for rho) at the
     end, then the manual 6-dp round (NOTES rule: ROUND() HALF_UP on
     rational midpoints diverges between Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eventanalysis_spark.operators.ranks import ranged_with_pid

# decimal(19,0) factors multiply into decimal(38,0): exact products up
# to ~1e38, far above anything a 10^12-row corpus can produce.
_DEC = "decimal(19,0)"


def _round6(c: Column) -> Column:
    """Cross-engine-safe 6-dp round of a rational-valued double."""
    return F.signum(c) * F.floor(F.abs(c) * 1e6 + 0.5) / F.lit(1e6)


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _collapsed_cums(
    df: DataFrame,
    value: Column,
    parts: dict[str, Column],
    num_partitions: int,
) -> DataFrame:
    """Collapse `df` to distinct values of `value` with one hash
    aggregate summing each indicator in `parts`, then attach ascending
    cumulative sums (`cum_<name>`) and grand totals (`n_<name>`) via
    the two-phase ranged cumsum. Output one row per distinct value:
    (value, <name>…, cum_<name>…, n_<name>…)."""
    counts = (
        df.where(value.isNotNull())
        .groupBy(value.alias("value"))
        .agg(*[F.sum(c).alias(k) for k, c in parts.items()])
    )
    ranged = ranged_with_pid(counts, [F.col("value")], num_partitions)
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(F.lit(0))
    sel = [F.col("__pid")]
    for k in parts:
        sel.append(
            F.coalesce(F.sum(F.col(f"__p_{k}")).over(w_prev), F.lit(0)).alias(f"__off_{k}")
        )
        sel.append(F.sum(F.col(f"__p_{k}")).over(w_all).alias(f"n_{k}"))
    offsets = (
        ranged.groupBy("__pid")
        .agg(*[F.sum(k).alias(f"__p_{k}") for k in parts])
        .select(*sel)
    )
    # offsets has one row per range partition — always broadcastable.
    local = Window.partitionBy("__pid").orderBy("value")
    out = ranged.join(F.broadcast(offsets), "__pid")
    for k in parts:
        out = out.withColumn(f"cum_{k}", F.sum(k).over(local) + F.col(f"__off_{k}"))
    return out.drop("__pid", *[f"__off_{k}" for k in parts])


def roc_auc(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact ROC-AUC of `score_col` against boolean/0-1 `label_col`
    (Mann-Whitney U with average tie ranks). One row:
    (n_pos, n_neg, auc); auc is NULL when either class is empty.

    Rank-sum identity in doubled units: with distinct scores ascending,
    a value group of size c starting after cum_before rows has average
    rank cum_before + (c+1)/2, i.e. doubled rank 2·cum_before + c + 1;
    U = R_pos − P(P+1)/2 and AUC = U / (P·N) become
    AUC = (R2 − P·(P+1)) / (2·P·N) with R2 an exact integer."""
    lab = _col(label_col).cast("int")
    cum = _collapsed_cums(
        df, _col(score_col), {"pos": lab, "all": F.lit(1)}, num_partitions
    )
    rank2 = 2 * (F.col("cum_all") - F.col("all")) + F.col("all") + 1
    agg = cum.agg(
        F.sum(F.col("pos").cast(_DEC) * rank2.cast(_DEC)).alias("r2"),
        F.max("n_pos").alias("n_pos"),
        F.max(F.col("n_all") - F.col("n_pos")).alias("n_neg"),
    )
    p, n = F.col("n_pos").cast(_DEC), F.col("n_neg").cast(_DEC)
    auc = (F.col("r2") - p * (p + 1)).cast("double") / (
        F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), _round6(auc)).alias("auc"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    num_partitions: int = 32,
) -> DataFrame:
    """Confusion counts and PR/ROC points at EVERY distinct score,
    with "predict positive when score >= threshold". One row per
    distinct score value, descending: (threshold, tp, fp, fn, tn,
    precision, recall, fpr). Counts are exact longs; the three ratios
    are single divisions of those longs (NULL on an empty class).

    tp+fp ≥ the threshold group's own count ≥ 1, so precision never
    divides by zero."""
    lab = _col(label_col).cast("int")
    cum = _collapsed_cums(
        df, _col(score_col), {"pos": lab, "all": F.lit(1)}, num_partitions
    )
    # rows with score >= t  =  total − rows strictly below t
    tp = F.col("n_pos") - (F.col("cum_pos") - F.col("pos"))
    allc = F.col("n_all") - (F.col("cum_all") - F.col("all"))
    fp = allc - tp
    n_neg = F.col("n_all") - F.col("n_pos")
    return cum.select(
        F.col("value").alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        (F.col("n_pos") - tp).alias("fn"),
        (n_neg - fp).alias("tn"),
        _round6(tp.cast("double") / allc).alias("precision"),
        F.when(F.col("n_pos") > 0, _round6(tp / F.col("n_pos"))).alias("recall"),
        F.when(n_neg > 0, _round6(fp / n_neg)).alias("fpr"),
    ).orderBy(F.col("threshold").desc())


def spearman_rho(
    df: DataFrame,
    x_col: str | Column,
    y_col: str | Column,
    num_partitions: int = 32,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns with
    average-rank tie handling. One row: (n, rho); rho is NULL when
    either column has zero rank variance (or n < 2).

    Each column's doubled average rank (an exact long) comes from its
    own collapsed cumsum and is joined back by value. Because both
    rank vectors cover the same n rows, their doubled-rank mean is
    exactly n+1, so Pearson-on-ranks reduces to centered sums
    Σdx·dy / √(Σdx²·Σdy²) with dx = rx2 − (n+1) — exact decimals,
    no n·ΣXY cross terms that would overflow at corpus scale.

    Scale shape: rows collapse to DISTINCT (x, y) pairs in ONE hash
    aggregate before any join, so the per-column rank dictionaries
    (value-domain-sized) join against the pair domain, never the row
    stream — the moment sums are weighted by the pair multiplicities.
    Marginal rank dictionaries derive from the pair frame too: the
    full table is scanned exactly once."""
    x, y = _col(x_col), _col(y_col)
    pairs = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("__x"), y.alias("__y"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )

    def rank2(col: str) -> DataFrame:
        cum = _collapsed_cums(
            pairs, F.col(col), {"cnt": F.col("__cnt")}, num_partitions
        )
        return cum.select(
            F.col("value").alias(col),
            (2 * (F.col("cum_cnt") - F.col("cnt")) + F.col("cnt") + 1).alias(
                f"{col}_r2"
            ),
            F.col("n_cnt").alias("__n"),
        )

    ranked = (
        pairs.join(rank2("__x"), "__x")
        .join(rank2("__y").drop("__n"), "__y")
    )
    dx = (F.col("__x_r2") - (F.col("__n") + 1)).cast(_DEC)
    dy = (F.col("__y_r2") - (F.col("__n") + 1)).cast(_DEC)
    w = F.col("__cnt").cast(_DEC)
    agg = ranked.agg(
        F.sum("__cnt").alias("n"),
        F.sum(w * dx * dy).alias("sxy"),
        F.sum(w * dx * dx).alias("sxx"),
        F.sum(w * dy * dy).alias("syy"),
    )
    rho = F.col("sxy").cast("double") / (
        F.sqrt(F.col("sxx").cast("double")) * F.sqrt(F.col("syy").cast("double"))
    )
    return agg.select(
        "n",
        F.when((F.col("sxx") > 0) & (F.col("syy") > 0), _round6(rho)).alias("rho"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str | Column,
    group_col: str | Column,
    group_a,
    group_b,
    num_partitions: int = 32,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the `value_col`
    distributions of two slices (drift between crawls / sources /
    langs). One row: (n_a, n_b, ks); NULL when either slice is empty.

    D = max_v |F_a(v) − F_b(v)| is evaluated on the exact integer
    numerator |cum_a·n_b − cum_b·n_a| (decimal(38,0) — the cross
    products overflow a long at corpus scale) with ONE division by
    n_a·n_b at the end, so the max is taken over exact integers."""
    g = _col(group_col)
    slice_ = df.where(g.isin([group_a, group_b]))
    cum = _collapsed_cums(
        slice_,
        _col(value_col),
        {
            "a": (g == F.lit(group_a)).cast("int"),
            "b": (g == F.lit(group_b)).cast("int"),
        },
        num_partitions,
    )
    num = F.abs(
        F.col("cum_a").cast(_DEC) * F.col("n_b").cast(_DEC)
        - F.col("cum_b").cast(_DEC) * F.col("n_a").cast(_DEC)
    )
    agg = cum.agg(
        F.max(num).alias("d_num"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    ks = F.col("d_num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return agg.select(
        "n_a",
        "n_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), _round6(ks)).alias("ks"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-curve bins: equal-width score bands over [lo, hi]
    vs the observed positive rate. One row per non-empty bin:
    (bin, bin_lo, bin_hi, n, n_pos, frac_pos) ordered by bin. Scores
    outside [lo, hi] clamp into the edge bins, so the bins partition
    the input. One map-side-partial hash aggregate; every output is an
    exact integer or a single division of two of them."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    s = _col(score_col).cast("double")
    lab = _col(label_col).cast("int")
    raw = F.floor((s - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    bin_ = F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0)).cast("int")
    width = (hi - lo) / n_bins
    return (
        df.where(s.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(lab).alias("n_pos"))
        .select(
            "bin",
            _round6(F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            _round6(F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias(
                "bin_hi"
            ),
            "n",
            "n_pos",
            _round6(F.col("n_pos").cast("double") / F.col("n")).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def psi_drift(
    df: DataFrame,
    value_col: str | Column,
    group_col: str | Column,
    group_a,
    group_b,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Population Stability Index between the `value_col` distributions
    of two slices over `n_bins` equal-width bands on [lo, hi] (values
    outside clamp into the edge bins, like calibration_bins). One row:
    (n_a, n_b, psi) with PSI = Σ_bins (p_a − p_b)·ln(p_a / p_b).

    The banker's drift score next to ks_statistic's sup-norm: PSI
    weights the whole distribution, KS the worst point. Bin counts are
    Laplace(+1)-smoothed over ALL n_bins bins (empty bins included via
    a generated bin spine), so every log is finite and the score is an
    exact function of exact integer counts; the ≤ n_bins-term double
    sum is the only order-sensitive step and sits ~1e-15 below the 6-dp
    round. One map-side-partial hash aggregate over the slice rows;
    everything after is n_bins-row arithmetic."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    g = _col(group_col)
    v = _col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    bin_ = F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0)).cast("long")
    counts = (
        df.where(g.isin([group_a, group_b]) & v.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(
            F.sum((g == F.lit(group_a)).cast("int")).alias("ca"),
            F.sum((g == F.lit(group_b)).cast("int")).alias("cb"),
        )
    )
    spine = df.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    full = (
        spine.join(F.broadcast(counts), "bin", "left")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = full.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = full.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.lit(n_bins)).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.lit(n_bins)).cast("double")
    return j.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        _round6(F.sum((pa - pb) * F.log(pa / pb))).alias("psi"),
    )


def chi2_drift(
    df: DataFrame,
    cat_col: str | Column,
    group_col: str | Column,
    group_a,
    group_b,
) -> DataFrame:
    """Pearson chi-square independence statistic between two slices
    over a CATEGORICAL column (did the lang / source / event-class mix
    shift between crawls?). One row: (n_a, n_b, n_categories, chi2,
    cramers_v); NULL statistics when either slice is empty or there is
    only one category.

    chi² = Σ_cells (obs − exp)²/exp over the 2×k contingency table with
    exp = row_total·col_total/n; Cramér's V = √(chi²/n) for the 2-row
    table. Observed counts and all marginals are exact integers from
    ONE map-side-partial hash aggregate keyed by category (k rows, not
    row-scale); the k-term double sum sits ~1e-15 below the 6-dp round."""
    g = _col(group_col)
    cat = _col(cat_col)
    counts = (
        df.where(g.isin([group_a, group_b]) & cat.isNotNull())
        .groupBy(cat.alias("cat"))
        .agg(
            F.sum((g == F.lit(group_a)).cast("int")).alias("ca"),
            F.sum((g == F.lit(group_b)).cast("int")).alias("cb"),
        )
    )
    tot = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("k"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    n = (F.col("na") + F.col("nb")).cast("double")
    col_tot = (F.col("ca") + F.col("cb")).cast("double")

    def cell(obs: Column, row_tot: Column) -> Column:
        # exp = 0 only when a slice is empty (row_tot = 0) — the output
        # is NULL-gated then, but ANSI mode still evaluates the sum, so
        # guard the division (0 contribution keeps the sum finite).
        exp = row_tot.cast("double") * col_tot / n
        d = obs.cast("double") - exp
        return F.when(exp > 0, d * d / exp).otherwise(F.lit(0.0))

    agg = j.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max("k").cast("long").alias("n_categories"),
        F.sum(cell(F.col("ca"), F.col("na")) + cell(F.col("cb"), F.col("nb"))).alias(
            "chi2_raw"
        ),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("n_categories") > 1)
    v = F.sqrt(F.col("chi2_raw") / (F.col("n_a") + F.col("n_b")))
    return agg.select(
        "n_a",
        "n_b",
        "n_categories",
        F.when(ok, _round6(F.col("chi2_raw"))).alias("chi2"),
        F.when(ok, _round6(v)).alias("cramers_v"),
    )


def classification_report(
    df: DataFrame,
    actual_col: str | Column,
    predicted_col: str | Column,
) -> DataFrame:
    """Per-class precision / recall / F1 for a predicted-vs-actual
    label comparison (e.g. detect_language vs the corpus lang column).
    One row per class seen on either side: (label, tp, fp, fn,
    precision, recall, f1), ordered by label; ratios NULL on an empty
    denominator. Two map-side-partial hash aggregates over (actual,
    predicted) pairs — the pair domain is #classes², not rows."""
    a, p = _col(actual_col), _col(predicted_col)
    pairs = (
        df.where(a.isNotNull() & p.isNotNull())
        .groupBy(a.alias("actual"), p.alias("predicted"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hit = F.col("actual") == F.col("predicted")
    per = pairs.select(
        F.explode(F.array_distinct(F.array(F.col("actual"), F.col("predicted")))).alias(
            "label"
        ),
        F.when(hit, F.col("cnt")).otherwise(F.lit(0)).alias("tp"),
        F.col("actual"),
        F.col("predicted"),
        F.col("cnt"),
    )
    per = per.groupBy("label").agg(
        F.sum("tp").alias("tp"),
        F.sum(
            F.when((F.col("predicted") == F.col("label")) & ~hit, F.col("cnt")).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("actual") == F.col("label")) & ~hit, F.col("cnt")).otherwise(0)
        ).alias("fn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    f1 = 2 * F.col("tp").cast("double") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    return per.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0, _round6(prec)).alias("precision"),
        F.when(F.col("tp") + F.col("fn") > 0, _round6(rec)).alias("recall"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0, _round6(f1)).alias("f1"),
    ).orderBy("label")


def ndcg_at_k(
    results: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "rel",
    id_col: str = "doc_id",
) -> DataFrame:
    """nDCG@k per query (Järvelin & Kekäläinen, TOIS 2002) — the
    standard graded-relevance retrieval metric, closing the eval loop
    for the BM25 / dense / RRF rankers in this engine.

    Input: one row per (query, doc) with the system `score` and the
    graded relevance label `rel` (>= 0). DCG uses the exponential gain
    form (2^rel - 1)/log2(rank+1) over the top `k` by score (ties
    broken by id for determinism); IDCG re-ranks the SAME query's
    judged docs by rel desc. Queries with IDCG = 0 (no relevant doc)
    yield NULL ndcg — reported, never silently averaged in.

    Output: (query_id, dcg, idcg, ndcg) one row per query, 6-dp edge,
    ordered. Scale shape: two rank windows sharing one hash
    partitioning on query_id, then one partial-aggregatable group-by —
    judged result lists are k-to-hundreds of rows per query, so the
    window partitions are tiny and skew-free."""
    w_sys = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0)
    ranked = results.select(
        F.col(query_col),
        F.col(rel_col),
        gain.alias("__g"),
        F.row_number().over(w_sys).alias("__rs"),
        F.row_number().over(w_ideal).alias("__ri"),
    )
    disc = lambda r: F.log2(r.cast("double") + F.lit(1.0))  # noqa: E731
    agg = ranked.groupBy(query_col).agg(
        F.sum(
            F.when(F.col("__rs") <= k, F.col("__g") / disc(F.col("__rs")))
            .otherwise(F.lit(0.0))
        ).alias("__dcg"),
        F.sum(
            F.when(F.col("__ri") <= k, F.col("__g") / disc(F.col("__ri")))
            .otherwise(F.lit(0.0))
        ).alias("__idcg"),
    )
    return agg.select(
        F.col(query_col),
        _round6(F.col("__dcg")).alias("dcg"),
        _round6(F.col("__idcg")).alias("idcg"),
        F.when(
            F.col("__idcg") > 0, _round6(F.col("__dcg") / F.col("__idcg"))
        ).alias("ndcg"),
    ).orderBy(query_col)


def retrieval_metrics(
    results: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "rel",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary-relevance retrieval metrics per query — the classic quartet
    next to `ndcg_at_k`: reciprocal rank, average precision, precision@k
    and recall@k. `rel` > 0 counts as relevant (graded labels binarize).

    Definitions (all over the system ranking by score desc, id asc):
      rr        = 1 / rank of the FIRST relevant doc (0 if none)
      ap        = mean over relevant docs of precision at their rank
                  (the full-list MAP summand, normalized by ALL judged
                  relevant docs for the query)
      precision_k / recall_k = relevant-in-top-k / (k, n_relevant)
    Queries with no relevant doc report rr=0 and NULL ap/recall.

    Scale shape: ONE rank window on the query-keyed partitioning, a
    running-relevant cumulative sum over the same window order (no
    second exchange), then one partial-aggregatable group-by."""
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    is_rel = (F.col(rel_col) > 0).cast("int")
    ranked = results.select(
        F.col(query_col),
        is_rel.alias("__r"),
        F.row_number().over(w).alias("__rk"),
        F.sum(is_rel).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
    )
    agg = ranked.groupBy(query_col).agg(
        F.sum("__r").cast("long").alias("n_relevant"),
        F.min(F.when(F.col("__r") == 1, F.col("__rk"))).alias("__first"),
        F.sum(
            F.when(
                F.col("__r") == 1,
                F.col("__cum").cast("double") / F.col("__rk").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("__ap_sum"),
        F.sum(F.when(F.col("__rk") <= k, F.col("__r")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__rel_k"),
    )
    return agg.select(
        F.col(query_col),
        "n_relevant",
        _round6(
            F.when(
                F.col("__first").isNotNull(),
                F.lit(1.0) / F.col("__first").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("rr"),
        F.when(
            F.col("n_relevant") > 0,
            _round6(F.col("__ap_sum") / F.col("n_relevant").cast("double")),
        ).alias("ap"),
        _round6(F.col("__rel_k").cast("double") / F.lit(float(k))).alias(
            "precision_k"
        ),
        F.when(
            F.col("n_relevant") > 0,
            _round6(
                F.col("__rel_k").cast("double")
                / F.col("n_relevant").cast("double")
            ),
        ).alias("recall_k"),
    ).orderBy(query_col)
