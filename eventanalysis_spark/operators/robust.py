"""Robust quality signals: character entropy and MAD-based outliers.

Two filtering signals that pair with the ratio heuristics in
textstats/webfilter:
  - `char_entropy`: Shannon entropy of the character distribution —
    near-zero for repeated-character junk, abnormally high for
    random-bytes gibberish; a standard cheap screen before model-based
    scoring.
  - `mad_outliers`: robust z-scores from the median/MAD instead of
    mean/stddev — one boilerplate mega-doc cannot drag the threshold
    the way it drags a standard deviation. Built on
    quantiles.exact_quantiles, so the medians are exact, deterministic,
    and computed without a global sort.

Cross-engine: entropy is evaluated as ln(n) − (Σ c·ln c)/n with the
same expression shape in DuckDB, ROUND(,6) absorbing per-call ln ULPs;
the MAD z uses the same rounded-output rule.

No analog in the reference (its quality surface is validity flags,
Lcl.EventLog/Jobs/EventJob.cs); at-scale pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventanalysis_spark.operators.quantiles import exact_quantiles


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, entropy) per non-empty document, entropy in nats
    rounded to 6dp. One explode to (doc, char) rows and one hash
    aggregate KEYED BY (doc, char) — the doc id is in the key, so a
    mega-document spreads over its distinct characters and partial
    aggregation collapses each (doc, char) map-side; the per-doc
    reduce then touches ≤ |alphabet| rows per doc."""
    cc = (
        docs.where(F.length(text_col) > 0)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__ch"))
        .groupBy(id_col, "__ch")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return (
        cc.groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_chars"),
            F.sum(F.col("__c").cast("double") * F.log("__c")).alias("__s"),
        )
        .select(
            id_col,
            "n_chars",
            F.round(F.log("n_chars") - F.col("__s") / F.col("n_chars"), 6).alias(
                "entropy"
            ),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    keys: tuple[str, ...] = (),
    threshold: float = 3.5,
) -> DataFrame:
    """Append `robust_z` and `is_outlier` to every row: robust z =
    0.6745·(v − median)/MAD with median and MAD both exact type-1
    quantiles (quantiles.exact_quantiles). The 0.6745 factor makes the
    score comparable to a normal z; 3.5 is the Iglewicz-Hoskin cutoff.

    Degenerate groups (MAD = 0: over half the values identical) flag
    nothing and return null robust_z — a spread of zero supports no
    outlier claim. Both quantile passes collapse to distinct values
    before anything ordered; medians join back as broadcasts."""
    med = (
        exact_quantiles(df, value_col, [0.5], keys)
        .withColumnRenamed("value", "__med")
        .drop("prob")
    )
    base = (
        df.join(F.broadcast(med), list(keys)) if keys
        else df.crossJoin(F.broadcast(med))
    )
    dev = base.withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = (
        exact_quantiles(dev, "__dev", [0.5], keys)
        .withColumnRenamed("value", "__mad")
        .drop("prob")
    )
    scored = (
        dev.join(F.broadcast(mad), list(keys)) if keys
        else dev.crossJoin(F.broadcast(mad))
    )
    raw = (
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med")).cast("double")
        / F.col("__mad").cast("double")
    )
    # manual half-away-from-zero at 6dp: integer diff / integer MAD makes
    # z land EXACTLY on decimal midpoints (e.g. 0.6745*-75/200 =
    # -0.2529375), where Spark's BigDecimal ROUND and DuckDB's double
    # ROUND disagree; floor over the identical double cannot
    z = F.signum(raw) * F.floor(F.abs(raw) * 1e6 + 0.5) / F.lit(1e6)
    return (
        scored.withColumn(
            "robust_z", F.when(F.col("__mad") > 0, z)
        )
        .withColumn(
            "is_outlier",
            F.when(
                F.col("__mad") > 0, F.abs(F.col("robust_z")) > threshold
            ).otherwise(F.lit(False)),
        )
        .drop("__med", "__dev", "__mad")
    )
