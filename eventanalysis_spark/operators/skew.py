"""Skew handling — explicit salting for hot keys (north-rule requirement).

The pages workload is host-skewed by construction (Zipf hosts, two hot
hosts ≈ 38% of rows — datagen.py). AQE's skew-join splitting covers joins,
but two things remain ours to write (SURVEY.md §4):

  1. hot-key detection: cheap sampled frequency pre-pass (or exact count
     at small scale) → the salt map;
  2. salted two-phase aggregation: partial agg on (key, salt) then final
     agg on key — bounds the biggest reduce task by 1/salt_n;
  3. salted repartition for sink writes so one host cannot pin a writer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    key: str,
    threshold: float = 0.05,
    sample_fraction: float | None = None,
) -> list:
    """Keys holding more than `threshold` of (sampled) rows. At 100 TB run
    with sample_fraction ~1e-4: frequency estimation of >5% keys needs only
    ~10^5 rows for tight bounds."""
    src = df.sample(sample_fraction) if sample_fraction else df
    total_counts = src.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = src.count()
    if total == 0:
        return []
    cut = total * threshold
    return [
        r[key]
        for r in total_counts.where(F.col("n") >= cut).collect()
        if r[key] is not None
    ]


def salt_column(key: Column, hot: list, salt_n: int, entropy: Column) -> Column:
    """salt ∈ [0, salt_n) for hot keys, 0 otherwise. Entropy must be a
    per-row stable column (url) so results are deterministic."""
    if not hot:
        return F.lit(0)
    return F.when(
        key.isin(hot), F.pmod(F.xxhash64(entropy), F.lit(salt_n)).cast("int")
    ).otherwise(F.lit(0))


def salted_repartition(
    df: DataFrame, key: str, hot: list, salt_n: int = 16,
    entropy_col: str = "url", num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (key, salt): cold keys co-locate as usual, hot keys
    spread over salt_n partitions."""
    salted = df.withColumn("__salt", salt_column(F.col(key), hot, salt_n, F.col(entropy_col)))
    if num_partitions:
        out = salted.repartition(num_partitions, key, "__salt")
    else:
        out = salted.repartition(key, "__salt")
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],  # (fn, col, alias) fn ∈ count|sum|min|max
    hot: list,
    salt_n: int = 16,
    hot_key: str | None = None,
    entropy_col: str = "url",
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates:
    groupBy(keys+salt).partial → groupBy(keys).final.

    Note: Spark's hash agg already does map-side partial aggregation, which
    defuses most group-by skew; explicit salting matters when a reduce-side
    group (hot host × high cardinality subkeys) still overloads one task,
    and for the sink-write path. Provided for those cases + as the
    documented scale strategy."""
    hot_key = hot_key or keys[0]
    salted = df.withColumn(
        "__salt", salt_column(F.col(hot_key), hot, salt_n, F.col(entropy_col))
    )
    partial_exprs = []
    final_exprs = []
    for fn, col, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"non-decomposable agg {fn!r}")
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
