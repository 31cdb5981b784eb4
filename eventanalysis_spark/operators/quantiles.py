"""Exact distributed quantiles — no global sort, no approximation.

Filtering pipelines set thresholds from distributions ("drop docs below
the 5th length percentile", "cap at p99"): `approx_percentile` answers
fast but non-deterministically across partitionings, which poisons both
reproducibility and the cross-engine oracle. These operators compute
EXACT type-1 (inverted-CDF) quantiles with shuffles proportional to the
number of DISTINCT values, not rows:

  1. collapse to (value, cnt) with one map-side-partial hash aggregate —
     at web scale the value domain (lengths, scores, counts) is tiny
     next to row count, so this is the big reduction;
  2. cumulative counts over the distinct values;
  3. the q-quantile is the smallest value whose cumulative count
     reaches ceil(q·n) — a narrow filter, one row per (group, q).

Step 2 is the only ordered step and comes in two shapes:
  - grouped: a per-key window — the per-group DISTINCT-value list is
    what a single task must hold (document lengths, not documents);
  - global: the two-phase ranged cumsum (`ranks.ranged_with_pid`) also
    used by sequence packing / budget selection — per-partition totals
    feed global offsets, so no single task ever sees the whole domain.

ceil(q·n) is evaluated as the same IEEE double expression in Spark and
DuckDB, so boundary behavior is engine-identical by construction.

The reference has no quantile machinery (its stats are min/max/count,
Lcl.EventLog/Jobs/EventJob.Queries.cs); this is at-scale pipeline
surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventanalysis_spark.operators.ranks import ranged_with_pid


def _pick(cum: DataFrame, probs: list[float], keys: tuple[str, ...]) -> DataFrame:
    """From (keys…, value, cnt, cum, n) pick, per prob, the smallest
    value whose cumulative count reaches ceil(prob·n)."""
    p = F.explode(F.array(*[F.lit(float(q)) for q in probs])).alias("prob")
    e = cum.select(*keys, "value", "cnt", "cum", "n", p)
    target = F.ceil(F.col("prob") * F.col("n"))
    return (
        e.where((F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target))
        .select(*keys, "prob", "value")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    keys: tuple[str, ...] = (),
    num_partitions: int = 32,
) -> DataFrame:
    """Exact type-1 quantiles of `value_col` at each prob in `probs`,
    optionally per `keys` group. Output (keys…, prob, value) — one row
    per (group, prob); prob must be in (0, 1].

    Shuffle cost: one hash agg over (keys…, value) [map-side partial],
    then either a per-key window (grouped; a task holds a group's
    distinct VALUES only) or the two-phase ranged cumsum (global; no
    single-task step at any cardinality)."""
    if not probs or any(not (0 < q <= 1) for q in probs):
        raise ValueError("probs must be within (0, 1]")
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if keys:
        w = Window.partitionBy(*keys)
        cum = counts.select(
            *keys,
            "value",
            "cnt",
            F.sum("cnt").over(w.orderBy("value")).alias("cum"),
            F.sum("cnt").over(w).alias("n"),
        )
        return _pick(cum, probs, keys)
    # global: range-partition the distinct values once, cumsum in two
    # phases (per-partition totals -> offsets -> local running sum)
    ranged = ranged_with_pid(counts, [F.col("value")], num_partitions)
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.sum("cnt").alias("__psum"))
        .select(
            "__pid",
            (
                F.sum("__psum")
                .over(Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1))
            ).alias("__offset"),
            F.sum("__psum").over(Window.partitionBy(F.lit(0))).alias("n"),
        )
        .fillna({"__offset": 0})
    )
    local = Window.partitionBy("__pid").orderBy("value")
    cum = (
        ranged.withColumn("__local", F.sum("cnt").over(local))
        .join(F.broadcast(offsets), "__pid")
        .select(
            "value",
            "cnt",
            (F.col("__local") + F.col("__offset")).alias("cum"),
            "n",
        )
    )
    return _pick(cum, probs, ())


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Convenience: (keys…, lo_value, hi_value) exact clipping bounds —
    the common "keep rows between p_lo and p_hi" gate computed in one
    pass over the distinct-value counts."""
    q = exact_quantiles(df, value_col, [lo, hi], keys)
    return q.groupBy(*keys).agg(
        F.min(F.when(F.col("prob") == float(lo), F.col("value"))).alias("lo_value"),
        F.min(F.when(F.col("prob") == float(hi), F.col("value"))).alias("hi_value"),
    )
