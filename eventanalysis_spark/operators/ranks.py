"""Shared core of the two-phase global rank / running-sum operators.

`pack_sequences`, `budget_select`, `enrich.assign_ids` (and through it
`shuffle_corpus`) all need the same thing: the input range-partitioned
on a total order, with the partition id materialized as a column, read
by TWO consumers — the per-partition totals branch (offsets) and the
data branch (partition-local window).

Why this helper exists (an at-scale correctness subtlety, found by
reading the physical plan): when the same Python DataFrame is consumed
twice in one plan, Catalyst duplicates the subtree and plans TWO
separate range exchanges (no ReusedExchange node — verified on Spark
4.1). Spark's range partitioner picks its boundary values by sampling
with an RDD-id-derived seed, so two physically distinct exchanges MAY
choose different boundaries once inputs are large enough that the
boundary sample is lossy (reservoir sampling truncates). Different
boundaries put boundary-adjacent rows in partition p on one branch and
p±1 on the other — and then the offsets join silently misaligns and
the "exact" running sum is wrong. Small inputs sample exhaustively, so
unit tests and SF-scale oracles can never catch it; only the plan
shows it.

The fix is to materialize the ranged frame ONCE: `localCheckpoint
(eager=False)` pins a single physical partitioning that both branches
read, making the partition ids consistent by construction (and
executing the range exchange once instead of twice). The cost is a
lineage cut — a lost executor fails the job instead of recomputing —
which is the same trade `cluster.connected_components` already makes
per pointer-jumping round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranged_with_pid(
    df: DataFrame,
    order_cols: list[Column],
    num_partitions: int,
) -> DataFrame:
    """Range-partition `df` on `order_cols` and attach the physical
    partition id as `__pid`, materialized exactly once so every
    consumer sees the same boundaries (see module docstring). Keep the
    input narrow — the caller's projection is what crosses the wire."""
    return (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
