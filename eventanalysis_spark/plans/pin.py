"""Pinning strategies for iterative DataFrame loops.

Every iterative operator in this engine (PageRank, TrustRank, label
propagation, connected components, TextRank) must re-materialize its
per-iteration state: the state frame is referenced 2+ times by the next
iteration, so an unpinned loop doubles the logical plan per round (2^k
subtree copies, each re-executed at the final action).

`localCheckpoint` is the right LOCAL fix — it truncates lineage with one
node-sized materialization — but it stores its blocks on executors with
NO recomputation path: on a real multi-executor cluster, one lost
executor invalidates the truncated lineage and kills a multi-hour
100-iteration job. This module gives the iterative operators a `pin=`
strategy so cluster jobs can choose fault tolerance:

  - "local" (default): `localCheckpoint(eager=False)`. Fastest; right
    for local mode, short loops, and restartable jobs.
  - "persist": truncate the CATALYST plan by rebasing the frame onto its
    own JVM `RDD[Row]` (a LogicalRDD leaf — O(1) logical plan per round,
    exactly what localCheckpoint gives), then `persist(MEMORY_AND_DISK)`.
    Unlike localCheckpoint, the backing RDD KEEPS its lineage, so a lost
    executor's blocks are recomputed instead of failing the job. A plain
    `.persist()` would NOT work here: it leaves the logical plan intact,
    and a loop whose state is referenced twice per round doubles the
    analysis tree every iteration — measured as an analyzer hang by
    round ~10 on connected_components. RDD lineage still chains linearly
    across rounds, so beyond ~50 rounds prefer "checkpoint".
  - "checkpoint": reliable `df.checkpoint()` to
    `sparkContext.setCheckpointDir(...)` storage (HDFS/S3) every
    `checkpoint_every` iterations, the "persist" rebase between them —
    the GraphX periodic-checkpoint pattern: executor loss costs at most
    `checkpoint_every` iterations of recompute, never the job, and the
    RDD lineage chain is cut at every reliable checkpoint.

Loops WITH a per-iteration driver action (connected components runs a
convergence count) should call `rotate(keep)` after the action: the
freshly materialized round is the only live state, so earlier rounds'
persisted blocks are released eagerly instead of accumulating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

PIN_STRATEGIES = ("local", "persist", "checkpoint")


class Pinner:
    """Callable pin policy for one iterative loop. Stateless apart from
    the iteration counter and the persisted-frame ledger."""

    def __init__(self, strategy: str = "local", checkpoint_every: int = 4):
        if strategy not in PIN_STRATEGIES:
            raise ValueError(
                f"pin must be one of {PIN_STRATEGIES}, got {strategy!r}"
            )
        if checkpoint_every < 1:
            raise ValueError("checkpoint_every must be >= 1")
        self.strategy = strategy
        self.checkpoint_every = checkpoint_every
        self._calls = 0
        self._persisted: list[DataFrame] = []

    def __call__(self, df: DataFrame) -> DataFrame:
        self._calls += 1
        if self.strategy == "local":
            return df.localCheckpoint(eager=False)
        if self.strategy == "checkpoint" and (
            self._calls % self.checkpoint_every == 0
        ):
            sc = df.sparkSession.sparkContext
            if sc._jsc.sc().getCheckpointDir().isEmpty():
                raise RuntimeError(
                    "pin='checkpoint' requires "
                    "spark.sparkContext.setCheckpointDir(...) — point it at "
                    "reliable storage (HDFS/S3) before running the loop"
                )
            # non-eager: written when the next action first computes it,
            # same laziness contract as the localCheckpoint path
            return df.checkpoint(eager=False)
        pinned = self._rebase_on_rdd(df).persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted.append(pinned)
        return pinned

    @staticmethod
    def _rebase_on_rdd(df: DataFrame) -> DataFrame:
        """New DataFrame over the frame's own JVM RDD[Row]: the logical
        plan collapses to a LogicalRDD leaf (plan growth stopped) while
        the RDD keeps recomputable lineage (executor-loss safe). All
        JVM-side — rows never round-trip through Python."""
        spark = df.sparkSession
        jdf = df._jdf
        jdf2 = spark._jsparkSession.createDataFrame(
            jdf.toJavaRDD(), jdf.schema()
        )
        return DataFrame(jdf2, spark)

    def rotate(self, keep: DataFrame | None = None) -> None:
        """Release persisted frames from earlier rounds. Call only after
        an action has materialized the current round (otherwise the next
        action recomputes the whole chain). `keep` (typically the current
        round) stays cached."""
        survivors = []
        for df in self._persisted:
            if keep is not None and df is keep:
                survivors.append(df)
            else:
                df.unpersist()
        self._persisted = survivors

    def release(self) -> None:
        """Unpersist everything this pinner cached. Safe once the loop's
        result has been materialized (or discarded)."""
        self.rotate(keep=None)
