"""Per-partition lineage + throughput metrics (north-rule requirement;
reference tag-file analog, EventJob.cs:125-159 T3).

Two layers:
  - partition_stats(df): a one-pass DataFrame aggregate keyed by
    spark_partition_id → rows / bytes / ts range per physical partition
    (the lineage record of what each task actually processed);
  - StageTimer: driver-side wall-clock per pipeline stage → docs/sec.

Metrics are committed as snapshot metadata on the destination table plus a
JSON sidecar under <warehouse>/<table>/_metrics/ so they survive and are
greppable (the reference's tag files next to the DB)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_stats(df: DataFrame, bytes_col: str | None = "n_bytes") -> list[dict]:
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.min("warc_ts").cast("string").alias("ts_min"),
        F.max("warc_ts").cast("string").alias("ts_max"),
    ]
    if bytes_col and bytes_col in df.columns:
        aggs.append(F.sum(bytes_col).alias("bytes"))
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(*aggs)
        .orderBy("partition")
        .collect()
    )
    return [r.asDict() for r in rows]


class StageTimer:
    def __init__(self):
        self.stages: dict[str, float] = {}
        self._t0 = time.perf_counter()
        self._last = self._t0

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self._last = now
        return dt

    def total(self) -> float:
        return time.perf_counter() - self._t0


def write_metrics_sidecar(table_path: str, batch_id: str, payload: dict) -> str:
    d = os.path.join(table_path, "_metrics")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"batch-{batch_id}.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, p)
    return p
