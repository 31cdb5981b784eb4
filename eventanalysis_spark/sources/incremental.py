"""T1/T2 — incremental source with a high-water mark and bounded batches.

Reference: `OpenDbV2.UpdateFrom` reads MAX(rid) then ingests only records
above it (OpenDbV2.cs:862-870), pushing the watermark predicate INTO the
source (EventRecordSource.cs:65-68); `cap` bounds each run
(PutEvents, OpenDbV2.cs:887-908) and the caller loops until the increment
is 0 (DbTests.cs:589-628).

Spark-first: the watermark is a (warc_ts, url) pair persisted in the state
of the destination warehouse (committed atomically WITH the data — no
lost/duplicated batch on crash). The predicate is a plain Catalyst filter
→ parquet/Iceberg min-max pruning skips whole files below the watermark.
The cap is an ordered limit (TakeOrderedAndProject — no global sort
materialization)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Watermark:
    ts: str | None = None   # ISO timestamp of last ingested row
    url: str | None = None  # tie-break within equal ts

    @classmethod
    def from_state(cls, state: dict) -> "Watermark":
        return cls(ts=state.get("wm_ts"), url=state.get("wm_url"))

    def to_state(self) -> dict:
        return {"wm_ts": self.ts, "wm_url": self.url}

    def is_unset(self) -> bool:
        return self.ts is None


def above_watermark(df: DataFrame, wm: Watermark) -> DataFrame:
    """Strictly-after filter on the (warc_ts, url) total order — the
    `rid > watermark` pushdown analog."""
    if wm.is_unset():
        return df
    ts = F.lit(wm.ts).cast("timestamp")
    return df.where(
        (F.col("warc_ts") > ts)
        | ((F.col("warc_ts") == ts) & (F.col("url") > F.lit(wm.url)))
    )


def next_batch(df: DataFrame, wm: Watermark, cap: int | None = 20000) -> DataFrame:
    """One bounded micro-batch in watermark order. cap=None → everything
    above the watermark. Default cap mirrors the reference's 20k
    (event_db_updater/AppUpdate.fs:44).

    Scale note: a naive `orderBy(...).limit(cap)` plans as
    TakeOrderedAndProject, which funnels the WHOLE batch into ONE
    partition — every downstream stage (the parse UDF, the staged write)
    then runs single-task, collapsing throughput at production cap sizes
    (measured 12x slower at cap=400k). Instead: find the cap-th
    (warc_ts, url) key on a narrow two-column ordered-limit (cheap — the
    top-k only carries the key columns), then select the batch as a
    PARALLEL filter against that bound. The selected row set is
    identical (url is unique within a timestamp, so the bound cuts
    exactly at the cap-th row); partitioning is preserved. Runs one
    small Spark job to compute the bound."""
    inc = above_watermark(df, wm)
    if cap is None:
        return inc
    bound = (
        inc.select("warc_ts", "url")
        .orderBy(F.col("warc_ts").asc(), F.col("url").asc())
        .limit(cap)
        .agg(F.max(F.struct(F.col("warc_ts"), F.col("url"))).alias("m"))
        .collect()[0]["m"]
    )
    if bound is None:  # source exhausted
        return inc.where(F.lit(False))
    b_ts = F.lit(bound["warc_ts"]).cast("timestamp")
    b_url = F.lit(bound["url"])
    return inc.where(
        (F.col("warc_ts") < b_ts)
        | ((F.col("warc_ts") == b_ts) & (F.col("url") <= b_url))
    )


def advance(batch_max: tuple | None, wm: Watermark) -> Watermark:
    """New watermark from the batch's max (warc_ts, url); None batch → keep."""
    if batch_max is None:
        return wm
    ts, url = batch_max
    return Watermark(ts=str(ts), url=url)


def batch_bounds(batch: DataFrame) -> tuple | None:
    """Max (warc_ts, url) of the batch — one tiny aggregate."""
    row = batch.agg(
        F.max(F.struct(F.col("warc_ts"), F.col("url"))).alias("m")
    ).collect()[0]
    if row["m"] is None:
        return None
    return (row["m"]["warc_ts"], row["m"]["url"])
