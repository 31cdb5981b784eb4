"""The end-to-end parse → enrich → route → aggregate pipeline.

This is the engine's flagship path, the Spark-first rebuild of the
reference's ingest lifecycle (SURVEY.md §3.1):

  reference                               here
  ---------                               ----
  MaxRecordId() watermark                 (warc_ts, url) watermark in table state
  XPath rid>N pushdown into ETW           Catalyst filter → parquet min-max pruning
  per-row XML parse + dim caches          ONE Arrow pandas-UDF parse pass +
                                          broadcast-join enrich
  ProviderInfoCache.Observe (new dims)    distinct → anti-join → deterministic ids,
                                          committed before facts
  ShouldProcess rule filter               broadcast rule join (default-allow),
                                          dropped rows still observed
  buffered insert + txn commit            per-sink snapshot append (atomic manifest)
  tag files (db-updated, last rid)        commit metadata + _metrics sidecars
  -cap 20000 / -repeat loop               bounded batches / run_until_exhausted

Scale design (100 TB / 1000 executors):
  - one wide pass over the batch: parse runs once, payload is dropped
    immediately after extraction (V2 header/payload split via column
    pruning), the routed projection is cached for the N sink writes;
  - all joins in the batch are broadcast (dims and rules are KBs—MBs);
    the fact side never shuffles for enrichment;
  - the batch is repartitioned by xxhash64(url) — uniform by construction
    (the north rule's hashed-url partitioning); host-keyed aggregates use
    explicit hot-host salting (operators/skew.py) on top of map-side
    partial aggregation;
  - resume: the watermark commits atomically with data; re-running a
    half-committed batch skips sinks that already recorded the batch_id
    (idempotent), then advances — crash-safe exactly-once overall.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventanalysis_spark import datagen
from eventanalysis_spark.metrics import StageTimer, partition_stats, write_metrics_sidecar
from eventanalysis_spark.operators.aggregate import sink_aggregates
from eventanalysis_spark.operators.enrich import discover_and_grow, enrich_pages
from eventanalysis_spark.operators.parse import parse_pages
from eventanalysis_spark.operators.route import apply_rules, observation_counts, routed_only
from eventanalysis_spark.operators.skew import hot_keys, salted_repartition
from eventanalysis_spark.sources.catalog import Warehouse
from eventanalysis_spark.sources.incremental import (
    Watermark,
    advance,
    batch_bounds,
    next_batch,
)

SINK_PREFIX = "sink_"


@dataclass
class PipelineConfig:
    warehouse: str
    cap: int | None = 20000
    period: str = "day"
    default_sink: str = datagen.DEFAULT_SINK
    id_mode: str = "sequential"
    salt_threshold: float = 0.05
    salt_n: int = 16
    detect_hot_hosts: bool = True
    repartition: int | None = None  # xxhash64(url) partitions; None = leave as scanned


@dataclass
class BatchResult:
    batch_id: str
    n_input: int
    n_routed: int
    sink_counts: dict[str, int] = field(default_factory=dict)
    new_hosts: int = 0
    new_langs: int = 0
    seconds: float = 0.0
    docs_per_sec: float = 0.0
    watermark: dict | None = None
    stages: dict[str, float] = field(default_factory=dict)


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        host_info: DataFrame | None = None,
        lang_info: DataFrame | None = None,
        rules: DataFrame | None = None,
    ):
        self.spark = spark
        self.cfg = config
        self.wh = Warehouse(config.warehouse)
        self.state_tbl = self.wh.table("_pipeline")
        # bootstrap dims/rules into warehouse tables on first run
        self.host_tbl = self.wh.table("dim_host")
        self.lang_tbl = self.wh.table("dim_lang")
        self.rules_tbl = self.wh.table("route_rules")
        if not self.host_tbl.exists():
            self.host_tbl.overwrite(host_info or datagen.host_info_df(spark))
        if not self.lang_tbl.exists():
            self.lang_tbl.overwrite(lang_info or datagen.lang_info_df(spark))
        if not self.rules_tbl.exists():
            self.rules_tbl.overwrite(rules or datagen.route_rules_df(spark))

    # ---- state ---------------------------------------------------------
    def watermark(self) -> Watermark:
        return Watermark.from_state(self.state_tbl.state())

    def _next_batch_id(self) -> str:
        n = self.state_tbl.state().get("n_batches", 0)
        return f"b{n + 1:06d}"

    # ---- one batch -------------------------------------------------------
    def run_batch(self, source: DataFrame) -> BatchResult | None:
        """Process one capped batch above the watermark. Returns None when
        the source is exhausted (the reference's increment==0 signal)."""
        timer = StageTimer()
        wm = self.watermark()
        batch_id = self._next_batch_id()

        # validity filter BEFORE the capped ordered selection: null-keyed rows
        # sort first under ASC NULLS FIRST and would wedge the watermark loop
        valid_source = source.where(
            F.col("url").isNotNull() & F.col("warc_ts").isNotNull()
        )
        batch = next_batch(valid_source, wm, self.cfg.cap)
        if self.cfg.repartition:
            batch = batch.repartition(self.cfg.repartition, F.xxhash64("url"))

        # -- parse (single Arrow pass; payload dropped after extraction)
        parsed = parse_pages(batch).persist()
        n_input = parsed.count()
        timer.lap("parse")
        if n_input == 0:
            parsed.unpersist()
            return None
        bounds = batch_bounds(parsed)

        # -- dimension discovery, committed BEFORE facts (T4 ordering)
        host_dim = self.host_tbl.read(self.spark)
        new_hosts, host_dim2 = discover_and_grow(
            parsed, host_dim, ["host"], id_col="host_id", mode=self.cfg.id_mode
        )
        n_new_hosts = new_hosts.count()
        if n_new_hosts and self.host_tbl.state().get("last_batch") != batch_id:
            self.host_tbl.overwrite(host_dim2, meta={"batch": batch_id},
                                    state_update={"last_batch": batch_id})
        lang_dim = self.lang_tbl.read(self.spark)
        new_langs, lang_dim2 = discover_and_grow(parsed, lang_dim, ["lang"])
        n_new_langs = new_langs.count()
        if n_new_langs and self.lang_tbl.state().get("last_batch") != batch_id:
            self.lang_tbl.overwrite(lang_dim2, meta={"batch": batch_id},
                                    state_update={"last_batch": batch_id})
        timer.lap("discover_dims")

        # -- enrich + route (broadcast joins only — no fact shuffle)
        enriched = enrich_pages(parsed, self.host_tbl.read(self.spark),
                                self.lang_tbl.read(self.spark))
        with_rules = apply_rules(enriched, self.rules_tbl.read(self.spark),
                                 self.cfg.default_sink)
        routed = routed_only(with_rules).persist()

        # -- observation stats (includes dropped rows — P3 semantics)
        obs = observation_counts(with_rules).withColumn("batch_id", F.lit(batch_id))
        obs_tbl = self.wh.table("observations")
        if obs_tbl.state().get("last_batch") != batch_id:
            obs_tbl.append(obs, meta={"batch": batch_id},
                           state_update={"last_batch": batch_id})
        timer.lap("enrich_route")

        # -- fan-out to sinks (idempotent per batch)
        sink_counts: dict[str, int] = {}
        hot = (
            hot_keys(routed, "host", self.cfg.salt_threshold)
            if self.cfg.detect_hot_hosts
            else []
        )
        sinks = sorted(
            r["sink"] for r in routed.select("sink").distinct().collect()
        )
        for s in sinks:
            part = routed.where(F.col("sink") == s).drop("sink")
            tbl = self.wh.table(f"{SINK_PREFIX}{s}")
            if tbl.state().get("last_batch") == batch_id:
                sink_counts[s] = tbl.state().get("last_batch_rows", 0)
                continue  # resume: this sink already committed this batch
            if hot:
                part = salted_repartition(part, "host", hot, self.cfg.salt_n)
            lineage = partition_stats(part)
            n = sum(p["rows"] for p in lineage)
            tbl.append(
                part,
                meta={
                    "batch": batch_id,
                    "rows": n,
                    "watermark_from": wm.to_state(),
                    "lineage": lineage,
                },
                state_update={"last_batch": batch_id, "last_batch_rows": n},
            )
            sink_counts[s] = n
        n_routed = sum(sink_counts.values())
        timer.lap("fan_out")

        # -- per-sink north-rule aggregate for this batch (additive counts)
        agg = sink_aggregates(
            routed.select("sink", "host", "lang", "event_class", "warc_ts"),
            self.cfg.period,
        ).withColumn("batch_id", F.lit(batch_id))
        agg_tbl = self.wh.table("sink_agg")
        if agg_tbl.state().get("last_batch") != batch_id:
            agg_tbl.append(agg, meta={"batch": batch_id},
                           state_update={"last_batch": batch_id})
        timer.lap("aggregate")

        # -- advance watermark (the overall batch commit point)
        new_wm = advance(bounds, wm)
        n_batches = self.state_tbl.state().get("n_batches", 0) + 1
        self.state_tbl.set_state(
            **new_wm.to_state(), n_batches=n_batches, last_batch=batch_id
        )

        total = timer.total()
        result = BatchResult(
            batch_id=batch_id,
            n_input=n_input,
            n_routed=n_routed,
            sink_counts=sink_counts,
            new_hosts=n_new_hosts,
            new_langs=n_new_langs,
            seconds=total,
            docs_per_sec=n_input / total if total > 0 else 0.0,
            watermark=new_wm.to_state(),
            stages=dict(timer.stages),
        )
        write_metrics_sidecar(
            self.state_tbl.path,
            batch_id,
            {
                "batch_id": batch_id,
                "n_input": n_input,
                "n_routed": n_routed,
                "sink_counts": sink_counts,
                "docs_per_sec": result.docs_per_sec,
                "stage_seconds": result.stages,
                "watermark": result.watermark,
                "hot_hosts": hot,
                "committed_at": time.time(),
            },
        )
        parsed.unpersist()
        routed.unpersist()
        return result

    def run_until_exhausted(self, source: DataFrame, max_batches: int = 1000) -> list[BatchResult]:
        """The -repeat loop (AppUpdate.fs:66-80): batches until increment 0."""
        out: list[BatchResult] = []
        for _ in range(max_batches):
            r = self.run_batch(source)
            if r is None:
                break
            out.append(r)
        return out

    # ---- readback helpers -----------------------------------------------
    def sink_table(self, sink: str) -> DataFrame:
        return self.wh.table(f"{SINK_PREFIX}{sink}").read(self.spark)

    def total_sink_aggregates(self) -> DataFrame:
        """Collapse per-batch additive aggregates to current totals."""
        agg = self.wh.table("sink_agg").read(self.spark)
        return (
            agg.groupBy("sink", "host", "lang", "event_class", "bucket")
            .agg(F.sum("n").alias("n"))
            .orderBy("sink", "host", "lang", "event_class", "bucket")
        )
