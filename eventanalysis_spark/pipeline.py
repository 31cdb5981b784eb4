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
  - ONE wide pass over the batch: parse runs once and streams directly
    into a single partitionBy(sink) columnar write (dropped rows →
    quarantine partition); every downstream stat re-reads the narrow
    columns of that staged data instead of re-running the UDF or caching
    the wide frame;
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

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from eventanalysis_spark import datagen
from eventanalysis_spark.functions.scalars import period_key
from eventanalysis_spark.metrics import StageTimer, write_metrics_sidecar
from eventanalysis_spark.operators.enrich import discover_and_grow, enrich_pages
from eventanalysis_spark.operators.parse import parse_pages, parse_pages_fused
from eventanalysis_spark.operators.route import apply_rules
from eventanalysis_spark.sources.catalog import Warehouse
from eventanalysis_spark.sources.incremental import Watermark, advance, next_batch

SINK_PREFIX = "sink_"
QUARANTINE = "__quarantine"
QUARANTINE_TABLE = "quarantine"

# Internal warehouse tables a user-supplied sink must never shadow: a rule
# with sink='agg' would otherwise resolve to the internal 'sink_agg'
# aggregates table, adopt page rows into it, and mark its batch state as
# committed — silently skipping the real aggregate append.
RESERVED_TABLES = frozenset(
    {"_pipeline", "dim_host", "dim_lang", "route_rules",
     "sink_agg", "observations", "lineage", QUARANTINE_TABLE}
)
# sink names follow the reference's job-name grammar (EventJobConfig.cs:58)
_SINK_NAME_RE = re.compile(r"^[a-z][a-z0-9]*([-_][a-z0-9]+)*$")

# fixed schemas for driver-side micro-commits (Table.append_rows — no
# Spark job for a 5-row table); must match the bootstrap DataFrames
_HOST_SCHEMA = StructType([
    StructField("host_id", IntegerType()),
    StructField("host", StringType()),
    StructField("registrar", StringType()),
])
_LANG_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("lang_name", StringType()),
])
_OBS_SCHEMA = StructType([
    StructField("event_class", StringType()),
    StructField("n_observed", LongType()),
    StructField("n_routed", LongType()),
    StructField("n_dropped", LongType()),
    StructField("batch_id", StringType()),
])


def validate_sink_name(sink: str) -> None:
    """Reject sinks that are malformed or would shadow an internal table."""
    if not isinstance(sink, str) or not _SINK_NAME_RE.match(sink):
        raise ValueError(
            f"invalid sink name {sink!r}: must match "
            "^[a-z][a-z0-9]*([-_][a-z0-9]+)*$ (EventJobConfig.cs:58)"
        )
    if f"{SINK_PREFIX}{sink}" in RESERVED_TABLES or sink in RESERVED_TABLES:
        raise ValueError(
            f"sink name {sink!r} is reserved: table "
            f"'{SINK_PREFIX}{sink}' would shadow an internal pipeline table"
        )


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
    compute_text_features: bool = True  # quality/lang-id/fingerprint per doc
    # Wide-pass transport: mapInPandas emits assembled rows from Python
    # (no JVM struct expand/zip; ~5-8% faster at 400k/32c) but moves the
    # passthrough columns (url, warc_ts, lang) through Arrow both ways;
    # False = pandas_udf struct column (passthroughs stay JVM-side).
    fused_parse: bool = True
    # Hot-path codec: interleaved min-of-4 wide-pass timings at 400k/32c
    # measured snappy fastest (2.18-2.38s) vs lz4 (2.40-2.86s) and zstd
    # (2.40-2.83s) at BOTH bench split sizes, with output bytes on par
    # with lz4 (27.7 vs 29.0 MB). Snappy also decompresses fast for the
    # staged stats re-read. Sink tables adopt the staged files in place,
    # so cold data is recompressed to zstd by Table.compact (the Iceberg
    # rewrite_data_files / reference-vacuum maintenance step, S12).
    staging_codec: str = "snappy"
    # Files per sink_agg commit. The per-batch aggregate is bounded by
    # group cardinality (hosts x langs x classes x buckets actually seen),
    # ~10^3-10^4 rows at bench scale -> 1 file. On a cluster where a batch
    # can surface millions of hosts, raise to ~rows/5M so single-task
    # writes don't serialize. (Explicit because the persisted agg pins its
    # shuffle partitioning before AQE coalescing can apply.)
    agg_write_files: int = 1
    # Driver dim-cache ceiling. Below it, host/lang dims live on the
    # driver (the reference's ProviderInfoCache shape: tiny dims, broadcast
    # enrich, driver-side sequential ids). Once the host dim outgrows it,
    # the pipeline PERMANENTLY switches to the table path (flag persisted
    # in state): hosts stay in the warehouse table, discovery is a
    # distributed anti-join append (operators/enrich.py), and the enrich
    # join stops forcing broadcast so AQE picks the join strategy. At
    # web scale hosts exceed 10^7 — a driver cache cannot hold them.
    dim_cache_limit: int = 1_000_000
    # Per-partition lineage transport. Inline (driver collect at
    # (sink, part_id, event_class) grain, embedded in the sink manifest
    # JSON) is exact reference-tag-file parity and free at <=10^3 write
    # tasks. But at cluster scale a batch can stage 10^5+ tasks x 10
    # sinks — millions of driver rows and an unboundedly growing manifest
    # — so above this many staged data files the per-partition lineage is
    # instead written DISTRIBUTEDLY to the 'lineage' warehouse table
    # (one bounded rollup of the cached fine-grain aggregate; the driver
    # only ever holds the (sink, event_class) observation grain) and each
    # sink commit carries a {"lineage_ref": ...} pointer.
    lineage_inline_max: int = 4096
    discovery: str = "post"  # "post": new dim keys from the staged batch
    # aggregate (no extra source scan; ids attach from the NEXT batch on) |
    # "pre": strict reference ordering (ProviderInfoCache semantics — ids
    # visible to the same batch's facts) at the cost of one extra scan
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
        # driver-side dim caches (the reference's ProviderInfoCache/J4 shape):
        # dims are tiny; keeping them on the driver avoids re-reading parquet
        # every batch and makes the enrich joins broadcast-from-local.
        # Once the host dim has outgrown dim_cache_limit (flag persisted in
        # state), hosts stay in the warehouse table — no driver cache.
        self._dims_spilled = bool(self.state_tbl.state().get("dims_spilled", False))
        self._host_rows = (
            None
            if self._dims_spilled
            else [r.asDict() for r in self.host_tbl.read(spark).collect()]
        )
        self._lang_rows = [r.asDict() for r in self.lang_tbl.read(spark).collect()]
        self._rules_df = self.rules_tbl.read(spark)
        # hot hosts learned from the previous batch's aggregate (committed
        # with the watermark, so resume keeps the salting decision)
        self._hot_hosts: list[str] = list(self.state_tbl.state().get("hot_hosts", []))
        # validate the rule table up front (rules are user input): every
        # sink name must be legal, and no two rules may claim the same
        # event class — the router broadcast-joins on event_class, so a
        # duplicate would silently DUPLICATE every fact row of that class
        # (the JobRegistry.cs:52-68 duplicate-channel rejection, which
        # exists for exactly this reason)
        rule_rows = self._rules_df.collect()
        for s in {r["sink"] for r in rule_rows} | {config.default_sink}:
            validate_sink_name(s)
        seen_cls: dict[str, tuple] = {}
        dup_exact = False
        for r in rule_rows:
            key = (r["sink"], r["min_version"], r["enabled"])
            prev = seen_cls.get(r["event_class"])
            if prev is not None and prev != key:
                raise ValueError(
                    f"Duplicate channel name '{r['event_class']}' (jobs "
                    f"'{r['sink']}' and '{prev[0]}'): two differing rules "
                    "for one event class would duplicate its rows through "
                    "the routing join"
                )
            dup_exact = dup_exact or prev is not None
            seen_cls[r["event_class"]] = key
        if dup_exact:
            # exact re-registration replaces (JobRegistry.Register dict
            # semantics): dedupe so the routing join stays 1:1
            self._rules_df = self._rules_df.dropDuplicates(["event_class"])

    def _host_df(self) -> DataFrame:
        if self._dims_spilled:
            return self.host_tbl.read(self.spark)
        return self.spark.createDataFrame(
            [(r["host_id"], r["host"], r["registrar"]) for r in self._host_rows],
            "host_id int, host string, registrar string",
        )

    def _lang_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(r["lang"], r["lang_name"]) for r in self._lang_rows],
            "lang string, lang_name string",
        )

    def _grow_dims(self, seen_hosts: set, seen_langs: set, batch_id: str) -> tuple[int, int]:
        """Deterministic sequential id assignment for newly observed keys
        (driver-side over the tiny new-key set; the reference does exactly
        this on its single thread, ProviderInfoCache.cs:92-136). Commits
        are APPEND-ONLY driver-side arrow writes of just the new rows — no
        Spark job, no full-dim rewrite. When the host cache outgrows
        cfg.dim_cache_limit the pipeline flips to the table path
        (_grow_hosts_table) permanently."""
        n_h = n_l = 0
        new_hosts = (
            sorted(seen_hosts - {r["host"] for r in self._host_rows})
            if seen_hosts and self._host_rows is not None
            else []
        )
        if new_hosts and self.host_tbl.state().get("last_batch") != batch_id:
            next_id = max((r["host_id"] for r in self._host_rows), default=0) + 1
            rows = [(next_id + i, h, None) for i, h in enumerate(new_hosts)]
            for hid, h, _ in rows:
                self._host_rows.append({"host_id": hid, "host": h, "registrar": None})
            n_h = len(new_hosts)
            self.host_tbl.append_rows(
                rows, _HOST_SCHEMA, meta={"batch": batch_id},
                state_update={"last_batch": batch_id},
            )
            if len(self._host_rows) > self.cfg.dim_cache_limit:
                # permanent switch to the table path; flag rides the next
                # watermark commit and every future Pipeline sees it
                self._dims_spilled = True
                self._host_rows = None
        new_langs = sorted(seen_langs - {r["lang"] for r in self._lang_rows})
        if new_langs and self.lang_tbl.state().get("last_batch") != batch_id:
            rows = [(lg, None) for lg in new_langs]
            for lg in new_langs:
                self._lang_rows.append({"lang": lg, "lang_name": None})
            n_l = len(new_langs)
            self.lang_tbl.append_rows(
                rows, _LANG_SCHEMA, meta={"batch": batch_id},
                state_update={"last_batch": batch_id},
            )
        return n_h, n_l

    def _grow_hosts_table(self, batch_hosts: DataFrame, batch_id: str) -> int:
        """Scale path for host-dim growth (dims too big for the driver):
        distinct batch hosts anti-join the dim TABLE, sequential ids
        continue from the table max (ProviderInfoCache.cs:126 numbering,
        distributed), and ONLY the new rows are appended. No driver-side
        host set, no full-dim rewrite — O(new keys) work per batch."""
        from eventanalysis_spark.operators.enrich import assign_ids, discover_new_keys

        if self.host_tbl.state().get("last_batch") == batch_id:
            return self.host_tbl.state().get("last_batch_new", 0)
        dim = self.host_tbl.read(self.spark)
        new = discover_new_keys(
            batch_hosts.select("host"), dim, ["host"], broadcast=False
        )
        start = dim.agg(F.max("host_id").alias("m")).collect()[0]["m"] or 0
        new_ids = (
            assign_ids(new, "host_id", ["host"], start_after=start)
            .select(
                "host_id", "host", F.lit(None).cast("string").alias("registrar")
            )
            .persist()
        )
        n_new = new_ids.count()
        if n_new:
            self.host_tbl.append(
                new_ids, meta={"batch": batch_id},
                state_update={"last_batch": batch_id, "last_batch_new": n_new},
                coalesce=1,
            )
        else:
            self.host_tbl.set_state(last_batch=batch_id, last_batch_new=0)
        new_ids.unpersist()
        return n_new

    # ---- state ---------------------------------------------------------
    def watermark(self) -> Watermark:
        return Watermark.from_state(self.state_tbl.state())

    def _next_batch_id(self) -> str:
        n = self.state_tbl.state().get("n_batches", 0)
        return f"b{n + 1:06d}"

    # ---- one batch -------------------------------------------------------
    def run_batch(self, source: DataFrame) -> BatchResult | None:
        """Process one capped batch above the watermark. Returns None when
        the source is exhausted (the reference's increment==0 signal).

        Single-wide-pass design: the expensive parse UDF runs EXACTLY ONCE,
        streamed straight into one partitionBy(sink) parquet write (dropped
        rows land in a quarantine partition). Every downstream number —
        counts, watermark bounds, observation stats, per-sink aggregates,
        per-partition lineage — is computed from the written columnar
        staging data (narrow column scans, no UDF re-run, no wide cache)."""
        import os as _os

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
            # Explicit batch partitioning (the north rule's hashed-url +
            # hot-host salting). Host-keyed partitioning co-locates each
            # host's pages; hosts the PREVIOUS batch's aggregate showed
            # above salt_threshold of batch volume get a url-hash salt in
            # [0, salt_n) so no single reducer owns a hot host. First
            # batch (no learned hot set yet) partitions by pure url hash —
            # uniform by construction.
            host_e = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
            if self.cfg.detect_hot_hosts and self._hot_hosts:
                salt = F.when(
                    host_e.isin(self._hot_hosts),
                    F.pmod(F.xxhash64("url"), F.lit(self.cfg.salt_n)),
                ).otherwise(F.lit(0))
                batch = batch.repartition(self.cfg.repartition, host_e, salt)
            else:
                batch = batch.repartition(self.cfg.repartition, F.xxhash64("url"))

        # -- dimension discovery (J5). "pre" mode runs an extra pure-JVM
        # distinct scan BEFORE facts so same-batch facts carry new ids
        # (strict ProviderInfoCache.cs:126 ordering); "post" mode (default)
        # discovers from the batch aggregate after the wide pass — zero
        # extra source scans, ids attach from the next batch on.
        n_new_hosts = n_new_langs = 0
        if self.cfg.discovery == "pre":
            host_expr = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host")
            if self._dims_spilled:
                # spilled dims (host set too big for the driver): pre-mode
                # hosts go through the same bounded table path post mode
                # uses — the driver never holds a distinct host set at any
                # corpus size; langs remain a bounded distinct collect
                # (ISO-code-sized domain, same as the post-mode path).
                batch_hosts = (
                    batch.select(host_expr)
                    .where(F.col("host").isNotNull() & (F.col("host") != ""))
                    .distinct()
                )
                n_new_hosts = self._grow_hosts_table(batch_hosts, batch_id)
                langs = batch.select("lang").distinct().collect()
                _, n_new_langs = self._grow_dims(
                    set(), {r["lang"] for r in langs if r["lang"]}, batch_id
                )
            else:
                pairs = batch.select(host_expr, "lang").distinct().collect()
                n_new_hosts, n_new_langs = self._grow_dims(
                    {p["host"] for p in pairs if p["host"]},
                    {p["lang"] for p in pairs if p["lang"]},
                    batch_id,
                )
        timer.lap("discover_dims")

        # -- THE wide pass: parse (+fused text features) → enrich → route →
        # partitioned write. Features ride the same Arrow batch as the
        # parse — measured 4.3s/1.6M docs cheaper than equivalent JVM
        # expressions appended after the UDF (each is another full pass
        # over the text column).
        parsed = (
            parse_pages_fused(batch, features=self.cfg.compute_text_features)
            if self.cfg.fused_parse
            else parse_pages(batch, features=self.cfg.compute_text_features)
        )
        enriched = enrich_pages(
            parsed, self._host_df(), self._lang_df(),
            broadcast_host=not self._dims_spilled,
        )
        with_rules = apply_rules(enriched, self._rules_df, self.cfg.default_sink)
        staged = with_rules.withColumn(
            "sink", F.when(F.col("allowed"), F.col("sink")).otherwise(F.lit(QUARANTINE))
        ).withColumn("part_id", F.spark_partition_id())
        stage_dir = _os.path.join(self.wh.root, "_staging", batch_id)
        wm_bound_row = None
        if not _os.path.exists(_os.path.join(stage_dir, "_SUCCESS")):
            # the watermark bound max(ts,url) rides the write job as an
            # Observation — zero extra scan, and the fine-stats job below
            # then never touches the wide url column
            wm_obs = Observation(f"wm-{batch_id}")
            (staged.drop("allowed")
             .observe(wm_obs, F.max(F.struct(F.col("warc_ts"), F.col("url"))).alias("mx"))
             .write.mode("overwrite")
             .option("compression", self.cfg.staging_codec)
             .partitionBy("sink").parquet(stage_dir))
            wm_bound_row = wm_obs.get["mx"]
        timer.lap("parse_route_write")

        # exhausted source → the partitioned write produced no sink dirs
        if not any(
            d.startswith("sink=") for d in _os.listdir(stage_dir)
        ):
            import shutil as _shutil

            _shutil.rmtree(stage_dir, ignore_errors=True)
            return None

        # -- all stats from ONE staged scan: a single fine-grained
        # map-side-partial hash aggregate at (sink, part_id, event_class,
        # host, lang, bucket) grain is persisted, and EVERYTHING downstream
        # — per-sink north-rule aggregate, lineage, observation stats,
        # dim-discovery keys, hot-host volumes — is a tiny rollup of that
        # cache. The previous design ran TWO full staged scans (fine stats
        # + agg) in parallel threads; overlap hides the second scan only
        # when cores are idle, so at low parallelism (the N→4N scaling
        # regime) it was pure extra work. part_id is in the grain, so the
        # map-side combine is perfect (each task owns one part_id) and the
        # shuffled volume is the per-task distinct-combo count, not rows.
        import threading as _threading

        stg = self.spark.read.parquet(stage_dir)
        fine_grain = (
            stg.groupBy(
                "sink", "part_id", "event_class", "host", "lang",
                period_key(F.col("warc_ts"), self.cfg.period).alias("bucket"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("warc_ts").alias("__ts_min"),
                F.max("warc_ts").alias("__ts_max"),
                F.sum("n_bytes").alias("__bytes"),
            )
            .persist()
        )
        agg_tbl = self.wh.table("sink_agg")
        post_discovery = self.cfg.discovery == "post"

        # Lineage transport decision: the staged file count is a direct
        # proxy for write tasks x sinks (one data file per task-sink pair),
        # known from a pure driver-side listing. Above the inline ceiling
        # the driver must never hold per-partition rows.
        n_staged_files = sum(
            1
            for _r, _d, _fs in _os.walk(stage_dir)
            for f in _fs
            if f.endswith(".parquet")
        )
        spill_lineage = n_staged_files > self.cfg.lineage_inline_max

        # the ONE staged scan: materializes the cache with full parallelism
        # and collects the (sink, part_id, event_class) rollup (lineage +
        # observation grain) — or, on the spill path, only the bounded
        # (sink, event_class) observation grain. (A grouping-sets form was
        # measured 3x slower at low parallelism: Expand duplicates every
        # input row per set.)
        _fine_keys = (
            ["sink", "event_class"] if spill_lineage
            else ["sink", "part_id", "event_class"]
        )
        fine = (
            fine_grain.groupBy(*_fine_keys)
            .agg(
                F.sum("n").alias("rows"),
                F.min("__ts_min").cast("string").alias("ts_min"),
                F.max("__ts_max").cast("string").alias("ts_max"),
                F.sum("__bytes").alias("bytes"),
            )
            .collect()
        )
        n_input_fine = sum(r["rows"] for r in fine)

        # -- per-sink north-rule aggregate (additive counts), INCLUDING the
        # quarantine partition ("observe even ignored events",
        # EventImportJob.cs:93-94): a cached rollup + tiny append, launched
        # on a DRIVER THREAD so it overlaps the driver-side lineage/obs
        # assembly and the sink manifest commits below.
        agg_res: dict = {}
        hot_thr = self.cfg.salt_threshold * max(n_input_fine, 1)

        def _agg_write():
            try:
                if agg_tbl.state().get("last_batch") != batch_id:
                    if post_discovery and not self._dims_spilled:
                        # ONE tiny cached rollup feeds dim discovery AND
                        # hot-host detection: (host, lang) volumes;
                        # host/lang marginals derive driver-side
                        agg_res["kl"] = (
                            fine_grain.groupBy("host", "lang")
                            .agg(F.sum("n").alias("n"))
                            .collect()
                        )
                    elif post_discovery:
                        # spilled dims: hosts never collect unbounded —
                        # hot candidates are filtered to >= threshold
                        # (≤ 1/salt_threshold rows by construction) and
                        # langs are a bounded distinct
                        agg_res["hot"] = (
                            fine_grain.groupBy("host")
                            .agg(F.sum("n").alias("n"))
                            .where(F.col("n") >= F.lit(hot_thr))
                            .collect()
                        )
                        agg_res["langs"] = (
                            fine_grain.select("lang").distinct().collect()
                        )
                    agg = (
                        fine_grain.groupBy("sink", "host", "lang", "event_class", "bucket")
                        .agg(F.sum("n").alias("n"))
                        .withColumn("batch_id", F.lit(batch_id))
                    )
                    agg_res["sid"] = agg_tbl.append(
                        agg, meta={"batch": batch_id},
                        state_update={"last_batch": batch_id},
                        coalesce=self.cfg.agg_write_files,
                    )
                else:  # resume: locate the already-committed snapshot
                    agg_res["sid"] = agg_tbl.snapshot_for_meta("batch", batch_id)
            except Exception as e:
                agg_res["err"] = e

        agg_thread = _threading.Thread(target=_agg_write, name=f"agg-{batch_id}")
        agg_thread.start()
        # resume (write skipped, no Observation): one narrow 2-column scan
        if wm_bound_row is None:
            wm_bound_row = stg.select(
                F.max(F.struct(F.col("warc_ts"), F.col("url"))).alias("mx")
            ).collect()[0]["mx"]
        obs_rows: list = list(fine)
        lineage: dict[str, list] = {}
        sink_rows: dict[str, int] = {}
        if not spill_lineage:
            lineage_acc: dict = {}
            for r in fine:
                k = (r["sink"], r["part_id"])
                d = lineage_acc.get(k)
                if d is None:
                    lineage_acc[k] = d = {
                        "rows": 0, "ts_min": r["ts_min"], "ts_max": r["ts_max"],
                        "bytes": 0,
                    }
                d["rows"] += r["rows"]
                d["bytes"] += r["bytes"] or 0
                if r["ts_min"] < d["ts_min"]:
                    d["ts_min"] = r["ts_min"]
                if r["ts_max"] > d["ts_max"]:
                    d["ts_max"] = r["ts_max"]
            for k, d in lineage_acc.items():
                lineage.setdefault(k[0], []).append(
                    {"partition": k[1], "rows": d["rows"],
                     "ts_min": d["ts_min"], "ts_max": d["ts_max"],
                     "bytes": d["bytes"]}
                )
                sink_rows[k[0]] = sink_rows.get(k[0], 0) + d["rows"]
        else:
            for r in fine:
                sink_rows[r["sink"]] = sink_rows.get(r["sink"], 0) + r["rows"]
        n_input = n_input_fine
        if n_input == 0:
            agg_thread.join()
            fine_grain.unpersist()
            return None
        bounds = (wm_bound_row["warc_ts"], wm_bound_row["url"])
        if spill_lineage:
            # distributed per-partition lineage: one bounded rollup of the
            # cached fine-grain aggregate, written cluster-side — the
            # driver holds zero per-partition rows. Idempotent on resume
            # via the same last_batch guard the sinks use.
            lineage_tbl = self.wh.table("lineage")
            if lineage_tbl.state().get("last_batch") != batch_id:
                parts = (
                    fine_grain.groupBy("sink", "part_id")
                    .agg(
                        F.sum("n").alias("rows"),
                        F.min("__ts_min").cast("string").alias("ts_min"),
                        F.max("__ts_max").cast("string").alias("ts_max"),
                        F.sum("__bytes").alias("bytes"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                )
                lineage_tbl.append(
                    parts,
                    meta={"batch": batch_id},
                    state_update={"last_batch": batch_id},
                )

        timer.lap("observe")

        # -- adopt staged partitions into the sink tables (in place, no move)
        sink_counts: dict[str, int] = {}
        for s in sorted(sink_rows):
            n_rows = sink_rows[s]
            src_dir = _os.path.join(stage_dir, f"sink={s}")
            name = QUARANTINE_TABLE if s == QUARANTINE else f"{SINK_PREFIX}{s}"
            tbl = self.wh.table(name)
            if tbl.state().get("last_batch") == batch_id:
                if s != QUARANTINE:
                    sink_counts[s] = tbl.state().get("last_batch_rows", 0)
                continue  # resume: this sink already committed this batch
            if _os.path.exists(src_dir):
                tbl.register_dir(
                    src_dir,
                    meta={
                        "batch": batch_id,
                        "rows": n_rows,
                        "watermark_from": wm.to_state(),
                        "lineage": lineage.get(s, []),
                        **(
                            {"lineage_ref": {"table": "lineage", "batch": batch_id}}
                            if spill_lineage
                            else {}
                        ),
                    },
                    state_update={"last_batch": batch_id, "last_batch_rows": n_rows},
                    # drop_reason is quarantine-only triage data; routed
                    # sink partitions carry it always-null (single
                    # partitionBy write), so sink tables project it away —
                    # batch and streaming sink schemas stay identical
                    read_drop=None if s == QUARANTINE else ["drop_reason"],
                )
            if s != QUARANTINE:
                sink_counts[s] = n_rows
        n_routed = sum(sink_counts.values())
        timer.lap("fan_out")

        # observation stats assembled DRIVER-SIDE from the fine-grouped
        # rows (no extra scan) and committed as a driver-side arrow write
        # (Table.append_rows) — zero Spark jobs for a ~|event classes|-row
        # table; all commits stay independent and idempotent, and happen
        # before the watermark advances (the overall commit point)
        obs_acc: dict = {}
        for r in obs_rows:
            d = obs_acc.setdefault(
                r["event_class"], {"n_observed": 0, "n_routed": 0, "n_dropped": 0}
            )
            d["n_observed"] += r["rows"]
            if r["sink"] == QUARANTINE:
                d["n_dropped"] += r["rows"]
            else:
                d["n_routed"] += r["rows"]
        obs_tbl = self.wh.table("observations")
        if obs_tbl.state().get("last_batch") != batch_id:
            obs_tbl.append_rows(
                [
                    (ec, d["n_observed"], d["n_routed"], d["n_dropped"], batch_id)
                    for ec, d in sorted(obs_acc.items(), key=lambda kv: str(kv[0]))
                ],
                _OBS_SCHEMA,
                meta={"batch": batch_id},
                state_update={"last_batch": batch_id},
            )

        agg_thread.join()
        if "err" in agg_res:
            raise agg_res["err"]

        # post-mode dimension discovery: keys were collected on the agg
        # thread from the persisted aggregate (no extra scan). Resume case
        # (agg already committed): read back ONLY the files that batch's
        # commit added (incremental snapshot read).
        if post_discovery:
            if self._dims_spilled:
                # table path: hosts never touch the driver; langs stay in
                # the (bounded) driver cache
                batch_hosts = fine_grain.select("host").where(
                    F.col("host").isNotNull()
                ).distinct()
                n_new_hosts = self._grow_hosts_table(batch_hosts, batch_id)
                langs = agg_res.get("langs")
                if langs is None:
                    langs = fine_grain.select("lang").distinct().collect()
                _, n_new_langs = self._grow_dims(
                    set(), {r["lang"] for r in langs if r["lang"]}, batch_id
                )
                if self.cfg.detect_hot_hosts and agg_res.get("hot") is not None:
                    self._hot_hosts = sorted(
                        r["host"] for r in agg_res["hot"] if r["host"]
                    )
            else:
                kl = agg_res.get("kl")
                if kl is None:  # resume: read back this batch's agg files
                    keys_src = (
                        agg_tbl.read_incremental(self.spark, agg_res["sid"])
                        if agg_res.get("sid") is not None
                        else agg_tbl.read(self.spark).where(F.col("batch_id") == batch_id)
                    )
                    kl = (
                        keys_src.groupBy("host", "lang")
                        .agg(F.sum("n").alias("n"))
                        .collect()
                    )
                n_new_hosts, n_new_langs = self._grow_dims(
                    {k["host"] for k in kl if k["host"]},
                    {k["lang"] for k in kl if k["lang"]},
                    batch_id,
                )
                if self.cfg.detect_hot_hosts:
                    host_totals: dict[str, int] = {}
                    for r in kl:
                        if r["host"]:
                            host_totals[r["host"]] = host_totals.get(r["host"], 0) + r["n"]
                    self._hot_hosts = sorted(
                        h for h, n in host_totals.items() if n >= hot_thr
                    )
        fine_grain.unpersist()
        timer.lap("aggregate")

        # -- advance watermark (the overall batch commit point)
        new_wm = advance(bounds, wm)
        n_batches = self.state_tbl.state().get("n_batches", 0) + 1
        self.state_tbl.set_state(
            **new_wm.to_state(), n_batches=n_batches, last_batch=batch_id,
            hot_hosts=self._hot_hosts, dims_spilled=self._dims_spilled,
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
                "stage_dir": stage_dir,
                "committed_at": time.time(),
            },
        )
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
        """Collapse per-batch additive aggregates to current totals
        (quarantined/dropped rows excluded — they are observation-only)."""
        agg = self.wh.table("sink_agg").read(self.spark).where(
            F.col("sink") != QUARANTINE
        )
        return (
            agg.groupBy("sink", "host", "lang", "event_class", "bucket")
            .agg(F.sum("n").alias("n"))
            .orderBy("sink", "host", "lang", "event_class", "bucket")
        )
