"""M4 — end-to-end pipeline: batched==single-run equality, resume,
idempotent partial-failure recovery, observation semantics, lineage."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.pipeline import Pipeline, PipelineConfig


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


def _mk(spark, wh_path, cap=None):
    return Pipeline(spark, PipelineConfig(warehouse=wh_path, cap=cap))


def test_batched_equals_single_run(spark, pages, tmp_path):
    single = _mk(spark, str(tmp_path / "w1"), cap=None)
    r = single.run_batch(pages)
    assert r is not None and r.n_input == pages.count()

    batched = _mk(spark, str(tmp_path / "w2"), cap=1100)
    results = batched.run_until_exhausted(pages)
    assert len(results) == 3  # 3000 rows / 1100 cap
    assert sum(x.n_input for x in results) == pages.count()

    for sink in ["content", "commerce", "security", "misc"]:
        a = {x.url for x in single.sink_table(sink).select("url").collect()}
        b = {x.url for x in batched.sink_table(sink).select("url").collect()}
        assert a == b, sink
    pa = single.total_sink_aggregates().toPandas()
    pb = batched.total_sink_aggregates().toPandas()
    assert pa.equals(pb)


def test_watermark_resume_across_instances(spark, pages, wh):
    p1 = _mk(spark, wh, cap=2000)
    assert p1.run_batch(pages) is not None
    # a NEW pipeline object on the same warehouse continues, not restarts
    p2 = _mk(spark, wh, cap=2000)
    r2 = p2.run_batch(pages)
    assert r2 is not None and r2.batch_id == "b000002"
    assert p2.run_batch(pages) is None  # exhausted
    total = sum(
        p2.sink_table(s).count() for s in ["content", "commerce", "security", "misc"]
    )
    # equals the routed count of a fresh uncapped single run
    fresh = _mk(spark, wh + "_fresh", cap=None)
    rf = fresh.run_batch(pages)
    assert rf is not None
    assert total == rf.n_routed


def test_partial_failure_is_idempotent(spark, pages, wh):
    """Simulate a crash after sinks committed but before the watermark
    advanced: re-running the batch must not duplicate sink rows."""
    p = _mk(spark, wh, cap=1500)
    r1 = p.run_batch(pages)
    assert r1 is not None
    # roll the pipeline state back (as if the final commit never happened)
    p.state_tbl.set_state(wm_ts=None, wm_url=None, n_batches=0, last_batch=None)
    r_redo = p.run_batch(pages)  # re-runs batch b000001 over the same slice
    assert r_redo is not None and r_redo.batch_id == "b000001"
    # sink appends were skipped (idempotent), counts unchanged
    for s, n in r1.sink_counts.items():
        assert p.sink_table(s).count() == n, s
    # per-row: no duplicate urls in any sink
    for s in r1.sink_counts:
        tbl = p.sink_table(s)
        assert tbl.count() == tbl.select("url").distinct().count()


def test_observation_counts_include_dropped(spark, pages, wh):
    p = _mk(spark, wh, cap=None)
    p.run_batch(pages)
    obs = p.wh.table("observations").read(spark)
    login = obs.where(F.col("event_class") == "login").collect()[0]
    assert login.n_observed > 0 and login.n_routed == 0
    assert login.n_dropped == login.n_observed


def test_lineage_and_metrics_sidecars(spark, pages, wh):
    p = _mk(spark, wh, cap=None)
    r = p.run_batch(pages)
    # sink commit metadata carries per-partition lineage
    snap = p.wh.table("sink_content").current_snapshot()
    assert snap.meta["batch"] == "b000001"
    assert snap.meta["rows"] == r.sink_counts["content"]
    lineage = snap.meta["lineage"]
    assert sum(x["rows"] for x in lineage) == r.sink_counts["content"]
    assert all("ts_min" in x and "ts_max" in x for x in lineage)
    # metrics sidecar exists and carries throughput + stage laps
    mdir = os.path.join(p.state_tbl.path, "_metrics")
    files = os.listdir(mdir)
    assert len(files) == 1
    payload = json.load(open(os.path.join(mdir, files[0])))
    assert payload["docs_per_sec"] > 0
    assert set(payload["stage_seconds"]) >= {
        "discover_dims", "parse_route_write", "observe", "fan_out", "aggregate"
    }


def test_reserved_sink_names_rejected(spark, wh):
    """A rule routing to sink='agg' would shadow the internal 'sink_agg'
    aggregates table (ADVICE r1, medium): must be rejected at init."""
    from eventanalysis_spark import datagen

    bad_rules = datagen.route_rules_df(spark).withColumn(
        "sink",
        F.when(F.col("sink") == "commerce", F.lit("agg")).otherwise(F.col("sink")),
    )
    with pytest.raises(ValueError, match="reserved"):
        Pipeline(spark, PipelineConfig(warehouse=wh), rules=bad_rules)
    # malformed names (reference job-name grammar) also rejected
    bad2 = datagen.route_rules_df(spark).withColumn(
        "sink",
        F.when(F.col("sink") == "commerce", F.lit("Bad Name!")).otherwise(F.col("sink")),
    )
    with pytest.raises(ValueError, match="invalid sink name"):
        Pipeline(spark, PipelineConfig(warehouse=wh + "_2"), rules=bad2)


def test_dims_grow_once_and_persist(spark, pages, wh):
    p = _mk(spark, wh, cap=1000)
    p.run_until_exhausted(pages)
    hosts = p.wh.table("dim_host").read(spark)
    assert hosts.count() == 20
    ids = [r.host_id for r in hosts.collect()]
    assert len(set(ids)) == 20  # no collisions across discovery batches
    langs = p.wh.table("dim_lang").read(spark)
    assert langs.count() == 10


def test_drop_reason_only_in_quarantine(spark, pages, wh):
    """drop_reason is triage data for quarantined rows: sink tables must
    NOT expose it (it is always-null there by construction), quarantine
    must — and batch sink schema == streaming sink schema."""
    p = _mk(spark, wh, cap=None)
    r = p.run_batch(pages)
    assert r is not None
    for s in r.sink_counts:
        assert "drop_reason" not in p.sink_table(s).columns, s
    q = p.wh.table("quarantine").read(spark)
    assert "drop_reason" in q.columns
    assert q.where(F.col("drop_reason").isNull()).count() == 0


def test_dim_spill_switches_to_table_path(spark, pages, wh):
    """Once the host dim outgrows dim_cache_limit the pipeline must flip
    permanently to the table-based anti-join path (distributed discovery,
    append-only growth, no driver cache) with sequential-id CONTINUITY
    across the switch — and a fresh Pipeline on the same warehouse must
    come up already spilled."""
    cfg = PipelineConfig(warehouse=wh, cap=1000, dim_cache_limit=5)
    p = Pipeline(spark, cfg)
    results = p.run_until_exhausted(pages)
    assert len(results) == 3
    assert p._dims_spilled is True
    assert p._host_rows is None
    assert p.state_tbl.state().get("dims_spilled") is True
    hosts = p.wh.table("dim_host").read(spark).collect()
    assert len(hosts) == 20
    ids = sorted(r.host_id for r in hosts)
    assert ids == list(range(1, 21))  # sequential, no gaps across the switch
    # a new instance resumes spilled and still discovers nothing new
    p2 = Pipeline(spark, cfg)
    assert p2._dims_spilled is True
    assert p2.run_batch(pages) is None
    # parity: same routed rows as an unspilled run
    q = _mk(spark, wh + "_ref", cap=1000)
    q.run_until_exhausted(pages)
    for s in ["content", "commerce", "security", "misc"]:
        a = {x.url for x in p.sink_table(s).select("url").collect()}
        b = {x.url for x in q.sink_table(s).select("url").collect()}
        assert a == b, s


def test_hot_host_salting_learns_and_spreads(spark, pages, wh):
    """North-rule skew handling: a host above salt_threshold of batch
    volume is learned from batch N's aggregate and its rows are salted
    over several partitions in batch N+1, while cold hosts stay
    co-located in a single partition. The hot set survives resume."""
    # rewrite ~60% of urls onto one hot host (urls stay unique via hash)
    hot_src = pages.withColumn(
        "url",
        F.when(
            F.pmod(F.xxhash64("url"), F.lit(10)) < 6,
            F.concat(
                F.lit("https://hot.example.com/p"),
                F.abs(F.xxhash64("url")).cast("string"),
            ),
        ).otherwise(F.col("url")),
    )
    cfg = PipelineConfig(
        warehouse=wh, cap=1500, repartition=4,
        salt_threshold=0.3, salt_n=8,
    )
    pipe = Pipeline(spark, cfg)
    r1 = pipe.run_batch(hot_src)
    assert r1 is not None
    assert "hot.example.com" in pipe._hot_hosts

    r2 = pipe.run_batch(hot_src)
    assert r2 is not None
    stg = spark.read.parquet(os.path.join(wh, "_staging", r2.batch_id))
    hot_parts = (
        stg.where(F.col("url").contains("hot.example.com"))
        .select("part_id").distinct().count()
    )
    assert hot_parts > 1, "hot host should be salted across partitions"
    # a cold host stays co-located (salt 0 → one partition)
    cold_host = (
        stg.where(~F.col("url").contains("hot.example.com"))
        .select(F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).first()["h"]
    )
    cold_parts = (
        stg.where(F.col("url").contains(cold_host))
        .select("part_id").distinct().count()
    )
    assert cold_parts == 1, f"cold host {cold_host} should stay in one partition"
    # learned hot set is committed with the watermark and survives resume
    p2 = Pipeline(spark, cfg)
    assert p2._hot_hosts == pipe._hot_hosts


def test_warehouse_maintain_compacts_and_preserves(spark, pages, tmp_path):
    """S12 VACUUM at warehouse scope: after batched runs leave one staging
    dir per (batch, sink), maintain() collapses each sink to one compacted
    snapshot dir, reclaims the superseded staging dirs, and changes no
    data (row sets identical before/after). Resume state survives."""
    wh_path = str(tmp_path / "wm")
    pipe = _mk(spark, wh_path, cap=1100)
    pipe.run_until_exhausted(pages)
    before = {
        s: {x.url for x in pipe.sink_table(s).select("url").collect()}
        for s in ["content", "commerce", "security", "misc"]
    }
    content = pipe.wh.table("sink_content")
    assert len(content.current_snapshot().dirs) == 3  # one per batch

    out = pipe.wh.maintain(spark, keep_snapshots=1, target_partitions=1)
    assert out["sink_content"]["dirs_before"] == 3
    assert out["sink_content"]["dirs_removed"] > 0
    assert len(content.current_snapshot().dirs) == 1

    after = {
        s: {x.url for x in pipe.sink_table(s).select("url").collect()}
        for s in ["content", "commerce", "security", "misc"]
    }
    assert before == after
    # pipeline state (watermark, batch count) untouched by maintenance
    p2 = _mk(spark, wh_path, cap=1100)
    assert p2.run_batch(pages) is None  # still exhausted, resume intact


def test_lineage_spills_to_table_above_inline_max(spark, pages, wh):
    """Web-scale lineage path: above lineage_inline_max staged files the
    per-partition lineage is written distributedly to the 'lineage' table
    (driver never holds per-partition rows) and sink commits carry a
    pointer. Totals, per-sink counts, and resume idempotence all hold."""
    p = Pipeline(
        spark,
        PipelineConfig(warehouse=wh, cap=None, lineage_inline_max=2, repartition=4),
    )
    r = p.run_batch(pages)
    assert r is not None
    snap = p.wh.table("sink_content").current_snapshot()
    assert snap.meta["lineage"] == []  # not inlined in manifest JSON
    assert snap.meta["lineage_ref"] == {"table": "lineage", "batch": r.batch_id}

    lin = p.wh.table("lineage").read(spark)
    assert lin.agg(F.sum("rows")).collect()[0][0] == r.n_input
    by_sink = {
        x["sink"]: x["n"]
        for x in lin.groupBy("sink").agg(F.sum("rows").alias("n")).collect()
    }
    for s, n in r.sink_counts.items():
        assert by_sink[s] == n, s
    # the partition grain survived (all 4 repartition tasks present)
    assert lin.select("part_id").distinct().count() == 4
    n_lineage_rows = lin.count()

    # crash-after-sinks-committed resume must not duplicate lineage rows
    p.state_tbl.set_state(wm_ts=None, wm_url=None, n_batches=0, last_batch=None)
    r2 = p.run_batch(pages)
    assert r2 is not None and r2.batch_id == r.batch_id
    assert p.wh.table("lineage").read(spark).count() == n_lineage_rows


def test_dim_spill_pre_mode_uses_table_path(spark, pages, wh):
    """discovery='pre' after the dim spill must route host discovery
    through the table anti-join path like post mode — no unbounded
    driver collect of (host, lang) pairs remains reachable from any
    config — with sequential-id continuity and sink parity vs the
    default post-mode run."""
    cfg = PipelineConfig(
        warehouse=wh, cap=1000, dim_cache_limit=5, discovery="pre"
    )
    p = Pipeline(spark, cfg)
    results = p.run_until_exhausted(pages)
    assert len(results) == 3
    assert p._dims_spilled is True and p._host_rows is None
    hosts = p.wh.table("dim_host").read(spark).collect()
    assert len(hosts) == 20
    assert sorted(r.host_id for r in hosts) == list(range(1, 21))
    assert p.wh.table("dim_lang").read(spark).count() == 10
    # fresh instance resumes spilled; exhausted source stays exhausted
    p2 = Pipeline(spark, cfg)
    assert p2._dims_spilled is True
    assert p2.run_batch(pages) is None
    # parity with the default post-mode spilled run
    q = Pipeline(spark, PipelineConfig(
        warehouse=wh + "_ref", cap=1000, dim_cache_limit=5
    ))
    q.run_until_exhausted(pages)
    for s in ["content", "commerce", "security", "misc"]:
        a = {x.url for x in p.sink_table(s).select("url").collect()}
        b = {x.url for x in q.sink_table(s).select("url").collect()}
        assert a == b, s
