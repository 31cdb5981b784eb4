"""M5 — export sinks (S7-S9), extract-spec compiler, archive/purge (S5/S6/
S11/P7/W3), streaming pipeline."""

from __future__ import annotations

import csv
import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark import datagen
from eventanalysis_spark.operators.aggregate import overview
from eventanalysis_spark.operators.parse import parse_pages
from eventanalysis_spark.plans.extract_spec import ExportSpec, compile_spec
from eventanalysis_spark.sources.archive import (
    CurrentMonthError,
    build_archive,
    list_archives,
    month_slice,
    purge_archived,
    read_archive,
    vacuum,
)
from eventanalysis_spark.sources.catalog import Warehouse
from eventanalysis_spark.sources.exports import (
    export_csv,
    export_metadata_json,
    export_samples,
    export_spec_csv,
    indent_xml,
)


@pytest.fixture(scope="module")
def parsed_full(spark, pages):
    df = parse_pages(pages, keep_payload=True).persist()
    df.count()
    yield df
    df.unpersist()


# ---- extract spec (§2.10) ---------------------------------------------------

def test_spec_compile_and_transforms(spark, parsed_full):
    spec = ExportSpec(
        jobname="content-dump",
        classes=["article", "forum"],
        columns={
            "page_url": ":page:url",
            "page_host": ":sys:host",
            "version": "unsigned,notempty:sys:ever_raw",
            "klass": ":data:ea:class",
            "reserved": None,
        },
    )
    out = compile_spec(spec, parsed_full)
    pdf = out.toPandas()
    want = parsed_full.where(F.col("event_class").isin(["article", "forum"]))
    assert len(pdf) == want.count()
    assert set(pdf.columns) == {"url", "page_url", "page_host", "version", "klass", "reserved", "_err"}
    assert (pdf.page_url == pdf.url).all()
    assert pdf.reserved.isna().all()
    # unsigned canonicalized hex versions to decimal strings
    assert set(pdf.version.dropna().unique()) <= {"1", "2", "3"}
    assert pdf._err.isna().all()
    assert set(pdf.klass.unique()) <= {"article", "forum"}


def test_spec_json_roundtrip():
    spec = ExportSpec("j", ["a"], {"c": ":sys:host", "r": None})
    spec2 = ExportSpec.from_json(spec.to_json())
    assert spec2 == spec


def test_spec_error_column(spark, parsed_full):
    # notempty on title: rows with empty/missing title must carry _err
    spec = ExportSpec("t", [], {"title_req": "notempty:sys:title"})
    pdf = compile_spec(spec, parsed_full).toPandas()
    n_empty = (pdf._err.notna()).sum()
    want_empty = parsed_full.where(
        F.col("title").isNull() | (F.col("title") == "")
    ).count()
    assert n_empty == want_empty


# ---- CSV / samples / metadata sinks -----------------------------------------

def test_export_csv_and_spec_csv(spark, parsed_full, tmp_path):
    spec = ExportSpec("dump", ["article"], {"u": ":page:url", "h": ":sys:host"})
    out = str(tmp_path / "csv")
    export_spec_csv(parsed_full, spec, out)
    files = glob.glob(f"{out}/*.csv")
    assert files
    rows = []
    for fp in files:
        with open(fp) as f:
            rows.extend(list(csv.DictReader(f)))
    assert len(rows) == parsed_full.where(F.col("event_class") == "article").count()
    assert set(rows[0].keys()) == {"url", "u", "h"}


def test_export_samples(spark, parsed_full, tmp_path):
    paths = export_samples(parsed_full, str(tmp_path / "samples"), k=5)
    assert len(paths) == 5
    content = open(paths[0]).read()
    assert content.startswith("url: https://")


def test_indent_xml_golden():
    """F10 golden: nesting, text-only inline, self-closing normalization,
    inter-element whitespace dropped, document declaration
    (XmlUtilities.cs:95-125 IndentXml analog)."""
    raw = (
        '<Event><System>  <Provider Name="x"/>'
        "<EventID>5</EventID><Empty></Empty></System></Event>"
    )
    assert indent_xml(raw) == (
        "<Event>\n"
        "  <System>\n"
        '    <Provider Name="x" />\n'
        "    <EventID>5</EventID>\n"
        "    <Empty></Empty>\n"
        "  </System>\n"
        "</Event>"
    )
    doc = indent_xml("<a><b>t</b></a>", fragment=False)
    assert doc.startswith('<?xml version="1.0" encoding="utf-8"?>\n<a>')
    assert doc.endswith("</a>\n")
    # malformed input never raises, depth clamps at 0
    assert indent_xml("</b><a>text</a>") == "</b>\n<a>text</a>"
    assert indent_xml("") == ""


def test_export_samples_xml_mode(spark, parsed_full, tmp_path):
    paths = export_samples(
        parsed_full, str(tmp_path / "xml_samples"), k=3, fmt="xml"
    )
    assert len(paths) == 3 and all(p.endswith(".xml") for p in paths)
    content = open(paths[0]).read()
    assert content.startswith('<?xml version="1.0" encoding="utf-8"?>\n<sample ')
    assert content.rstrip().endswith("</sample>")


def test_export_metadata_json(spark, parsed_full, tmp_path):
    ov = overview(parsed_full)
    p = str(tmp_path / "meta.json")
    export_metadata_json(
        datagen.host_info_df(spark), datagen.lang_info_df(spark), ov, p
    )
    doc = json.load(open(p))
    assert len(doc["hosts"]) == 20
    assert doc["hosts"][0]["classes"]  # nested children present
    assert {x["lang"] for x in doc["langs"]} == {r[0] for r in datagen.lang_info_rows()}


# ---- archive / purge ---------------------------------------------------------

def test_archive_lifecycle(spark, pages, tmp_path):
    root = str(tmp_path / "arc")
    # completeness gate: watermark inside the month → refused
    with pytest.raises(CurrentMonthError):
        build_archive(pages, root, "2024-12", watermark_ts="2024-12-15 00:00:00")
    # ADVICE r1: a watermark exactly at the month boundary, in str(datetime)
    # format (space separator), means the month IS complete — must not raise
    info = build_archive(
        pages, root + "_b", "2024-12", watermark_ts="2025-01-01 00:00:00"
    )
    assert info is not None
    import shutil

    shutil.rmtree(root + "_b")
    info = build_archive(pages, root, "2024-12", watermark_ts="2025-02-20 00:00:00")
    assert info is not None
    assert info.n_rows == month_slice(pages, "2024-12").count()
    assert info.name == "cluster.pages.archive.2024-12"
    # collision check
    with pytest.raises(FileExistsError):
        build_archive(pages, root, "2024-12", allow_current=True)
    # read back: row set identical, ordered storage
    back = read_archive(spark, root, info.name)
    assert back.count() == info.n_rows
    assert {r.url for r in back.select("url").collect()} == {
        r.url for r in month_slice(pages, "2024-12").select("url").collect()
    }
    assert list_archives(root)[0].month == "2024-12"
    # empty month → None
    assert build_archive(pages, root, "2030-01", allow_current=True) is None


def test_purge_and_vacuum(spark, pages, tmp_path):
    root = str(tmp_path / "arc")
    wh = Warehouse(str(tmp_path / "wh"))
    t = wh.table("pages")
    t.overwrite(pages)
    n0 = t.read(spark).count()
    info = build_archive(pages, root, "2024-11", allow_current=True)
    purged = purge_archived(spark, t, root, before_month="2024-12")
    assert purged == 1
    n1 = t.read(spark).count()
    assert n1 == n0 - info.n_rows
    # vacuumed table still reads correctly with fewer snapshots
    removed = vacuum(spark, t, keep_last=1)
    assert removed > 0
    assert t.read(spark).count() == n1


# ---- streaming ---------------------------------------------------------------

def test_streaming_windowed_counts_match_batch(spark, pages, pages_path):
    from eventanalysis_spark.streaming.stream_pipeline import (
        run_windowed_counts_to_memory,
    )

    got = run_windowed_counts_to_memory(spark, pages_path, "wc_test").toPandas()
    want = (
        pages.groupBy(F.window("warc_ts", "1 day").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "lang", "n")
        .toPandas()
    )
    g = got.set_index(["w_start", "lang"]).n.sort_index()
    w = want.set_index(["w_start", "lang"]).n.sort_index()
    assert g.equals(w)


def test_streaming_router_exactly_once(spark, pages_path, tmp_path):
    from eventanalysis_spark.streaming.stream_pipeline import start_routing_stream

    wh_path = str(tmp_path / "swh")
    ckpt = str(tmp_path / "ckpt")
    q = start_routing_stream(spark, pages_path, wh_path, ckpt)
    q.awaitTermination()
    wh = Warehouse(wh_path)
    total = sum(
        wh.table(t).read(spark).count()
        for t in wh.tables()
        if t.startswith("stream_sink_")
    )
    assert total > 0
    # restart with same checkpoint: no new data → no duplicate commits
    q2 = start_routing_stream(spark, pages_path, wh_path, ckpt)
    q2.awaitTermination()
    total2 = sum(
        wh.table(t).read(spark).count()
        for t in wh.tables()
        if t.startswith("stream_sink_")
    )
    assert total2 == total


def test_jsonl_roundtrip_sharded(spark, pages, tmp_path):
    from eventanalysis_spark.sources.exports import export_jsonl, read_jsonl

    src = pages.limit(500).select("url", "warc_ts", "text", "lang")
    out = str(tmp_path / "jsonl")
    export_jsonl(
        src.repartition(4), out, shard_rows=100,
        order_within_shard=["url"],
    )
    import glob

    shards = glob.glob(out + "/part-*.json.gz")
    assert len(shards) >= 5  # 500 rows / 100-row cap over 4 partitions
    back = read_jsonl(
        spark, out, "url string, warc_ts timestamp, text string, lang string"
    )
    rows = back.collect()
    # (filtering on _corrupt_record alone is disallowed by Spark on raw
    # JSON scans — inspect it post-collect)
    assert all(r["_corrupt_record"] is None for r in rows)
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r)[:-1] for r in rows}
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    from eventanalysis_spark.sources.exports import read_jsonl

    p = tmp_path / "bad"
    p.mkdir()
    (p / "a.json").write_text(
        '{"url": "http://a", "n": 1}\nnot json at all\n{"url": "http://b", "n": 2}\n'
    )
    df = read_jsonl(spark, str(p), "url string, n long")
    rows = df.collect()
    assert len(rows) == 3
    assert sum(r["_corrupt_record"] is not None for r in rows) == 1
    assert {r["url"] for r in rows if r["_corrupt_record"] is None} == {
        "http://a", "http://b",
    }
