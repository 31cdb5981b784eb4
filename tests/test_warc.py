"""WARC ingestion (sources/warc.py): record codec golden tests, file
roundtrip at both compressions, and the full pipeline running off a
WARC-read source with sink parity vs the parquet source."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from eventanalysis_spark.pipeline import Pipeline, PipelineConfig
from eventanalysis_spark.sources.warc import (
    parse_warc,
    read_warc,
    warc_record_bytes,
    write_warc,
)


def _golden_blob() -> bytes:
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 15\r\n\r\n"
        b"robots: classic\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Target-URI: http://a.example/x\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        b"Content-Length: 19\r\n\r\n"
        b"GET /x HTTP/1.1\r\n\r\n"
    )
    resp = warc_record_bytes(
        "http://a.example/x",
        "2024-01-01T00:00:00Z",
        b"<html>WARC/1.0 inside payload</html>",
        "en",
    )
    resp2 = warc_record_bytes(
        "http://b.example/y", "2024-02-02T03:04:05Z", b"<html>two</html>", None
    )
    return info + req + resp + resp2


def test_parse_warc_golden():
    recs = list(parse_warc(_golden_blob()))
    # warcinfo + request skipped, both responses kept, in order
    assert [r["url"] for r in recs] == [
        "http://a.example/x", "http://b.example/y",
    ]
    assert recs[0]["html"] == b"<html>WARC/1.0 inside payload</html>"
    assert recs[0]["lang"] == "en"
    assert recs[1]["lang"] is None
    assert recs[1]["ts"] == "2024-02-02T03:04:05Z"


def test_parse_warc_truncated_tail_not_fatal():
    blob = _golden_blob() + b"WARC/1.0\r\nWARC-Type: response\r\ngarbage"
    assert len(list(parse_warc(blob))) == 2


def test_parse_warc_multimember_gzip():
    from eventanalysis_spark.sources.warc import _maybe_gunzip

    a = warc_record_bytes("http://a/1", "2024-01-01T00:00:00Z", b"<p>a</p>", "en")
    b = warc_record_bytes("http://b/2", "2024-01-01T00:00:01Z", b"<p>b</p>", "de")
    blob = gzip.compress(a) + gzip.compress(b)  # CC per-record-gzip layout
    out = _maybe_gunzip("x.warc.gz", blob)
    assert [r["url"] for r in parse_warc(out)] == ["http://a/1", "http://b/2"]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(spark, pages, tmp_path, compress):
    src = pages.limit(400)
    out = str(tmp_path / ("gz" if compress else "plain"))
    paths = write_warc(src.repartition(3), out, compress=compress)
    assert len(paths) == 3
    back = read_warc(spark, out)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]), r["lang"])
        for r in src.select("url", "warc_ts", "html", "lang").collect()
    }
    got = {
        (r["url"], r["warc_ts"], bytes(r["html"]), r["lang"])
        for r in back.collect()
    }
    assert got == want
    # provenance columns present and well-formed
    prov = back.select("warc_file", "warc_rec").collect()
    assert all(r["warc_file"].startswith("part-") for r in prov)


def test_pipeline_over_warc_matches_parquet_source(spark, pages, tmp_path):
    """The ingestion contract: a WARC-read source drains through the
    pipeline with the SAME routed row-sets as the parquet source (text
    is re-extracted from html by the parse stage, so nothing is lost
    dropping the WET-style text column)."""
    src = pages.limit(600)
    warc_dir = str(tmp_path / "warc")
    write_warc(src.repartition(2), warc_dir, compress=True)

    p_parquet = Pipeline(spark, PipelineConfig(warehouse=str(tmp_path / "w1")))
    r1 = p_parquet.run_batch(src)
    p_warc = Pipeline(spark, PipelineConfig(warehouse=str(tmp_path / "w2")))
    r2 = p_warc.run_batch(read_warc(spark, warc_dir))
    assert r1 is not None and r2 is not None
    assert r2.n_input == r1.n_input
    assert r2.sink_counts == r1.sink_counts
    for sink in r1.sink_counts:
        a = {
            (x["url"], x["text_extracted"])
            for x in p_parquet.sink_table(sink)
            .select("url", "text_extracted").collect()
        }
        b = {
            (x["url"], x["text_extracted"])
            for x in p_warc.sink_table(sink)
            .select("url", "text_extracted").collect()
        }
        assert a == b, sink
