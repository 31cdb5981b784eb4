"""WARC ingestion — read Common-Crawl-style WARC files straight into the
pipeline's page schema.

Common Crawl's native on-disk format is WARC/1.0 (ISO 28500): a
concatenation of records, each a `WARC/1.0` version line + CRLF headers +
CRLF CRLF + a Content-Length-delimited payload + CRLF CRLF. Crawl
`response` records carry the fetched HTTP response (status line +
headers + html bytes) and the fetch metadata the pipeline needs:
`WARC-Target-URI` (url), `WARC-Date` (warc_ts), and — in Common Crawl
since CC-MAIN-2018-34 — `WARC-Identified-Content-Language` (lang).
The `text` column of the input contract is NOT in WARC (Common Crawl
ships it as the separate WET sidecar); the parse stage extracts it from
`html` byte-identically (operators/parse.py), so WARC-read sources flow
through `Pipeline.run_batch` unchanged.

Spark-first shape: `spark.read.format("binaryFile")` enumerates and
loads the files (distributed listing, one row per file — binaryFile
never splits a file, matching WARC's non-splittable gzip framing), and
a pure-Python record scan runs inside `mapInPandas` — per-FILE
sequential work, embarrassingly parallel across files. A Common Crawl
snapshot is ~72k WARC files of ~1 GB, so file-level parallelism
saturates any cluster; per-record gzip members (the CC layout) are
handled by whole-blob multi-member decompression. The scan is
Content-Length-driven (never regex over payload bytes), so html
containing literal 'WARC/1.0' cannot desync it.

The writer exists to build real WARC fixtures from the deterministic
datagen pages (tests + local bench); production data arrives as WARC
already.

Reference tie-in: this is the S3-analog "foreign binary container →
typed rows" scan the reference does for .evtx via EventLogReader
(Lcl.EventLog/Utilities/RawEventExtractor.cs) — recast for the web
corpus world where the container is WARC.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "warc_file string, warc_rec int"
)

_CRLF = b"\r\n"


# ---- record-level codec (pure python, shared by writer and reader) --------


def warc_record_bytes(
    url: str, ts_iso: str, html: bytes, lang: str | None
) -> bytes:
    """ONE WARC/1.0 response record wrapping `html` as an HTTP/1.1 200
    response. Record ids are content-derived (md5 of url+date) so the
    writer is deterministic — same rows, same bytes, any partitioning."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    rid = hashlib.md5(f"{url}|{ts_iso}".encode()).hexdigest()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: " + ts_iso.encode(),
        b"WARC-Target-URI: " + url.encode(),
    ]
    if lang is not None:
        headers.append(b"WARC-Identified-Content-Language: " + lang.encode())
    headers += [
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Scan one (decompressed) WARC blob into response-record dicts
    {url, ts, html, lang}. Content-Length-driven: payload bytes are
    sliced, never searched. Non-response records (warcinfo, request,
    metadata) and truncated trailing garbage are skipped, not fatal —
    one malformed record in a 1 GB crawl file must not kill the task."""
    pos, n = 0, len(blob)
    while pos < n:
        while pos < n and blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0 or not blob.startswith(b"WARC/", pos):
            return  # desynced / trailing junk: stop cleanly
        headers: dict[str, str] = {}
        lines = blob[pos:head_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body = blob[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        if headers.get("warc-type") != "response" or len(body) < clen:
            continue
        # payload = HTTP response; html starts after its header block
        sep = body.find(_CRLF + _CRLF)
        html = body[sep + 4 :] if sep >= 0 else body
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        if not url or not ts:
            continue
        yield {
            "url": url,
            "ts": ts,
            "html": html,
            "lang": headers.get("warc-identified-content-language"),
        }


def _maybe_gunzip(name: str, content: bytes) -> bytes:
    if name.endswith(".gz") or content[:2] == b"\x1f\x8b":
        # multi-member streams (the Common Crawl per-record-gzip layout)
        # decompress as the concatenation of all members
        out, buf = [], io.BytesIO(content)
        while True:
            start = buf.tell()
            if start >= len(content):
                break
            try:
                with gzip.GzipFile(fileobj=buf) as g:
                    out.append(g.read())
            except OSError:
                break
        return b"".join(out)
    return content


# ---- Spark-side reader -----------------------------------------------------


def read_warc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Distributed WARC scan → (url, warc_ts, html, lang, warc_file,
    warc_rec). One task per file (binaryFile rows), iterator mapInPandas
    so only one file's records are materialized per yield. `warc_file` +
    `warc_rec` give per-record provenance lineage for free."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def scan(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                blob = _maybe_gunzip(fpath, bytes(content))
                recs = list(parse_warc(blob))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r["url"] for r in recs],
                        "warc_ts": pd.to_datetime(
                            [r["ts"] for r in recs], utc=True, format="ISO8601"
                        ).tz_localize(None),
                        "html": [r["html"] for r in recs],
                        "lang": [r["lang"] for r in recs],
                        "warc_file": os.path.basename(fpath),
                        "warc_rec": range(len(recs)),
                    }
                )

    return files.mapInPandas(scan, WARC_PAGES_DDL)


# ---- writer (deterministic fixture/export utility) -------------------------


def write_warc(
    df: DataFrame, out_dir: str, compress: bool = False, prefix: str = "part"
) -> list[str]:
    """Serialize a pages frame (url, warc_ts, html[, lang]) into WARC
    files, one per Spark partition, records in (warc_ts, url) order
    within a file. Record bytes are content-derived, so the corpus's
    WARC serialization is deterministic given the partitioning. Files
    are assembled on executors (one pass) and persisted through the
    driver — a fixture/export path for tests and local benches, not the
    100-TB write path (production web corpora arrive as WARC)."""
    from pyspark.sql import functions as F

    cols = ["url", "warc_ts", "html"]
    has_lang = "lang" in df.columns
    src = df.select(*cols, *(["lang"] if has_lang else []))

    def build(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for t in pdf.itertuples(index=False):
                ts_iso = pd.Timestamp(t.warc_ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                rows.append(
                    (
                        (ts_iso, t.url),
                        warc_record_bytes(
                            t.url, ts_iso, bytes(t.html),
                            t.lang if has_lang else None,
                        ),
                    )
                )
        if not rows:
            return
        rows.sort(key=lambda r: r[0])
        blob = b"".join(r[1] for r in rows)
        if compress:
            gz = gzip.compress(blob, 6)
            blob = gz
        yield pd.DataFrame({"n_records": [len(rows)], "blob": [blob]})

    built = src.mapInPandas(build, "n_records long, blob binary").collect()
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    paths = []
    for i, r in enumerate(built):
        p = os.path.join(out_dir, f"{prefix}-{i:05d}{ext}")
        with open(p, "wb") as f:
            f.write(r["blob"])
        paths.append(p)
    return paths
