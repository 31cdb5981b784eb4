"""Custom stateful streaming operator (applyInPandasWithState) — per-host
gap sessionization, checked against a pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from eventanalysis_spark.streaming.stateful import run_sessions_available_now


def _oracle_sessions(pdf: pd.DataFrame, gap_seconds: int) -> pd.DataFrame:
    """Pure-pandas sessionization; returns only GAP-closed sessions (the
    final open session per host stays in state, matching append-mode)."""
    out = []
    pdf = pdf.copy()
    pdf["host"] = pdf.url.str.extract(r"^[a-z]+://([^/]+)")
    pdf["n_bytes"] = pdf.html.map(len)
    for host, g in pdf.sort_values("warc_ts").groupby("host"):
        start = end = None
        n = total = 0
        for t, b in zip(g.warc_ts, g.n_bytes):
            if start is None:
                start, end, n, total = t, t, 1, int(b)
            elif (t - end).total_seconds() > gap_seconds:
                out.append((host, start, end, n, total))
                start, end, n, total = t, t, 1, int(b)
            else:
                end, n, total = t, n + 1, total + int(b)
        # final open session NOT emitted
    return pd.DataFrame(
        out, columns=["host", "session_start", "session_end", "n_events", "total_bytes"]
    )


def test_host_sessions_match_pandas_oracle(spark, pages_path, pages_pdf):
    gap = 6 * 3600  # 6h gap over the ~3-month fixture → plenty of sessions
    got = (
        run_sessions_available_now(spark, pages_path, gap, "sess_test")
        .toPandas()
        .sort_values(["host", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_sessions(pages_pdf, gap)
        .sort_values(["host", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.host == want.host).all()
    assert (got.session_start == want.session_start).all()
    assert (got.session_end == want.session_end).all()
    assert (got.n_events == want.n_events).all()
    assert (got.total_bytes == want.total_bytes).all()
    assert (got.closed_reason == "gap").all()
    assert got.n_events.sum() > 0


def test_exact_dedup_stream_bounded_state(spark, pages_path, pages_pdf, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) drains a
    duplicated source to exactly one row per distinct content."""
    from eventanalysis_spark.streaming.stream_pipeline import (
        exact_dedup_stream,
        read_pages_stream,
    )

    # duplicate every page (two files of the same data)
    dup_dir = str(tmp_path / "dup-pages")
    src = spark.read.parquet(pages_path)
    src.write.mode("overwrite").parquet(dup_dir)
    src.write.mode("append").parquet(dup_dir)

    stream = read_pages_stream(spark, dup_dir)
    deduped = exact_dedup_stream(stream, text_col="html")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dedup_stream_test")
    n_distinct = pages_pdf.html.map(bytes).nunique()
    assert got.count() == n_distinct
    # one row per content hash, schema preserved
    from pyspark.sql import functions as F

    assert got.groupBy(F.md5("html")).count().where("count > 1").count() == 0
    assert set(got.columns) == set(src.columns)
