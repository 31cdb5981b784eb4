"""Custom stateful streaming operator via applyInPandasWithState —
SURVEY.md §2.5 W4's true streaming analog (the reference's
emit-on-group-change running stats, AppDiag.fs:71-98 +
EventRowStatistics.cs:17-98, kept running state per group on its single
thread; the distributed form is per-key state in the state store).

Operator: per-host SESSION statistics — gap-based sessionization with a
running (count, bytes, first_ts, last_ts) accumulator per open session.
A session closes when the host goes quiet for `gap` seconds (or at
timeout); closed sessions are emitted downstream.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_bytes", LongType()),
        StructField("closed_reason", StringType()),
    ]
)

# state: (start_us, end_us, n, bytes)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("bytes", LongType()),
    ]
)


def _session_fn(gap_seconds: int, use_timeout: bool = True):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        host = key[0]
        out = []

        if state.hasTimedOut:
            (start_us, end_us, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_bytes": [total],
                    "closed_reason": ["timeout"],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("warc_ts")
        ts_us = (rows["warc_ts"].astype("int64") // 1000).to_numpy()
        sizes = rows["n_bytes"].fillna(0).astype("int64").to_numpy()

        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us = end_us = None
            n = total = 0

        for t, b in zip(ts_us, sizes):
            if start_us is None:
                start_us, end_us, n, total = int(t), int(t), 1, int(b)
            elif t - end_us > gap_us:
                out.append((start_us, end_us, n, total, "gap"))
                start_us, end_us, n, total = int(t), int(t), 1, int(b)
            else:
                end_us = int(t)
                n += 1
                total += int(b)

        state.update((start_us, end_us, n, total))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)

        if out:
            yield pd.DataFrame(
                {
                    "host": [host] * len(out),
                    "session_start": [pd.Timestamp(o[0], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[1], unit="us") for o in out],
                    "n_events": [o[2] for o in out],
                    "total_bytes": [o[3] for o in out],
                    "closed_reason": [o[4] for o in out],
                }
            )

    return fn


def host_sessions_stream(
    pages_stream: DataFrame, gap_seconds: int = 3600, use_timeout: bool = True
) -> DataFrame:
    """Streaming per-host sessionization. Input: a streaming pages frame;
    host derived JVM-side (no UDF), state keyed by host.

    use_timeout=True (continuous deployments): idle sessions are flushed by
    a wall-clock ProcessingTimeTimeout. use_timeout=False (bounded drains,
    e.g. availableNow): no timeouts — a query holding registered
    processing-time timeouts keeps scheduling empty micro-batches waiting
    for them to fire, so an availableNow drain would never terminate."""
    withhost = pages_stream.select(
        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
        "warc_ts",
        F.length("html").cast("long").alias("n_bytes"),
    ).where(F.col("warc_ts").isNotNull())
    return withhost.groupBy("host").applyInPandasWithState(
        _session_fn(gap_seconds, use_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_sessions_available_now(
    spark, source_path: str, gap_seconds: int = 3600, query_name: str = "sessions"
) -> DataFrame:
    """Drive the stateful operator over the available files (test/smoke
    harness). Note: only gap-closed sessions are emitted — the final open
    session per host stays in state (that is the semantics of append-mode
    stateful processing)."""
    from eventanalysis_spark.streaming.stream_pipeline import read_pages_stream

    stream = read_pages_stream(spark, source_path)
    sessions = host_sessions_stream(stream, gap_seconds, use_timeout=False)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    # bounded wait: availableNow should drain and stop; if it wedges (state
    # timeouts re-arming batches, source churn), fail loudly instead of
    # hanging the caller forever
    if not q.awaitTermination(timeout=300):
        progress = q.lastProgress
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not drain in 300s; "
            f"last progress: {progress}"
        )
    return spark.sql(f"SELECT * FROM {query_name}")
