"""Export sinks — SURVEY.md §2.1 S7-S9.

S7  CSV sink        (XsvBuffer writer, AppDump.fs:175-222)  → df.write.csv
S8  sample docs     (XML sample files, AppSamples.fs:141-150) → k-spread
                    sample collected + per-record files (low volume by
                    construction — the reference writes individual files)
S9  metadata sink   (nested provider→task→op skeleton JSON,
                    ChannelDto.cs:65-109) → nested struct/collect_list JSON

The dump lifecycle (§3.2) is reproduced Spark-first: instead of
schema-discovery-from-newest-row + per-row re-dissection, the export spec
fixes the columns (plans/extract_spec.py) and ONE vectorized pass
extracts them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventanalysis_spark.operators.query import HeaderQuery, k_spread_sample
from eventanalysis_spark.plans.extract_spec import ExportSpec, compile_spec


def export_csv(df: DataFrame, path: str, single_file: bool = False,
               order_by: list[str] | None = None) -> None:
    """S7: CSV with header. single_file=True coalesces (driver-side-ish,
    only for small exports — the reference's CSV files are per-query
    reports, not bulk data)."""
    out = df
    if order_by:
        out = out.orderBy(*order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def export_spec_csv(
    parsed_with_payload: DataFrame, spec: ExportSpec, path: str
) -> DataFrame:
    """§3.2 dump: class filter → spec-compiled extraction → CSV.
    Returns the extracted frame (rows with _err != null are excluded from
    the CSV and returned for quarantine routing)."""
    extracted = compile_spec(spec, parsed_with_payload)
    good = extracted
    if "_err" in extracted.columns:
        good = extracted.where(F.col("_err").isNull()).drop("_err")
    export_csv(good, path, order_by=["url"])
    return extracted


def export_samples(
    df: DataFrame,
    out_dir: str,
    k: int = 5,
    predicate=None,
    content_col: str = "text_extracted",
) -> list[str]:
    """S8: evenly-spread k samples written as individual files (the
    reference's per-event XML sample files). Collect is bounded by k."""
    os.makedirs(out_dir, exist_ok=True)
    rows = k_spread_sample(df, k, predicate).collect()
    paths = []
    for r in rows:
        safe = "".join(c if c.isalnum() else "_" for c in r["url"])[:120]
        p = os.path.join(out_dir, f"sample-{safe}.txt")
        with open(p, "w") as f:
            f.write(f"url: {r['url']}\nwarc_ts: {r['warc_ts']}\n\n")
            f.write(r[content_col] or "")
        paths.append(p)
    return paths


def export_metadata_json(
    host_info: DataFrame,
    lang_info: DataFrame,
    overview: DataFrame,
    path: str | None = None,
) -> str:
    """S9: nested metadata skeleton — hosts with their observed
    (lang, event_class) children and counts, as one JSON document
    (ChannelDto.FromJob analog). Built with collect_list of structs so the
    nesting happens distributed, not in a driver loop."""
    nested = (
        overview.groupBy("host")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("lang", "event_class", "ever", "n_events")
                )
            ).alias("classes"),
            F.sum("n_events").alias("total_events"),
        )
        .join(F.broadcast(host_info), "host", "left")
        .select("host", "host_id", "registrar", "total_events", "classes")
        .orderBy("host")
    )
    doc = {
        "hosts": [json.loads(r) for r in nested.toJSON().collect()],
        "langs": [
            {"lang": r["lang"], "lang_name": r["lang_name"]}
            for r in lang_info.orderBy("lang").collect()
        ],
    }
    s = json.dumps(doc, indent=2)
    if path:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(s)
        os.replace(tmp, path)
    return s


def export_query_csv(
    df: DataFrame, q: HeaderQuery, path: str, columns: list[str] | None = None
) -> None:
    """§3.2 filtered/ordered/limited header dump to CSV."""
    export_csv(q.apply(df, columns), path)
