#!/usr/bin/env python
"""A/B the wide-pass UDF transport: pandas_udf(struct) vs mapInPandas.

Same parse work, same input, same write — only the Python<->JVM transport
and row-assembly mechanics differ:
  A. pandas_udf returning a StructType column, expanded JVM-side (current)
  B. mapInPandas emitting the full output rows from Python (passthrough
     columns ride the Arrow batch instead of being zipped JVM-side)

Interleaved reps, min per variant (the sandbox has bursty CPU steal).
Usage: python tools/ab_parse_udf.py [docs] [reps]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
OUT = "/tmp/ea-ab-out"


def variant_a(spark, src):
    from eventanalysis_spark.operators.parse import parse_pages

    return parse_pages(src, features=True)


def variant_b(spark, src):
    from pyspark.sql.types import StructField, StructType, StringType, TimestampType

    from eventanalysis_spark.operators.parse import (
        FEATURED_SCHEMA,
        parse_batch,
        text_feature_batch,
    )

    out_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("lang", StringType()),
        ]
        + FEATURED_SCHEMA.fields
    )

    def gen(batches):
        for pdf in batches:
            base, toks = parse_batch(pdf["url"], pdf["html"], _with_tokens=True)
            feats = text_feature_batch(base["text_extracted"], tokens=toks)
            yield pd.concat(
                [pdf[["url", "warc_ts", "lang"]].reset_index(drop=True), base, feats],
                axis=1,
            )

    from pyspark.sql import functions as F

    valid = src.where(F.col("url").isNotNull() & F.col("warc_ts").isNotNull())
    return valid.select("url", "warc_ts", "lang", "html").mapInPandas(gen, out_schema)


def variant_c(spark, src):
    """mapInArrow: no pandas at all — lists in, pyarrow arrays out."""
    import pyarrow as pa

    from eventanalysis_spark.operators.parse import (
        parse_batch,
        text_feature_batch,
    )

    out_type = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("lang", pa.string()),
            ("host", pa.string()),
            ("tld", pa.string()),
            ("path_depth", pa.int32()),
            ("title", pa.string()),
            ("charset", pa.string()),
            ("meta_lang", pa.string()),
            ("event_class", pa.string()),
            ("ever", pa.int32()),
            ("ever_raw", pa.string()),
            ("text_extracted", pa.string()),
            ("n_tokens", pa.int32()),
            ("n_bytes", pa.int64()),
            ("q_avg_word_len", pa.float64()),
            ("q_punct_ratio", pa.float64()),
            ("q_upper_ratio", pa.float64()),
            ("q_score", pa.float64()),
            ("lang_detected", pa.string()),
            ("doc_fingerprint", pa.int64()),
        ]
    )

    def gen(batches):
        for rb in batches:
            url = pd.Series(rb.column(0).to_pylist())
            html = pd.Series(rb.column(3).to_pylist())
            base, toks = parse_batch(url, html, _with_tokens=True)
            feats = text_feature_batch(base["text_extracted"], tokens=toks)
            arrays = [rb.column(0), rb.column(1), rb.column(2)] + [
                pa.array(base[c].tolist()) for c in base.columns
            ] + [pa.array(feats[c].tolist()) for c in feats.columns]
            yield pa.RecordBatch.from_arrays(
                [a.cast(f.type) if a.type != f.type else a
                 for a, f in zip(arrays, out_type)],
                schema=out_type,
            )

    from pyspark.sql import functions as F

    ddl = (
        "url string, warc_ts timestamp, lang string, host string, tld string, "
        "path_depth int, title string, charset string, meta_lang string, "
        "event_class string, ever int, ever_raw string, text_extracted string, "
        "n_tokens int, n_bytes long, q_avg_word_len double, q_punct_ratio double, "
        "q_upper_ratio double, q_score double, lang_detected string, "
        "doc_fingerprint long"
    )
    valid = src.where(F.col("url").isNotNull() & F.col("warc_ts").isNotNull())
    return valid.select("url", "warc_ts", "lang", "html").mapInArrow(gen, ddl)


def run(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").option("compression", "lz4").parquet(OUT)
    return time.perf_counter() - t0


def main():
    import bench
    from eventanalysis_spark.session import get_spark

    spark = get_spark(
        "ab-parse", master="local[32]", shuffle_partitions=32,
        extra_conf={**bench.SMALL_INPUT_CONF,
                    "spark.ui.showConsoleProgress": "false"},
    )
    pages = bench.ensure_pages(spark, DOCS)
    bench.warmup(spark)
    src = spark.read.parquet(pages)
    variants = {"A_pandas_udf_struct": variant_a, "B_mapInPandas": variant_b,
                "C_mapInArrow": variant_c}
    best: dict[str, float] = {}
    # warm both plans once untimed
    for name, fn in variants.items():
        run(fn(spark, src))
    for i in range(REPS):
        for name, fn in variants.items():
            dt = run(fn(spark, src))
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{i} {name}: {dt:6.2f}s  (best {best[name]:.2f})", flush=True)
    print({k: round(v, 2) for k, v in best.items()})
    shutil.rmtree(OUT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
