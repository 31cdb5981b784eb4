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
    variants = {"A_pandas_udf_struct": variant_a, "B_mapInPandas": variant_b}
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
