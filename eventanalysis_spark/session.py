"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[32], 128 GiB); on a real
cluster the same builder is driven by spark-submit conf instead. UTC
session timezone is pinned so period keys (day / ISO-week / month) and
the DuckDB oracle agree byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "eventanalysis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    Parameters are overridable so bench.py can run the identical job at
    two parallelism levels (the in-sandbox stand-in for N vs 4N
    executors, per BASELINE.md).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Shuffle partitions ~ cores in local mode; on a cluster AQE coalesces.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k-record Arrow batches starve the pandas UDF on small
        # rows (~30% of wide-pass wall time in py4j/Arrow round-trips,
        # measured at 1.6M docs / 32c). 64Ki records ≈ 16 MB for ~250 B
        # synthetic docs; real ~100 KB pages are bounded first by
        # spark.sql.execution.arrow.maxBytesPerBatch (64 MB default), so
        # raising the record cap is safe at both extremes.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # generated-class cache (default 100 entries): a driver running
        # many distinct plans (the 50+ registry queries, or any real
        # multi-tenant job server) evicts and re-compiles codegen units
        # every pass; entries are a few KB of bytecode each, so 10k is
        # still tiny next to the driver heap at ANY cluster size
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # v2 committer: task-side file moves — v1's serial driver-side
        # rename is a real bottleneck for partitioned fan-out writes
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def build_pyfiles_zip(out_dir: str | None = None) -> str:
    """Zip the package for spark-submit --py-files (north-rule packaging).
    Idempotent per content; returns the zip path."""
    import hashlib
    import pathlib
    import tempfile
    import zipfile

    pkg_root = pathlib.Path(__file__).resolve().parent
    files = sorted(p for p in pkg_root.rglob("*.py") if "__pycache__" not in str(p))
    digest = hashlib.sha256()
    for p in files:
        digest.update(str(p.relative_to(pkg_root)).encode())
        digest.update(p.read_bytes())
    out_dir = out_dir or tempfile.gettempdir()
    zpath = pathlib.Path(out_dir) / f"eventanalysis_spark-{digest.hexdigest()[:12]}.zip"
    if not zpath.exists():
        tmp = zpath.with_suffix(".tmp.zip")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for p in files:
                z.write(p, f"eventanalysis_spark/{p.relative_to(pkg_root)}")
        os.replace(tmp, zpath)
    return str(zpath)


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors regardless of driver cwd —
    the local-mode equivalent of `spark-submit --py-files pkg.zip`."""
    try:
        spark.sparkContext.addPyFile(build_pyfiles_zip())
    except Exception:
        pass  # already added with same name, or non-filesystem deploy
