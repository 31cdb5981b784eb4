#!/usr/bin/env python
"""Supplementary per-query measurement (round 6 optimization evidence).

NOT the graded bench (bench.py is frozen): this harness isolates each
declared query with the noop sink (guide §1.4) so we time the
computation without the sink, labels jobs (§1.5), and dumps
`.explain("formatted")` for every query to plans/r06/.

Usage:
  python tools/bench_extra.py [--sf DIR] [--reps N] [--plans-dir DIR]
                              [--queries a,b,c] [--explain-only]

Prints one JSON line: {"queries": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="_before",
                    help="plan file suffix (default _before)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench.py's list)")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from eventanalysis_spark.session import get_spark
    import bench
    import __spark_entry__ as entry

    spark = get_spark("bench-extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8),
                      extra_conf=bench.SMALL_INPUT_CONF)
    qs = entry.queries()
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    else:
        # the frozen bench's query list, recovered from its source so this
        # harness always measures what the driver measures
        import inspect
        src = inspect.getsource(bench.timed_queries)
        names = [ln.strip().strip('",') for ln in src.splitlines()
                 if ln.strip().startswith('"')]
        names = [n for n in names if n in qs]

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            try:
                txt = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            with open(os.path.join(
                    args.plans_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(txt)
        print(json.dumps({"plans": len(names), "dir": args.plans_dir}),
              file=sys.stderr)

    out: dict[str, float] = {}
    if not args.explain_only:
        bench.warmup(spark)
        for rep in range(args.reps):
            for name in names:
                spark.sparkContext.setJobDescription(f"bx:{name}")
                # construction INSIDE the timed window (same convention
                # as the frozen bench): several round-6 plans run real
                # jobs at construction (training collects, lazy-pin
                # materialization under AQE), so timing the write alone
                # would under-report exactly those queries
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if name not in out or dt < out[name]:
                    out[name] = dt
                spark.sparkContext.setJobDescription(None)
        out = {k: round(v, 3) for k, v in out.items()}
    print(json.dumps({"queries": out, "sf_dir": args.sf,
                      "total": round(sum(out.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
