#!/usr/bin/env python
"""Quick per-query timer using the FROZEN bench's .count() methodology
(same session confs, round-robin reps, min per query) for a subset of
queries — used between optimization edits; the graded numbers stay
bench.py's.

Usage: python tools/time_queries.py q1,q2,... [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    import __spark_entry__ as entry
    from eventanalysis_spark.session import get_spark

    spark = get_spark("time-queries", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf=bench.SMALL_INPUT_CONF)
    bench.warmup(spark)
    qs = entry.queries()
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    print(json.dumps({k: round(v, 3) for k, v in best.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
