"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            if hasattr(v, "isoformat"):
                v = v.isoformat(sep=" ")
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entry
    from eventanalysis_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        duck_cols = list(ddf.columns)
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append((name, f"cols {spark_cols} vs {duck_cols}"))
            print(f"FAIL {name}: column mismatch {spark_cols} vs {duck_cols}")
            continue
        if len(spark_rows) != len(ddf):
            failures.append((name, f"rows {len(spark_rows)} vs {len(ddf)}"))
            print(f"FAIL {name}: row count {len(spark_rows)} vs {len(ddf)}")
            continue
        cols = sorted(spark_cols)
        s_norm = normalize([r.asDict() for r in spark_rows], cols)
        d_norm = normalize(ddf.to_dict("records"), cols)
        if s_norm != d_norm:
            diff = [
                (a, b) for a, b in zip(s_norm, d_norm) if a != b
            ][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(spark_rows)} rows")

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
