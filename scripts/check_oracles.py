"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from searcharray_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            # the driver gate hashes values at 6-decimal precision — match it
            df[c] = df[c].astype(float).round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            if len(got) == 0 and name not in ("exact_dedup",):
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"schema: {list(g.columns)} != {list(e.columns)}"))
            print(f"FAIL {name}: schema {list(g.columns)} vs {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append((name, f"rows: {len(g)} != {len(e)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            continue
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            failures.append((name, f"values differ in {neq.sum()} rows"))
            print(f"FAIL {name}: {neq.sum()} differing rows")
            print(pd.concat([g[neq].head(3), e[neq].head(3)], axis=1))
            continue
        print(f"ok   {name}: {len(g)} rows match")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
