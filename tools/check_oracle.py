"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

The verdict logic lives in yomitoku_spark/oracle_compare.py (shared
with the pytest tail gate, tests/test_oracle_tail.py — one
canonicalizer, one verdict, so the two can never drift apart); this
script only adds the CLI loop and per-query progress output.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yomitoku_spark.oracle_compare import compare_query, duckdb_connect


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from yomitoku_spark.queries import ORACLE, QUERIES
    from yomitoku_spark.session import get_spark

    spark = get_spark(app="check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb_connect(sf_dir)

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLE.get(name)
        try:
            err = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as e:
            err = f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}"
        if err:
            failures.append(name)
            print(f"✗ {err}")
        elif sql is None:
            print(f"· {name}: rows-only OK")
        else:
            print(f"✓ {name}: match")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
