"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from yomitoku_spark.oracle_compare import duckdb_connect, normalize


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
            got = fn(spark, sf_dir)
            gpdf = got.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"· {name}: rows-only ({len(gpdf)} rows)")
            if len(gpdf) == 0:
                failures.append(name)
                print(f"  ✗ zero rows!")
            continue
        try:
            wpdf = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        g, w = normalize(gpdf), normalize(wpdf)
        ok = True
        if list(g.columns) != list(w.columns):
            print(f"✗ {name}: columns differ: spark={list(g.columns)} duck={list(w.columns)}")
            ok = False
        elif len(g) != len(w):
            print(f"✗ {name}: rowcount spark={len(g)} duck={len(w)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-9)
            except AssertionError as e:
                print(f"✗ {name}: VALUES differ: {str(e)[:400]}")
                # show first few diffs
                neq = (g.astype(str) != w.astype(str)).any(axis=1)
                print(pd.concat([g[neq].head(3).assign(side='spark'),
                                 w[neq].head(3).assign(side='duck')]))
                ok = False
        if ok:
            print(f"✓ {name}: {len(g)} rows match")
        else:
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
