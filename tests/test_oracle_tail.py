"""Hard gate for the rotated-out registry tail (ADVICE r4).

The driver's correctness artifact snapshots only the FIRST 50 registry
entries, so rows rotated past the window would otherwise keep only a
by-convention referee (tools/check_oracle.py run by hand). This test
replays EVERY tail entry against its DuckDB oracle at the driver's
scale (sf0.01) on every pytest run — a regression in a rotated row
fails CI, not just the next manual replay.
"""

from yomitoku_spark.oracle_compare import compare_query, duckdb_connect
from yomitoku_spark.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.01"
DRIVER_WINDOW = 50


def test_tail_rows_match_oracle(spark):
    names = list(QUERIES)[DRIVER_WINDOW:]
    assert names, "registry no longer exceeds the driver window"
    con = duckdb_connect(SF_DIR)
    failures = []
    for name in names:
        err = compare_query(spark, con, name, QUERIES[name], ORACLE.get(name), SF_DIR)
        if err:
            failures.append(err)
    assert not failures, failures
