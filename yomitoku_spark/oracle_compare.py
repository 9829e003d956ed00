"""Shared Spark-vs-DuckDB comparison used by tools/check_oracle.py and
tests/test_oracle_tail.py — one canonicalizer, one verdict, so the
pytest tail gate and the manual full replay can never drift apart.

Mirrors the driver's correctness gate: same tables, same
order-insensitive column-sorted comparison, float round to 1e-6.
"""

from __future__ import annotations

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        else:
            try:  # duckdb may hand back decimal.Decimal / object ints
                pdf[c] = pd.to_numeric(pdf[c], downcast=None)
                if pd.api.types.is_integer_dtype(pdf[c]):
                    pdf[c] = pdf[c].astype("int64")
            except (ValueError, TypeError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def compare_query(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> str | None:
    """Run one registry query on Spark and its oracle on DuckDB; return
    None when they match (or rows-only passes), else a failure string."""
    gpdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return None if len(gpdf) > 0 else f"{name}: rows-only returned zero rows"
    wpdf = con.sql(sql).df()
    g, w = normalize(gpdf), normalize(wpdf)
    if list(g.columns) != list(w.columns):
        return f"{name}: columns differ: spark={list(g.columns)} duck={list(w.columns)}"
    if len(g) != len(w):
        return f"{name}: rowcount spark={len(g)} duck={len(w)}"
    try:
        pd.testing.assert_frame_equal(
            g, w, check_dtype=False, check_exact=False, rtol=1e-9
        )
    except AssertionError as e:
        neq = (g.astype(str) != w.astype(str)).any(axis=1)
        head = pd.concat(
            [g[neq].head(3).assign(side="spark"), w[neq].head(3).assign(side="duck")]
        )
        return f"{name}: VALUES differ: {str(e)[:400]}\n{head}"
    return None
