"""Deterministic transcript corpus derived from the ``documents`` table.

The flagship extraction queries need a HARD external referee (driver
DuckDB check), but the full synthetic mix (:mod:`yomitoku_spark.datagen`)
is generated with Python's Mersenne Twister — not reproducible in SQL.
This module builds a transcripts-shaped input (the BASELINE.json
``input_hint`` schema) from the driver's ``documents`` parquet with pure
column expressions, covering every SQL-expressible payload class the
segmenter handles:

======= ==========================================================
variant payload (v = doc_id % 8)
======= ==========================================================
0       markdown heading + paragraph carrying a digit token
        (regex-tier bait for the field extractor)
1       paragraph + a too-short paragraph (noise-dropped)
2       markdown list + paragraph
3       fenced code block + paragraph
4       key-value block (Invoice No / Due Date / Status)
5       HTML: boiler <nav> (dropped) + <p> + <h2>
6       empty turn (no blocks, empty row via the spine join)
7       heading whose keep depends on MIN_HEADING_CHARS + paragraph
        + list
======= ==========================================================

The payload text pieces are sanitized to single-line ``[A-Za-z ]`` (NFKC
identity, no accidental list/kv/table/heading/html matches), so the
expected segmentation, keep decisions, ordering (block order — no layout
payloads), span offsets, and per-turn concatenation are all expressible
as DuckDB string/length arithmetic over the SAME parquet column. The
Spark side runs the REAL generic pipeline (fused and staged); the oracle
computes the expected output from the construction rules — the same
engine-vs-constructed-referee seam the form-layout corpus uses
(sources/layout.py).

The datagen full mix stays registered as ``extract_transcripts_mix``
(rows-only; byte-checked against the pure-Python oracle in pytest and
the 791k-turn scaling checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FALLBACK_BODY = "corpus fallback paragraph text"
N_CONVS = 25


def _pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = F.trim(
        F.regexp_replace(F.regexp_replace("text", "[^A-Za-z ]", ""), " +", " ")
    )
    body = F.when(F.length(clean) >= 12, clean).otherwise(F.lit(FALLBACK_BODY))
    b = d.select(
        F.col("doc_id").cast("bigint").alias("did"),
        (F.col("doc_id") % 8).cast("int").alias("v"),
        F.concat(F.lit("c"), (F.col("doc_id") % N_CONVS).cast("string")).alias(
            "conv_id"
        ),
        F.floor(F.col("doc_id") / N_CONVS).cast("int").alias("turn_idx"),
        body.alias("b"),
    )
    return b.withColumn("w", F.regexp_extract("b", "^[A-Za-z]+", 0)).withColumn(
        "d", (F.col("did") * 7 + 1013).cast("string")
    )


def corpus_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) — one turn
    per documents row, payload variant by doc_id % 8. Tool-role turns
    carry the payload in ``tool`` (text empty) to exercise the payload
    coalesce."""
    p = _pieces(spark, sf_dir)
    nl, nl2 = F.lit("\n"), F.lit("\n\n")
    w, b, dg = F.col("w"), F.col("b"), F.col("d")
    payload = (
        F.when(F.col("v") == 0, F.concat(F.lit("## "), w, F.lit(" report"), nl2, b, F.lit(" ref "), dg))
        .when(F.col("v") == 1, F.concat(b, nl2, F.lit("ok")))
        .when(F.col("v") == 2, F.concat(F.lit("- one "), w, nl, F.lit("- two "), w, nl2, b))
        .when(F.col("v") == 3, F.concat(F.lit("```py"), nl, F.lit("v = "), w, nl, F.lit("```"), nl2, b))
        .when(
            F.col("v") == 4,
            F.concat(F.lit("Invoice No: "), dg, nl, F.lit("Due Date: 2024-03-15"), nl, F.lit("Status: "), w),
        )
        .when(
            F.col("v") == 5,
            F.concat(
                F.lit('<nav class="menu"><a href="/x">'), w, F.lit("</a></nav><p>"),
                b, F.lit("</p><h2>"), w, F.lit(" news</h2>"),
            ),
        )
        .when(F.col("v") == 6, F.lit(""))
        .otherwise(F.concat(F.lit("# "), w, nl2, b, nl2, F.lit("- alpha one"), nl, F.lit("- beta two")))
    )
    role = (
        F.when(F.col("did") % 3 == 0, F.lit("user"))
        .when(F.col("did") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    is_tool = role == "tool"
    return p.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        F.when(is_tool, F.lit("")).otherwise(payload).alias("text"),
        F.when(is_tool, payload).otherwise(F.lit("")).alias("tool"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("did")).alias("ts"),
    )


# ------------------------------------------------------------------ SQL
# DuckDB twin of the piece builder; the per-variant EXPECTED outputs are
# composed from these pieces in yomitoku_spark/queries.py.

SQL_CORPUS_PIECES = """
tc_pieces AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 8 AS INT) AS v,
         'c' || CAST(doc_id % 25 AS VARCHAR) AS conv_id,
         CAST(doc_id // 25 AS INT) AS turn_idx,
         CASE WHEN length(trim(regexp_replace(regexp_replace(text, '[^A-Za-z ]', '', 'g'), ' +', ' ', 'g'))) >= 12
              THEN trim(regexp_replace(regexp_replace(text, '[^A-Za-z ]', '', 'g'), ' +', ' ', 'g'))
              ELSE 'corpus fallback paragraph text' END AS b,
         CAST(doc_id * 7 + 1013 AS VARCHAR) AS d
  FROM documents
),
tc_base AS (
  SELECT *, regexp_extract(b, '^[A-Za-z]+') AS w,
         length(b) AS lb, length(regexp_extract(b, '^[A-Za-z]+')) AS lw,
         length(d) AS ld
  FROM tc_pieces
)"""
