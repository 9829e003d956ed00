"""Deterministic form-layout corpus derived from the ``supplier`` table.

The semantic-parsing operators (KV-graph parser, scalar-field cascade,
table-field extraction, template override) consume *layout tables*:

* ``cells``      — (doc_id, cell_id, role, x1, y1, x2, y2, contents)
  with roles header / cell / empty / group (the reference's node model,
  schemas/table_semantic_parser.py:56-96)
* ``paragraphs`` — (doc_id, par_id, x1..y2, contents)
* ``words``      — (doc_id, word_id, x1..y2, content)

(grid_headers / grid_data are no longer synthesized here — they are
DERIVED from cell geometry by operators/grid_headers.py.)

This module synthesizes those tables deterministically from the
driver's parquet (20 suppliers → one document), with an exactly
equivalent SQL CTE for the DuckDB oracle, so every semantic operator
gets a 3-axis correctness check. Geometry per document:

* group A ``gA`` box [0,0,240,230]: a horizontal KV form — 10 rows of
  header ``h{i}`` (x 2..100) right-adjacent to value ``c{i}``
  (x 110..230), rows 22 px apart (headers form a D-chain);
* group B ``gB`` box [0,290,1290,370]: a vertical form — a row of 10
  headers ``h{10+j}`` (R-chain, 10 px gaps) each bottom-adjacent to
  value ``c{10+j}``, plus a second value row ``c{20+j}`` adjacent only
  to the first value row (→ keyless in KV parsing, row 1 in the grid);
* one ``empty`` cell ``e40`` inside group A that stays keyless: no
  header is adjacent to it (c9 above it IS soft-bottom-adjacent, but
  the KV edge family never links cell→empty, kv_parser.py:163-196).

All coordinates are integers and all adjacency relations are decided
by the squared-integer rule family (operators/adjacency.py), so the
corpus parses identically in Spark, DuckDB, and the scalar twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CELLS_COLS = ["doc_id", "cell_id", "role", "x1", "y1", "x2", "y2", "contents"]


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the supplier scan is tiny but local-mode splitting would hand
    # every downstream union branch 32 sliver partitions (task-schedule
    # overhead dwarfs the work); one partition per ~100k rows is plenty,
    # and grouped/pandas stages re-shuffle to full width anyway
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = max(1, s.rdd.getNumPartitions() // 8)
    s = s.coalesce(n)
    return s.select(
        F.floor(F.col("s_suppkey") / 20).cast("bigint").alias("doc_id"),
        (F.col("s_suppkey") % 20).cast("int").alias("i"),
        "s_name",
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("s_addr"),
        F.concat(
            F.col("s_name"), F.lit(" bal "),
            F.round(F.col("s_acctbal") * 100).cast("bigint").cast("string"),
        ).alias("s_note"),
        "s_suppkey",
    )


def _i(c) -> F.Column:
    return c.cast("int")


def form_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _base(spark, sf_dir)
    h = b.select(
        "doc_id",
        F.concat(F.lit("h"), F.col("i").cast("string")).alias("cell_id"),
        F.lit("header").alias("role"),
        _i(F.when(F.col("i") < 10, 2).otherwise((F.col("i") - 10) * 130)).alias("x1"),
        _i(F.when(F.col("i") < 10, F.col("i") * 22).otherwise(300)).alias("y1"),
        _i(F.when(F.col("i") < 10, 100).otherwise((F.col("i") - 10) * 130 + 120)).alias("x2"),
        _i(F.when(F.col("i") < 10, F.col("i") * 22 + 16).otherwise(316)).alias("y2"),
        F.when(F.col("i") < 10, F.concat(F.lit("hkey"), F.col("i").cast("string")))
        .otherwise(F.concat(F.lit("vkey"), (F.col("i") - 10).cast("string")))
        .alias("contents"),
    )
    v1 = b.select(
        "doc_id",
        F.concat(F.lit("c"), F.col("i").cast("string")).alias("cell_id"),
        F.lit("cell").alias("role"),
        _i(F.when(F.col("i") < 10, 110).otherwise((F.col("i") - 10) * 130)).alias("x1"),
        _i(F.when(F.col("i") < 10, F.col("i") * 22).otherwise(322)).alias("y1"),
        _i(F.when(F.col("i") < 10, 230).otherwise((F.col("i") - 10) * 130 + 120)).alias("x2"),
        _i(F.when(F.col("i") < 10, F.col("i") * 22 + 16).otherwise(338)).alias("y2"),
        F.col("s_name").alias("contents"),
    )
    v2 = b.filter(F.col("i") >= 10).select(
        "doc_id",
        F.concat(F.lit("c"), (F.col("i") + 10).cast("string")).alias("cell_id"),
        F.lit("cell").alias("role"),
        _i((F.col("i") - 10) * 130).alias("x1"),
        F.lit(344).alias("y1"),
        _i((F.col("i") - 10) * 130 + 120).alias("x2"),
        F.lit(360).alias("y2"),
        F.col("s_addr").alias("contents"),
    )
    docs = b.select("doc_id").distinct()
    vdocs = b.filter(F.col("i") >= 10).select("doc_id").distinct()

    def fixed(src, cid, role, x1, y1, x2, y2):
        return src.select(
            "doc_id",
            F.lit(cid).alias("cell_id"),
            F.lit(role).alias("role"),
            F.lit(x1).alias("x1"),
            F.lit(y1).alias("y1"),
            F.lit(x2).alias("x2"),
            F.lit(y2).alias("y2"),
            F.lit("").alias("contents"),
        )

    ga = fixed(docs, "gA", "group", 0, 0, 240, 230)
    gb = fixed(vdocs, "gB", "group", 0, 290, 1290, 370)
    e = fixed(docs, "e40", "empty", 110, 219, 230, 229)
    return h.unionByName(v1).unionByName(v2).unionByName(ga).unionByName(gb).unionByName(e)


def form_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _base(spark, sf_dir)
    return b.select(
        "doc_id",
        F.concat(F.lit("p"), F.col("i").cast("string")).alias("par_id"),
        F.lit(0).alias("x1"),
        _i(600 + F.col("i") * 30).alias("y1"),
        F.lit(400).alias("x2"),
        _i(620 + F.col("i") * 30).alias("y2"),
        F.concat(F.lit("note: "), F.col("s_note")).alias("contents"),
    )


def form_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _base(spark, sf_dir)
    return b.select(
        "doc_id",
        F.concat(F.lit("w"), F.col("i").cast("string")).alias("word_id"),
        F.lit(500).alias("x1"),
        _i(600 + F.col("i") * 30).alias("y1"),
        F.lit(560).alias("x2"),
        _i(616 + F.col("i") * 30).alias("y2"),
        F.concat(F.lit("ZQW"), F.col("s_suppkey").cast("string"), F.lit("X")).alias(
            "content"
        ),
    )


def form_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-header table corpus for geometric header derivation
    (grid_parser.py:635-671, 733-784): per document, grid ``t0`` =

    * row 0 (header): ``T0`` "grp" spanning cols 0-1, ``T1`` "pair"
      spanning cols 2-3;
    * row 1 (header): ``Ha`` "alpha" (col 0), ``Hb`` "beta" (col 1) —
      cols 2-3 absent, so col_headers stack [T0,Ha]/[T0,Hb]/[T1]/[T1]
      and cols 2,3 share trailing header T1 → merged;
    * rows 2-3 (data): supplier-derived contents, plus a STRAY
      header-role cell ``S`` in row 3 col 0 → demoted to cell.

    Geometry: unit rows y = r*22 .. r*22+16; unit cols x = c*70 ..
    c*70+60; spanning headers cover two unit columns exactly."""
    b = _base(spark, sf_dir)
    r2 = b.filter(F.col("i") == 0)
    r3 = b.filter(F.col("i") == 1)
    docs = b.select("doc_id").distinct()

    def fixed(src, cid, role, x1, y1, x2, y2, contents):
        return src.select(
            "doc_id",
            F.lit("t0").alias("grid_id"),
            F.lit(cid).alias("cell_id"),
            F.lit(role).alias("role"),
            F.lit(x1).alias("x1"),
            F.lit(y1).alias("y1"),
            F.lit(x2).alias("x2"),
            F.lit(y2).alias("y2"),
            (F.lit(contents) if isinstance(contents, str) else contents).alias(
                "contents"
            ),
        )

    parts = [
        fixed(docs, "T0", "header", 0, 0, 130, 16, "grp"),
        fixed(docs, "T1", "header", 140, 0, 270, 16, "pair"),
        fixed(docs, "Ha", "header", 0, 22, 60, 38, "alpha"),
        fixed(docs, "Hb", "header", 70, 22, 130, 38, "beta"),
        fixed(r2, "D20", "cell", 0, 44, 60, 60, F.col("s_name")),
        fixed(r2, "D21", "cell", 70, 44, 130, 60, F.col("s_addr")),
        fixed(r2, "D22", "cell", 140, 44, 200, 60, F.concat(F.lit("x"), F.col("s_suppkey").cast("string"))),
        fixed(r2, "D23", "cell", 210, 44, 270, 60, F.concat(F.lit("y"), F.col("s_suppkey").cast("string"))),
        fixed(r3, "S", "header", 0, 66, 60, 82, "stray"),
        fixed(r3, "D31", "cell", 70, 66, 130, 82, F.col("s_name")),
        fixed(r3, "D32", "cell", 140, 66, 200, 82, F.concat(F.lit("x"), F.col("s_suppkey").cast("string"))),
        fixed(r3, "D33", "cell", 210, 66, 270, 82, F.concat(F.lit("y"), F.col("s_suppkey").cast("string"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------------------ SQL
# DuckDB twins of the builders above (shared CTE text, composed into
# the oracle SQL of every semantic registry query).

SQL_FORM_BASE = """
fc_base AS (
  SELECT CAST(FLOOR(s_suppkey/20) AS BIGINT) AS doc_id,
         CAST(s_suppkey % 20 AS INT) AS i,
         s_name,
         'N' || CAST(s_nationkey AS VARCHAR) AS s_addr,
         s_name || ' bal ' || CAST(CAST(ROUND(s_acctbal*100) AS BIGINT) AS VARCHAR) AS s_note,
         s_suppkey
  FROM supplier
)"""

SQL_FORM_CELLS = """
fc_cells AS (
  SELECT doc_id, 'h' || CAST(i AS VARCHAR) AS cell_id, 'header' AS role,
         CAST(CASE WHEN i < 10 THEN 2 ELSE (i-10)*130 END AS INT) AS x1,
         CAST(CASE WHEN i < 10 THEN i*22 ELSE 300 END AS INT) AS y1,
         CAST(CASE WHEN i < 10 THEN 100 ELSE (i-10)*130+120 END AS INT) AS x2,
         CAST(CASE WHEN i < 10 THEN i*22+16 ELSE 316 END AS INT) AS y2,
         CASE WHEN i < 10 THEN 'hkey' || CAST(i AS VARCHAR)
              ELSE 'vkey' || CAST(i-10 AS VARCHAR) END AS contents
  FROM fc_base
  UNION ALL
  SELECT doc_id, 'c' || CAST(i AS VARCHAR), 'cell',
         CAST(CASE WHEN i < 10 THEN 110 ELSE (i-10)*130 END AS INT),
         CAST(CASE WHEN i < 10 THEN i*22 ELSE 322 END AS INT),
         CAST(CASE WHEN i < 10 THEN 230 ELSE (i-10)*130+120 END AS INT),
         CAST(CASE WHEN i < 10 THEN i*22+16 ELSE 338 END AS INT),
         s_name
  FROM fc_base
  UNION ALL
  SELECT doc_id, 'c' || CAST(i+10 AS VARCHAR), 'cell',
         CAST((i-10)*130 AS INT), 344, CAST((i-10)*130+120 AS INT), 360, s_addr
  FROM fc_base WHERE i >= 10
  UNION ALL
  SELECT DISTINCT doc_id, 'gA', 'group', 0, 0, 240, 230, '' FROM fc_base
  UNION ALL
  SELECT DISTINCT doc_id, 'gB', 'group', 0, 290, 1290, 370, ''
  FROM fc_base WHERE i >= 10
  UNION ALL
  SELECT DISTINCT doc_id, 'e40', 'empty', 110, 219, 230, 229, '' FROM fc_base
)"""

SQL_FORM_PARAGRAPHS = """
fc_paragraphs AS (
  SELECT doc_id, 'p' || CAST(i AS VARCHAR) AS par_id,
         0 AS x1, CAST(600 + i*30 AS INT) AS y1,
         400 AS x2, CAST(620 + i*30 AS INT) AS y2,
         'note: ' || s_note AS contents
  FROM fc_base
)"""

SQL_FORM_WORDS = """
fc_words AS (
  SELECT doc_id, 'w' || CAST(i AS VARCHAR) AS word_id,
         500 AS x1, CAST(600 + i*30 AS INT) AS y1,
         560 AS x2, CAST(616 + i*30 AS INT) AS y2,
         'ZQW' || CAST(s_suppkey AS VARCHAR) || 'X' AS content
  FROM fc_base
)"""

SQL_TABLE_CORPUS = """
ft_cells AS (
  SELECT DISTINCT doc_id, 't0' AS grid_id, 'T0' AS cell_id, 'header' AS role,
         0 AS x1, 0 AS y1, 130 AS x2, 16 AS y2, 'grp' AS contents FROM fc_base
  UNION ALL
  SELECT DISTINCT doc_id, 't0', 'T1', 'header', 140, 0, 270, 16, 'pair' FROM fc_base
  UNION ALL
  SELECT DISTINCT doc_id, 't0', 'Ha', 'header', 0, 22, 60, 38, 'alpha' FROM fc_base
  UNION ALL
  SELECT DISTINCT doc_id, 't0', 'Hb', 'header', 70, 22, 130, 38, 'beta' FROM fc_base
  UNION ALL
  SELECT doc_id, 't0', 'D20', 'cell', 0, 44, 60, 60, s_name FROM fc_base WHERE i = 0
  UNION ALL
  SELECT doc_id, 't0', 'D21', 'cell', 70, 44, 130, 60, s_addr FROM fc_base WHERE i = 0
  UNION ALL
  SELECT doc_id, 't0', 'D22', 'cell', 140, 44, 200, 60,
         'x' || CAST(s_suppkey AS VARCHAR) FROM fc_base WHERE i = 0
  UNION ALL
  SELECT doc_id, 't0', 'D23', 'cell', 210, 44, 270, 60,
         'y' || CAST(s_suppkey AS VARCHAR) FROM fc_base WHERE i = 0
  UNION ALL
  SELECT doc_id, 't0', 'S', 'header', 0, 66, 60, 82, 'stray' FROM fc_base WHERE i = 1
  UNION ALL
  SELECT doc_id, 't0', 'D31', 'cell', 70, 66, 130, 82, s_name FROM fc_base WHERE i = 1
  UNION ALL
  SELECT doc_id, 't0', 'D32', 'cell', 140, 66, 200, 82,
         'x' || CAST(s_suppkey AS VARCHAR) FROM fc_base WHERE i = 1
  UNION ALL
  SELECT doc_id, 't0', 'D33', 'cell', 210, 66, 270, 82,
         'y' || CAST(s_suppkey AS VARCHAR) FROM fc_base WHERE i = 1
)"""

