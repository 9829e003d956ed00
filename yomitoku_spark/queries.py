"""Driver-contract query registry.

Each entry maps a SURVEY.md §2 operator (or a training-data-pipeline
op) to (a) a Spark DataFrame implementation and (b) an equivalent ANSI
SQL string the DuckDB oracle can run on the same parquet tables. Column
names and types are aligned on both sides (the driver hashes values
after sorting columns by name).

Numeric discipline: every aggregate that could differ by float
summation order is computed on scaled integers (cents/permille/
quantized vectors) so the value-hash is bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yomitoku_spark.functions import sketch as SK
from yomitoku_spark.functions import textstats as TS
from yomitoku_spark.operators import bpe as BPE
from yomitoku_spark.operators import curation as CUR
from yomitoku_spark.operators import dedup as DD
from yomitoku_spark.operators import retrieval as RET
from yomitoku_spark.operators import similarity as SIM
from yomitoku_spark.operators import spatial as SP
from yomitoku_spark.session import fan_out


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _par(df: DataFrame) -> DataFrame:
    """Fan a small scan out to the session's parallelism before
    expensive per-row work — see :func:`yomitoku_spark.session.fan_out`
    (guide §2.5 input skew; skips itself when the scan already has
    ample input files, so it is a no-op at real scale)."""
    return fan_out(df)


def _cents(c) -> F.Column:
    return F.round(F.col(c) * 100).cast("bigint")


# ===================================================================
# relational core (SURVEY.md §2.2–§2.6)
# ===================================================================


def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style aggregation sweep (§2.4 aggregations)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount") * 1)
            ).alias("sum_disc_c4"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def filter_threshold(spark, sf_dir):
    """Score-threshold filter (§2.2; reference rtdetr_postprocessor.py:110-113)."""
    e = t(spark, sf_dir, "events")
    return e.filter((F.col("value") > 50) & (F.col("event_type") == "click")).select(
        "event_id", "user_id", "event_type"
    )


SQL_FILTER = """
SELECT event_id, user_id, event_type FROM events
WHERE value > 50 AND event_type = 'click'
"""


def argmax_join(spark, sf_dir):
    """Argmax join: each order's best lineitem (§2.3; reference
    word→best-cell, table_semantic_parser.py:471-499)."""
    l = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        l.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("best_line"),
            _cents("l_extendedprice").alias("best_cents"),
        )
    )


SQL_ARGMAX = """
SELECT l_orderkey, l_linenumber AS best_line,
       CAST(ROUND(l_extendedprice*100) AS BIGINT) AS best_cents
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber ASC) rk
  FROM lineitem
) WHERE rk = 1
"""


def anti_join_orphans(spark, sf_dir):
    """LEFT ANTI join (§2.3/§2.6; reference uncovered-word recovery,
    document_analyzer.py:528-540)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def semi_join_hot_parts(spark, sf_dir):
    """LEFT SEMI join (§2.3; reference containment semi-joins)."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


SQL_SEMI = """
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
"""


def content_concat(spark, sf_dir):
    """Ordered per-group concatenation (§2.4; reference
    document_analyzer.py:233-235 contents join — the same
    array_sort(collect_list(struct)) → array_join pattern the
    extraction emit stage uses)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_linenumber").alias("n"),
                            F.col("l_partkey").alias("p"),
                        )
                    )
                ),
                lambda x: x["p"].cast("string"),
            ),
            ",",
        ).alias("parts_in_order")
    )


SQL_CONCAT = """
SELECT l_orderkey,
       string_agg(l_partkey::VARCHAR, ',' ORDER BY l_linenumber, l_partkey) AS parts_in_order
FROM lineitem GROUP BY l_orderkey
"""


def dup_key_indexer(spark, sf_dir):
    """Duplicate-key indexer (§2.4; reference make_unique_all,
    schemas/table_semantic_parser.py:26-40): suffix a running index
    onto repeated keys only."""
    o = t(spark, sf_dir, "orders")
    wn = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wc = W.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        F.when(
            F.count(F.lit(1)).over(wc) > 1,
            F.concat_ws("_", F.col("o_custkey").cast("string"),
                        F.row_number().over(wn).cast("string")),
        )
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("uniq_key"),
    )


SQL_DUPKEY = """
SELECT o_orderkey,
  CASE WHEN COUNT(*) OVER (PARTITION BY o_custkey) > 1
       THEN o_custkey::VARCHAR || '_' ||
            (ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey))::VARCHAR
       ELSE o_custkey::VARCHAR END AS uniq_key
FROM orders
"""


def direction_vote(spark, sf_dir):
    """Argmax aggregation (§2.4; reference page-direction vote,
    document_analyzer.py:23-40: sum weight per key, keep the winner)."""
    e = t(spark, sf_dir, "events")
    v = e.groupBy("user_id", "event_type").agg(
        F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("weight")
    )
    w = W.partitionBy("user_id").orderBy(F.desc("weight"), F.asc("event_type"))
    return (
        v.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("dominant_type"), "weight")
    )


SQL_VOTE = """
SELECT user_id, event_type AS dominant_type, weight FROM (
  SELECT user_id, event_type,
         CAST(SUM(CAST(ROUND(value*1000) AS BIGINT)) AS BIGINT) AS weight,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY SUM(CAST(ROUND(value*1000) AS BIGINT)) DESC, event_type ASC) rk
  FROM events GROUP BY user_id, event_type
) WHERE rk = 1
"""


def grid_cells(spark, sf_dir):
    """Row-line × col-line grid construction (§2.3; reference
    extract_cells, table_structure_recognizer.py:27-46)."""
    rows = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("row_id"))
    cols = t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("col_id"))
    return rows.crossJoin(cols).select(
        "row_id", "col_id", (F.col("row_id") * 10 + F.col("col_id")).alias("cell_id")
    )


SQL_GRID = """
SELECT n_nationkey AS row_id, r_regionkey AS col_id,
       n_nationkey*10 + r_regionkey AS cell_id
FROM nation, region
"""


def span_extents(spark, sf_dir):
    """Span-extent aggregation (§2.4; reference cell-span extents,
    grid_parser.py:526-559: per id min/max row/col)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_orderkey").agg(
        F.min("l_linenumber").alias("line_min"),
        F.max("l_linenumber").alias("line_max"),
        F.min("l_partkey").alias("part_min"),
        F.max("l_partkey").alias("part_max"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_EXTENTS = """
SELECT l_orderkey, MIN(l_linenumber) AS line_min, MAX(l_linenumber) AS line_max,
       MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


# ---- synthetic box geometry (deterministic integer boxes derived from
# keys, so the same geometry exists on both engines) ----------------

SQL_PART_BOX = """
  SELECT p_partkey,
         p_partkey % 100 AS x1,
         CAST(FLOOR(p_partkey/100) AS BIGINT) % 100 AS y1,
         p_partkey % 100 + p_size % 20 + 5 AS x2,
         CAST(FLOOR(p_partkey/100) AS BIGINT) % 100 + p_size % 15 + 5 AS y2
  FROM part
"""


def _part_boxes(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.struct(
            (F.col("p_partkey") % 100).alias("x1"),
            (F.floor(F.col("p_partkey") / 100).cast("bigint") % 100).alias("y1"),
            (F.col("p_partkey") % 100 + F.col("p_size") % 20 + 5).alias("x2"),
            (
                F.floor(F.col("p_partkey") / 100).cast("bigint") % 100
                + F.col("p_size") % 15
                + 5
            ).alias("y2"),
        ).alias("box"),
    )


def containment_join(spark, sf_dir):
    """Geometric containment join (§2.2/§2.3; reference is_contained,
    utils/misc.py:53-72 + word∈element join, document_analyzer.py:191-237).
    Integer predicate 5·overlap ≥ 4·area ⇔ threshold 0.8, bit-exact."""
    parts = _part_boxes(spark, sf_dir)
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.struct(
            ((F.col("s_suppkey") * 7) % 80).alias("x1"),
            ((F.col("s_suppkey") * 13) % 80).alias("y1"),
            ((F.col("s_suppkey") * 7) % 80 + 30).alias("x2"),
            ((F.col("s_suppkey") * 13) % 80 + 30).alias("y2"),
        ).alias("box"),
    )
    a = s.alias("a")
    b = parts.alias("b")
    pred = (SP.overlap_area("a.box", "b.box") * 5) >= (SP.box_area("b.box") * 4)
    return a.join(b, pred).select("s_suppkey", "p_partkey")


SQL_CONTAIN = f"""
WITH pb AS ({SQL_PART_BOX}),
sb AS (
  SELECT s_suppkey,
         (s_suppkey*7) % 80 AS x1, (s_suppkey*13) % 80 AS y1,
         (s_suppkey*7) % 80 + 30 AS x2, (s_suppkey*13) % 80 + 30 AS y2
  FROM supplier
)
SELECT s_suppkey, p_partkey
FROM sb a JOIN pb b
ON GREATEST(LEAST(a.x2,b.x2) - GREATEST(a.x1,b.x1), 0)
   * GREATEST(LEAST(a.y2,b.y2) - GREATEST(a.y1,b.y1), 0) * 5
   >= (b.x2-b.x1)*(b.y2-b.y1) * 4
"""


def dedup_contained_boxes(spark, sf_dir):
    """Contained-rectangle dedup, keep-larger (§2.2; reference
    layout_parser.py:28-58): self containment join → anti-join losers."""
    # NOTE: unblocked theta join on purpose — this synthetic geometry is
    # pathologically dense (20k boxes in a 130×130 space at sf0.1), so
    # grid blocking only adds a pair-materialization shuffle. For sparse
    # real-world page geometry use blocked_cell (see spatial.py).
    boxes = _part_boxes(spark, sf_dir)
    return SP.dedup_contained(boxes, "p_partkey", keep="larger", threshold=0.8).select(
        "p_partkey"
    )


SQL_DEDUP_BOXES = f"""
WITH pb AS ({SQL_PART_BOX})
SELECT a.p_partkey FROM pb a
WHERE NOT EXISTS (
  SELECT 1 FROM pb b
  WHERE b.p_partkey != a.p_partkey
    AND GREATEST(LEAST(a.x2,b.x2) - GREATEST(a.x1,b.x1), 0)
        * GREATEST(LEAST(a.y2,b.y2) - GREATEST(a.y1,b.y1), 0) * 5
        >= (a.x2-a.x1)*(a.y2-a.y1) * 4              -- b contains a
    AND ( NOT ( GREATEST(LEAST(a.x2,b.x2) - GREATEST(a.x1,b.x1), 0)
                * GREATEST(LEAST(a.y2,b.y2) - GREATEST(a.y1,b.y1), 0) * 5
                >= (b.x2-b.x1)*(b.y2-b.y1) * 4 )     -- not mutual
          OR (a.x2-a.x1)*(a.y2-a.y1) < (b.x2-b.x1)*(b.y2-b.y1)
          OR ( (a.x2-a.x1)*(a.y2-a.y1) = (b.x2-b.x1)*(b.y2-b.y1)
               AND a.p_partkey > b.p_partkey ) )
)
"""


def sessionize(spark, sf_dir):
    """Sessionization via lag + running sum (§2.5 windows; the
    streaming-adjacent pattern from the PySpark guide)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff is timezone-free on TIMESTAMP_NTZ (unix_timestamp
    # would interpret NTZ in the session TZ — fragile under a driver
    # session with a non-UTC timezone)
    # both endpoints truncated to whole seconds BEFORE the diff so the
    # >3600 boundary agrees with the oracle on sub-second timestamps
    # (Spark's timestampdiff truncates the interval; DuckDB's epoch cast
    # rounds each endpoint — identical only on whole-second inputs)
    stepped = e.withColumn("__prev_ts", F.lag("ts").over(w))
    gap = F.expr(
        "timestampdiff(SECOND, date_trunc('second', __prev_ts), date_trunc('second', ts))"
    )
    news = F.when(F.col("__prev_ts").isNull() | (gap > 3600), 1).otherwise(0)
    return stepped.select(
        "event_id",
        "user_id",
        F.sum(news).over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_no"),
    )


SQL_SESSION = """
SELECT event_id, user_id,
  CAST(SUM(CASE WHEN prev_ts IS NULL
                  OR CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                     - CAST(epoch(date_trunc('second', prev_ts)) AS BIGINT) > 3600
                THEN 1 ELSE 0 END)
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
FROM (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
"""


def topk_per_group(spark, sf_dir):
    """Top-K per group window (§2.5; reference top-300 query cap,
    rtdetr_postprocessor.py:71-79)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


SQL_TOPK = """
SELECT o_custkey, o_orderkey, CAST(rank AS INT) AS rank FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


# ===================================================================
# text / training-data ops (documents table)
# ===================================================================

_TOKS = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), w -> w != '')"


def doc_exact_dedup(spark, sf_dir):
    """Exact dedup groups by normalized-text digest."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(DD.normalized_text(F.col("text"))).alias("digest"), F.col("doc_id")
        )
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
       MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""


def doc_token_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TS.token_count(F.col("text")).alias("n_tokens"),
        TS.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
  CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(regexp_split_to_array(text, '[^\\p{{L}}\\p{{N}}]+'), w -> w != ''))
       + length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS BIGINT) AS n_bpe_ish,
  CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
"""


def doc_quality(spark, sf_dir):
    """Quality permille scores (integer-exact)."""
    d = t(spark, sf_dir, "documents")
    stop = TS.stopword_count(F.col("text"), "en")
    punct = F.length(F.regexp_replace("text", r"[\w\s]", ""))
    return d.select(
        "doc_id",
        F.floor(F.lit(1000) * stop / F.greatest(TS.token_count(F.col("text")), F.lit(1)))
        .cast("bigint")
        .alias("stop_permille"),
        F.floor(F.lit(1000) * punct / F.greatest(F.length("text"), F.lit(1)))
        .cast("bigint")
        .alias("punct_permille"),
    )


SQL_QUALITY = f"""
SELECT doc_id,
  CAST(FLOOR(1000.0 * len(list_filter({_TOKS},
        w -> w IN ('the','and','of','to','a','in','is','it','that','for')))
       / GREATEST(len({_TOKS}), 1)) AS BIGINT) AS stop_permille,
  CAST(FLOOR(1000.0 * length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g'))
       / GREATEST(length(text), 1)) AS BIGINT) AS punct_permille
FROM documents
"""


def doc_lang_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.lang_id(F.col("text")).alias("lang_detected"))


def _sql_votes(lang):
    words = ",".join(f"'{w}'" for w in TS.STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, w -> w IN ({words})))"


SQL_LANG_ID = f"""
SELECT doc_id,
  CASE
    WHEN length(regexp_replace(text, '[^\\x{{3040}}-\\x{{30ff}}\\x{{3400}}-\\x{{9fff}}]', '', 'g')) * 4
         >= length(text) THEN 'cjk'
    WHEN GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) = 0
         THEN 'und'
    WHEN {_sql_votes('en')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'en'
    WHEN {_sql_votes('es')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'es'
    WHEN {_sql_votes('de')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'de'
    ELSE 'fr'
  END AS lang_detected
FROM documents
"""


def doc_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.fingerprint(F.col("text")).alias("fp"))


SQL_FINGERPRINT = f"""
SELECT doc_id, md5(array_to_string(({_TOKS})[1:8], ' ')) AS fp
FROM documents
"""


def doc_repetition_quality(spark, sf_dir):
    """Gopher/MassiveText repetition filters (Rae et al. 2021 A1.1):
    permille of tokens covered by the most-frequent word 2-/3-gram and
    by within-doc duplicated 5-grams. Extends the reference's
    per-element noise filters (document_analyzer.py:69-113) to the
    corpus-quality grain a 100 TB pipeline gates on."""
    return CUR.repetition_quality(t(spark, sf_dir, "documents"))


SQL_REPETITION = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS n_tokens FROM documents),
g2 AS (SELECT doc_id, n_tokens, array_to_string(t[i:i+1], ' ') AS gram
       FROM base, unnest(range(1, greatest(len(t)-1, 0)+1)) AS u(i)),
c2 AS (SELECT doc_id, n_tokens, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2, 3),
t2 AS (SELECT doc_id,
              LEAST(1000, CAST(FLOOR(2000.0*cnt/n_tokens) AS BIGINT)) AS top2_permille
       FROM c2
       QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) = 1),
g3 AS (SELECT doc_id, n_tokens, array_to_string(t[i:i+2], ' ') AS gram
       FROM base, unnest(range(1, greatest(len(t)-2, 0)+1)) AS u(i)),
c3 AS (SELECT doc_id, n_tokens, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2, 3),
t3 AS (SELECT doc_id,
              LEAST(1000, CAST(FLOOR(3000.0*cnt/n_tokens) AS BIGINT)) AS top3_permille
       FROM c3
       QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) = 1),
g5 AS (SELECT doc_id, n_tokens, i, array_to_string(t[i:i+4], ' ') AS gram
       FROM base, unnest(range(1, greatest(len(t)-4, 0)+1)) AS u(i)),
d5 AS (SELECT doc_id, n_tokens, i FROM
         (SELECT doc_id, n_tokens, i,
                 COUNT(*) OVER (PARTITION BY doc_id, gram) AS cnt FROM g5)
       WHERE cnt >= 2),
cov AS (SELECT doc_id,
               CAST(FLOOR(1000.0*COUNT(DISTINCT pos)/n_tokens) AS BIGINT)
                 AS dup5_cover_permille
        FROM (SELECT doc_id, n_tokens, i + o AS pos
              FROM d5, unnest(range(0, 5)) AS w(o))
        GROUP BY doc_id, n_tokens)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(t2.top2_permille, 0) AS top2_permille,
       COALESCE(t3.top3_permille, 0) AS top3_permille,
       COALESCE(cov.dup5_cover_permille, 0) AS dup5_cover_permille
FROM base b
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN cov USING (doc_id)
"""


def exact_substring_spans(spark, sf_dir):
    """Cross-document duplicated substring spans at word-8-gram
    granularity (Lee et al. 2022 exact-substring dedup re-expressed as
    one gram-hash aggregation + semi join + per-doc island merge —
    no suffix array, every stage distributed)."""
    return CUR.exact_substring_spans(t(spark, sf_dir, "documents"), k=8)


SQL_SUBSTRING_SPANS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
occ AS (SELECT doc_id, i AS pos,
               ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS gh
        FROM toks, unnest(range(1, greatest(len(t)-7, 0)+1)) AS u(i)),
dup AS (SELECT gh FROM occ GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (gh)),
flag AS (SELECT doc_id, pos,
                CASE WHEN MAX(pos + 7) OVER w IS NULL
                       OR pos > MAX(pos + 7) OVER w + 1
                     THEN 1 ELSE 0 END AS new_island
         FROM hits
         WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
isl AS (SELECT doc_id, pos,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flag)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos + 7) AS BIGINT) AS span_end,
       CAST(MAX(pos + 7) - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, island
"""


def corpus_mixture_sample(spark, sf_dir):
    """Deterministic hash-bucket mixture sampling: per-language
    permille rates applied via md5-bucket(doc_id) — reproducible on
    any cluster size / partitioning (membership is decided locally
    from the row alone; no RNG state)."""
    return CUR.mixture_sample(
        t(spark, sf_dir, "documents"),
        {"en": 500, "zh": 1000, "es": 800, "de": 250},
        default_permille=125,
    )


SQL_MIXTURE_SAMPLE = """
SELECT * FROM (
  SELECT doc_id, lang,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
      AS bucket_permille,
    CAST(CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 1000
                   WHEN 'es' THEN 800 WHEN 'de' THEN 250
                   ELSE 125 END AS BIGINT) AS rate_permille
  FROM documents)
WHERE bucket_permille < rate_permille
"""


def pack_chunks(spark, sf_dir):
    """Concat-then-chunk sequence packing with per-document lineage:
    per-language token-stream offsets and the [first_chunk, last_chunk]
    range each doc occupies at a 256-token context window (one range
    exchange per stream — Spark's two-pass prefix sum)."""
    return CUR.pack_chunks(t(spark, sf_dir, "documents"), chunk_tokens=256)


SQL_PACK_CHUNKS = f"""
WITH d AS (SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d WHERE n_tokens > 0)
SELECT doc_id, lang, n_tokens,
  CAST(cum - n_tokens AS BIGINT) AS start_offset,
  CAST(FLOOR((cum - n_tokens)/256.0) AS BIGINT) AS first_chunk,
  CAST(FLOOR((cum - 1)/256.0) AS BIGINT) AS last_chunk
FROM c
"""


def doc_scrub_spans(spark, sf_dir):
    """Exact-substring dedup with REMOVAL (operators/curation.
    scrub_duplicate_spans — the second half of Lee et al. 2022):
    cross-doc duplicated 8-gram spans keep one copy (smallest doc_id)
    and are cut from every other document, with the cleaned text and
    removed-token counts emitted per doc. Grams travel as 60-bit
    hashes; overlapping spans merge via the DISTINCT covered-position
    set; the referee rebuilds every cleaned string in DuckDB."""
    return CUR.scrub_duplicate_spans(t(spark, sf_dir, "documents"), k=8)


SQL_SCRUB_SPANS = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
toks AS (SELECT doc_id, CAST(i AS BIGINT) AS p, t[i] AS tok
         FROM base, unnest(range(1, len(t)+1)) AS u(i)),
occ AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
          ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
            AS gh
        FROM base, unnest(range(1, greatest(len(t)-7, 0)+1)) AS u(i)),
keeper AS (SELECT gh, MIN(doc_id) AS keep_id FROM occ
           GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
dup AS (SELECT o.doc_id, o.pos, k.keep_id FROM occ o JOIN keeper k USING (gh)),
cov AS (SELECT DISTINCT doc_id, pos + j AS p
        FROM dup, unnest(range(0, 8)) AS r(j) WHERE doc_id <> keep_id),
prot AS (SELECT DISTINCT doc_id, pos + j AS p
         FROM dup, unnest(range(0, 8)) AS r(j) WHERE doc_id = keep_id),
rem AS (SELECT c.doc_id, c.p FROM cov c
        LEFT JOIN prot q ON q.doc_id = c.doc_id AND q.p = c.p
        WHERE q.p IS NULL),
kept AS (SELECT t.doc_id, t.p, t.tok FROM toks t
         LEFT JOIN rem c ON c.doc_id = t.doc_id AND c.p = t.p
         WHERE c.p IS NULL),
reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
          string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY doc_id),
tcnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
         FROM toks GROUP BY doc_id),
tot AS (SELECT d.doc_id, CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN tcnt t USING (doc_id))
SELECT tt.doc_id, tt.n_tokens,
  CAST(tt.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
  COALESCE(r.cleaned_text, '') AS cleaned_text
FROM tot tt LEFT JOIN reb r USING (doc_id)
"""


def pack_chunks_sharded(spark, sf_dir):
    """The hot-stream variant of pack_chunks (operators/curation.
    pack_chunks_sharded): contiguous id-range shards run the prefix
    sum at parallelism × n_shards, a tiny per-shard totals table is
    window-cumsum'd and broadcast back to re-base local offsets —
    the explicit distributed two-pass prefix sum for a stream too hot
    for one window partition. Forced through many shards here
    (range_size=16); output contract — and therefore the oracle — is
    IDENTICAL to pack_chunks (pytest additionally pins set equality
    of the two paths)."""
    return CUR.pack_chunks_sharded(
        t(spark, sf_dir, "documents"), chunk_tokens=256, range_size=16
    )


def decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination (GPT-3/PaLM n-gram overlap scrub):
    training docs sharing any word-8-gram with a deterministic 2%
    hash-bucket eval split are flagged with hit counts and permille
    token coverage. The eval-gram set semi-joins back against training
    occurrences (broadcast when it fits)."""
    return CUR.decontaminate(t(spark, sf_dir, "documents"), k=8, eval_permille=20)


SQL_DECONTAMINATE = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < 20
         AS is_eval
      FROM documents),
occ AS (SELECT doc_id, is_eval, i AS pos,
               ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS gh
        FROM base, unnest(range(1, greatest(len(t)-7, 0)+1)) AS u(i)),
eg AS (SELECT DISTINCT gh FROM occ WHERE is_eval),
hits AS (SELECT o.doc_id, o.pos FROM occ o JOIN eg USING (gh) WHERE NOT o.is_eval),
cov AS (SELECT doc_id, COUNT(DISTINCT pos) AS eval_gram_hits,
               COUNT(DISTINCT pos + off) AS n_cov
        FROM hits, unnest(range(0, 8)) AS w(off) GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
  CAST(COALESCE(c.eval_gram_hits, 0) AS BIGINT) AS eval_gram_hits,
  CAST(COALESCE(FLOOR(1000*c.n_cov/b.n_tokens), 0) AS BIGINT)
    AS contam_cover_permille,
  CAST(CASE WHEN c.eval_gram_hits IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated
FROM base b LEFT JOIN cov c USING (doc_id) WHERE NOT b.is_eval
"""


def decontaminate_bloom(spark, sf_dir):
    """Scale path of decontaminate_ngram (operators/curation.py): the
    eval 8-gram set is packed into a 65536-bit Bloom filter (8 KiB,
    one map-side-combined bit_or exchange) and the TRAINING side
    probes it as a pure column expression against one
    crossJoin-broadcast row — no gram-grain semi join, no per-probe
    explode, no lookup aggregation; the corpus scan stays map-only
    until the doc-grain fold. No false negatives (Bloom law), so
    bloom_gram_hits >= eval_gram_hits and contaminated_bloom >=
    contaminated — the exact counts ride alongside to make the
    superset guarantee visible in-row; the referee replays the
    filter's bits in DuckDB."""
    return CUR.decontaminate_bloom(
        t(spark, sf_dir, "documents"), k=8, eval_permille=20,
        m_bits=65536, n_hashes=3,
    )


SQL_DECONTAM_BLOOM = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < 20
         AS is_eval
      FROM documents),
occ AS (SELECT doc_id, is_eval, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
        FROM base, unnest(range(1, greatest(len(t)-7, 0)+1)) AS u(i)),
mem AS (SELECT DISTINCT gram FROM occ WHERE is_eval),
cells AS (SELECT ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))::BIGINT
                   % 65536 AS bit
          FROM mem, unnest([0,1,2]) AS r(j)),
words AS (SELECT bit // 32 AS word,
          CAST(bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS BIGINT) AS bits
          FROM cells GROUP BY 1),
train AS (SELECT doc_id, pos, gram FROM occ WHERE NOT is_eval),
pc AS (SELECT doc_id, pos, gram,
              ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))::BIGINT
                % 65536 AS bit
       FROM train, unnest([0,1,2]) AS r(j)),
hit AS (SELECT doc_id, pos,
        MIN(CASE WHEN (COALESCE(bits, 0) & (CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)))
                      = (CAST(1 AS BIGINT) << CAST(bit % 32 AS INT))
                 THEN 1 ELSE 0 END) AS h
        FROM pc LEFT JOIN words ON words.word = pc.bit // 32
        GROUP BY doc_id, pos),
bh AS (SELECT doc_id, CAST(SUM(h) AS BIGINT) AS bloom_gram_hits FROM hit GROUP BY doc_id),
eh AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS eval_gram_hits
       FROM train tr JOIN mem USING (gram) GROUP BY tr.doc_id)
SELECT b.doc_id, b.n_tokens,
  CAST(COALESCE(bh.bloom_gram_hits, 0) AS BIGINT) AS bloom_gram_hits,
  CAST(COALESCE(eh.eval_gram_hits, 0) AS BIGINT) AS eval_gram_hits,
  CAST(CASE WHEN COALESCE(bh.bloom_gram_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated_bloom,
  CAST(CASE WHEN COALESCE(eh.eval_gram_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated
FROM base b LEFT JOIN bh USING (doc_id) LEFT JOIN eh USING (doc_id)
WHERE NOT b.is_eval
"""


def pii_redaction(spark, sf_dir):
    """PII scrub with typed placeholders: the documents text gets a
    deterministic synthesized contact line (email + IPv4 + dashed
    phone derived from doc_id) so the row exercises every pattern,
    then email -> IPv4 -> phone are redacted sequentially with
    per-stage replacement counts. Zero-shuffle plan (one Project)."""
    d = t(spark, sf_dir, "documents")
    src = F.concat(
        F.substring("text", 1, 80),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10.0.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" tel 03-1234-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    return CUR.pii_redact(d.select("doc_id", src.alias("text")))


SQL_PII_REDACT = f"""
WITH src AS (SELECT doc_id,
    substr(text, 1, 80) || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@mail.example.com ip 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
      || ' tel 03-1234-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS s0
  FROM documents),
st AS (SELECT doc_id, s0,
    regexp_replace(s0, '{CUR.PII_EMAIL}', '<EMAIL>', 'g') AS s1
  FROM src),
st2 AS (SELECT doc_id, s0, s1,
    regexp_replace(s1, '{CUR.PII_IPV4}', '<IP>', 'g') AS s2
  FROM st)
SELECT doc_id,
  CAST(len(regexp_extract_all(s0, '{CUR.PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(s1, '{CUR.PII_IPV4}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(s2, '{CUR.PII_PHONE}')) AS BIGINT) AS n_phones,
  regexp_replace(s2, '{CUR.PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM st2
"""


def doc_importance_weights(spark, sf_dir):
    """DSIR-style hashed-ngram importance weights (Xie et al. 2023),
    integer fixed-point: unigram+bigram features hashed to 1024
    buckets, a 10% hash split as the target distribution, per-bucket
    Laplace-smoothed probability differences summed per document. The
    bucket score table (<=1024 rows) is explicitly broadcast — the
    corpus shuffles once for the feature agg and once for the
    doc-grain fold, never for scoring."""
    return CUR.importance_weights(
        t(spark, sf_dir, "documents"), target_permille=100, n_buckets=1024
    )


SQL_IMPORTANCE_WEIGHTS = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < 100
         AS is_target
      FROM documents),
occ AS (SELECT doc_id, is_target,
               ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b
        FROM (SELECT doc_id, is_target, t[i] AS g
              FROM base, unnest(range(1, len(t)+1)) AS u(i)
              UNION ALL
              SELECT doc_id, is_target, array_to_string(t[i:i+1], ' ') AS g
              FROM base, unnest(range(1, greatest(len(t)-1, 0)+1)) AS u(i))),
cnts AS (SELECT b,
                CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tcnt,
                CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS bcnt
         FROM occ GROUP BY b),
tot AS (SELECT CAST(SUM(tcnt) AS BIGINT) AS tot_t,
               CAST(SUM(bcnt) AS BIGINT) AS tot_b FROM cnts),
score AS (SELECT b,
                 (1000000*(tcnt+1)) // (tot_t+1024)
                   - (1000000*(bcnt+1)) // (tot_b+1024) AS s
          FROM cnts, tot),
per_doc AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(s) AS weight
            FROM occ JOIN score USING (b) GROUP BY doc_id)
SELECT b.doc_id, CAST(b.is_target AS INT) AS is_target,
  CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
  CAST(COALESCE(p.weight, 0) AS BIGINT) AS weight
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


def doc_lm_perplexity(spark, sf_dir):
    """CCNet-style hash-bucketed bigram-LM quality scoring (Wenzek et
    al. 2020): a 50% hash split trains an add-one-smoothed bucket LM,
    every document is scored in integer milli-bits-per-bigram
    (floor-log2 via length(bin(q))-1 — string-exact on both engines),
    and `keep` flags the low-perplexity head. One corpus pass trains
    (melted context+bigram counts in a single hash agg), the ≤8192-row
    model broadcasts, one doc-grain fold scores — the corpus is never
    joined at its own grain."""
    return CUR.lm_perplexity(
        t(spark, sf_dir, "documents"),
        train_permille=500, n_buckets=4096, max_bits_milli=9000,
    )


SQL_LM_PERPLEXITY = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lm'), 1, 15))::BIGINT
          % 1000) < 500 AS is_train
      FROM documents),
occ AS (SELECT doc_id, is_train,
          ('0x' || substr(md5(t[i]), 1, 15))::BIGINT % 4096 AS bc,
          ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT % 4096 AS bg
        FROM base, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)),
ctx AS (SELECT bc AS b, COUNT(*) AS c_ctx FROM occ WHERE is_train GROUP BY bc),
bgc AS (SELECT bg AS b, COUNT(*) AS c_bg FROM occ WHERE is_train GROUP BY bg),
scored AS (SELECT doc_id,
    GREATEST(length(bin(GREATEST(
      (COALESCE(c.c_ctx, 0) + 4096) * 1024 // (COALESCE(g.c_bg, 0) + 1),
      1))) - 11, 0) AS bits
  FROM occ LEFT JOIN ctx c ON c.b = occ.bc LEFT JOIN bgc g ON g.b = occ.bg),
per_doc AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(bits) AS total_bits
            FROM scored GROUP BY doc_id)
SELECT b.doc_id, CAST(b.is_train AS INT) AS is_train,
  CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(p.total_bits, 0) AS BIGINT) AS total_bits,
  CAST(1000 * COALESCE(p.total_bits, 0)
       // GREATEST(COALESCE(p.n_bigrams, 0), 1) AS BIGINT) AS bits_milli,
  CAST(1000 * COALESCE(p.total_bits, 0)
       // GREATEST(COALESCE(p.n_bigrams, 0), 1) <= 9000 AS INT) AS keep
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


def bm25_retrieval_topk(spark, sf_dir):
    """BM25 top-k lexical retrieval (operators/retrieval.py): every
    50th document's first 5 tokens play the query set; scores are
    integer fixed point (piecewise-linear milli-log2 idf + milli tf
    saturation) so DuckDB hash-matches the ranking bit for bit. The
    corpus-scale sibling of the reference's per-document
    search_cells_by_query (table_semantic_parser.py:276-287)."""
    d = t(spark, sf_dir, "documents")
    toks = TS.tokens(F.lower(F.col("text")))
    queries = d.filter(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("query_text"),
    )
    return RET.bm25_topk(d, queries, k=5, k1_milli=1200, b_milli=750)


_SQL_PLOG2_RATIO = RET.plog2_frag("ratio_micro", "duckdb")

SQL_BM25_TOPK = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM base),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
  GREATEST(1000 * CAST(COALESCE(SUM(dl),0) AS BIGINT)
           // GREATEST(CAST(COUNT(*) AS BIGINT), 1), 1) AS avgdl_milli FROM d),
postings AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, t[i] AS term
        FROM d, unnest(range(1, len(t)+1)) AS u(i))
  GROUP BY doc_id, dl, term),
q AS (SELECT doc_id AS query_id, t[1:5] AS qt FROM base WHERE doc_id % 50 = 7),
qterms AS (SELECT DISTINCT query_id, qt[i] AS term
           FROM q, unnest(range(1, len(qt)+1)) AS u(i)),
matched AS (SELECT p.* FROM postings p
            JOIN (SELECT DISTINCT term FROM qterms) ts USING (term)),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM matched GROUP BY term),
s0 AS (SELECT qq.query_id, m.doc_id, m.tf, m.dl, f.df, s.n_docs, s.avgdl_milli,
   CAST(1000000 AS BIGINT) * (2*s.n_docs - 2*f.df + 1) // (2*f.df + 1)
     + 1000000 AS ratio_micro
  FROM matched m JOIN qterms qq USING (term) JOIN dft f USING (term)
  CROSS JOIN stats s),
scored AS (SELECT query_id, doc_id,
   SUM( ({_SQL_PLOG2_RATIO} - {RET.PLOG2_1M})
      * (CAST(1000000 AS BIGINT) * tf * (1000 + 1200)
         // ((1000*tf + (1200 * (1000 - 750
              + (750 * (1000000 * dl // avgdl_milli)) // 1000)) // 1000)
            * 1000)) ) AS score_micro
  FROM s0 GROUP BY query_id, doc_id),
ranked AS (SELECT query_id, doc_id, score_micro,
   ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(score_micro AS BIGINT) AS score_micro
FROM ranked WHERE rank <= 5
"""


def doc_sliding_chunks(spark, sf_dir):
    """RAG-style sliding-window chunking (operators/curation.py):
    16-token windows, 4-token overlap (stride 12), per-chunk (offset,
    token count, text) lineage — a zero-shuffle explode+project."""
    return CUR.sliding_chunks(
        t(spark, sf_dir, "documents"), chunk_size=16, overlap=4
    )


SQL_SLIDING_CHUNKS = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
dd AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM base
       WHERE len(t) > 0),
c AS (SELECT doc_id, t, n, i AS chunk_idx
      FROM dd, unnest(range(0, 1 + (GREATEST(n - 16, 0) + 11) // 12)) AS u(i))
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(chunk_idx*12 AS BIGINT) AS start_token,
  CAST(LEAST(16, n - chunk_idx*12) AS BIGINT) AS chunk_tokens,
  array_to_string(t[chunk_idx*12 + 1 : chunk_idx*12 + 16], ' ') AS chunk_text
FROM c
"""


def hll_distinct_tokens(spark, sf_dir):
    """Portable mergeable HyperLogLog (functions/sketch.py): per-source
    distinct-token estimate from a 256-register sketch (one
    (group, bucket)-keyed exchange with map-side MAX combine — the
    mergeable artifact Spark's approx_count_distinct can't persist),
    integer fixed point end to end, with the exact distinct count
    alongside so the estimate's error is visible in the row itself."""
    d = t(spark, sf_dir, "documents")
    occ = d.select(
        "source", F.explode(TS.tokens(F.lower(F.col("text")))).alias("tok")
    )
    est = SK.hll_estimate(
        SK.hll_registers(occ, F.col("tok"), ["source"]), ["source"]
    )
    exact = occ.groupBy("source").agg(
        F.countDistinct("tok").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "source")


SQL_HLL_DISTINCT = f"""
WITH base AS (SELECT source, {_TOKS} AS t FROM documents),
occ AS (SELECT source, t[i] AS tok
        FROM base, unnest(range(1, len(t)+1)) AS u(i)),
{SK.sql_hll_estimate('occ', 'source', 'tok')},
ex AS (SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
       FROM occ GROUP BY source)
SELECT h.source, h.n_nonzero, h.sum_rho, h.est_milli, ex.exact_distinct
FROM hest h JOIN ex USING (source)
"""


def cmsketch_token_counts(spark, sf_dir):
    """Count-min frequency sketch (functions/sketch.py, Cormode &
    Muthukrishnan 2005): 4×1024 BIGINT counters built in one map-side-
    combined exchange, probed for every 101st document's distinct
    tokens, with the exact occurrence count alongside (est >= exact is
    the sketch's guarantee; equality when the probe's 4 cells are
    collision-free). The sketch table merges across shards by SUM —
    pytest pins the merge law."""
    d = t(spark, sf_dir, "documents")
    occ = _par(d).select(
        "doc_id", F.explode(TS.tokens(F.lower(F.col("text")))).alias("tok")
    )
    sk = SK.cm_build(occ, F.col("tok"), [])
    probes = (
        occ.filter(F.col("doc_id") % 101 == 7)
        .select(F.col("tok").alias("probe"))
        .distinct()
    )
    est = SK.cm_query(sk, probes, [], "probe")
    exact = occ.groupBy(F.col("tok").alias("probe")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    return est.join(exact, "probe")


SQL_CM_TOKEN_COUNTS = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
occ AS (SELECT doc_id, t[i] AS tok
        FROM base, unnest(range(1, len(t)+1)) AS u(i)),
probes AS (SELECT DISTINCT tok AS probe FROM occ WHERE doc_id % 101 = 7),
{SK.sql_cm_estimate('occ', 'probes')},
ex AS (SELECT tok AS probe, CAST(COUNT(*) AS BIGINT) AS exact_count
       FROM occ GROUP BY tok)
SELECT e.probe, e.est, x.exact_count
FROM cmest e JOIN ex x USING (probe)
"""


def bloom_token_membership(spark, sf_dir):
    """Bloom membership filter (functions/sketch.py, Bloom 1970): the
    broadcast-decontamination primitive. Builds an 8192-bit packed
    filter (256 BIGINT words, one map-side-combined bit_or exchange)
    over the tokens of the "eval" docs (doc_id % 7 == 3), then probes
    every distinct corpus token with the filter broadcast — the corpus
    side never shuffles for the lookup, which is the whole point at
    100 TB. Exact membership rides alongside: contains >= exact_member
    always (no false negatives); pytest pins the merge-idempotence and
    no-false-negative laws."""
    d = t(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id", F.explode(TS.tokens(F.lower(F.col("text")))).alias("tok")
    )
    members = occ.filter(F.col("doc_id") % 7 == 3)
    sk = SK.bloom_build(members, F.col("tok"), [])
    probes = occ.select(F.col("tok").alias("probe")).distinct()
    got = SK.bloom_contains(sk, probes, [], "probe")
    exact = (
        members.select(F.col("tok").alias("probe"))
        .distinct()
        .withColumn("exact_member", F.lit(1).cast("bigint"))
    )
    return got.join(exact, "probe", "left").select(
        "probe",
        "contains",
        F.coalesce("exact_member", F.lit(0)).cast("bigint").alias(
            "exact_member"
        ),
    )


SQL_BLOOM_MEMBERSHIP = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
occ AS (SELECT doc_id, t[i] AS tok
        FROM base, unnest(range(1, len(t)+1)) AS u(i)),
members AS (SELECT tok FROM occ WHERE doc_id % 7 = 3),
probes AS (SELECT DISTINCT tok AS probe FROM occ),
{{bloom_frag}},
ex AS (SELECT DISTINCT tok AS probe FROM occ WHERE doc_id % 7 = 3)
SELECT b.probe, b.contains,
       CAST(CASE WHEN e.probe IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS exact_member
FROM blest b LEFT JOIN ex e USING (probe)
""".replace("{bloom_frag}", SK.sql_bloom_contains("members", "probes"))


def adaptive_length_gate(spark, sf_dir):
    """Sketch-driven curation gate: the per-language p10 token-count
    cutoff is computed from the log-linear quantile sketch's BOUNDED
    bucket table (functions/sketch.q_build — <= (64-s)*2^s rows per
    lang) instead of a corpus-wide exact percentile, then joins back
    (a tiny per-lang table, Spark broadcasts it) to gate short
    documents. This is how a 100 TB pipeline calibrates thresholds:
    the control-plane statistic comes from a mergeable artifact that
    costs one map-side-combined exchange, not a full sort — and it
    can be reused/merged across days without rescanning. The referee
    replays the sketch cutoff bit for bit."""
    d = t(spark, sf_dir, "documents")
    src = d.select(
        "doc_id", "lang", TS.token_count(F.col("text")).alias("n_tokens")
    )
    sk = SK.q_build(src, F.col("n_tokens"), ["lang"], sub_bits=5)
    cut = SK.q_quantiles(sk, ["lang"], [100], sub_bits=5).select(
        "lang", F.col("est").alias("cutoff")
    )
    return src.join(F.broadcast(cut), "lang").select(
        "doc_id", "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cutoff").cast("bigint").alias("cutoff"),
        (F.col("n_tokens") >= F.col("cutoff")).cast("bigint").alias("keep"),
    )


SQL_ADAPTIVE_GATE = f"""
WITH src AS (SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
             FROM documents),
{{q_frag}},
cut AS (SELECT lang, est AS cutoff FROM qest)
SELECT s.doc_id, s.lang, s.n_tokens, c.cutoff,
  CAST(CASE WHEN s.n_tokens >= c.cutoff THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM src s JOIN cut c USING (lang)
""".replace(
    "{q_frag}",
    SK.sql_q_quantiles("src", "n_tokens", ["lang"], [100], sub_bits=5).lstrip(),
)


def kmv_overlap_langs(spark, sf_dir):
    """Sketch-space set algebra (Cohen & Kaplan 2007 bottom-k; the
    KMV intersection estimator of Beyer et al. 2007 SIGMOD "On
    synopses for distinct-value estimation"): the token-set overlap
    of every language PAIR — Jaccard, intersection size, union size —
    estimated from the two k=64 bottom-k sketches ALONE. Per pair:
    union the two sketches, re-rank, keep the k smallest (exactly
    `sketch.kmv_merge` — the union sketch), then m = how many of
    those k appear in BOTH sides gives jaccard ~= m/k and
    |A ∩ B| ~= (m/k) * union_est. The corpus is touched ONCE (the
    distinct (lang, tok) exchange inside kmv_build); all pair math
    runs on <=64-row artifacts — at 100 TB this is the dataset-
    overlap report (e.g. cross-source contamination triage) that
    needs no corpus-×-corpus join, and the sketches are the same
    mergeable artifacts a daily pipeline already keeps. Exact
    intersection/union/Jaccard ride alongside as the referee."""
    d = t(spark, sf_dir, "documents")
    occ = d.select(
        "lang", F.explode(TS.tokens(F.lower(F.col("text")))).alias("tok")
    )
    k = 64
    sk = SK.kmv_build(occ, F.col("tok"), ["lang"], k=k)
    langs = occ.select("lang").distinct()
    pairs = (
        langs.select(F.col("lang").alias("s1"))
        .crossJoin(langs.select(F.col("lang").alias("s2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    tagged = pairs.join(
        F.broadcast(sk), (F.col("lang") == F.col("s1")) | (F.col("lang") == F.col("s2"))
    ).select(
        "s1", "s2", "h", "v",
        F.when(F.col("lang") == F.col("s1"), F.lit(1)).otherwise(F.lit(2)).alias("side"),
    )
    pg = tagged.groupBy("s1", "s2", "h", "v").agg(
        F.countDistinct("side").alias("nsides")
    )
    pw = W.partitionBy("s1", "s2").orderBy("h", "v")
    pk = pg.withColumn("rank", F.row_number().over(pw)).filter(F.col("rank") <= k)
    pa = pk.groupBy("s1", "s2").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("h_max"),
        F.sum((F.col("nsides") == 2).cast("bigint")).cast("bigint").alias("m_both"),
    )
    est = pa.select(
        "s1", "s2", "n_kept", "m_both",
        F.expr(SK.kmv_est_frag(k, "spark")).cast("bigint").alias(
            "union_est_milli"
        ),
    ).select(
        "s1", "s2", "n_kept", "m_both", "union_est_milli",
        F.expr("m_both * 1000 DIV n_kept").cast("bigint").alias("jaccard_milli"),
        F.expr("m_both * union_est_milli DIV n_kept").cast("bigint").alias(
            "inter_est_milli"
        ),
    )
    # referee-side exact overlap (the O(corpus) join the sketch avoids)
    exd = occ.distinct()
    sizes = exd.groupBy("lang").agg(F.countDistinct("tok").alias("n"))
    inter = (
        exd.select(F.col("lang").alias("s1"), "tok")
        .join(exd.select(F.col("lang").alias("s2"), "tok"), "tok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("bigint").alias("exact_inter"))
    )
    exact = (
        pairs.join(sizes.select(F.col("lang").alias("s1"), F.col("n").alias("n1")), "s1")
        .join(sizes.select(F.col("lang").alias("s2"), F.col("n").alias("n2")), "s2")
        .join(inter, ["s1", "s2"], "left")
        .select(
            "s1", "s2",
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
            (F.col("n1") + F.col("n2") - F.coalesce("exact_inter", F.lit(0)))
            .cast("bigint").alias("exact_union"),
        )
        .withColumn(
            "exact_jaccard_milli",
            F.expr("exact_inter * 1000 DIV exact_union").cast("bigint"),
        )
    )
    return est.join(exact, ["s1", "s2"])


SQL_KMV_OVERLAP = """
WITH base AS (SELECT lang, {toks} AS t FROM documents),
occ AS (SELECT lang, t[i] AS tok FROM base, unnest(range(1, len(t)+1)) AS u(i)),
{kmv_frag},
langs AS (SELECT DISTINCT lang FROM occ),
pairs AS (SELECT a.lang AS s1, b.lang AS s2 FROM langs a, langs b
          WHERE a.lang < b.lang),
pu AS (SELECT p.s1, p.s2, s.h, s.v,
              CASE WHEN s.lang = p.s1 THEN 1 ELSE 2 END AS side
       FROM pairs p JOIN kmvs s ON s.lang = p.s1 OR s.lang = p.s2),
pg AS (SELECT s1, s2, h, v, COUNT(DISTINCT side) AS nsides
       FROM pu GROUP BY 1, 2, 3, 4),
pr AS (SELECT s1, s2, h, nsides,
              ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h, v) AS rank
       FROM pg),
pa AS (SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS h_max,
              CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS m_both
       FROM pr WHERE rank <= 64 GROUP BY 1, 2),
est AS (SELECT s1, s2, n_kept, m_both,
          CAST({kmv_frag_est} AS BIGINT) AS union_est_milli
        FROM pa),
exd AS (SELECT DISTINCT lang, tok FROM occ),
sizes AS (SELECT lang, COUNT(DISTINCT tok) AS n FROM exd GROUP BY lang),
inter AS (SELECT a.lang AS s1, b.lang AS s2,
                 CAST(COUNT(*) AS BIGINT) AS exact_inter
          FROM exd a JOIN exd b ON a.tok = b.tok AND a.lang < b.lang
          GROUP BY 1, 2)
SELECT e.s1, e.s2, e.n_kept, e.m_both, e.union_est_milli,
  CAST(e.m_both * 1000 // e.n_kept AS BIGINT) AS jaccard_milli,
  CAST(e.m_both * e.union_est_milli // e.n_kept AS BIGINT) AS inter_est_milli,
  CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
  CAST(z1.n + z2.n - COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_union,
  CAST(COALESCE(i.exact_inter, 0) * 1000
       // (z1.n + z2.n - COALESCE(i.exact_inter, 0)) AS BIGINT)
    AS exact_jaccard_milli
FROM est e
LEFT JOIN inter i ON i.s1 = e.s1 AND i.s2 = e.s2
JOIN sizes z1 ON z1.lang = e.s1
JOIN sizes z2 ON z2.lang = e.s2
""".replace("{toks}", _TOKS).replace(
    "{kmv_frag}", SK.sql_kmv("occ", "tok", ["lang"], k=64).lstrip()
).replace("{kmv_frag_est}", SK.kmv_est_frag(64, "duckdb"))


def bpe_train_merges(spark, sf_dir):
    """Distributed BPE merge training (operators/bpe.py, Sennrich et
    al. 2016): the corpus reduces to its word-frequency dictionary in
    ONE exchange, then 8 merge rounds run over that bounded vocabulary
    — adjacent-pair explode + sum, deterministic argmax (count desc,
    pair asc), and the merge applied to every word as one JVM
    ``replace`` on a separator-wrapped symbol string whose greedy
    leftmost scan IS the BPE apply rule (bit-identical in Spark and
    DuckDB). No Python UDF anywhere; per-round lineage bounded by
    localCheckpoint; the 1-row argmax is a documented driver fold.
    Output = the 8-row merge table, i.e. the tokenizer artifact. The
    referee replays all 8 rounds as generated CTE stages."""
    return BPE.bpe_train(t(spark, sf_dir, "documents"), n_merges=8)


def bpe_subword_counts(spark, sf_dir):
    """Train-then-apply composition: the 8 merges learned by
    `bpe_train_merges` (collected — an 8-row driver fold) are applied
    to every document as a nested JVM replace chain in one Project,
    yielding per-doc word and subword counts — the token-budget
    numbers a packing/mixture planner consumes. The referee re-learns
    the same merges in SQL and joins the final word segmentations
    back to the docs."""
    d = t(spark, sf_dir, "documents")
    m = BPE.bpe_train(d, n_merges=8)
    pairs = [(r.x, r.y) for r in m.orderBy("round").collect()]
    return BPE.bpe_apply(d, pairs)


def pack_chunks_bpe(spark, sf_dir):
    """The tokenizer loop closed end to end: learn the 8 BPE merges
    (bpe_train_merges), tokenize every document with them
    (bpe_apply — a nested-replace codegen Project), then pack the
    SUBWORD stream per language into 256-subword context windows with
    per-doc lineage — the same two-pass prefix-sum packing as
    pack_chunks, but budgeted in the units the model actually consumes
    instead of whitespace tokens. One corpus exchange for the word
    dict, one for the doc fold, one range exchange per stream; the
    referee re-learns the merges and replays the packing arithmetic."""
    d = t(spark, sf_dir, "documents")
    m = BPE.bpe_train(d, n_merges=8)
    pairs = [(r.x, r.y) for r in m.orderBy("round").collect()]
    sub = BPE.bpe_apply(d, pairs).select("doc_id", "n_subwords")
    j = d.select("doc_id", "lang").join(sub, "doc_id")
    byid = W.partitionBy("lang").orderBy("doc_id")
    c = j.withColumn("cum", F.sum("n_subwords").over(byid))
    return c.select(
        "doc_id", "lang",
        F.col("n_subwords").cast("bigint").alias("n_subwords"),
        (F.col("cum") - F.col("n_subwords")).cast("bigint").alias(
            "start_offset"
        ),
        F.expr("(cum - n_subwords) DIV 256").cast("bigint").alias(
            "first_chunk"
        ),
        F.expr("(cum - 1) DIV 256").cast("bigint").alias("last_chunk"),
    )


def _sql_bpe_rounds(n: int) -> str:
    S = BPE.SEP
    parts = [
        f"""base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
occ AS (SELECT doc_id, t[i] AS w FROM base, unnest(range(1, len(t)+1)) AS u(i)),
wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM occ
       WHERE position('{S}' IN w) = 0 GROUP BY w),
w0 AS (SELECT w, cnt, regexp_replace(w, '(.)', '{S}\\1{S}', 'g') AS s FROM wc)"""
    ]
    for r in range(1, n + 1):
        # AS MATERIALIZED is load-bearing: each w{r} is referenced
        # twice (pair counts + rewrite), so DuckDB's default CTE
        # inlining would re-expand the whole chain 2^n times
        parts.append(
            f"""a{r} AS (SELECT cnt, string_split(trim(s, '{S}'), '{S}{S}') AS a
        FROM w{r - 1}),
p{r} AS (SELECT a[i] AS x, a[i+1] AS y, CAST(SUM(cnt) AS BIGINT) AS pair_count
         FROM a{r}, unnest(range(1, len(a))) AS u(i) GROUP BY 1, 2),
m{r} AS MATERIALIZED (SELECT x, y, pair_count FROM p{r}
         ORDER BY pair_count DESC, x, y LIMIT 1),
w{r} AS MATERIALIZED (SELECT w, cnt, replace(s,
           -- COALESCE sentinel: if the pair table dried up before
           -- round {r} (Spark's bpe_train breaks early), the scalar
           -- subquery is NULL and replace(s, NULL, ..) would NULL the
           -- whole corpus; 5 consecutive separators can never occur
           -- (symbol wrapping yields at most 2), so the round becomes
           -- the identity instead
           COALESCE((SELECT '{S}' || x || '{S}{S}' || y || '{S}' FROM m{r}),
                    '{S}{S}{S}{S}{S}'),
           COALESCE((SELECT '{S}' || x || y || '{S}' FROM m{r}), '')) AS s
         FROM w{r - 1})"""
        )
    return ",\n".join(parts)


SQL_BPE_TRAIN = (
    "WITH " + _sql_bpe_rounds(8) + "\n"
    + "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, x, y, pair_count FROM m{r}"
        for r in range(1, 9)
    )
)

SQL_BPE_APPLY = (
    "WITH " + _sql_bpe_rounds(8) + f""",
segs AS (SELECT w, CAST(len(string_split(trim(s, '{BPE.SEP}'),
                '{BPE.SEP}{BPE.SEP}')) AS BIGINT) AS n_sub FROM w8)
SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(g.n_sub) AS BIGINT) AS n_subwords
FROM occ o JOIN segs g USING (w)
GROUP BY o.doc_id
"""
)

SQL_PACK_BPE = (
    "WITH " + _sql_bpe_rounds(8) + f""",
segs AS (SELECT w, CAST(len(string_split(trim(s, '{BPE.SEP}'),
                '{BPE.SEP}{BPE.SEP}')) AS BIGINT) AS n_sub FROM w8),
sub AS (SELECT o.doc_id, CAST(SUM(g.n_sub) AS BIGINT) AS n_subwords
        FROM occ o JOIN segs g USING (w) GROUP BY o.doc_id),
j AS (SELECT d.doc_id, d.lang, s.n_subwords
      FROM (SELECT doc_id, lang FROM documents) d JOIN sub s USING (doc_id)),
c AS (SELECT doc_id, lang, n_subwords,
        SUM(n_subwords) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM j)
SELECT doc_id, lang, n_subwords,
  CAST(cum - n_subwords AS BIGINT) AS start_offset,
  CAST((cum - n_subwords) // 256 AS BIGINT) AS first_chunk,
  CAST((cum - 1) // 256 AS BIGINT) AS last_chunk
FROM c
"""
)


def sketch_drift_psi(spark, sf_dir):
    """Distribution-drift monitor from the SAME mergeable artifacts
    the pipeline already keeps: per-language PSI (population stability
    index, Σ (p2-p1)·ln(p2/p1)) between day-1 and day-2 token-count
    distributions, computed on the log-linear quantile sketch's
    BOUNDED bucket tables (functions/sketch.q_build — <= (64-s)·2^s
    rows per group) rather than raw data. At 100 TB this is the
    day-over-day data-quality gate: each day costs one map-side-
    combined exchange to sketch, and the drift report is pure
    arithmetic over two tiny bucket tables — no rescan, no sort.
    Integer fixed point end to end: shares in ppm with +1 smoothing
    (empty buckets get 1 ppm, keeps the log total), |ln ratio| via
    the micro-log2 quadratic fragment (operators/retrieval.plog2q) on
    the hi/lo ratio so every operand stays positive (Spark DIV
    truncates toward zero but DuckDB // floors — they only agree on
    non-negatives). Referee replays bucket ids, shares, and the log
    arithmetic bit for bit."""
    d = t(spark, sf_dir, "documents")
    src = d.select(
        "lang",
        F.when(
            TS.hash64(F.col("doc_id").cast("string")) % 1000 < 500, F.lit(1)
        ).otherwise(F.lit(2)).alias("day"),
        TS.token_count(F.col("text")).alias("n_tokens"),
    )
    sk = SK.q_build(src, F.col("n_tokens"), ["lang", "day"], sub_bits=5)
    piv = sk.groupBy("lang", "bucket").agg(
        F.sum(F.when(F.col("day") == 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint").alias("c1"),
        F.sum(F.when(F.col("day") == 2, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint").alias("c2"),
    )
    tot = piv.groupBy("lang").agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    shares = piv.join(F.broadcast(tot), "lang").select(
        "lang", "n1", "n2",
        F.expr("c1 * 1000000 DIV GREATEST(n1, CAST(1 AS BIGINT)) + 1")
        .cast("bigint").alias("s1"),
        F.expr("c2 * 1000000 DIV GREATEST(n2, CAST(1 AS BIGINT)) + 1")
        .cast("bigint").alias("s2"),
    )
    ratio = "(GREATEST(s1, s2) * 1048576 DIV LEAST(s1, s2))"
    ln_micro = (
        f"(({RET.plog2q_frag(ratio, 'spark')} - 20000000) "
        f"* {SK.LN2_MICRO} DIV 1000000)"
    )
    contrib = f"((GREATEST(s1, s2) - LEAST(s1, s2)) * {ln_micro} DIV 1000000)"
    return shares.groupBy("lang").agg(
        F.min("n1").cast("bigint").alias("n1"),
        F.min("n2").cast("bigint").alias("n2"),
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum(F.expr(contrib)).cast("bigint").alias("psi_micro"),
    )


def _sql_psi() -> str:
    ratio = "(GREATEST(s1, s2) * 1048576 // LEAST(s1, s2))"
    ln_micro = (
        f"(({RET.plog2q_frag(ratio, 'duckdb')} - 20000000) "
        f"* {SK.LN2_MICRO} // 1000000)"
    )
    contrib = f"((GREATEST(s1, s2) - LEAST(s1, s2)) * {ln_micro} // 1000000)"
    return f"""
WITH src AS (SELECT lang,
    CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000) < 500 THEN 1 ELSE 2 END AS day,
    GREATEST(CAST(len({_TOKS}) AS BIGINT), 1) AS v
  FROM documents),
qsb AS (SELECT lang, day,
          (GREATEST(length(bin(v)) - 6, 0) * 32
           + (v >> GREATEST(length(bin(v)) - 6, 0))) AS bucket
        FROM src),
piv AS (SELECT lang, bucket,
          CAST(SUM(CASE WHEN day = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN day = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM qsb GROUP BY 1, 2),
tot AS (SELECT lang, SUM(c1) AS n1, SUM(c2) AS n2 FROM piv GROUP BY lang),
sh AS (SELECT p.lang, t.n1, t.n2,
         p.c1 * 1000000 // GREATEST(t.n1, 1) + 1 AS s1,
         p.c2 * 1000000 // GREATEST(t.n2, 1) + 1 AS s2
       FROM piv p JOIN tot t USING (lang))
SELECT lang, CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
  CAST(COUNT(*) AS BIGINT) AS n_buckets,
  CAST(SUM({contrib}) AS BIGINT) AS psi_micro
FROM sh GROUP BY lang
"""


SQL_DRIFT_PSI = _sql_psi()


def containment_near_pairs(spark, sf_dir):
    """Asymmetric CONTAINMENT dedup (Broder 1997's containment
    coefficient, |A∩B| / min(|A|,|B|) over shingle sets): catches the
    excerpt/quote case symmetric Jaccard structurally misses — a
    30-token excerpt inside a 200-token source has Jaccard ≈ 0.15 but
    containment 1.0. To make the row self-demonstrating, every 37th
    document contributes a deterministic 30-token-prefix excerpt doc
    (id + 100000) to the corpus; pairs are thresholded on containment
    ≥ 0.8 with the Jaccard riding alongside so the asymmetry is
    visible in-row. Same scale machinery as jaccard_near_pairs:
    distinct shingles, hot-shingle cap (>100 docs), equi-join only."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    ex = d.filter(F.col("doc_id") % 37 == 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(
            F.slice(TS.tokens(F.lower(F.col("text"))), 1, 30), " "
        ).alias("text"),
    )
    corpus = d.unionByName(ex)
    # the shingle table feeds FOUR consumers (sizes, hot-shingle agg,
    # and both sides of the intersection join); computed lazily the
    # interpreted-HOF shingling re-ran for each on a 2-partition scan
    # (~5.9 s/pass at sf0.1, ~80% of the query wall). Fan out to every
    # core first (guide §2.5), materialize ONCE (guide §2.4).
    sh = (
        _par(corpus)
        .select(F.col("doc_id").alias("id"), DD.shingles(F.col("text"), 3).alias("sh"))
        .localCheckpoint(eager=True)
    )
    sizes = sh.select("id", F.size("sh").cast("bigint").alias("sz"))
    exd = sh.select("id", F.explode("sh").alias("g"))
    hot = (
        exd.groupBy("g").agg(F.count("*").alias("c"))
        .filter(F.col("c") > 100).select("g")
    )
    cold = exd.join(F.broadcast(hot), "g", "left_anti")
    inter = (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb")), "id_b")
        .select(
            "id_a", "id_b", "inter", "sza", "szb",
            F.expr("inter * 1000 DIV LEAST(sza, szb)").cast("bigint").alias(
                "containment_milli"
            ),
            F.expr("inter * 1000 DIV (sza + szb - inter)").cast("bigint").alias(
                "jaccard_milli"
            ),
        )
        .filter(F.col("containment_milli") >= 800)
    )


SQL_CONTAINMENT = """
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(
           (list_filter(regexp_split_to_array(lower(text),
              '[ \\t\\n\\x0b\\x0c\\r]+'), t -> t <> ''))[1:30], ' ')
  FROM documents WHERE doc_id % 37 = 5
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0b\\x0c\\r]+'),
                     t -> t <> '') AS tk
  FROM src
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(tk) >= 3
           THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
           ELSE [array_to_string(tk, ' ')] END) AS s
  FROM toks
),
sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) > 100),
exc AS (SELECT * FROM ex WHERE g NOT IN (SELECT g FROM hot)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM exc a JOIN exc b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b, i.inter, sa.sz AS sza, sb.sz AS szb,
       CAST(i.inter * 1000 // LEAST(sa.sz, sb.sz) AS BIGINT)
         AS containment_milli,
       CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT)
         AS jaccard_milli
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.inter * 1000 // LEAST(sa.sz, sb.sz) >= 800
"""


def winnowing_near_pairs(spark, sf_dir):
    """Winnowing near-dup candidates (operators/dedup.
    winnow_fingerprints — Schleimer, Wilkerson & Aiken 2003, the MOSS
    algorithm): word-5-gram hashes winnowed with a w=4 window
    (rightmost-min per window via one framed struct-min — no
    self-join), guaranteeing any shared token run >= w+k-1 = 8 tokens
    produces a shared fingerprint while storing only ~2/(w+1) of the
    grams. Fingerprints hotter than 50 docs are dropped before the
    pair join (boilerplate skew defusal, same discipline as the
    hot-shingle cap in jaccard_pairs); pairs sharing >= 2 fingerprints
    emerge with per-doc fingerprint counts and a containment-style
    overlap ratio. The POSITIONAL guarantee is what MinHash (set
    sample) and SimHash (global vector) don't give — this is the
    clone/plagiarism-detector index shape at corpus scale."""
    d = t(spark, sf_dir, "documents")
    fp = DD.winnow_fingerprints(d, k=5, w=4)
    # materialize the winnowed index ONCE: byh feeds the hot-cap agg
    # AND the cold anti-join, and cold feeds the per-doc counts plus
    # BOTH pair-join sides — left lazy the two window passes + per-gram
    # md5 re-ran up to 5x (bimodal 1.7 s / ~15 s walls at sf0.1
    # depending on whether exchange reuse kicked in). Guide §2.4.
    byh = (
        fp.select(F.col("doc_id").alias("id"), "fh").distinct()
        .localCheckpoint(eager=True)
    )
    hot = (
        byh.groupBy("fh")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") > 50)
        .select("fh")
    )
    cold = byh.join(F.broadcast(hot), "fh", "left_anti").localCheckpoint(eager=True)
    counts = cold.groupBy("id").agg(F.count("*").cast("bigint").alias("n_fp"))
    a, b = cold.alias("a"), cold.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.countDistinct(F.col("a.fh")).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        pairs.join(
            counts.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_fp_a")),
            "id_a",
        )
        .join(
            counts.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_fp_b")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "n_shared", "n_fp_a", "n_fp_b",
            F.expr("n_shared * 1000 DIV LEAST(n_fp_a, n_fp_b)")
            .cast("bigint")
            .alias("overlap_milli"),
        )
    )


SQL_WINNOWING = """
WITH base AS (SELECT doc_id, {toks} AS t FROM documents),
gr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT
           AS gh
       FROM base, unnest(range(1, greatest(len(t)-4, 0)+1)) AS u(i)),
sel AS (SELECT doc_id, pos,
         -- HUGEINT packing of (gh asc, pos desc): 2^40 position space
         -- (a doc would need >10^12 grams to overflow, vs the Spark
         -- twin's uncapped struct-min)
         MIN(CAST(gh AS HUGEINT) * 1099511627776 + (1099511627775 - pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS skey,
         COUNT(*) OVER (PARTITION BY doc_id) AS ng
        FROM gr),
fp AS (SELECT DISTINCT doc_id,
         CAST(skey // 1099511627776 AS BIGINT) AS fh,
         CAST(1099511627775 - (skey % 1099511627776) AS BIGINT) AS fpos
       FROM sel WHERE pos <= greatest(ng - 3, 1)),
byh AS (SELECT DISTINCT doc_id AS id, fh FROM fp),
hot AS (SELECT fh FROM byh GROUP BY fh HAVING COUNT(DISTINCT id) > 50),
cold AS (SELECT * FROM byh WHERE fh NOT IN (SELECT fh FROM hot)),
cnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM cold GROUP BY id),
pr AS (SELECT a.id AS id_a, b.id AS id_b,
              CAST(COUNT(DISTINCT a.fh) AS BIGINT) AS n_shared
       FROM cold a JOIN cold b ON a.fh = b.fh AND a.id < b.id
       GROUP BY 1, 2
       HAVING COUNT(DISTINCT a.fh) >= 2)
SELECT p.id_a, p.id_b, p.n_shared, ca.n_fp AS n_fp_a, cb.n_fp AS n_fp_b,
  CAST(p.n_shared * 1000 // LEAST(ca.n_fp, cb.n_fp) AS BIGINT)
    AS overlap_milli
FROM pr p JOIN cnt ca ON ca.id = p.id_a JOIN cnt cb ON cb.id = p.id_b
""".replace("{toks}", _TOKS)


def incremental_ingest_dedup(spark, sf_dir):
    """Incremental ingest: day-2 documents deduplicate against day-1
    WITHOUT rescanning day-1 — the only state carried across days is
    the day-1 Bloom filter of exact digests (8 KiB packed into one
    map row, functions/sketch.bloom_pack) plus the mergeable HLL
    register table (<=256 rows). Day-2's plan: digest each doc, test
    the crossJoin-broadcast Bloom row with a pure column expression
    (map-only — the production cross-day decision), keep the smallest
    doc_id within day 2, and fold yesterday's HLL registers with
    today's (per-bucket MAX, idempotent) for the running corpus
    distinct estimate. Exact columns ride alongside as the referee:
    bloom_seen_day1 >= exact_seen_day1 always (no false negatives),
    and the exact distinct digest count sits next to the merged HLL
    estimate. This is the daily-delta shape of a 100 TB pipeline —
    O(new data) scan + O(sketch) state, never O(corpus) rework."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.md5(DD.normalized_text(F.col("text"))).alias("digest"),
        (TS.hash64(F.col("doc_id").cast("string")) % 1000 < 500).alias(
            "is_day1"
        ),
    )
    day1 = base.filter(F.col("is_day1"))
    day2 = base.filter(~F.col("is_day1"))
    packed = SK.bloom_pack(SK.bloom_build(day1, F.col("digest"), []))
    probed = day2.crossJoin(F.broadcast(packed)).select(
        "doc_id",
        "digest",
        SK.bloom_test(F.col("digest")).alias("bloom_seen_day1"),
    )
    d2min = day2.groupBy("digest").agg(F.min("doc_id").alias("min_id"))
    # referee-side exact membership (a real day-2 job would trust the
    # Bloom and never touch this O(day-1) set)
    seen1 = (
        day1.select("digest")
        .distinct()
        .withColumn("seen1", F.lit(1).cast("bigint"))
    )
    regs = SK.hll_merge(
        SK.hll_registers(day1, F.col("digest"), []).unionByName(
            SK.hll_registers(day2, F.col("digest"), [])
        ),
        [],
    )
    est = SK.hll_estimate(regs, []).select(
        F.col("est_milli").alias("corpus_distinct_est_milli")
    )
    ex = base.agg(
        F.countDistinct("digest").cast("bigint").alias(
            "exact_distinct_digests"
        )
    )
    return (
        probed.join(d2min, "digest")
        .join(F.broadcast(seen1), "digest", "left")
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(ex))
        .select(
            "doc_id",
            "bloom_seen_day1",
            F.coalesce("seen1", F.lit(0)).cast("bigint").alias(
                "exact_seen_day1"
            ),
            (F.col("doc_id") == F.col("min_id")).cast("bigint").alias(
                "first_in_day2"
            ),
            (
                (F.col("bloom_seen_day1") == 0)
                & (F.col("doc_id") == F.col("min_id"))
            ).cast("bigint").alias("keep"),
            "corpus_distinct_est_milli",
            "exact_distinct_digests",
        )
    )


SQL_INCREMENTAL_INGEST = """
WITH base AS (SELECT doc_id,
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < 500
      AS is_day1
  FROM documents),
members AS (SELECT DISTINCT digest AS tok FROM base WHERE is_day1),
probes AS (SELECT DISTINCT digest AS probe FROM base WHERE NOT is_day1),
{bloom_frag},
d2min AS (SELECT digest, MIN(doc_id) AS min_id FROM base
          WHERE NOT is_day1 GROUP BY digest),
alld AS (SELECT digest, 1 AS g FROM base),
{hll_frag},
ex AS (SELECT CAST(COUNT(DISTINCT digest) AS BIGINT) AS exact_distinct_digests
       FROM base)
SELECT b.doc_id,
  bl.contains AS bloom_seen_day1,
  CAST(CASE WHEN m.tok IS NULL THEN 0 ELSE 1 END AS BIGINT) AS exact_seen_day1,
  CAST(CASE WHEN b.doc_id = d.min_id THEN 1 ELSE 0 END AS BIGINT)
    AS first_in_day2,
  CAST(CASE WHEN bl.contains = 0 AND b.doc_id = d.min_id THEN 1 ELSE 0 END
    AS BIGINT) AS keep,
  h.est_milli AS corpus_distinct_est_milli,
  ex.exact_distinct_digests
FROM base b
JOIN blest bl ON bl.probe = b.digest
LEFT JOIN members m ON m.tok = b.digest
JOIN d2min d USING (digest)
CROSS JOIN hest h
CROSS JOIN ex
WHERE NOT b.is_day1
""".replace("{bloom_frag}", SK.sql_bloom_contains("members", "probes").lstrip()).replace(
    "{hll_frag}", SK.sql_hll_estimate("alld", "g", "digest").lstrip()
)


def kmv_sample_tokens(spark, sf_dir):
    """Bottom-k (KMV) sample (functions/sketch.kmv_build, Cohen &
    Kaplan 2007 / Bar-Yossef et al. 2002): per-language k=64 smallest
    60-bit hashes of the distinct tokens — a DETERMINISTIC, MERGEABLE
    uniform sample (no RNG seed; any shard split unions to the same
    sketch, pytest-pinned idempotent) that doubles as a KMV
    distinct-count estimate. The corpus side reduces to DISTINCT
    (lang, tok) in one partial-agg exchange; the artifact is <= k
    rows per group. Exact distinct counts ride alongside; the referee
    replays hash, rank, and estimator arithmetic bit for bit."""
    d = t(spark, sf_dir, "documents")
    occ = _par(d).select(
        "lang", F.explode(TS.tokens(F.lower(F.col("text")))).alias("tok")
    )
    sk = SK.kmv_build(occ, F.col("tok"), ["lang"], k=64)
    est = SK.kmv_estimate(sk, ["lang"], k=64)
    exact = occ.groupBy("lang").agg(
        F.countDistinct("tok").cast("bigint").alias("exact_distinct")
    )
    return (
        sk.join(est, "lang")
        .join(exact, "lang")
        .select(
            "lang", "rank", F.col("v").alias("tok"), "h",
            "n_kept", "est_milli", "exact_distinct",
        )
    )


SQL_KMV_SAMPLE = f"""
WITH base AS (SELECT lang, {_TOKS} AS tk FROM documents),
occ AS (SELECT lang, tk[i] AS tok
        FROM base, unnest(range(1, len(tk)+1)) AS u(i)),
{{kmv_frag}},
ex AS (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
       FROM occ GROUP BY lang)
SELECT s.lang, s.rank, s.v AS tok, s.h, e.n_kept, e.est_milli, ex.exact_distinct
FROM kmvs s JOIN kmve e USING (lang) JOIN ex USING (lang)
""".replace("{kmv_frag}", SK.sql_kmv("occ", "tok", ["lang"], k=64).lstrip())


def quantile_sketch_doclen(spark, sf_dir):
    """Log-linear quantile sketch (functions/sketch.q_build, the
    HdrHistogram/DDSketch bucket store): per-language p50/p90/p99 of
    document token counts from a mergeable (lang, bucket, cnt) table
    — one map-side-combined exchange, <= (64-s)*2^s rows per group,
    shard merge by SUM, quantile walk over the bounded rows. The
    exact r-th-smallest value (same rank rule, computed by window
    row_number) rides alongside; pytest pins the relative-error law
    |est - exact| <= exact * 2^-(s+1). The referee replays the bucket
    and rank arithmetic bit for bit in DuckDB."""
    qms = [500, 900, 990]
    d = t(spark, sf_dir, "documents")
    src = d.select("lang", TS.token_count(F.col("text")).alias("n_tokens"))
    sk = SK.q_build(src, F.col("n_tokens"), ["lang"], sub_bits=5)
    est = SK.q_quantiles(sk, ["lang"], qms, sub_bits=5)
    vals = src.select(
        "lang", F.greatest(F.col("n_tokens").cast("bigint"), F.lit(1)).alias("v")
    )
    wn = vals.withColumn(
        "rn", F.row_number().over(W.partitionBy("lang").orderBy("v"))
    ).withColumn("nn", F.count("*").over(W.partitionBy("lang")))
    qx = (
        wn.withColumn(
            "q_milli",
            F.explode(F.array(*[F.lit(q).cast("bigint") for q in qms])),
        )
        .filter(F.col("rn") == F.expr("q_milli * (nn - 1) DIV 1000 + 1"))
        .select("lang", "q_milli", F.col("v").cast("bigint").alias("exact"))
    )
    return est.join(qx, ["lang", "q_milli"]).select(
        "lang", "q_milli",
        F.col("est").cast("bigint").alias("est"),
        "exact",
        F.col("n").cast("bigint").alias("n"),
    )


SQL_QUANTILE_SKETCH = f"""
WITH src AS (SELECT lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
{{q_frag}},
vals AS (SELECT lang, GREATEST(n_tokens, 1) AS v FROM src),
rn AS (SELECT lang, v, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY v) AS rn,
              COUNT(*) OVER (PARTITION BY lang) AS nn FROM vals),
qx AS (SELECT lang, CAST(q_milli AS BIGINT) AS q_milli, CAST(v AS BIGINT) AS exact
       FROM rn, unnest([500,900,990]) AS u(q_milli)
       WHERE rn = q_milli * (nn - 1) // 1000 + 1)
SELECT e.lang, e.q_milli, e.est, qx.exact, e.n
FROM qest e JOIN qx USING (lang, q_milli)
""".replace(
    "{q_frag}",
    SK.sql_q_quantiles("src", "n_tokens", ["lang"], [500, 900, 990], sub_bits=5).lstrip(),
)


def markdown_escape(spark, sf_dir):
    """Markdown escaping (§2.7; reference export_markdown.py:7-9)."""
    d = t(spark, sf_dir, "documents")
    src = F.concat(F.lit("*"), F.substring("text", 1, 40), F.lit("* [link](url) #x"))
    return d.select(
        "doc_id",
        F.regexp_replace(src, r"([`*{}\[\]()#+!~|-])", r"\\$1").alias("escaped"),
    )


SQL_MD_ESCAPE = """
SELECT doc_id,
  regexp_replace('*' || substr(text,1,40) || '* [link](url) #x',
                 '([`*{}\\[\\]()#+!~|-])', '\\\\\\1', 'g') AS escaped
FROM documents
"""


# ===================================================================
# dedup / similarity (MinHash-LSH, quantized ANN)
# ===================================================================


def minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (8 hashes, 4 bands of 2,
    3-word shingles) — same md5-derived hashes on both engines."""
    d = t(spark, sf_dir, "documents")
    return DD.lsh_candidate_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, shingle_n=3
    )


def _sql_minhash(j):
    return (
        "list_min(list_transform(s, x -> "
        f"('0x' || substr(md5('{j}:' || x), 1, 15))::BIGINT))"
    )


def _sql_minhash_ctes(src: str) -> str:
    """MinHash-LSH banding CTEs (8 hashes, 4 bands of 2, 3-shingles)
    over any source relation exposing (doc_id, text). The short-text
    fallback shingle COALESCEs to '' because DuckDB's
    array_to_string([]) is NULL where Python's ' '.join([]) is '' —
    without it an empty document gets a NULL signature and silently
    drops out of every bucket (diverging from the engine, which banks
    empty docs into one shared bucket)."""
    return f"""toks AS (SELECT doc_id, {_TOKS} AS tk FROM {src}),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(tk) >= 3
      THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]
      ELSE [COALESCE(array_to_string(tk, ' '), '')] END) AS s
  FROM toks),
sig AS (
  SELECT doc_id,
    {_sql_minhash(0)} AS h0, {_sql_minhash(1)} AS h1,
    {_sql_minhash(2)} AS h2, {_sql_minhash(3)} AS h3,
    {_sql_minhash(4)} AS h4, {_sql_minhash(5)} AS h5,
    {_sql_minhash(6)} AS h6, {_sql_minhash(7)} AS h7
  FROM sh),
banded AS (
  SELECT doc_id, 0 AS band, h0::VARCHAR || ',' || h1::VARCHAR AS key FROM sig
  UNION ALL SELECT doc_id, 1, h2::VARCHAR || ',' || h3::VARCHAR FROM sig
  UNION ALL SELECT doc_id, 2, h4::VARCHAR || ',' || h5::VARCHAR FROM sig
  UNION ALL SELECT doc_id, 3, h6::VARCHAR || ',' || h7::VARCHAR FROM sig)"""


_SQL_MINHASH_CTES = _sql_minhash_ctes("documents")

SQL_MINHASH_PAIRS = f"""
WITH {_SQL_MINHASH_CTES}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""

# Hot-bucket guard used by the COMPOSED pipelines (dedup.
# lsh_candidate_pairs max_bucket_size): buckets above the cap emit
# star pairs (min id ↔ member) instead of all-pairs — O(B) rows, same
# downstream connectivity. The referee implements the identical rule.
_LSH_CAP = 64
_SQL_CAPPED_PAIRS = f"""bsz AS (
  SELECT doc_id, band, key,
         COUNT(*) OVER (PARTITION BY band, key) AS n,
         MIN(doc_id) OVER (PARTITION BY band, key) AS mn
  FROM banded),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bsz a JOIN bsz b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
   AND a.n <= {_LSH_CAP}
  UNION
  SELECT DISTINCT mn AS id_a, doc_id AS id_b
  FROM bsz WHERE n > {_LSH_CAP} AND doc_id <> mn
)"""


def training_set_selection(spark, sf_dir):
    """The end-to-end training-data selection a 100 TB corpus pipeline
    actually runs, as ONE composed query: language ID + quality gates
    (stopword/punctuation permille, token floor) + exact-dedup keeper +
    near-dup cluster keeper → a per-document selected flag with every
    contributing signal exposed. All components reuse the individually
    oracle-checked operators; the DuckDB referee recomputes the whole
    composition (including the recursive-closure near-dup clusters)."""
    from yomitoku_spark.operators import components as CC

    d = t(spark, sf_dir, "documents")
    stop = TS.stopword_count(F.col("text"), "en")
    punct = F.length(F.regexp_replace("text", r"[\w\s]", ""))
    n_tok = TS.token_count(F.col("text"))
    stats = _par(d).select(
        "doc_id",
        TS.lang_id(F.col("text")).alias("lang_detected"),
        n_tok.alias("n_tokens"),
        F.floor(F.lit(1000) * stop / F.greatest(n_tok, F.lit(1)))
        .cast("bigint")
        .alias("stop_permille"),
        F.floor(F.lit(1000) * punct / F.greatest(F.length("text"), F.lit(1)))
        .cast("bigint")
        .alias("punct_permille"),
    )
    exact = DD.exact_dedup(d, "text", "doc_id").select(
        "doc_id", F.lit(True).alias("exact_keeper")
    )
    pairs = DD.lsh_candidate_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=_LSH_CAP,
    )
    comp = CC.label_propagation(
        # compress=True: pointer jumping keeps the sweep count
        # O(log diameter) even on chain-shaped duplicate families
        # (star-capped LSH graphs are usually shallow, but a 100 TB
        # corpus can chain near-dups arbitrarily long — r5 advice)
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        compress=True,
        # size-based strategy pick: tiny materialized graphs run one
        # union-find task instead of >= 3 sweep jobs (identical labels)
        small_graph_edges=CC.SMALL_GRAPH_EDGES,
    ).withColumnRenamed("node", "doc_id")
    out = (
        stats.join(exact, "doc_id", "left")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "lang_detected",
            "n_tokens",
            "stop_permille",
            "punct_permille",
            F.coalesce("exact_keeper", F.lit(False)).alias("exact_keeper"),
            (F.coalesce("label", F.col("doc_id")) == F.col("doc_id")).alias(
                "neardup_keeper"
            ),
        )
    )
    selected = (
        (F.col("lang_detected") == "en")
        & (F.col("stop_permille") >= 60)
        & (F.col("punct_permille") <= 200)
        & (F.col("n_tokens") >= 10)
        & F.col("exact_keeper")
        & F.col("neardup_keeper")
    )
    # flags as INT (driver-canonicalizer-safe: no boolean columns cross
    # the value-hash boundary anywhere in the registry)
    return out.withColumn("selected", selected).select(
        "doc_id", "lang_detected", "n_tokens", "stop_permille", "punct_permille",
        F.col("exact_keeper").cast("int").alias("exact_keeper"),
        F.col("neardup_keeper").cast("int").alias("neardup_keeper"),
        F.col("selected").cast("int").alias("selected"),
    )


# training-set selection referee, split so composed queries can reuse
# the same CTE chain (corpus_index_build appends the IVF list build)
_TSS_CTES = f"""{_SQL_MINHASH_CTES},
{_SQL_CAPPED_PAIRS},
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS node, a AS peer FROM und
  UNION
  SELECT r.node, u.b FROM reach r JOIN und u ON u.a = r.peer
),
comp AS (SELECT node, MIN(peer) AS cluster FROM reach GROUP BY node),
exact AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
),
stats AS (
  SELECT doc_id,
    CASE
      WHEN length(regexp_replace(text, '[^\\x{{3040}}-\\x{{30ff}}\\x{{3400}}-\\x{{9fff}}]', '', 'g')) * 4
           >= length(text) THEN 'cjk'
      WHEN GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) = 0
           THEN 'und'
      WHEN {_sql_votes('en')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'en'
      WHEN {_sql_votes('es')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'es'
      WHEN {_sql_votes('de')} = GREATEST({_sql_votes('en')},{_sql_votes('es')},{_sql_votes('de')},{_sql_votes('fr')}) THEN 'de'
      ELSE 'fr'
    END AS lang_detected,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
    CAST(FLOOR(1000.0 * len(list_filter({_TOKS},
          w -> w IN ('the','and','of','to','a','in','is','it','that','for')))
         / GREATEST(len({_TOKS}), 1)) AS BIGINT) AS stop_permille,
    CAST(FLOOR(1000.0 * length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g'))
         / GREATEST(length(text), 1)) AS BIGINT) AS punct_permille
  FROM documents
)"""

_TSS_FINAL = f"""SELECT s.doc_id, s.lang_detected, s.n_tokens, s.stop_permille, s.punct_permille,
       CAST(e.doc_id IS NOT NULL AS INT) AS exact_keeper,
       CAST(COALESCE(c.cluster, s.doc_id) = s.doc_id AS INT) AS neardup_keeper,
       CAST((s.lang_detected = 'en' AND s.stop_permille >= 60
        AND s.punct_permille <= 200 AND s.n_tokens >= 10
        AND e.doc_id IS NOT NULL
        AND COALESCE(c.cluster, s.doc_id) = s.doc_id) AS INT) AS selected
FROM stats s
LEFT JOIN exact e ON e.doc_id = s.doc_id
LEFT JOIN comp c ON c.node = s.doc_id
"""

SQL_TRAINING_SELECTION = f"""
WITH RECURSIVE {_TSS_CTES}
{_TSS_FINAL}
"""


def doc_near_dup_clusters(spark, sf_dir):
    """End-to-end near-dup REDUCTION (the composition a training-data
    pipeline actually runs): MinHash-LSH candidate pairs → global
    weakly-connected components by iterative min-label propagation (the
    100 TB path — no single-task union-find; each sweep is one
    self-join + min-agg, and near-dup components are near-cliques so 5
    sweeps ≥ any realistic diameter) → one canonical keeper per
    cluster (the minimum doc_id); untouched documents keep themselves.
    The DuckDB referee computes the exact transitive closure, so the
    row also proves the sweep count converged."""
    from yomitoku_spark.operators import components as CC

    d = t(spark, sf_dir, "documents")
    pairs = DD.lsh_candidate_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=_LSH_CAP,
    )
    comp = CC.label_propagation(
        # compress=True: pointer jumping keeps the sweep count
        # O(log diameter) even on chain-shaped duplicate families
        # (star-capped LSH graphs are usually shallow, but a 100 TB
        # corpus can chain near-dups arbitrarily long — r5 advice)
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        compress=True,
        # size-based strategy pick: tiny materialized graphs run one
        # union-find task instead of >= 3 sweep jobs (identical labels)
        small_graph_edges=CC.SMALL_GRAPH_EDGES,
    )
    return (
        d.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).cast("bigint").alias("cluster"),
            (F.coalesce("label", F.col("doc_id")) == F.col("doc_id"))
            .cast("int")
            .alias("keeper"),
        )
    )


SQL_NEAR_DUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
{_SQL_CAPPED_PAIRS},
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS node, a AS peer FROM und
  UNION
  SELECT r.node, u.b FROM reach r JOIN und u ON u.a = r.peer
),
comp AS (SELECT node, MIN(peer) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id, CAST(COALESCE(c.cluster, d.doc_id) AS BIGINT) AS cluster,
       CAST(COALESCE(c.cluster, d.doc_id) = d.doc_id AS INT) AS keeper
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def embedding_topk(spark, sf_dir):
    """Brute-force top-3 neighbors per vector by quantized dot product
    (integer-exact across engines; the float cosine variant lives in
    operators.similarity and is pytest-verified)."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk_quantized(e, e, "vec_id", "embedding", k=3, scale=1000)


SQL_EMB_TOPK = """
WITH pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
    list_sum([CAST(ROUND(CAST(a.embedding[i] AS DOUBLE)*1000) AS BIGINT)
              * CAST(ROUND(CAST(b.embedding[i] AS DOUBLE)*1000) AS BIGINT)
              for i in range(1, len(a.embedding)+1)])::BIGINT AS dot_q
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id)
SELECT query_id, corpus_id, dot_q, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id ASC) AS rank
  FROM pairs
) WHERE rank <= 3
"""


def normalize_dates(spark, sf_dir):
    """Japanese-date normalization (§2.7; reference era-date parse,
    extractor/normalizer.py:57-127): render o_orderdate as a 日本語 date
    string, run it through date_iso, recover the ISO date."""
    from yomitoku_spark.functions.normalize import date_iso

    o = t(spark, sf_dir, "orders")
    jdate = F.concat(
        F.year("o_orderdate").cast("string"), F.lit("年"),
        F.month("o_orderdate").cast("string"), F.lit("月"),
        F.dayofmonth("o_orderdate").cast("string"), F.lit("日"),
    )
    return o.select("o_orderkey", date_iso(jdate).alias("iso_date"))


SQL_NORM_DATES = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso_date FROM orders
"""


def phone_format(spark, sf_dir):
    """Digit-count phone formatting (§2.7; reference normalizer.py:46-54)."""
    from yomitoku_spark.functions.normalize import phone

    c = t(spark, sf_dir, "customer")
    digits11 = F.lpad(((F.col("c_custkey") * 7919) % 100000000000).cast("string"), 11, "0")
    return c.select("c_custkey", phone(digits11).alias("phone"))


SQL_PHONE = """
SELECT c_custkey,
  substr(d,1,3) || '-' || substr(d,4,4) || '-' || substr(d,8,4) AS phone
FROM (SELECT c_custkey, lpad(((c_custkey*7919) % 100000000000)::VARCHAR, 11, '0') d
      FROM customer)
"""


def price_histogram(spark, sf_dir):
    """Integer-bucket histogram (§2.2; the size-distribution histogram
    behind the reference's ruby filter, document_analyzer.py:95-152 —
    bucket → count, here on exact integer cents)."""
    l = t(spark, sf_dir, "lineitem")
    bucket = F.floor(_cents("l_extendedprice") / 500000).cast("bigint")
    return l.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


SQL_HISTOGRAM = """
SELECT CAST(FLOOR(CAST(ROUND(l_extendedprice*100) AS BIGINT) / 500000.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
"""


def pivot_event_types(spark, sf_dir):
    """Pivot via conditional aggregation (§2.4 / guide 'pivot')."""
    e = t(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("bigint")
    aggs = [
        F.sum(F.when(F.col("event_type") == typ, milli).otherwise(F.lit(0))).alias(
            f"{typ}_milli"
        )
        for typ in ["click", "view", "purchase"]
    ]
    return e.groupBy("user_id").agg(*aggs)


SQL_PIVOT = """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type='click' THEN CAST(ROUND(value*1000) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_milli,
  CAST(SUM(CASE WHEN event_type='view' THEN CAST(ROUND(value*1000) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_milli,
  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(ROUND(value*1000) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_milli
FROM events GROUP BY user_id
"""


def union_distinct_nations(spark, sf_dir):
    """Set ops: union + distinct (§2.6; reference element-group union,
    document_analyzer.py:570)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SQL_UNION = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


def gap_detection(spark, sf_dir):
    """Interval-complement gap detection via window lead (§2.2; the
    span-level analog of the reference's hole synthesis,
    table_cell_detector.py:105-131: missing cells = complement of the
    covered intervals)."""
    l = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    nxt = F.lead("l_linenumber").over(w)
    return (
        l.select("l_orderkey", "l_linenumber", nxt.alias("next_line"))
        .filter(F.col("next_line") - F.col("l_linenumber") > 1)
        .select(
            "l_orderkey",
            (F.col("l_linenumber") + 1).alias("gap_start"),
            (F.col("next_line") - 1).alias("gap_end"),
        )
    )


SQL_GAPS = """
SELECT l_orderkey, l_linenumber + 1 AS gap_start, next_line - 1 AS gap_end
FROM (
  SELECT l_orderkey, l_linenumber,
         LEAD(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS next_line
  FROM lineitem
) WHERE next_line - l_linenumber > 1
"""


def adjacency_join(spark, sf_dir):
    """Right-adjacency theta join (§2.2; reference is_right_adjacent,
    utils/misc.py:299-427: edge-to-edge distance bound + y-overlap)."""
    boxes = _part_boxes(spark, sf_dir)
    a, b = boxes.alias("a"), boxes.alias("b")
    y_overlap = F.least(F.col("a.box.y2"), F.col("b.box.y2")) - F.greatest(
        F.col("a.box.y1"), F.col("b.box.y1")
    )
    gap = F.col("b.box.x1") - F.col("a.box.x2")
    pred = (
        (F.col("a.p_partkey") != F.col("b.p_partkey"))
        & (gap >= 0)
        & (gap <= 2)
        & (y_overlap > 0)
    )
    return a.join(b, pred).select(
        F.col("a.p_partkey").alias("left_key"), F.col("b.p_partkey").alias("right_key")
    )


SQL_ADJACENCY = f"""
WITH pb AS ({SQL_PART_BOX})
SELECT a.p_partkey AS left_key, b.p_partkey AS right_key
FROM pb a JOIN pb b
  ON a.p_partkey != b.p_partkey
 AND b.x1 - a.x2 >= 0 AND b.x1 - a.x2 <= 2
 AND LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1) > 0
"""


def page_select(spark, sf_dir):
    """Range + set page selection (§2.1; reference --pages 1,2,5-10,
    cli/main.py:94-118)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderkey").between(100, 200) | F.col("o_orderkey").isin(1, 5, 9000)
    ).select("o_orderkey", "o_custkey")


SQL_PAGE_SELECT = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_orderkey BETWEEN 100 AND 200 OR o_orderkey IN (1, 5, 9000)
"""


def zip_join_positional(spark, sf_dir):
    """Positional zip join (§2.3; reference det⋈rec merge by index,
    ocr.py:6-24): row_number both sides → equi-join on position. The
    reference zip is per-page, so the windows are PARTITIONED by the
    group key (n_regionkey here, page in the pipeline) — positions are
    assigned group-locally and never serialize through one partition."""
    n = t(spark, sf_dir, "nation")
    wa = W.partitionBy("n_regionkey").orderBy("n_nationkey")
    wb = W.partitionBy("n_regionkey").orderBy("n_name")
    a = n.select("n_regionkey", "n_nationkey", F.row_number().over(wa).alias("pos"))
    b = n.select(
        F.col("n_regionkey").alias("rk_b"),
        F.col("n_name"),
        F.row_number().over(wb).alias("pos"),
    )
    return a.join(
        b, (a.n_regionkey == b.rk_b) & (a.pos == b.pos)
    ).select("n_regionkey", a.pos.alias("pos"), "n_nationkey", "n_name")


SQL_ZIP = """
SELECT a.n_regionkey, a.pos, a.n_nationkey, b.n_name
FROM (SELECT n_regionkey, n_nationkey,
             ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) pos
      FROM nation) a
JOIN (SELECT n_regionkey, n_name,
             ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) pos
      FROM nation) b
  ON a.n_regionkey = b.n_regionkey AND a.pos = b.pos
"""


# ===================================================================
# extraction pipeline (non-SQL-expressible → rows-only checks)
# ===================================================================


def asof_join(spark, sf_dir):
    """As-of join composed from built-ins (Spark lacks a native one —
    guide §'Common OLAP patterns'): each event matched to the latest
    order of the same key at-or-before the event time, via theta join
    on (key, time bound) → rank-1 window with explicit tiebreak."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = e.join(
        o,
        (F.col("user_id") == F.col("o_custkey")) & (F.col("o_orderdate") <= F.col("ts")),
        "inner",
    )
    w = W.partitionBy("event_id").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "user_id", F.col("o_orderkey").alias("asof_orderkey"))
    )


SQL_ASOF = """
SELECT event_id, user_id, o_orderkey AS asof_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rk
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rk = 1
"""


def rollup_revenue(spark, sf_dir):
    """GROUP BY ROLLUP (beyond the reference — it has no grouping sets;
    SURVEY §2.4 note)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_cents("l_extendedprice")).alias("rev_cents"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("status"),
            "rev_cents",
        )
    )


SQL_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def grid_recovery(spark, sf_dir):
    """Geometric grid recovery from cell boxes (per-table line
    clustering in a grouped pandas UDF — reference
    table_structure_recognizer.py:27-85). The synthetic grid is regular,
    so the recovered (row, col) assignment has a closed-form SQL
    referee: dense_rank of the y-line within the table."""
    from yomitoku_spark.operators.grid import recover_grids

    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cells = n.crossJoin(r).select(
        F.lit("t").alias("conv_id"),
        F.lit(0).alias("turn_idx").cast("int"),
        (F.col("n_nationkey") % 3).cast("int").alias("table_id"),
        (F.col("n_nationkey") * 10 + F.col("r_regionkey")).cast("int").alias("cell_id"),
        (F.col("r_regionkey") * 50 + 1).alias("x1"),
        (F.col("n_nationkey") * 20 + 1).alias("y1"),
        ((F.col("r_regionkey") + 1) * 50 - 1).alias("x2"),
        ((F.col("n_nationkey") + 1) * 20 - 1).alias("y2"),
    )
    return recover_grids(cells)


SQL_GRID_RECOVERY = """
SELECT 't' AS conv_id, CAST(0 AS INT) AS turn_idx,
       CAST(n_nationkey % 3 AS INT) AS table_id,
       CAST(n_nationkey*10 + r_regionkey AS INT) AS cell_id,
       CAST(DENSE_RANK() OVER (PARTITION BY n_nationkey % 3, r_regionkey
                               ORDER BY n_nationkey) - 1 AS INT) AS row,
       CAST(r_regionkey AS INT) AS col,
       CAST(1 AS INT) AS row_span, CAST(1 AS INT) AS col_span
FROM nation, region
"""


def export_formats(spark, sf_dir):
    """Per-turn markdown/html/csv/json export sinks (§2.1; reference
    export_markdown.py / export_html.py:149-227 / export_csv.py:120-158
    / export_json.py:61-97) over the parquet-derived transcript corpus —
    every rendered format is reproduced by the DuckDB referee."""
    from yomitoku_spark.plans.export import export_blocks
    from yomitoku_spark.plans.pipeline import classify, featurize, order_blocks, segment_blocks
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    blocks = classify(
        featurize(order_blocks(segment_blocks(corpus_transcripts(spark, sf_dir))))
    )
    return export_blocks(blocks)


def extract_fields_kv(spark, sf_dir):
    """Declarative schema extraction over the corpus transcripts
    (reference yomitoku_extract cascade — KV key match → regex fallback
    → normalize, rule_pipeline.py:141-262). The KV tier fires on the
    variant-4 forms, the regex tier on the digit token planted in
    variant-0 prose; the DuckDB referee recomputes both."""
    from yomitoku_spark.extractor import ExtractionSchema, extract_fields
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    schema = ExtractionSchema.from_dict(
        {
            "fields": [
                {
                    "name": "invoice_no",
                    "keys": ["invoice no", "order id"],
                    "regex": r"\d{3,}",
                    "normalize": "digits",
                },
                {"name": "due_date", "keys": ["due date", "date"], "normalize": "identity"},
                {"name": "status", "keys": ["status"], "normalize": "collapse_ws"},
            ]
        }
    )
    df = extract_fields(corpus_transcripts(spark, sf_dir), schema)
    return df.filter(
        F.col("invoice_no").isNotNull()
        | F.col("due_date").isNotNull()
        | F.col("status").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        F.coalesce("invoice_no", F.lit("")).alias("invoice_no"),
        F.coalesce("due_date", F.lit("")).alias("due_date"),
        F.coalesce("status", F.lit("")).alias("status"),
    )


def simhash_pairs(spark, sf_dir):
    """60-bit SimHash digests over documents (md5-token bit votes —
    the identical computation runs in the DuckDB oracle)."""
    d = t(spark, sf_dir, "documents")
    return DD.simhash64(d, "doc_id", "text")


SQL_SIMHASH_DOCS = DD.SQL_SIMHASH.format(
    table="documents", id_col="doc_id", text_col="text"
)


def simhash_near_dup_pairs(spark, sf_dir):
    """SimHash near-dup candidate pairs: 15-bit band join over the
    60-bit signatures (4 bands → pigeonhole-complete at Hamming ≤ 3),
    refined by exact bit_count Hamming distance — the full banded
    pipeline reproduced by the DuckDB referee, not just the digests."""
    d = t(spark, sf_dir, "documents")
    return DD.simhash_near_pairs(d, "doc_id", "text")


SQL_SIMHASH_NEAR = f"""
WITH shf AS ({SQL_SIMHASH_DOCS}),
banded AS (
  SELECT id, simhash, CAST(r AS INT) AS band,
         (simhash >> CAST(r * 15 AS INT)) & 32767 AS key
  FROM shf, range(4) rr(r)
),
p AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM p WHERE hamming <= 3
"""


def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup PAIRS (threshold form of the
    similarity family): every (a < b) pair with quantized integer dot
    ≥ 400000, computed with the Arrow numpy dot over the id-ordered
    cross pairs. Exact by construction — the quadratic referee shape;
    the scale paths are the LSH/IVF candidates (ann_lsh_topk /
    ivf_flat_topk), which bound candidates per query instead."""
    e = t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    dq = SIM.dot_quantized_arrow(1000)(F.col("va"), F.col("vb")).alias("dot_q")
    return (
        pairs.select("id_a", "id_b", dq)
        .filter(F.col("dot_q") >= 400000)
    )


SQL_EMB_NEAR_DUP = """
WITH qv AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(CASE WHEN embedding[CAST(i AS INT) + 1] >= 0
              THEN FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              ELSE -FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              END AS BIGINT) AS q
  FROM embeddings, range(64) r(i)
)
SELECT qa.vec_id AS id_a, qb.vec_id AS id_b, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
FROM qv qa JOIN qv qb ON qa.i = qb.i AND qa.vec_id < qb.vec_id
GROUP BY qa.vec_id, qb.vec_id
HAVING SUM(qa.q * qb.q) >= 400000
"""


def connected_components_labels(spark, sf_dir):
    """Per-group weakly-connected components (§2.6; reference
    nx.weakly_connected_components + UnionFind,
    table_semantic_parser.py:187 / utils/union_find.py): a two-level
    anchor graph over suppliers per nation — stars s→⌊s/5⌋·5 merged by
    anchor chains ⌊s/5⌋·5→⌊s/25⌋·25 — labeled by the component's
    minimum node. The DuckDB referee computes the same labels with a
    recursive min-reachability CTE."""
    from yomitoku_spark.operators import components as CC

    s = t(spark, sf_dir, "supplier")
    g = F.col("s_nationkey").cast("bigint").alias("g")
    a5 = (F.col("s_suppkey") - F.col("s_suppkey") % 5).alias("dst")
    e1 = s.select(g, F.col("s_suppkey").alias("src"), a5)
    e2 = s.select(
        g,
        (F.col("s_suppkey") - F.col("s_suppkey") % 5).alias("src"),
        (F.col("s_suppkey") - F.col("s_suppkey") % 25).alias("dst"),
    )
    return CC.connected_components(e1.unionByName(e2), ["g"])


SQL_CC = """
WITH RECURSIVE e AS (
  SELECT CAST(s_nationkey AS BIGINT) AS g, s_suppkey AS src,
         s_suppkey - s_suppkey % 5 AS dst
  FROM supplier
  UNION ALL
  SELECT CAST(s_nationkey AS BIGINT), s_suppkey - s_suppkey % 5,
         s_suppkey - s_suppkey % 25
  FROM supplier
),
und AS (
  SELECT g, src AS a, dst AS b FROM e
  UNION SELECT g, dst, src FROM e
),
nodes AS (SELECT DISTINCT g, src AS node FROM e
          UNION SELECT DISTINCT g, dst FROM e),
reach AS (
  SELECT g, node, node AS peer FROM nodes
  UNION
  SELECT r.g, r.node, u.b AS peer
  FROM reach r JOIN und u ON u.g = r.g AND u.a = r.peer
)
SELECT g, node, CAST(MIN(peer) AS BIGINT) AS component
FROM reach GROUP BY g, node
"""


def jaccard_near_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs over documents (§ training-
    data ops): shingle equi-join with hot-shingle skew capping; the
    integer (inter, union) columns make the ≥0.5 threshold bit-exact
    across engines."""
    d = t(spark, sf_dir, "documents")
    return DD.jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, max_shingle_freq=100
    ).select("id_a", "id_b", "inter", "uni")


SQL_JACCARD = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0b\\x0c\\r]+'),
                     t -> t <> '') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(tk) >= 3
           THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
           ELSE [array_to_string(tk, ' ')] END) AS s
  FROM toks
),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) > 100),
exc AS (SELECT * FROM ex WHERE g NOT IN (SELECT g FROM hot)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM exc a JOIN exc b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b, i.inter,
       CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.inter * 1000 >= 500 * (sa.sz + sb.sz - i.inter)
"""


def ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN with integer-exact md5-sign hyperplanes and a
    quantized-dot re-rank — the full approximate pipeline (bucketing,
    candidate join, dedup, re-rank) is reproduced by the DuckDB oracle
    bit-for-bit. Recall vs brute force is measured separately in
    tests/test_operators.py."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.lsh_ann_topk_quantized(
        e, k=3, n_planes=_ANN_PLANES, n_tables=_ANN_TABLES
    )


# 5 planes x 8 tables: measured at sf0.1 this lifts recall@3 from 0.12
# (6x2, the round-3 config) to 0.55 for ~0.4 s — bench reports the
# recall so the trade stays visible round over round
_ANN_PLANES, _ANN_TABLES = 5, 8
# multi-probe config (planes, tables, flips): recall@3 0.88 at sf0.1 /
# 0.84 at sf0.01 with ~950 candidates/query at sf0.1 — the ≥0.8
# production-retrieval config, with the SAME index size as 6x8
_MP_PLANES, _MP_TABLES, _MP_FLIP = 6, 8, 4


def ann_multiprobe_topk(spark, sf_dir):
    """Multi-probe LSH ANN (Lv et al., VLDB'07): the query side probes
    its base bucket plus the 4 buckets reached by flipping its
    lowest-|margin| sign bits; the index side stays base-only, so
    recall rises (0.55 → 0.88 @3 at sf0.1) with NO extra index memory
    and no extra tables. Bucketing, probe derivation (margin-sorted bit
    flips), candidate join, and quantized re-rank are all reproduced
    bit-for-bit by the DuckDB oracle."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.lsh_ann_topk_quantized(
        e, k=3, n_planes=_MP_PLANES, n_tables=_MP_TABLES, n_flip=_MP_FLIP
    )


def _sql_ann_lsh(n_planes: int, n_tables: int, n_flip: int, k: int) -> str:
    """DuckDB twin of lsh_ann_topk_quantized: md5-sign planes, integer
    dots, base buckets, optional multi-probe (flip the n_flip
    lowest-|d| bits, ties by plane index — the stable-argsort rule),
    candidate join against BASE buckets only, quantized re-rank."""
    probes = "  SELECT vec_id, t, bucket FROM buckets"
    flips_cte = ""
    if n_flip:
        flips_cte = """
flips AS (
  SELECT vec_id, t, p,
         ROW_NUMBER() OVER (PARTITION BY vec_id, t ORDER BY ABS(d), p) AS r
  FROM dots
),"""
        probes += f"""
  UNION ALL
  SELECT b.vec_id, b.t, xor(b.bucket, CAST(1 << fl.p AS BIGINT)) AS bucket
  FROM buckets b
  JOIN flips fl ON fl.vec_id = b.vec_id AND fl.t = b.t AND fl.r <= {n_flip}"""
    return f"""
WITH planes AS (
  SELECT CAST(t AS INT) AS t, CAST(p AS INT) AS p, CAST(i AS INT) AS i,
         CASE WHEN ('0x' || substr(md5(CAST(t AS VARCHAR) || ':' ||
                    CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1))::INT
                   % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM range({n_tables}) tt(t), range({n_planes}) pp(p), range(64) ii(i)
),
qv AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(ROUND(embedding[CAST(i AS INT) + 1] * 1000) AS BIGINT) AS q
  FROM embeddings, range(64) r(i)
),
dots AS (
  SELECT qv.vec_id, pl.t, pl.p, SUM(qv.q * pl.s) AS d
  FROM qv JOIN planes pl ON pl.i = qv.i
  GROUP BY qv.vec_id, pl.t, pl.p
),
buckets AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, t
),{flips_cte}
probes AS (
{probes}
),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS corpus_id
  FROM probes a JOIN buckets b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
pairdot AS (
  SELECT c.query_id, c.corpus_id, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv qa ON qa.vec_id = c.query_id
  JOIN qv qb ON qb.vec_id = c.corpus_id AND qb.i = qa.i
  GROUP BY c.query_id, c.corpus_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= {k}
"""


SQL_ANN_LSH = _sql_ann_lsh(_ANN_PLANES, _ANN_TABLES, 0, 3)
SQL_ANN_MULTIPROBE = _sql_ann_lsh(_MP_PLANES, _MP_TABLES, _MP_FLIP, 3)


def multimodal_features(spark, sf_dir):
    """REAL multimodal decode (r5 verdict item 2 — the rows-only pin
    retired): the synthetic media table carries VALID 24-bit BMP and
    16-bit PCM WAV payloads (stdlib struct/wave encoders), and
    decode_media parses them back in Arrow batches — BMP header +
    stride-padded pixel scan, WAV PCM framing. Every decoded stat is
    closed-form in the media id, so the DuckDB referee recomputes
    width/height/px_sum/sample_rate/amp_sum from id arithmetic alone:
    the encode→decode ROUND TRIP is what the 3-axis check verifies.
    Reference analog: load_image decode-validate (data/functions.py:
    33-78)."""
    from yomitoku_spark.multimodal.media import decode_media, synthetic_media_codec

    return decode_media(synthetic_media_codec(spark, n=256)).drop("decode_error")


SQL_MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         ['image', 'audio', 'video'][CAST(i % 3 AS INT) + 1] AS kind,
         8 + (i * 37) % 33 AS w, 8 + (i * 53) % 33 AS h,
         8000 + (i % 3) * 4000 AS sr, 50 + i % 100 AS ns
  FROM range(256) r(i)
),
img AS (
  SELECT m.media_id,
         CAST(SUM((m.media_id*7 + x.x*3 + y.y*5 + c.c*11) % 256) AS BIGINT) AS px_sum
  FROM m
  JOIN range(41) x(x) ON x.x < m.w
  JOIN range(41) y(y) ON y.y < m.h
  CROSS JOIN range(3) c(c)
  WHERE m.kind <> 'audio'
  GROUP BY m.media_id
),
aud AS (
  SELECT m.media_id,
         CAST(SUM(ABS((m.media_id*13 + t.t*17) % 2001 - 1000)) AS BIGINT) AS amp_sum
  FROM m JOIN range(150) t(t) ON t.t < m.ns
  WHERE m.kind = 'audio'
  GROUP BY m.media_id
)
SELECT m.media_id, m.kind,
       CASE WHEN m.kind <> 'audio' THEN m.w END AS width,
       CASE WHEN m.kind <> 'audio' THEN m.h END AS height,
       CAST(CASE WHEN m.kind <> 'audio' THEN 24 END AS BIGINT) AS bpp,
       img.px_sum,
       CASE WHEN m.kind = 'audio' THEN m.sr END AS sample_rate,
       CAST(CASE WHEN m.kind = 'audio' THEN 1 END AS BIGINT) AS n_channels,
       CASE WHEN m.kind = 'audio' THEN m.ns END AS n_samples,
       aud.amp_sum
FROM m
LEFT JOIN img ON img.media_id = m.media_id
LEFT JOIN aud ON aud.media_id = m.media_id
"""


def _extract_corpus_result(spark, sf_dir, extract_fn):
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    res = extract_fn(corpus_transcripts(spark, sf_dir))
    return res.select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.to_json("spans").alias("spans"),
        "blocks_kept",
        "blocks_dropped",
        "chars_emitted",
    )


def multimodal_plan(spark, sf_dir):
    """The JVM-side half of the multimodal pipeline, HARD-checked:
    metadata validation (min-side floor / low-res warning), resize
    target-dimension math, and video frame-sampling counts are all pure
    column expressions over the deterministic synthetic media table —
    reproduced exactly by the DuckDB referee. Only the codec stub
    (binary payload → features/pixels) stays rows-only
    (multimodal_features)."""
    from yomitoku_spark.multimodal.media import (
        resize_media,
        sample_frames,
        synthetic_media,
        validate_media,
    )

    m = validate_media(synthetic_media(spark, n=256))
    valid = m.filter(F.col("valid"))
    rs = resize_media(valid).select("media_id", "dst_w", "dst_h")
    fr = sample_frames(valid).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("frames")
    )
    return (
        m.select("media_id", "kind", "valid", "low_res_warning")
        .join(rs, "media_id", "left")
        .join(fr, "media_id", "left")
        .select(
            "media_id",
            "kind",
            F.col("valid").cast("int").alias("valid"),
            F.col("low_res_warning").cast("int").alias("low_res_warning"),
            F.coalesce("dst_w", F.lit(-1)).cast("int").alias("dst_w"),
            F.coalesce("dst_h", F.lit(-1)).cast("int").alias("dst_h"),
            F.coalesce("frames", F.lit(-1)).cast("bigint").alias("frames"),
        )
    )


SQL_MULTIMODAL_PLAN = """
WITH m AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CASE WHEN i % 3 <> 1 THEN CAST(16 + (i*37) % 2000 AS INT) END AS w,
         CASE WHEN i % 3 <> 1 THEN CAST(16 + (i*53) % 1200 AS INT) END AS h,
         CASE WHEN i % 3 = 2 THEN CAST(1 + i % 300 AS INT) END AS nf
  FROM range(256) r(i)
),
v AS (
  SELECT *,
         CASE WHEN kind = 'audio' THEN TRUE ELSE w >= 32 AND h >= 32 END AS valid,
         kind <> 'audio' AND LEAST(w, h) < 720 AS low_res_warning
  FROM m
)
SELECT media_id, kind, CAST(valid AS INT) AS valid,
  CAST(low_res_warning AS INT) AS low_res_warning,
  CAST(COALESCE(CASE WHEN valid AND kind = 'image' THEN
    CASE WHEN GREATEST(w, h) <= 720 THEN w
         ELSE CAST(ROUND(w * 720.0 / GREATEST(w, h)) AS INT) END
  END, -1) AS INT) AS dst_w,
  CAST(COALESCE(CASE WHEN valid AND kind = 'image' THEN
    CASE WHEN GREATEST(w, h) <= 720 THEN h
         ELSE CAST(ROUND(h * 720.0 / GREATEST(w, h)) AS INT) END
  END, -1) AS INT) AS dst_h,
  CAST(COALESCE(CASE WHEN valid AND kind = 'video' THEN (nf - 1) // 30 + 1 END,
       -1) AS BIGINT) AS frames
FROM v
"""


def extract_transcripts(spark, sf_dir):
    """Flagship row, HARD-checked: the FUSED extraction pipeline (the
    exact north-rule plan — one mapInPandas stage, zero shuffles) over
    the parquet-derived transcript corpus. The corpus payloads cover
    every SQL-expressible class (prose/heading/list/code/kv/html/empty),
    so extracted text, span offsets, and keep metrics are all verified
    by the DuckDB referee. The full synthetic mix (incl. layout
    reading-order) stays registered as extract_transcripts_mix and is
    byte-checked against the pure-Python oracle in pytest."""
    from yomitoku_spark.plans.pipeline import extract

    return _extract_corpus_result(spark, sf_dir, extract)


def extract_transcripts_staged(spark, sf_dir):
    """The STAGED decomposition of the same pipeline over the same
    corpus — must produce byte-identical rows; shares the fused row's
    oracle SQL, so the driver hard-checks both engine paths."""
    from yomitoku_spark.plans.pipeline import extract_staged

    return _extract_corpus_result(spark, sf_dir, extract_staged)


def extract_transcripts_mix(spark, sf_dir):
    """The full synthetic payload mix (north-rule flagship smoke):
    layout reading-order is graph-valued (not SQL-expressible) →
    rows-only driver check; byte-equality vs the pure-Python oracle is
    enforced by tests/test_pipeline.py + the 791k-turn scaling
    checksum. The struct-array spans column is serialized to JSON so
    the driver canonicalizer can hash the rows."""
    from yomitoku_spark.datagen import transcripts_df
    from yomitoku_spark.plans.pipeline import extract

    return extract(transcripts_df(spark, n_convs=40, seed=42)).withColumn(
        "spans", F.to_json("spans")
    )


def segment_features(spark, sf_dir):
    """Long-form block features (the queryable intermediate) over the
    corpus transcripts — kinds, content lengths, link densities
    (integer permille), keep decisions, and block order all recomputed
    by the DuckDB referee."""
    from yomitoku_spark.plans.pipeline import classify, featurize, order_blocks, segment_blocks
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    blocks = classify(
        featurize(order_blocks(segment_blocks(corpus_transcripts(spark, sf_dir))))
    )
    return blocks.select(
        "conv_id",
        "turn_idx",
        "block_id",
        "source",
        "kind",
        "content_len",
        F.floor(F.lit(1000) * F.col("link_chars") / F.greatest("visible_len", F.lit(1)))
        .cast("int")
        .alias("link_permille"),
        F.col("keep").cast("int").alias("keep"),
        F.col("order").alias("blk_order"),
    )


# -- DuckDB referees for the corpus-backed extraction rows ---------------
# Expected outputs are composed from the SAME parquet-derived pieces the
# Spark corpus builder uses (sources/transcripts_corpus.py): the engine
# runs the generic pipeline, the oracle the construction rules. Offsets
# are pure length arithmetic because payloads are single-line [A-Za-z ]
# bodies glued with known literals.

from yomitoku_spark.sources import transcripts_corpus as TC  # noqa: E402

_TCNL = "chr(10)"
_TCNL2 = "chr(10) || chr(10)"


def _tc_span(start: str, end: str, kind: str) -> str:
    return (
        "'{\"start\":' || (" + start + ") || ',\"end\":' || (" + end + ") "
        "|| ',\"kind\":\"" + kind + "\"}'"
    )


def _tc_spans(*parts: str) -> str:
    inner = " || ',' || ".join(parts)
    return "'[' || " + inner + " || ']'"


_TC_ET = f"""CASE v
  WHEN 0 THEN '## ' || w || ' report' || {_TCNL2} || b || ' ref ' || d
  WHEN 1 THEN b
  WHEN 2 THEN '- one ' || w || {_TCNL} || '- two ' || w || {_TCNL2} || b
  WHEN 3 THEN '```py' || {_TCNL} || 'v = ' || w || {_TCNL} || '```' || {_TCNL2} || b
  WHEN 4 THEN '- **Invoice No**: ' || d || {_TCNL} || '- **Due Date**: 2024-03-15'
              || {_TCNL} || '- **Status**: ' || w
  WHEN 5 THEN b || {_TCNL2} || '## ' || w || ' news'
  WHEN 6 THEN ''
  ELSE CASE WHEN lw >= 3 THEN '# ' || w || {_TCNL2} ELSE '' END
       || b || {_TCNL2} || '- alpha one' || {_TCNL} || '- beta two'
END"""

_TC_SPANS = f"""CASE v
  WHEN 0 THEN {_tc_spans(_tc_span('0', 'lw+10', 'heading'),
                         _tc_span('lw+12', 'lw+lb+ld+17', 'paragraph'))}
  WHEN 1 THEN {_tc_spans(_tc_span('0', 'lb', 'paragraph'))}
  WHEN 2 THEN {_tc_spans(_tc_span('0', '2*lw+13', 'list'),
                         _tc_span('2*lw+15', '2*lw+15+lb', 'paragraph'))}
  WHEN 3 THEN {_tc_spans(_tc_span('0', 'lw+14', 'code'),
                         _tc_span('lw+16', 'lw+16+lb', 'paragraph'))}
  WHEN 4 THEN {_tc_spans(_tc_span('0', 'lw+ld+42', 'kv'))}
  WHEN 5 THEN {_tc_spans(_tc_span('lw+41', 'lw+lb+48', 'paragraph'),
                         _tc_span('lw+lb+48', '2*lw+lb+62', 'heading'))}
  WHEN 6 THEN '[]'
  ELSE CASE WHEN lw >= 3
    THEN {_tc_spans(_tc_span('0', 'lw+2', 'heading'),
                    _tc_span('lw+4', 'lw+4+lb', 'paragraph'),
                    _tc_span('lw+6+lb', 'lw+28+lb', 'list'))}
    ELSE {_tc_spans(_tc_span('lw+4', 'lw+4+lb', 'paragraph'),
                    _tc_span('lw+6+lb', 'lw+28+lb', 'list'))}
  END
END"""

SQL_EXTRACT_CORPUS = f"""
WITH {TC.SQL_CORPUS_PIECES},
expected AS (
  SELECT conv_id, turn_idx,
         {_TC_ET} AS extracted_text,
         {_TC_SPANS} AS spans,
         CASE v WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2
                WHEN 4 THEN 1 WHEN 5 THEN 2 WHEN 6 THEN 0
                ELSE CASE WHEN lw >= 3 THEN 3 ELSE 2 END END AS blocks_kept,
         CASE v WHEN 1 THEN 1 WHEN 5 THEN 1
                WHEN 7 THEN CASE WHEN lw >= 3 THEN 0 ELSE 1 END
                ELSE 0 END AS blocks_dropped
  FROM tc_base
)
SELECT conv_id, turn_idx, extracted_text, spans,
       CAST(blocks_kept AS INT) AS blocks_kept,
       CAST(blocks_dropped AS INT) AS blocks_dropped,
       CAST(length(extracted_text) AS INT) AS chars_emitted
FROM expected
"""

SQL_SEGMENT_FEATURES = f"""
WITH {TC.SQL_CORPUS_PIECES},
blocks AS (
  SELECT conv_id, turn_idx, 0 AS block_id,
         CASE WHEN v = 5 THEN 'html' ELSE 'textual' END AS source,
         CASE v WHEN 0 THEN 'heading' WHEN 1 THEN 'paragraph' WHEN 2 THEN 'list'
                WHEN 3 THEN 'code' WHEN 4 THEN 'kv' WHEN 5 THEN 'paragraph'
                ELSE 'heading' END AS kind,
         CASE v WHEN 0 THEN lw+7 WHEN 1 THEN lb WHEN 2 THEN 2*lw+8
                WHEN 3 THEN lw+14 WHEN 4 THEN lw+ld+60 WHEN 5 THEN lw
                ELSE lw END AS content_len,
         CASE WHEN v = 5 THEN 1000 ELSE 0 END AS link_permille,
         CASE WHEN v = 5 THEN FALSE WHEN v = 7 THEN lw >= 3 ELSE TRUE END AS keep
  FROM tc_base WHERE v <> 6
  UNION ALL
  SELECT conv_id, turn_idx, 1,
         CASE WHEN v = 5 THEN 'html' ELSE 'textual' END,
         'paragraph',
         CASE v WHEN 0 THEN lb+ld+5 WHEN 1 THEN 2 ELSE lb END,
         0,
         v <> 1
  FROM tc_base WHERE v IN (0,1,2,3,5,7)
  UNION ALL
  SELECT conv_id, turn_idx, 2,
         CASE WHEN v = 5 THEN 'html' ELSE 'textual' END,
         CASE WHEN v = 5 THEN 'heading' ELSE 'list' END,
         CASE WHEN v = 5 THEN lw+5 ELSE 17 END,
         0, TRUE
  FROM tc_base WHERE v IN (5,7)
)
SELECT conv_id, turn_idx, CAST(block_id AS INT) AS block_id, source, kind,
       CAST(content_len AS INT) AS content_len,
       CAST(link_permille AS INT) AS link_permille,
       CAST(keep AS INT) AS keep,
       CAST(block_id AS INT) AS blk_order
FROM blocks
"""

SQL_FIELDS_KV = f"""
WITH {TC.SQL_CORPUS_PIECES}
SELECT conv_id, turn_idx,
       d AS invoice_no,
       CASE WHEN v = 4 THEN '2024-03-15' ELSE '' END AS due_date,
       CASE WHEN v = 4 THEN w ELSE '' END AS status
FROM tc_base WHERE v IN (0, 4)
"""

_TC_HTML = f"""CASE v
  WHEN 0 THEN '<h2>' || w || ' report</h2>' || {_TCNL} || '<p>' || b || ' ref ' || d || '</p>'
  WHEN 1 THEN '<p>' || b || '</p>'
  WHEN 2 THEN '<ul><li>one ' || w || '</li><li>two ' || w || '</li></ul>' || {_TCNL} || '<p>' || b || '</p>'
  WHEN 3 THEN '<pre>```py' || {_TCNL} || 'v = ' || w || {_TCNL} || '```</pre>' || {_TCNL} || '<p>' || b || '</p>'
  WHEN 4 THEN '<ul><li>**Invoice No**: ' || d || '</li><li>**Due Date**: 2024-03-15</li><li>**Status**: ' || w || '</li></ul>'
  WHEN 5 THEN '<p>' || b || '</p>' || {_TCNL} || '<h2>' || w || ' news</h2>'
  ELSE CASE WHEN lw >= 3 THEN '<h1>' || w || '</h1>' || {_TCNL} ELSE '' END
       || '<p>' || b || '</p>' || {_TCNL} || '<ul><li>alpha one</li><li>beta two</li></ul>'
END"""

_TC_CSV = f"""CASE v
  WHEN 0 THEN '## ' || w || ' report' || {_TCNL2} || b || ' ref ' || d
  WHEN 1 THEN b
  WHEN 2 THEN '- one ' || w || ' - two ' || w || {_TCNL2} || b
  WHEN 3 THEN '```py v = ' || w || ' ```' || {_TCNL2} || b
  WHEN 4 THEN '- **Invoice No**: ' || d || ' - **Due Date**: 2024-03-15 - **Status**: ' || w
  WHEN 5 THEN b || {_TCNL2} || '## ' || w || ' news'
  ELSE CASE WHEN lw >= 3 THEN '# ' || w || {_TCNL2} ELSE '' END
       || b || {_TCNL2} || '- alpha one - beta two'
END"""

def _sql_json_escape(expr: str) -> str:
    """JSON string-body escaping matching Spark ``to_json`` for every
    character the corpus can plausibly carry: backslash (FIRST), double
    quote, newline, tab, carriage return. Keeps the referees honest if
    a future payload variant introduces quotes/backslashes instead of
    silently diverging from to_json only then."""
    out = expr
    for raw, esc in (
        (r"'\'", r"'\\'"),
        ("'\"'", r"'\"'"),
        ("chr(10)", r"'\n'"),
        ("chr(9)", r"'\t'"),
        ("chr(13)", r"'\r'"),
    ):
        out = f"replace({out}, {raw}, {esc})"
    return out


SQL_EXPORT_FORMATS = f"""
WITH {TC.SQL_CORPUS_PIECES},
rendered AS (
  SELECT conv_id, turn_idx,
         {_TC_ET} AS markdown,
         '<html><body>' || {_TC_HTML} || '</body></html>' AS html,
         {_TC_CSV} AS csv
  FROM tc_base WHERE v <> 6
)
SELECT conv_id, turn_idx, markdown, html, csv,
       '{{"conv_id":"' || conv_id || '","turn_idx":' || CAST(turn_idx AS VARCHAR)
       || ',"extracted_text":"' || {_sql_json_escape('markdown')} || '"}}' AS json
FROM rendered
"""


def corpus_build(spark, sf_dir):
    """Composed corpus-build flagship — the full LLM training-corpus
    path as ONE plan over the parquet-derived transcripts: extraction
    (the REAL fused pipeline), quality stats on the extracted markdown
    (token floor, stopword/punct permille), exact-dedup keeper (one
    digest-partitioned window — the whole composition is ONE shuffle),
    a selection gate, and a JSON export record for every selected turn. The DuckDB referee
    recomputes every stage from the corpus construction rules: expected
    markdown via length arithmetic, the same md5 dedup, the same gates,
    manual JSON assembly (reference lifecycle: document_analyzer.py →
    export_json.py, recast as one declarative plan)."""
    from yomitoku_spark.plans.pipeline import extract
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    ex = extract(corpus_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "extracted_text"
    )
    ntok = TS.token_count(F.col("extracted_text"))
    stop = TS.stopword_count(F.col("extracted_text"), "en")
    punct = F.length(F.regexp_replace("extracted_text", r"[\w\s]", ""))
    stats = ex.select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        ntok.alias("n_tokens"),
        F.floor(F.lit(1000) * stop / F.greatest(ntok, F.lit(1)))
        .cast("bigint")
        .alias("stop_permille"),
        F.floor(
            F.lit(1000) * punct / F.greatest(F.length("extracted_text"), F.lit(1))
        )
        .cast("bigint")
        .alias("punct_permille"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("extracted_text"), r"\s+", " "))
        ).alias("digest"),
    )
    # keeper = min (conv_id, turn_idx) per normalized digest, as a
    # row_number window over digest partitions: ONE digest-hash shuffle
    # and the extraction pipeline runs ONCE. (The agg + join-back
    # alternative re-evaluates the extraction MapInPandas in both join
    # branches — column pruning makes the branches non-identical so
    # neither ReuseExchange nor AQE stage reuse can dedupe them. The
    # window partitions by digest, so parallelism matches the agg.)
    wk = W.partitionBy("digest").orderBy("conv_id", "turn_idx")
    j = stats.withColumn("__rk", F.row_number().over(wk))
    keeper = F.col("__rk") == 1
    selected = keeper & (F.col("n_tokens") >= 6) & (F.col("punct_permille") <= 150)
    return j.select(
        "conv_id",
        "turn_idx",
        "n_tokens",
        "stop_permille",
        "punct_permille",
        keeper.cast("int").alias("exact_keeper"),
        selected.cast("int").alias("selected"),
        F.when(
            selected,
            F.to_json(F.struct("conv_id", "turn_idx", "extracted_text")),
        )
        .otherwise(F.lit(""))
        .alias("record"),
    )


SQL_CORPUS_BUILD = f"""
WITH {TC.SQL_CORPUS_PIECES},
ext AS (
  SELECT conv_id, turn_idx, {_TC_ET} AS et FROM tc_base
),
ctoks AS (
  SELECT conv_id, turn_idx, et,
         list_filter(regexp_split_to_array(trim(lower(et)), '\\s+'), w -> w != '') AS tk
  FROM ext
),
cstats AS (
  SELECT conv_id, turn_idx, et,
    CAST(len(tk) AS BIGINT) AS n_tokens,
    CAST(FLOOR(1000.0 * len(list_filter(tk,
          w -> w IN ('the','and','of','to','a','in','is','it','that','for')))
         / GREATEST(len(tk), 1)) AS BIGINT) AS stop_permille,
    CAST(FLOOR(1000.0 * length(regexp_replace(et, '[a-zA-Z0-9_\\s]', '', 'g'))
         / GREATEST(length(et), 1)) AS BIGINT) AS punct_permille,
    md5(trim(regexp_replace(lower(et), '\\s+', ' ', 'g'))) AS digest
  FROM ctoks
),
ckept AS (
  SELECT *, CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY digest ORDER BY conv_id, turn_idx) = 1
                 THEN 1 ELSE 0 END AS exact_keeper
  FROM cstats
)
SELECT conv_id, turn_idx, n_tokens, stop_permille, punct_permille, exact_keeper,
  CASE WHEN exact_keeper = 1 AND n_tokens >= 6 AND punct_permille <= 150
       THEN 1 ELSE 0 END AS selected,
  CASE WHEN exact_keeper = 1 AND n_tokens >= 6 AND punct_permille <= 150
       THEN '{{"conv_id":"' || conv_id || '","turn_idx":' || CAST(turn_idx AS VARCHAR)
            || ',"extracted_text":"' || {_sql_json_escape('et')} || '"}}'
       ELSE '' END AS record
FROM ckept
"""


def corpus_build_full(spark, sf_dir):
    """corpus_build + the NEAR-DUP stage — the whole brief as one
    composed query: REAL fused extraction → quality permilles →
    exact-dedup keeper (digest window) → star-capped MinHash-LSH over
    the EXTRACTED markdown → fixpoint label-propagation clustering →
    near-dup cluster keeper → gate → JSON record.

    Scale shape: the extracted+scored corpus is materialized ONCE
    (localCheckpoint) because it feeds three consumers — the signature
    stage, the iterative LP loop, and the final join — and a lazy plan
    would re-run the extraction MapInPandas for each (the corpus_build
    window trick only covers single-consumer pipelines). The near-dup
    key is the (conv, turn) bijection back to doc_id, so the DuckDB
    referee (recursive closure over the SAME capped pairs) joins on it
    directly."""
    from yomitoku_spark.operators import components as CC
    from yomitoku_spark.plans.pipeline import extract
    from yomitoku_spark.sources.transcripts_corpus import corpus_transcripts

    ex = extract(corpus_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "extracted_text"
    )
    ntok = TS.token_count(F.col("extracted_text"))
    stop = TS.stopword_count(F.col("extracted_text"), "en")
    punct = F.length(F.regexp_replace("extracted_text", r"[\w\s]", ""))
    wk = W.partitionBy("digest").orderBy("conv_id", "turn_idx")
    stats = (
        ex.select(
            "conv_id",
            "turn_idx",
            "extracted_text",
            # conv_id='c<doc_id%25>', turn_idx=doc_id//25 → doc_id
            (
                F.regexp_extract("conv_id", "([0-9]+)", 1).cast("bigint")
                + F.col("turn_idx").cast("bigint") * 25
            ).alias("turn_key"),
            ntok.alias("n_tokens"),
            F.floor(F.lit(1000) * stop / F.greatest(ntok, F.lit(1)))
            .cast("bigint")
            .alias("stop_permille"),
            F.floor(
                F.lit(1000) * punct / F.greatest(F.length("extracted_text"), F.lit(1))
            )
            .cast("bigint")
            .alias("punct_permille"),
            F.md5(
                F.trim(F.regexp_replace(F.lower("extracted_text"), r"\s+", " "))
            ).alias("digest"),
        )
        .withColumn("__rk", F.row_number().over(wk))
        .withColumn("exact_keeper", (F.col("__rk") == 1).cast("int"))
        .drop("__rk")
    )
    stats = stats.localCheckpoint(eager=True)
    pairs = DD.lsh_candidate_pairs(
        stats, "turn_key", "extracted_text", n_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=_LSH_CAP,
    )
    comp = CC.label_propagation(
        # compress=True: pointer jumping keeps the sweep count
        # O(log diameter) even on chain-shaped duplicate families
        # (star-capped LSH graphs are usually shallow, but a 100 TB
        # corpus can chain near-dups arbitrarily long — r5 advice)
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        compress=True,
        # size-based strategy pick: tiny materialized graphs run one
        # union-find task instead of >= 3 sweep jobs (identical labels)
        small_graph_edges=CC.SMALL_GRAPH_EDGES,
    ).withColumnRenamed("node", "turn_key")
    j = stats.join(comp, "turn_key", "left")
    neardup = F.coalesce("label", F.col("turn_key")) == F.col("turn_key")
    selected = (
        (F.col("exact_keeper") == 1)
        & neardup
        & (F.col("n_tokens") >= 6)
        & (F.col("punct_permille") <= 150)
    )
    return j.select(
        "conv_id",
        "turn_idx",
        "n_tokens",
        "stop_permille",
        "punct_permille",
        "exact_keeper",
        neardup.cast("int").alias("neardup_keeper"),
        selected.cast("int").alias("selected"),
        F.when(
            selected,
            F.to_json(F.struct("conv_id", "turn_idx", "extracted_text")),
        )
        .otherwise(F.lit(""))
        .alias("record"),
    )


SQL_CORPUS_BUILD_FULL = f"""
WITH RECURSIVE {TC.SQL_CORPUS_PIECES},
cext AS (
  SELECT conv_id, turn_idx, did AS doc_id, {_TC_ET} AS text FROM tc_base
),
{_sql_minhash_ctes('cext')},
{_SQL_CAPPED_PAIRS},
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS node, a AS peer FROM und
  UNION
  SELECT r.node, u.b FROM reach r JOIN und u ON u.a = r.peer
),
comp AS (SELECT node, MIN(peer) AS cluster FROM reach GROUP BY node),
cstats AS (
  SELECT conv_id, turn_idx, doc_id, text,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
    CAST(FLOOR(1000.0 * len(list_filter({_TOKS},
          w -> w IN ('the','and','of','to','a','in','is','it','that','for')))
         / GREATEST(len({_TOKS}), 1)) AS BIGINT) AS stop_permille,
    CAST(FLOOR(1000.0 * length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g'))
         / GREATEST(length(text), 1)) AS BIGINT) AS punct_permille,
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest
  FROM cext
),
ckept AS (
  SELECT *, CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY digest ORDER BY conv_id, turn_idx) = 1
                 THEN 1 ELSE 0 END AS exact_keeper
  FROM cstats
)
SELECT k.conv_id, k.turn_idx, k.n_tokens, k.stop_permille, k.punct_permille,
  k.exact_keeper,
  CAST(COALESCE(c.cluster, k.doc_id) = k.doc_id AS INT) AS neardup_keeper,
  CAST((k.exact_keeper = 1 AND COALESCE(c.cluster, k.doc_id) = k.doc_id
        AND k.n_tokens >= 6 AND k.punct_permille <= 150) AS INT) AS selected,
  CASE WHEN k.exact_keeper = 1 AND COALESCE(c.cluster, k.doc_id) = k.doc_id
            AND k.n_tokens >= 6 AND k.punct_permille <= 150
       THEN '{{"conv_id":"' || k.conv_id || '","turn_idx":' || CAST(k.turn_idx AS VARCHAR)
            || ',"extracted_text":"' || {_sql_json_escape('k.text')} || '"}}'
       ELSE '' END AS record
FROM ckept k LEFT JOIN comp c ON c.node = k.doc_id
"""


# ===================================================================
# semantic layout parsing (§2.3 joins / §2.7 — the rule cascade,
# geometric KV recovery, table-field match, template override)
# ===================================================================

from yomitoku_spark.operators import adjacency as AJ  # noqa: E402
from yomitoku_spark.sources import layout as LY  # noqa: E402


def _sql_ov(a: str, b: str) -> str:
    return (
        f"GREATEST(LEAST({a}.x2,{b}.x2)-GREATEST({a}.x1,{b}.x1),0)"
        f"*GREATEST(LEAST({a}.y2,{b}.y2)-GREATEST({a}.y1,{b}.y1),0)"
    )


def _sql_norm(expr: str) -> str:
    return f"replace(replace({expr}, ' ', ''), '　', '')"


def adjacency_rules(spark, sf_dir):
    """Full adjacency rule family over synthetic part boxes (§2.2;
    reference utils/misc.py:299-427 soft/hard/nest/child). Squared-
    integer predicates — bit-exact vs the SQL twin. The coarse
    |Δx|,|Δy| < 60 prefilter is part of the query spec on both engines
    (adjacency implies proximity; the prefilter keeps the theta join's
    candidate count linear-ish in practice)."""
    parts = _part_boxes(spark, sf_dir)
    a = parts.select(F.col("p_partkey").alias("a_key"), F.col("box").alias("abox")).alias("a")
    b = parts.select(F.col("p_partkey").alias("b_key"), F.col("box").alias("bbox_")).alias("b")
    pre = (
        (F.col("a_key") != F.col("b_key"))
        & (F.abs(F.col("abox.y1") - F.col("bbox_.y1")) < 60)
        & (F.abs(F.col("abox.x1") - F.col("bbox_.x1")) < 60)
    )
    j = a.join(b, pre)
    cols = {
        "r_soft": AJ.right_adjacent("abox", "bbox_", "soft"),
        "r_hard": AJ.right_adjacent("abox", "bbox_", "hard"),
        "r_nest": AJ.right_adjacent("abox", "bbox_", "nest"),
        "b_soft": AJ.bottom_adjacent("abox", "bbox_", "soft"),
        "b_hard": AJ.bottom_adjacent("abox", "bbox_", "hard"),
        "b_nest": AJ.bottom_adjacent("abox", "bbox_", "nest"),
        "b_child": AJ.bottom_adjacent("abox", "bbox_", "child"),
    }
    out = j.select(
        "a_key",
        "b_key",
        *[v.cast("int").alias(k) for k, v in cols.items()],
        SP.vertical_aspect("abox").cast("int").alias("a_vertical"),
    )
    return out.filter((F.col("r_soft") == 1) | (F.col("b_soft") == 1))


SQL_ADJ_RULES = f"""
WITH pb AS ({SQL_PART_BOX})
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
  CAST({AJ.sql_right_adjacent('a', 'b', 'soft')} AS INT) AS r_soft,
  CAST({AJ.sql_right_adjacent('a', 'b', 'hard')} AS INT) AS r_hard,
  CAST({AJ.sql_right_adjacent('a', 'b', 'nest')} AS INT) AS r_nest,
  CAST({AJ.sql_bottom_adjacent('a', 'b', 'soft')} AS INT) AS b_soft,
  CAST({AJ.sql_bottom_adjacent('a', 'b', 'hard')} AS INT) AS b_hard,
  CAST({AJ.sql_bottom_adjacent('a', 'b', 'nest')} AS INT) AS b_nest,
  CAST({AJ.sql_bottom_adjacent('a', 'b', 'child')} AS INT) AS b_child,
  CAST((a.y2 - a.y1) > 2 * (a.x2 - a.x1) AS INT) AS a_vertical
FROM pb a JOIN pb b
  ON a.p_partkey <> b.p_partkey
 AND ABS(a.y1 - b.y1) < 60 AND ABS(a.x1 - b.x1) < 60
WHERE {AJ.sql_right_adjacent('a', 'b', 'soft')}
   OR {AJ.sql_bottom_adjacent('a', 'b', 'soft')}
"""


def search_cells_adjacent(spark, sf_dir):
    """Directional cell search relative to key text (§2.3; reference
    TableSemanticContentsSchema.search_cells_{right_of,left_of,below,
    upper}_key_text, schemas/table_semantic_parser.py:213-274): cells
    whose space-stripped contents contain the query are the keys; each
    direction returns every non-group cell soft-adjacent to a key in
    that direction. All four directions over the form corpus, one row
    per (doc, direction, cell). The corpus derivation is
    materialized once — each direction joins two consumers of it,
    so a lazy plan would re-run the supplier-union build 8x."""
    cells = LY.form_cells(spark, sf_dir).localCheckpoint(eager=True)
    out = None
    for d in ("right", "left", "below", "upper"):
        part = SEM.search_cells_directional(cells, "hkey3", d).select(
            "doc_id", F.lit(d).alias("direction"), "cell_id"
        )
        out = part if out is None else out.unionByName(part)
    return out


def _sql_search_dir(direction: str, pred: str) -> str:
    return f"""
SELECT DISTINCT t.doc_id, '{direction}' AS direction, t.cell_id
FROM sc_keys k JOIN sc_tgts t ON t.doc_id = k.doc_id AND ({pred})"""


SQL_SEARCH_CELLS = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_FORM_CELLS},
sc_keys AS (
  SELECT * FROM fc_cells
  WHERE role <> 'group' AND contents <> ''
    AND contains(replace(replace(contents, ' ', ''), '　', ''), 'hkey3')
),
sc_tgts AS (SELECT * FROM fc_cells WHERE role <> 'group')
{_sql_search_dir('right', AJ.sql_right_adjacent('k', 't'))}
UNION ALL {_sql_search_dir('left', AJ.sql_right_adjacent('t', 'k'))}
UNION ALL {_sql_search_dir('below', AJ.sql_bottom_adjacent('k', 't'))}
UNION ALL {_sql_search_dir('upper', AJ.sql_bottom_adjacent('t', 'k'))}
"""


def search_cells_lookup(spark, sf_dir):
    """Cell lookup surfaces (§2.3; reference search_cells_by_bbox —
    ≥50% containment in a query box, schemas/table_semantic_parser.py:
    202-211 — and search_cells_by_query — space-stripped substring
    match, :276-287) over the form corpus, one row per (doc, method,
    matched cell). Both lookups are pure predicates over the same
    corpus derivation, which is materialized once."""
    cells = LY.form_cells(spark, sf_dir).localCheckpoint(eager=True)
    by_q = SEM.search_cells_by_query(cells, "hkey3").select(
        "doc_id", F.lit("query").alias("method"), "cell_id"
    )
    by_b = SEM.search_cells_by_bbox(cells, [0, 0, 300, 200]).select(
        "doc_id", F.lit("bbox").alias("method"), "cell_id"
    )
    return by_q.unionByName(by_b)


SQL_SEARCH_LOOKUP = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_FORM_CELLS}
SELECT doc_id, 'query' AS method, cell_id FROM fc_cells
WHERE role <> 'group' AND contents IS NOT NULL AND contents <> ''
  AND contains(replace(replace(contents, ' ', ''), '　', ''), 'hkey3')
UNION ALL
SELECT doc_id, 'bbox' AS method, cell_id FROM fc_cells
WHERE role <> 'group'
  AND GREATEST(LEAST(300, x2) - GREATEST(0, x1), 0)
    * GREATEST(LEAST(200, y2) - GREATEST(0, y1), 0) * 1000
    >= 500 * (x2 - x1) * (y2 - y1)
"""


def kv_items_geometric(spark, sf_dir):
    """Geometric KV recovery over the deterministic form corpus (§2.3;
    reference kv_parser.py:14-345). The engine runs the full
    group-match → adjacency-DAG → orientation-vote → DFS parser per
    document; the DuckDB oracle recomputes the expected items for this
    corpus from the same squared-integer adjacency predicates + vote."""
    from yomitoku_spark.operators.kv_graph import parse_kv_items

    return parse_kv_items(LY.form_cells(spark, sf_dir))


def _sql_kv_cte() -> str:
    """CTE chain: fc_base/fc_cells → matched (cell→group argmax) →
    adjacency pairs → per-group orientation vote → adopted+keyless
    (as ``kvall``)."""
    ovgc = _sql_ov("g", "c")
    return f"""{LY.SQL_FORM_BASE},{LY.SQL_FORM_CELLS},
ng AS (SELECT * FROM fc_cells WHERE role <> 'group'),
gr AS (SELECT * FROM fc_cells WHERE role = 'group'),
matched AS (
  SELECT c.doc_id, c.cell_id, c.role, c.x1, c.y1, c.x2, c.y2, c.contents,
         g.cell_id AS group_id
  FROM ng c JOIN gr g
    ON g.doc_id = c.doc_id
   AND {ovgc} * 5 > (c.x2-c.x1)*(c.y2-c.y1)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c.doc_id, c.cell_id
            ORDER BY CAST({ovgc} AS DOUBLE)/((g.x2-g.x1)*(g.y2-g.y1)) DESC,
                     g.cell_id) = 1
),
pr AS (
  SELECT h.doc_id, h.group_id, h.cell_id AS key_cell, h.contents AS key_text,
         c.cell_id AS value_cell, c.contents AS value_text
  FROM matched h JOIN matched c
    ON h.doc_id = c.doc_id AND h.group_id = c.group_id
   AND h.role = 'header' AND c.role IN ('cell','empty')
   AND {AJ.sql_right_adjacent('h', 'c')}
),
pd AS (
  SELECT h.doc_id, h.group_id, h.cell_id AS key_cell, h.contents AS key_text,
         c.cell_id AS value_cell, c.contents AS value_text
  FROM matched h JOIN matched c
    ON h.doc_id = c.doc_id AND h.group_id = c.group_id
   AND h.role = 'header' AND c.role IN ('cell','empty')
   AND {AJ.sql_bottom_adjacent('h', 'c')}
),
vote AS (
  SELECT doc_id, group_id,
         COUNT(DISTINCT CASE WHEN d='R' THEN value_cell END) AS h_cnt,
         COUNT(DISTINCT CASE WHEN d='D' THEN value_cell END) AS v_cnt
  FROM (SELECT doc_id, group_id, value_cell, 'R' AS d FROM pr
        UNION ALL SELECT doc_id, group_id, value_cell, 'D' FROM pd)
  GROUP BY doc_id, group_id
),
adopted AS (
  SELECT p.doc_id, p.key_cell AS key_cells, p.key_text,
         p.value_cell, p.value_text, 'H' AS dir
  FROM pr p JOIN vote v ON p.doc_id = v.doc_id AND p.group_id = v.group_id
  WHERE v.v_cnt <= v.h_cnt
  UNION ALL
  SELECT p.doc_id, p.key_cell, p.key_text, p.value_cell, p.value_text, 'V'
  FROM pd p JOIN vote v ON p.doc_id = v.doc_id AND p.group_id = v.group_id
  WHERE v.v_cnt > v.h_cnt
),
kvall AS (
  SELECT * FROM adopted
  UNION ALL
  SELECT c.doc_id, '' AS key_cells, '' AS key_text,
         c.cell_id AS value_cell, c.contents AS value_text, '' AS dir
  FROM ng c
  WHERE c.role IN ('cell','empty')
    AND NOT EXISTS (SELECT 1 FROM adopted a
                    WHERE a.doc_id = c.doc_id AND a.value_cell = c.cell_id)
)"""


SQL_KV_GEOMETRIC = f"""
WITH {_sql_kv_cte()}
SELECT doc_id, key_cells, key_text, value_cell, value_text, dir FROM kvall
"""


def kv_dict_view(spark, sf_dir):
    """KV items → merged dict rows (reference TableSemanticContentsView
    .kv_items_to_dict with merge_values=True,
    schemas/table_semantic_parser.py:462-514) over the geometric KV
    parse of the form corpus: keys are '_'-joined space-stripped key
    cell contents; same-key values merge under the axis-spread sort.
    The referee recomputes the parse (the kvall CTE chain) AND the
    view."""
    from yomitoku_spark.operators.kv_graph import parse_kv_items

    cells = LY.form_cells(spark, sf_dir)
    return SEM.kv_items_to_dict(cells, parse_kv_items(cells), merge_values=True)


_SQL_SAFE = "replace(replace(coalesce({c}, ''), ' ', ''), '　', '')"

SQL_KV_DICT = f"""
WITH {_sql_kv_cte()},
kparts AS (
  SELECT doc_id, value_cell, unnest(string_split(key_cells, '/')) AS p,
         generate_subscripts(string_split(key_cells, '/'), 1) AS ord
  FROM kvall
),
kres AS (
  SELECT kp.doc_id, kp.value_cell,
         string_agg({_SQL_SAFE.format(c='c.contents')}, '_' ORDER BY kp.ord)
           AS key_str
  FROM kparts kp LEFT JOIN ng c
    ON c.doc_id = kp.doc_id AND c.cell_id = kp.p
  GROUP BY kp.doc_id, kp.value_cell
),
kvvals AS (
  SELECT kr.doc_id, kr.key_str, kr.value_cell,
         {_SQL_SAFE.format(c='c.contents')} AS v,
         COALESCE(c.x1, 0) AS x1, COALESCE(c.y1, 0) AS y1
  FROM kres kr LEFT JOIN ng c
    ON c.doc_id = kr.doc_id AND c.cell_id = kr.value_cell
)
SELECT doc_id, key_str AS key,
  CASE WHEN COUNT(*) = 1 THEN MIN(v)
       WHEN MAX(y1) - MIN(y1) >= MAX(x1) - MIN(x1)
       THEN string_agg(v, chr(10) ORDER BY y1, x1, value_cell)
       ELSE string_agg(v, chr(10) ORDER BY x1, y1, value_cell) END AS value
FROM kvvals GROUP BY doc_id, key_str
"""


def llm_extract_kv(spark, sf_dir):
    """LLM-assisted extraction loop, end to end and DETERMINISTIC
    (§2.9 / reference entry point 4, extractor/pipeline.py:139-198):
    geometric KV parse → per-document cell-id-annotated prompt →
    KeyMatchStubClient (a mock model that answers from the prompt text
    alone by key matching) → JSON parse → resolver → schema normalizer
    pass. Because the stub is a pure function of the prompt, the whole
    composed pipeline has a closed form: the referee recomputes the KV
    parse (kvall CTE), space-squashes the joined key contents, picks
    each field's first match in the prompt's (y1, x1, value_cell)
    order, and applies the numeric normalizer as a regexp."""
    from yomitoku_spark.extractor_llm import LLMSchema, llm_extract
    from yomitoku_spark.operators.kv_graph import parse_kv_items

    # two consumers (KV parse + prompt assembly) — materialize once
    cells = LY.form_cells(spark, sf_dir).localCheckpoint(eager=True)
    schema = LLMSchema.from_dict(
        {"fields": [
            {"name": "supplier_name", "description": "hkey2"},
            {"name": "balance_digits", "description": "hkey5",
             "normalize": "numeric"},
            {"name": "missing_field", "description": "nosuchkey"},
        ]}
    )
    out = llm_extract(cells, parse_kv_items(cells), schema,
                      paragraphs=LY.form_paragraphs(spark, sf_dir))
    return out.select("doc_id", "field", "value", "raw_text",
                      "confidence", "source", "cell_id")


# The stub squashes Python-\s whitespace; key/value contents in the
# form corpus are ASCII, so the ASCII regex classes below are exact.
SQL_LLM_EXTRACT_KV = f"""
WITH {_sql_kv_cte()},
kjoin AS (
  SELECT kp.doc_id, kp.value_cell,
         string_agg(regexp_replace(coalesce(c.contents, ''), '[\\s　]+', '', 'g'),
                    '' ORDER BY kp.ord) AS key_sq
  FROM (SELECT doc_id, value_cell,
               unnest(string_split(key_cells, '/')) AS p,
               generate_subscripts(string_split(key_cells, '/'), 1) AS ord
        FROM kvall WHERE key_cells <> '') kp
  LEFT JOIN ng c ON c.doc_id = kp.doc_id AND c.cell_id = kp.p
  GROUP BY kp.doc_id, kp.value_cell
),
kvv AS (
  SELECT kj.doc_id, kj.key_sq, kj.value_cell,
         replace(coalesce(c.contents, ''), chr(10), ' ') AS vtext,
         c.y1, c.x1
  FROM kjoin kj JOIN ng c
    ON c.doc_id = kj.doc_id AND c.cell_id = kj.value_cell
),
fields AS (SELECT * FROM (VALUES
    ('supplier_name', 'hkey2', NULL),
    ('balance_digits', 'hkey5', 'numeric'),
    ('missing_field', 'nosuchkey', NULL)
  ) AS f(field, probe, norm)),
docs AS (SELECT DISTINCT doc_id FROM fc_cells),
hits AS (
  SELECT k.doc_id, f.field, f.norm, k.vtext, k.value_cell,
         ROW_NUMBER() OVER (PARTITION BY k.doc_id, f.field
                            ORDER BY k.y1, k.x1, k.value_cell) AS rn
  FROM kvv k JOIN fields f ON k.key_sq LIKE '%' || f.probe || '%'
)
SELECT d.doc_id, f.field,
  COALESCE(CASE WHEN f.norm = 'numeric'
                THEN regexp_replace(h.vtext, '[^0-9.+-]', '', 'g')
                ELSE h.vtext END, '') AS value,
  COALESCE(h.vtext, '') AS raw_text,
  CASE WHEN h.vtext IS NULL THEN 'low' ELSE 'high' END AS confidence,
  CASE WHEN h.vtext IS NULL THEN 'not_found' ELSE 'kv' END AS source,
  h.value_cell AS cell_id
FROM docs d CROSS JOIN fields f
LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h
  ON h.doc_id = d.doc_id AND h.field = f.field
"""


def grid_dag_units(spark, sf_dir):
    """Reference-mode (adjacency-DAG) grid recovery, distributed
    (§2.3; reference grid_parser.py:442-608 via operators/grid_dag.py
    — the algorithm whose dag-mode output matches the reference's own
    goldens 10/10, tests/test_golden_parity.py). The form-table corpus
    has FIXED geometry across documents, so the unit expansion has a
    closed form the referee pins: T0 splits across its two child
    columns, T1 keeps its own head column because its data rows sit
    28px below (> the 20px soft-adjacency threshold, so no D-edge
    forms and no split happens — the reference's distance rule, not a
    bug), giving every document the same (4, 5) matrix."""
    from yomitoku_spark.operators.grid_dag import parse_grid_dag

    cells = LY.form_table_cells(spark, sf_dir)
    return parse_grid_dag(cells, lambda recs: [recs]).select(
        "doc_id", "grid_id", "n_row", "n_col", "row", "col", "cell_id"
    )


SQL_GRID_DAG_UNITS = f"""
WITH {{form_base}},{{table_corpus}},
expected(cell_id, row, col) AS (VALUES
  ('T0', 0, 0), ('T0', 0, 1), ('T1', 0, 2),
  ('Ha', 1, 0), ('Hb', 1, 1),
  ('D20', 2, 0), ('D21', 2, 1), ('D22', 2, 3), ('D23', 2, 4),
  ('S', 3, 0), ('D31', 3, 1), ('D32', 3, 3), ('D33', 3, 4))
SELECT d.doc_id, CAST(0 AS INT) AS grid_id, CAST(4 AS INT) AS n_row,
       CAST(5 AS INT) AS n_col, CAST(e.row AS INT) AS row,
       CAST(e.col AS INT) AS col, e.cell_id
FROM (SELECT DISTINCT doc_id FROM ft_cells) d CROSS JOIN expected e
""".format(form_base=LY.SQL_FORM_BASE, table_corpus=LY.SQL_TABLE_CORPUS.lstrip())


def ivf_flat_topk(spark, sf_dir):
    """IVF-flat ANN: deterministic coarse quantizer (lowest-id corpus
    vectors as centroids), argmax cell assignment, 2-probe search,
    quantized-dot re-rank — the inverted-list scale path, fully
    reproduced in the DuckDB oracle."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.ivf_flat_topk(e, n_cells=8, n_probe=2, k=3)


def _sql_ivf(n_cells: int, n_probe: int, k: int) -> str:
    return f"""
WITH qv AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(CASE WHEN embedding[CAST(i AS INT) + 1] >= 0
              THEN FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              ELSE -FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              END AS BIGINT) AS q
  FROM embeddings, range(64) r(i)
),
cent AS (
  SELECT vec_id AS cent_id, i, q FROM qv
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_cells})
),
cdots AS (
  SELECT v.vec_id, c.cent_id, SUM(v.q * c.q) AS d
  FROM qv v JOIN cent c ON c.i = v.i
  GROUP BY v.vec_id, c.cent_id
),
ranked AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cent_id) AS rk
  FROM cdots
),
lists AS (SELECT vec_id AS corpus_id, cent_id AS cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM ranked WHERE rk <= {n_probe}),
cand AS (
  SELECT DISTINCT p.query_id, l.corpus_id
  FROM probes p JOIN lists l ON l.cell = p.cell
  WHERE p.query_id <> l.corpus_id
),
pairdot AS (
  SELECT c.query_id, c.corpus_id, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv qa ON qa.vec_id = c.query_id
  JOIN qv qb ON qb.vec_id = c.corpus_id AND qb.i = qa.i
  GROUP BY c.query_id, c.corpus_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= {k}
"""


SQL_IVF = _sql_ivf(8, 2, 3)


def ivf_scaled_topk(spark, sf_dir):
    """IVF-flat at a PRODUCTION-SHAPED configuration: n_cells grows
    with the corpus (~sqrt(n): 64 cells on the 15k-vector sf0.1 table)
    so each query re-ranks ~n_probe/n_cells of the corpus instead of a
    quarter of it — the knob that keeps candidate counts flat as the
    table grows. 12 probes: measured at sf0.1 recall@3 0.53 (vs 0.43
    at 8) for the same wall, still under a fifth of the corpus per
    query. Same plan, same oracle construction as ivf_flat_topk."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.ivf_flat_topk(e, n_cells=64, n_probe=12, k=3)


SQL_IVF_SCALED = _sql_ivf(64, 12, 3)


def ivf_lloyd_topk(spark, sf_dir):
    """IVF-flat ANN with 2 integer-exact Lloyd refinement sweeps over
    the deterministic seeds (the production centroid-training step —
    recall lever; the plan shape matches ivf_flat_topk). Assignment,
    round-half-away centroid means, probing, and re-rank are all int64
    arithmetic, so the DuckDB oracle unrolls the identical training as
    CTEs and matches bit-for-bit."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.ivf_flat_topk(e, n_cells=8, n_probe=2, k=3, lloyd_iters=2)


def _sql_lloyd_iter(prev: str, cur: str) -> str:
    """One Lloyd sweep as CTE text: assign to argmax-dot centroid
    (ties → lowest cell), then per-(cell, dim) round-half-away mean;
    empty cells keep the previous centroid."""
    return f"""
d{cur} AS (
  SELECT v.vec_id, c.cell, SUM(v.q * c.c) AS d
  FROM qv v JOIN {prev} c ON c.i = v.i
  GROUP BY v.vec_id, c.cell
),
a{cur} AS (
  SELECT vec_id, cell FROM d{cur}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) = 1
),
s{cur} AS (
  SELECT a.cell, q.i, CAST(SUM(q.q) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM a{cur} a JOIN qv q ON q.vec_id = a.vec_id
  GROUP BY a.cell, q.i
),
c{cur} AS (
  SELECT cell, i,
         CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
              ELSE -((2*(-s) + n) // (2*n)) END AS c
  FROM s{cur}
  UNION ALL
  SELECT p.cell, p.i, p.c FROM {prev} p
  WHERE p.cell NOT IN (SELECT cell FROM s{cur})
)"""


SQL_IVF_LLOYD = f"""
WITH qv AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(CASE WHEN embedding[CAST(i AS INT) + 1] >= 0
              THEN FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              ELSE -FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              END AS BIGINT) AS q
  FROM embeddings, range(64) r(i)
),
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, vec_id
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
),
c0 AS (SELECT s.cell, q.i, q.q AS c FROM seeds s JOIN qv q ON q.vec_id = s.vec_id),
{_sql_lloyd_iter('c0', '1')},
{_sql_lloyd_iter('c1', '2')},
sd AS (
  SELECT v.vec_id, c.cell, SUM(v.q * c.c) AS d
  FROM qv v JOIN c2 c ON c.i = v.i
  GROUP BY v.vec_id, c.cell
),
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rk
  FROM sd
),
lists AS (SELECT vec_id AS corpus_id, cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE rk <= 2),
cand AS (
  SELECT DISTINCT p.query_id, l.corpus_id
  FROM probes p JOIN lists l ON l.cell = p.cell
  WHERE p.query_id <> l.corpus_id
),
pairdot AS (
  SELECT c.query_id, c.corpus_id, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv qa ON qa.vec_id = c.query_id
  JOIN qv qb ON qb.vec_id = c.corpus_id AND qb.i = qa.i
  GROUP BY c.query_id, c.corpus_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= 3
"""


# -- clustered-embedding ANN (the production retrieval regime) ------------

# 50 Rademacher cluster centers at weight 0.25 over the raw embeddings:
# same-cluster cosine ~0.8, cross ~0 — the mixture-like shape of real
# retrieval corpora (near-uniform vectors make every ANN method look
# like brute force and hide where IVF wins). 64 cells ≈ sqrt(corpus),
# 2 Lloyd sweeps, 4 probes: measured recall@3 = 1.0 at a 6% scan
# fraction at sf0.1 (vs ann_multiprobe's 0.88 at 48% on the raw
# near-uniform table) — the scale-safe high-recall config.
_CL_N, _CL_W = 50, 0.25
_CL_CELLS, _CL_PROBE, _CL_LLOYD = 64, 4, 2


def _clustered_vecs(spark, sf_dir):
    # the clustered table DERIVES from the driver's embeddings parquet
    # (rather than a datagen variant) because the correctness gate runs
    # every query against /root/testdata tables — a deterministic,
    # SQL-reproducible derivation keeps the 3-axis oracle check intact
    e = t(spark, sf_dir, "embeddings")
    # materialized ONCE per invocation: the clustered-ANN queries
    # consume the derived table from 3-5 subtrees (codebook collect,
    # assignment, encode, quantized re-rank sides) and left lazy each
    # re-ran the derivation map (guide §2.4)
    return SIM.clustered_embeddings(
        e, n_clusters=_CL_N, weight=_CL_W
    ).localCheckpoint(eager=True)


def embedding_clustered_topk(spark, sf_dir):
    """Exact quantized-dot top-3 over the DERIVED clustered embedding
    table (operators.similarity.clustered_embeddings — md5-Rademacher
    centers, SQL-reproducible) — the brute-force referee that
    ann_ivf_clustered_topk's recall is measured against in bench."""
    c = _clustered_vecs(spark, sf_dir)
    return SIM.brute_force_topk_quantized(c, c, "vec_id", "cvec", k=3)


def ann_ivf_clustered_topk(spark, sf_dir):
    """IVF-flat ANN on clustered embeddings at the production trade:
    sqrt-n cells, 2 integer-exact Lloyd sweeps, 4 probes → measured
    recall@3 = 1.0 scanning ~6% of the corpus per query (sf0.1; bench
    records recall AND candidates/query each round). The whole pipeline
    — cluster derivation, centroid training, assignment, probing,
    re-rank — is bit-reproduced by the DuckDB oracle."""
    c = _clustered_vecs(spark, sf_dir)
    return SIM.ivf_flat_topk(
        c, "vec_id", "cvec", n_cells=_CL_CELLS, n_probe=_CL_PROBE, k=3,
        lloyd_iters=_CL_LLOYD,
    )


# DuckDB twin of clustered_embeddings + quantization: md5-parity
# Rademacher signs (table 0 of signed_planes_md5 → key '0:{c}:{i}'),
# cvec = embedding + 0.25*sign, q = round-half-away(cvec * 1000)
_SQL_CL_QV = f"""signs AS (
  SELECT CAST(c AS BIGINT) AS c, CAST(i AS INT) AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(c AS VARCHAR) || ':' ||
                    CAST(i AS VARCHAR)), 1, 1))::INT % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM range({_CL_N}) cc(c), range(64) ii(i)
),
qv AS (
  SELECT e.vec_id, sg.i,
         CAST(CASE WHEN CAST(e.embedding[sg.i + 1] AS DOUBLE) + {_CL_W} * sg.s >= 0
              THEN FLOOR(ABS((CAST(e.embedding[sg.i + 1] AS DOUBLE) + {_CL_W} * sg.s) * 1000) + 0.5)
              ELSE -FLOOR(ABS((CAST(e.embedding[sg.i + 1] AS DOUBLE) + {_CL_W} * sg.s) * 1000) + 0.5)
              END AS BIGINT) AS q
  FROM embeddings e JOIN signs sg ON sg.c = e.vec_id % {_CL_N}
)"""

SQL_EMB_CLUSTERED_TOPK = f"""
WITH {_SQL_CL_QV},
pairdot AS (
  SELECT qa.vec_id AS query_id, qb.vec_id AS corpus_id,
         CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM qv qa JOIN qv qb ON qb.i = qa.i AND qb.vec_id <> qa.vec_id
  GROUP BY qa.vec_id, qb.vec_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= 3
"""

SQL_ANN_IVF_CLUSTERED = f"""
WITH {_SQL_CL_QV},
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, vec_id
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_CL_CELLS})
),
c0 AS (SELECT s.cell, q.i, q.q AS c FROM seeds s JOIN qv q ON q.vec_id = s.vec_id),
{_sql_lloyd_iter('c0', '1')},
{_sql_lloyd_iter('c1', '2')},
sd AS (
  SELECT v.vec_id, c.cell, SUM(v.q * c.c) AS d
  FROM qv v JOIN c2 c ON c.i = v.i
  GROUP BY v.vec_id, c.cell
),
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rk
  FROM sd
),
lists AS (SELECT vec_id AS corpus_id, cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE rk <= {_CL_PROBE}),
cand AS (
  SELECT DISTINCT p.query_id, l.corpus_id
  FROM probes p JOIN lists l ON l.cell = p.cell
  WHERE p.query_id <> l.corpus_id
),
pairdot AS (
  SELECT c.query_id, c.corpus_id, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv qa ON qa.vec_id = c.query_id
  JOIN qv qb ON qb.vec_id = c.corpus_id AND qb.i = qa.i
  GROUP BY c.query_id, c.corpus_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= 3
"""


def semdedup_embeddings(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the derived clustered
    embedding table: 8-cell k-means (2 integer-exact Lloyd sweeps),
    pairwise quantized dot ONLY within each trained cell, and a keep
    flag that drops every vector with a lower-id same-cell neighbor at
    dot_q >= 4.2e6 (same-Rademacher-cluster pairs sit near 4e6·(1+r)
    with residual dot r, cross-cluster near 0 — the threshold prunes
    semantic near-dups, not whole clusters). Cost is
    sum(cell_size^2), not n^2; the DuckDB referee replays Lloyd
    training + intra-cell pairing bit-for-bit."""
    c = _clustered_vecs(spark, sf_dir)
    return SIM.semdedup_keepers(
        c, "vec_id", "cvec", n_cells=8, lloyd_iters=2, tau_q=4_200_000
    ).withColumnRenamed("id", "vec_id")


SQL_SEMDEDUP = f"""
WITH {_SQL_CL_QV},
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, vec_id
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
),
c0 AS (SELECT s.cell, q.i, q.q AS c FROM seeds s JOIN qv q ON q.vec_id = s.vec_id),
{_sql_lloyd_iter('c0', '1')},
{_sql_lloyd_iter('c1', '2')},
sd AS (
  SELECT v.vec_id, c.cell, SUM(v.q * c.c) AS d
  FROM qv v JOIN c2 c ON c.i = v.i
  GROUP BY v.vec_id, c.cell
),
assign AS (
  SELECT vec_id, cell FROM sd
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) = 1
),
pairdot AS (
  SELECT qb.vec_id AS id_b, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM assign a1
  JOIN assign a2 ON a2.cell = a1.cell AND a2.vec_id > a1.vec_id
  JOIN qv qa ON qa.vec_id = a1.vec_id
  JOIN qv qb ON qb.vec_id = a2.vec_id AND qb.i = qa.i
  GROUP BY a1.vec_id, qb.vec_id
),
dup AS (SELECT DISTINCT id_b AS vec_id FROM pairdot WHERE dot_q >= 4200000)
SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
FROM assign a LEFT JOIN dup d USING (vec_id)
"""


def corpus_index_build(spark, sf_dir):
    """The full training-data LOOP closed in one plan: run the composed
    selection pipeline (lang ID + quality + exact keeper + star-capped
    LSH + fixpoint LP), keep the surviving documents that carry an
    embedding, and BUILD the retrieval index over exactly that kept set
    — per-doc IVF cell assignment (sqrt-n cells, integer-exact argmax)
    plus the resulting inverted-list sizes. This is the artifact a
    100 TB pipeline persists after dedup+selection so retrieval serves
    only curated content; the DuckDB referee recomputes the whole
    composition (recursive near-dup closure included) and the index
    assignment bit-for-bit."""
    sel = (
        training_set_selection(spark, sf_dir)
        .filter(F.col("selected") == 1)
        .select("doc_id")
    )
    e = t(spark, sf_dir, "embeddings")
    # materialize the kept set ONCE: its lineage is the ENTIRE selection
    # pipeline, and ivf_assign_probes consumes it twice (seed collect +
    # assignment pass) — left lazy the composed selection ran ~3x
    # (guide §2.4; measured 3.6 s -> ~2 s at sf0.1)
    kept = (
        e.join(sel, e.vec_id == sel.doc_id).select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    ap = SIM.ivf_assign_probes(
        kept, "vec_id", "embedding", n_cells=_CL_CELLS, n_probe=1, lloyd_iters=0
    )
    lists = ap.select(F.col("id").alias("doc_id"), "cell")
    w = W.partitionBy("cell")
    return lists.select(
        "doc_id", "cell", F.count(F.lit(1)).over(w).alias("cell_size")
    )


SQL_CORPUS_INDEX = f"""
WITH RECURSIVE {_TSS_CTES},
sel AS ({_TSS_FINAL}),
kept AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN sel ON sel.doc_id = e.vec_id AND sel.selected = 1
),
kqv AS (
  SELECT vec_id, CAST(i AS INT) AS i,
         CAST(CASE WHEN embedding[CAST(i AS INT) + 1] >= 0
              THEN FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              ELSE -FLOOR(ABS(embedding[CAST(i AS INT) + 1] * 1000) + 0.5)
              END AS BIGINT) AS q
  FROM kept, range(64) r(i)
),
kseeds AS (
  SELECT vec_id AS cent_id FROM kept ORDER BY vec_id LIMIT {_CL_CELLS}
),
kcent AS (SELECT s.cent_id, q.i, q.q AS c FROM kseeds s JOIN kqv q ON q.vec_id = s.cent_id),
kd AS (
  SELECT v.vec_id, c.cent_id, SUM(v.q * c.c) AS d
  FROM kqv v JOIN kcent c ON c.i = v.i
  GROUP BY v.vec_id, c.cent_id
),
own AS (
  SELECT vec_id AS doc_id, cent_id AS cell FROM kd
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cent_id) = 1
)
SELECT doc_id, cell,
       CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
FROM own
"""


_PQ_CODES, _PQ_M, _PQ_RERANK = 64, 8, 32


def ann_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ over the clustered embeddings — the 100 TB ANN shape:
    inverted-list candidates scored on m=8 integer PQ codes (asymmetric
    distance via codebook lookup sums), only the ADC top-16 per query
    re-ranked with full vectors. Candidate scoring ships 8 small ints
    per corpus vector instead of 64 floats; the full-vector join is
    bounded by `rerank`, not by candidate volume. Codebooks, encoding,
    coarse cells, probing, ADC and re-rank are all integer-exact and
    reproduced bit-for-bit by the DuckDB oracle. Measured at sf0.1:
    recall@3 = 0.956 with full vectors joined for only 32 of ~126
    candidates per query (1.6% of the corpus) — the sweep showed
    16 codes/rerank 48 at 0.999 and 16/32 at 0.934; ADC alone
    (rerank 16) bottoms at 0.66, which is the quantization loss the
    re-rank stage exists to absorb."""
    c = _clustered_vecs(spark, sf_dir)
    return SIM.ivf_pq_topk(
        c, "vec_id", "cvec", n_cells=_CL_CELLS, n_probe=_CL_PROBE, k=3,
        n_codes=_PQ_CODES, m=_PQ_M, rerank=_PQ_RERANK, lloyd_iters=0,
    )


SQL_ANN_IVF_PQ = f"""
WITH {_SQL_CL_QV},
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, vec_id
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_CL_CELLS})
),
c0 AS (SELECT s.cell, q.i, q.q AS c FROM seeds s JOIN qv q ON q.vec_id = s.vec_id),
sd AS (
  SELECT v.vec_id, c.cell, SUM(v.q * c.c) AS d
  FROM qv v JOIN c0 c ON c.i = v.i
  GROUP BY v.vec_id, c.cell
),
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rk
  FROM sd
),
lists AS (SELECT vec_id AS corpus_id, cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE rk <= {_CL_PROBE}),
cand AS (
  SELECT DISTINCT p.query_id, l.corpus_id
  FROM probes p JOIN lists l ON l.cell = p.cell
  WHERE p.query_id <> l.corpus_id
),
cb AS (
  SELECT s.j, CAST(q.i // {64 // _PQ_M} AS INT) AS m, q.i, q.q AS c
  FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j, vec_id
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_CODES})) s
  JOIN qv q ON q.vec_id = s.vec_id
),
enc_d AS (
  SELECT v.vec_id, c.m, c.j, SUM((v.q - c.c) * (v.q - c.c)) AS d2
  FROM qv v JOIN cb c ON c.i = v.i
  GROUP BY v.vec_id, c.m, c.j
),
codes AS (
  SELECT vec_id, m, j AS code FROM enc_d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1
),
adc AS (
  SELECT cd.query_id, cd.corpus_id, CAST(SUM(qa.q * cb.c) AS BIGINT) AS adc_q
  FROM cand cd
  JOIN codes co ON co.vec_id = cd.corpus_id
  JOIN cb ON cb.m = co.m AND cb.j = co.code
  JOIN qv qa ON qa.vec_id = cd.query_id AND qa.i = cb.i
  GROUP BY cd.query_id, cd.corpus_id
),
shortlist AS (
  SELECT query_id, corpus_id FROM adc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY adc_q DESC, corpus_id) <= {_PQ_RERANK}
),
pairdot AS (
  SELECT s.query_id, s.corpus_id, CAST(SUM(qa.q * qb.q) AS BIGINT) AS dot_q
  FROM shortlist s
  JOIN qv qa ON qa.vec_id = s.query_id
  JOIN qv qb ON qb.vec_id = s.corpus_id AND qb.i = qa.i
  GROUP BY s.query_id, s.corpus_id
)
SELECT query_id, corpus_id, dot_q, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot_q DESC, corpus_id) rk
  FROM pairdot
) WHERE rk <= 3
"""


# -- scalar-field cascade -------------------------------------------------

from yomitoku_spark.semantic import ScalarField, TableColumn  # noqa: E402
from yomitoku_spark import semantic as SEM  # noqa: E402

CASCADE_FIELDS = [
    ScalarField("f_cellid", cell_id="c3"),
    ScalarField("f_bbox", bbox=(0, 40, 240, 62)),
    ScalarField("f_kv", description="hkey5"),
    ScalarField("f_kv_merge", description="vkey", merge_values=True, separator="|"),
    ScalarField("f_cellq", description="Supplier#"),
    ScalarField("f_para", description="note:"),
    ScalarField("f_regex", regex="[0-9]{3,}"),
    ScalarField("f_word", regex="ZQW[0-9]+X"),
    ScalarField("f_missing", description="zzznothing"),
]


def extract_scalar_cascade(spark, sf_dir):
    """Full scalar-field extraction cascade over the form corpus (§2.3;
    reference rule_pipeline.py:141-262): cell_id equi → bbox
    containment → KV key (with axis-spread merge) → cell-content
    substring → paragraph substring → regex over cells/paragraphs/words
    → not_found."""
    from yomitoku_spark.operators.kv_graph import parse_kv_items

    # cells feeds four consumers (items union, KV parse, value-cell
    # join-back, doc spine): materialize the corpus derivation ONCE
    # instead of re-running the 6-branch supplier union per consumer —
    # profiled at sf0.1 this trims ~10% wall; at scale it converts four
    # full corpus recomputes into one write + three in-memory reads.
    cells = LY.form_cells(spark, sf_dir).localCheckpoint(eager=True)
    kv = parse_kv_items(cells)
    return SEM.extract_scalar_fields(
        cells, kv, LY.form_paragraphs(spark, sf_dir), LY.form_words(spark, sf_dir),
        CASCADE_FIELDS,
    )


def _sql_field_simple(name: str, src_sql: str, source: str, conf: str) -> str:
    """Left-join-or-not_found wrapper: ``src_sql`` yields at most one
    (doc_id, v) row per document."""
    return f"""
SELECT d.doc_id, '{name}' AS field, COALESCE(x.v, '') AS value,
       CASE WHEN x.doc_id IS NOT NULL THEN '{source}' ELSE 'not_found' END AS source,
       CASE WHEN x.doc_id IS NOT NULL THEN '{conf}' ELSE 'low' END AS confidence
FROM docs d LEFT JOIN ({src_sql}) x ON x.doc_id = d.doc_id"""


def _sql_field_tiers(name: str, tiers_sql: str) -> str:
    """``tiers_sql`` yields (doc_id, tier, o1, o2, o3, v, source, conf)
    candidates; pick min (tier, o1, o2, o3) per doc, else not_found."""
    return f"""
SELECT d.doc_id, '{name}' AS field, COALESCE(x.v, '') AS value,
       COALESCE(x.source, 'not_found') AS source,
       COALESCE(x.conf, 'low') AS confidence
FROM docs d LEFT JOIN (
  SELECT doc_id, v, source, conf FROM ({tiers_sql})
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tier, o1, o2, o3) = 1
) x ON x.doc_id = d.doc_id"""


def _sql_cascade() -> str:
    n = _sql_norm
    kv_first = """
SELECT k.doc_id, 3 AS tier, c.y1 AS o1, c.x1 AS o2, k.value_cell AS o3,
       k.value_text AS v, 'kv' AS source, 'high' AS conf
FROM kvall k JOIN ng c ON c.doc_id = k.doc_id AND c.cell_id = k.value_cell
WHERE contains({key}, '{q}')"""
    cellq = """
SELECT doc_id, 4 AS tier, y1 AS o1, x1 AS o2, cell_id AS o3,
       contents AS v, 'cell_query' AS source, 'medium' AS conf
FROM ng WHERE contents <> '' AND contains({cnorm}, '{q}')"""
    para = """
SELECT doc_id, 5 AS tier, y1 AS o1, x1 AS o2, par_id AS o3,
       contents AS v, 'paragraph' AS source, 'medium' AS conf
FROM fc_paragraphs WHERE contents <> '' AND contains({cnorm}, '{q}')"""

    def desc_tiers(q: str) -> str:
        return (
            kv_first.format(key=n("k.key_text"), q=q)
            + " UNION ALL "
            + cellq.format(cnorm=n("contents"), q=q)
            + " UNION ALL "
            + para.format(cnorm=n("contents"), q=q)
        )

    def regex_tiers(rx: str) -> str:
        return f"""
SELECT doc_id, 6 AS tier, y1 AS o1, x1 AS o2, cell_id AS o3,
       regexp_extract(contents, '{rx}') AS v, 'regex' AS source, 'high' AS conf
FROM ng WHERE contents <> '' AND regexp_extract(contents, '{rx}') <> ''
UNION ALL
SELECT doc_id, 7, y1, x1, par_id, regexp_extract(contents, '{rx}'), 'regex', 'high'
FROM fc_paragraphs WHERE contents <> '' AND regexp_extract(contents, '{rx}') <> ''
UNION ALL
SELECT doc_id, 8, y1, x1, word_id, regexp_extract(content, '{rx}'), 'regex', 'high'
FROM fc_words WHERE content <> '' AND regexp_extract(content, '{rx}') <> ''"""

    f_cellid = _sql_field_simple(
        "f_cellid", "SELECT doc_id, contents AS v FROM ng WHERE cell_id = 'c3'",
        "cell_id", "high",
    )
    f_bbox = _sql_field_simple(
        "f_bbox",
        """SELECT doc_id, contents AS v FROM ng
 WHERE 2*GREATEST(LEAST(240,x2)-GREATEST(0,x1),0)*GREATEST(LEAST(62,y2)-GREATEST(40,y1),0)
       > (x2-x1)*(y2-y1)
 QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY y1, x1, cell_id) = 1""",
        "bbox", "high",
    )
    f_kv = _sql_field_tiers("f_kv", desc_tiers("hkey5"))
    merge_src = f"""
SELECT k.doc_id, 3 AS tier, 0 AS o1, 0 AS o2, '' AS o3,
       CASE WHEN MAX(c.y1)-MIN(c.y1) >= MAX(c.x1)-MIN(c.x1)
            THEN string_agg(k.value_text, '|' ORDER BY c.y1, c.x1, k.value_cell, k.value_text)
            ELSE string_agg(k.value_text, '|' ORDER BY c.x1, c.y1, k.value_cell, k.value_text)
       END AS v, 'kv' AS source, 'high' AS conf
FROM kvall k JOIN ng c ON c.doc_id = k.doc_id AND c.cell_id = k.value_cell
WHERE contains({n('k.key_text')}, 'vkey')
GROUP BY k.doc_id"""
    f_kv_merge = _sql_field_tiers(
        "f_kv_merge",
        merge_src
        + " UNION ALL "
        + cellq.format(cnorm=n("contents"), q="vkey")
        + " UNION ALL "
        + para.format(cnorm=n("contents"), q="vkey"),
    )
    f_cellq = _sql_field_tiers(
        "f_cellq",
        cellq.format(cnorm=n("contents"), q="Supplier#")
        + " UNION ALL "
        + para.format(cnorm=n("contents"), q="Supplier#"),
    )
    f_para = _sql_field_tiers(
        "f_para",
        cellq.format(cnorm=n("contents"), q="note:")
        + " UNION ALL "
        + para.format(cnorm=n("contents"), q="note:"),
    )
    f_regex = _sql_field_tiers("f_regex", regex_tiers("[0-9]{3,}"))
    f_word = _sql_field_tiers("f_word", regex_tiers("ZQW[0-9]+X"))
    f_missing = (
        "SELECT doc_id, 'f_missing' AS field, '' AS value, "
        "'not_found' AS source, 'low' AS confidence FROM docs"
    )
    fields = [f_cellid, f_bbox, f_kv, f_kv_merge, f_cellq, f_para, f_regex, f_word, f_missing]
    return "\nUNION ALL\n".join(f"({f})" for f in fields)


SQL_SCALAR_CASCADE = f"""
WITH {_sql_kv_cte()},
{LY.SQL_FORM_PARAGRAPHS.lstrip()},
{LY.SQL_FORM_WORDS.lstrip()},
docs AS (SELECT DISTINCT doc_id FROM fc_base)
{_sql_cascade()}
"""


# -- table-field extraction -----------------------------------------------

TABLE_COLUMNS = [
    TableColumn("alpha", description="vkey3"),
    TableColumn("beta", cell_id="h17"),
    TableColumn("gamma", bbox=(1165, 295, 1295, 320)),
    TableColumn("delta", description="vkey"),
]


def grid_header_derivation(spark, sf_dir):
    """Geometric col_headers derivation from raw graded cells (§2.4;
    reference grid_parser.py:635-671, 733-784): span-expanded unit
    grid → header rows (all present roles header/empty) → per-column
    header stacks ordered by y1 → stray-header demotion → same-column
    merge of columns sharing a trailing header. The corpus plants a
    2-level header (T0 spans cols 0-1 over Ha/Hb), a header spanning
    cols 2-3 alone (→ merge), and a stray data-row header (→ demote)."""
    from yomitoku_spark.operators import grid_headers as GH

    cells = LY.form_table_cells(spark, sf_dir)
    headers, _, demoted, colmap = GH.derive_grid_headers(cells)
    h = headers.join(colmap, ["doc_id", "grid_id", "col"]).select(
        "doc_id", "cell_id", "col", "hdr_pos", "merged_col",
        F.lit("header").alias("kind"),
    )
    d = demoted.select(
        "doc_id", "cell_id",
        F.lit(-1).alias("col"), F.lit(-1).alias("hdr_pos"),
        F.lit(-1).alias("merged_col"), F.lit("demoted").alias("kind"),
    )
    return h.unionByName(d)


def grid_merged_cells(spark, sf_dir):
    """Same-column merge applied to the unit grid (reference
    _merge_same_column_values + merge_cells, grid_parser.py:694-784):
    member contents concatenated in column order, ids joined with '_',
    spanning-cell duplicates folded."""
    from yomitoku_spark.operators import grid_headers as GH

    cells = LY.form_table_cells(spark, sf_dir)
    _, data, _, colmap = GH.derive_grid_headers(cells)
    return GH.merged_grid_data(cells, data, colmap).select(
        "doc_id", "row", "merged_col", "cell_ids", "contents"
    )


def split_words_across_cells(spark, sf_dir):
    """Word-box splitting at cell boundaries (§3.1 lifecycle; reference
    _split_text_across_cells, document_analyzer.py:270-423): words
    ≥0.5-contained in the table allocate to the max-overlap row/column
    line and are clipped against every covering cell; sub-noise pieces
    drop; non-table words pass through. The corpus plants a horizontal
    4-cell spanner, a word whose pieces are all noise (vanishes), a
    vertical spanner crossing a header and a data cell, and an outside
    word."""
    from yomitoku_spark.operators import grid_headers as GH
    from yomitoku_spark.operators import wordsplit as WS

    cells = GH.assign_grid(LY.form_table_cells(spark, sf_dir)).withColumnRenamed(
        "grid_id", "table_id"
    )
    # doc spine straight from the supplier scan — rebuilding the
    # 12-branch corpus union just to list doc ids would re-scan
    # supplier once per branch. Words are planted only on docs that
    # carry BOTH the i=0 and i=1 supplier rows (those rows create the
    # D20-D23 / S-D33 cells the expected pieces clip against), so the
    # query stays referee-provable even if supplier keys were 1-based
    # or the last doc were partial.
    docs = (
        t(spark, sf_dir, "supplier")
        .select(
            F.floor(F.col("s_suppkey") / 20).cast("bigint").alias("doc_id"),
            (F.col("s_suppkey") % 20).cast("int").alias("i"),
        )
        .groupBy("doc_id")
        .agg(
            F.max((F.col("i") == 0).cast("int")).alias("h0"),
            F.max((F.col("i") == 1).cast("int")).alias("h1"),
        )
        .filter((F.col("h0") == 1) & (F.col("h1") == 1))
        .select("doc_id", (F.col("doc_id") % 7).cast("int").alias("dx"))
    )

    def wrd(wid, x1, y1, x2, y2):
        return docs.select(
            "doc_id",
            F.lit(wid).alias("word_id"),
            x1.cast("int").alias("x1"), y1.cast("int").alias("y1"),
            x2.cast("int").alias("x2"), y2.cast("int").alias("y2"),
        )

    dx = F.col("dx")
    words = (
        wrd("wA", F.lit(10) + dx, F.lit(44), F.lit(250), F.lit(60))
        .unionByName(wrd("wB", F.lit(50), F.lit(44), F.lit(80), F.lit(60)))
        .unionByName(wrd("wC", F.lit(2), F.lit(20), F.lit(18), F.lit(70) + dx))
        .unionByName(wrd("wD", F.lit(400), F.lit(10), F.lit(460), F.lit(24)))
    )
    return WS.split_words_across_cells(words, cells)


SQL_SPLIT_WORDS = f"""
WITH {LY.SQL_FORM_BASE},
docs AS (
  SELECT doc_id, CAST(doc_id % 7 AS INT) AS dx FROM fc_base
  GROUP BY doc_id
  HAVING MAX(CASE WHEN i = 0 THEN 1 ELSE 0 END) = 1
     AND MAX(CASE WHEN i = 1 THEN 1 ELSE 0 END) = 1
)
SELECT doc_id, 'wA' AS word_id, 'D20' AS part,
       CAST(10+dx AS INT) AS x1, 44 AS y1, 60 AS x2, 60 AS y2 FROM docs
UNION ALL SELECT doc_id, 'wA', 'D21', 70, 44, 130, 60 FROM docs
UNION ALL SELECT doc_id, 'wA', 'D22', 140, 44, 200, 60 FROM docs
UNION ALL SELECT doc_id, 'wA', 'D23', 210, 44, 250, 60 FROM docs
UNION ALL SELECT doc_id, 'wC', 'Ha', 2, 22, 18, 38 FROM docs
UNION ALL SELECT doc_id, 'wC', 'D20', 2, 44, 18, 60 FROM docs
UNION ALL SELECT doc_id, 'wD', '', 400, 10, 460, 24 FROM docs
"""


def extract_table_field(spark, sf_dir):
    """Table-field extraction END-TO-END FROM GEOMETRY: grid_headers /
    grid_data are DERIVED from the raw form cells (grid recovery +
    header-row detection, operators/grid_headers.py) instead of being a
    synthesized input, then schema columns match grid columns by
    cell_id / bbox-overlap / normalized header-text substring (§2.3;
    reference rule_pipeline.py:265-361). A grid column goes to the
    first matching schema column; `delta` demonstrates one schema
    column collecting many grid columns (values concatenated in column
    order). Header rows surface in grid_data and are skipped by the
    all-header value-row filter, like the reference raw grid."""
    from yomitoku_spark.operators import grid_headers as GH

    cells = LY.form_cells(spark, sf_dir)
    gridded = cells.filter(
        (F.col("y1") >= 290) & (F.col("y2") <= 370) & F.col("role").isin("header", "cell")
    ).select(
        "doc_id", F.lit("gB").alias("grid_id"), "cell_id", "role",
        "x1", "y1", "x2", "y2", "contents",
    )
    gh, gd, _, _ = GH.derive_grid_headers(gridded)
    return SEM.extract_table_field(cells, gh, gd, TABLE_COLUMNS)


_SQL_FT_UNITS = """
ucols AS (
  SELECT doc_id, cx1, cx2,
         CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY cx1) - 1 AS INT) AS c
  FROM (SELECT DISTINCT doc_id, x1 AS cx1, x2 AS cx2 FROM ft_cells WHERE x2 - x1 = 60)
),
urows AS (
  SELECT doc_id, y1,
         CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY y1) - 1 AS INT) AS r
  FROM (SELECT DISTINCT doc_id, y1 FROM ft_cells)
),
units AS (
  SELECT t.doc_id, t.cell_id, t.role, t.y1, t.contents, rr.r, cc.c
  FROM ft_cells t
  JOIN ucols cc ON cc.doc_id = t.doc_id
   AND LEAST(t.x2, cc.cx2) - GREATEST(t.x1, cc.cx1) > (cc.cx2 - cc.cx1) / 2
  JOIN urows rr ON rr.doc_id = t.doc_id AND rr.y1 = t.y1
),
hrows AS (
  SELECT doc_id, r FROM units GROUP BY doc_id, r
  HAVING bool_and(role IN ('header','empty'))
),
hdrpos AS (
  SELECT doc_id, col, cell_id, y1,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, col ORDER BY y1, cell_id) - 1
              AS INT) AS hdr_pos
  FROM (SELECT DISTINCT u.doc_id, u.c AS col, u.cell_id, u.y1
        FROM units u JOIN hrows h ON h.doc_id = u.doc_id AND h.r = u.r)
),
lasth AS (
  SELECT doc_id, col, cell_id AS last_cell FROM hdrpos
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, col ORDER BY hdr_pos DESC) = 1
),
ftcolmap AS (
  SELECT doc_id, col,
         CAST(MIN(col) OVER (PARTITION BY doc_id, last_cell) AS INT) AS merged_col
  FROM lasth
)"""

SQL_GRID_HEADERS = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_TABLE_CORPUS.lstrip()},{_SQL_FT_UNITS.lstrip()}
SELECT h.doc_id, h.cell_id, CAST(h.col AS INT) AS col, h.hdr_pos,
       m.merged_col, 'header' AS kind
FROM hdrpos h JOIN ftcolmap m ON m.doc_id = h.doc_id AND m.col = h.col
UNION ALL
SELECT DISTINCT u.doc_id, u.cell_id, -1, -1, -1, 'demoted'
FROM units u
LEFT JOIN (SELECT DISTINCT doc_id, cell_id FROM hdrpos) hh
  ON hh.doc_id = u.doc_id AND hh.cell_id = u.cell_id
WHERE u.role = 'header' AND hh.cell_id IS NULL
"""

SQL_GRID_MERGED = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_TABLE_CORPUS.lstrip()},{_SQL_FT_UNITS.lstrip()},
percell AS (
  SELECT u.doc_id, u.r AS row, m.merged_col, u.cell_id,
         MIN(u.c) AS mc, MIN(u.contents) AS contents
  FROM units u JOIN ftcolmap m ON m.doc_id = u.doc_id AND m.col = u.c
  GROUP BY u.doc_id, u.r, m.merged_col, u.cell_id
)
SELECT doc_id, CAST(row AS INT) AS row, merged_col,
       string_agg(cell_id, '_' ORDER BY mc) AS cell_ids,
       trim(string_agg(contents, '' ORDER BY mc)) AS contents
FROM percell GROUP BY doc_id, row, merged_col
"""


def grid_row_dicts(spark, sf_dir):
    """Grid → row dicts (reference TableSemanticContentsView
    .grids_to_dict, schemas/table_semantic_parser.py:516-549) composed
    END-TO-END FROM GEOMETRY: col_headers and the unit grid are DERIVED
    from the raw table cells (derive_grid_headers), then each data
    position becomes a (key, value) row — header positions skipped,
    spanning cells deduped to their first column, duplicate keys
    suffixed. The corpus's stray demoted header surfaces as a VALUE
    (it is no column's header), exactly like the reference."""
    from yomitoku_spark.operators import grid_headers as GH

    cells = LY.form_table_cells(spark, sf_dir)
    headers, data, _, _ = GH.derive_grid_headers(cells)
    return SEM.grids_to_dict(cells, headers, data)


SQL_GRID_DICT = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_TABLE_CORPUS.lstrip()},{_SQL_FT_UNITS.lstrip()},
gdcols AS (
  SELECT h.doc_id, h.col,
         string_agg(replace(replace(coalesce(fc.contents, ''), ' ', ''),
                            '　', ''), '_' ORDER BY h.hdr_pos) AS key_str,
         list(h.cell_id) AS hdr_ids
  FROM hdrpos h LEFT JOIN ft_cells fc
    ON fc.doc_id = h.doc_id AND fc.cell_id = h.cell_id
  GROUP BY h.doc_id, h.col
),
gdata AS (SELECT DISTINCT doc_id, r AS row, c AS col, cell_id FROM units),
gkeep AS (
  SELECT d.doc_id, d.row, d.col, d.cell_id, g.key_str
  FROM gdata d LEFT JOIN gdcols g ON g.doc_id = d.doc_id AND g.col = d.col
  WHERE NOT COALESCE(list_contains(g.hdr_ids, d.cell_id), FALSE)
),
gfirst AS (
  SELECT * FROM gkeep
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, row, cell_id
                             ORDER BY col) = 1
),
gval AS (
  SELECT k.doc_id, k.row, k.col, k.key_str,
         replace(replace(coalesce(fc.contents, ''), ' ', ''), '　', '') AS v
  FROM gfirst k LEFT JOIN ft_cells fc
    ON fc.doc_id = k.doc_id AND fc.cell_id = k.cell_id
)
SELECT doc_id, 't0' AS grid_id, CAST(row AS INT) AS row,
  CASE WHEN COUNT(*) OVER (PARTITION BY doc_id, row, key_str) > 1
       THEN COALESCE(key_str, '') || '_' ||
            CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, row, key_str
                                    ORDER BY col) - 1 AS VARCHAR)
       ELSE COALESCE(key_str, '') END AS key,
  v AS value
FROM gval
"""

_SQL_GB_DERIVED = """
gb AS (
  SELECT * FROM fc_cells
  WHERE y1 >= 290 AND y2 <= 370 AND role IN ('header','cell')
),
gpos AS (
  SELECT doc_id, cell_id, role, contents, x1, y1, x2, y2,
         CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY y1) - 1 AS INT) AS row,
         CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY x1) - 1 AS INT) AS col
  FROM gb
),
hdr_rows_g AS (
  SELECT doc_id, row FROM gpos GROUP BY doc_id, row
  HAVING bool_and(role IN ('header','empty'))
),
fc_grid_headers AS (
  SELECT g.doc_id, 'gB' AS grid_id, g.col,
         CAST(ROW_NUMBER() OVER (PARTITION BY g.doc_id, g.col
              ORDER BY g.y1, g.cell_id) - 1 AS INT) AS hdr_pos,
         g.cell_id
  FROM gpos g JOIN hdr_rows_g hr ON hr.doc_id = g.doc_id AND hr.row = g.row
),
fc_grid_data AS (
  SELECT doc_id, 'gB' AS grid_id, row, col, cell_id FROM gpos
)"""

SQL_TABLE_FIELD = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_FORM_CELLS},{_SQL_GB_DERIVED.lstrip()},
hdr AS (
  SELECT gh.doc_id, gh.grid_id, gh.col, gh.hdr_pos, gh.cell_id,
         c.x1, c.y1, c.x2, c.y2, c.contents AS h_contents
  FROM fc_grid_headers gh
  LEFT JOIN fc_cells c ON c.doc_id = gh.doc_id AND c.cell_id = gh.cell_id
),
col_text AS (
  SELECT doc_id, grid_id, col,
         string_agg(h_contents, '' ORDER BY hdr_pos) AS header_text
  FROM hdr GROUP BY doc_id, grid_id, col
),
matches AS (
  SELECT doc_id, grid_id, col, 0 AS prio, 'alpha' AS col_name
  FROM col_text WHERE contains({_sql_norm('header_text')}, 'vkey3')
  UNION ALL
  SELECT doc_id, grid_id, col, 1, 'beta' FROM hdr WHERE cell_id = 'h17'
  UNION ALL
  SELECT doc_id, grid_id, col, 2, 'gamma' FROM hdr
  WHERE 2*GREATEST(LEAST(1295,x2)-GREATEST(1165,x1),0)
         *GREATEST(LEAST(320,y2)-GREATEST(295,y1),0) > (x2-x1)*(y2-y1)
  UNION ALL
  SELECT doc_id, grid_id, col, 3, 'delta'
  FROM col_text WHERE contains({_sql_norm('header_text')}, 'vkey')
),
col_map AS (
  SELECT doc_id, grid_id, col, col_name FROM matches
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, grid_id, col ORDER BY prio) = 1
),
hdr_ids AS (SELECT DISTINCT doc_id, grid_id, cell_id FROM fc_grid_headers),
value_rows AS (
  SELECT d.doc_id, d.grid_id, d.row
  FROM fc_grid_data d LEFT JOIN hdr_ids h
    ON h.doc_id = d.doc_id AND h.grid_id = d.grid_id AND h.cell_id = d.cell_id
  GROUP BY d.doc_id, d.grid_id, d.row
  HAVING MAX(CASE WHEN h.cell_id IS NULL THEN 1 ELSE 0 END) = 1
)
SELECT d.doc_id, d.grid_id, d.row, m.col_name,
       string_agg(COALESCE(c.contents, ''), '' ORDER BY d.col) AS value,
       string_agg(d.cell_id, '/' ORDER BY d.col) AS cell_ids
FROM fc_grid_data d
JOIN value_rows vr ON vr.doc_id = d.doc_id AND vr.grid_id = d.grid_id AND vr.row = d.row
JOIN col_map m ON m.doc_id = d.doc_id AND m.grid_id = d.grid_id AND m.col = d.col
LEFT JOIN fc_cells c ON c.doc_id = d.doc_id AND c.cell_id = d.cell_id
GROUP BY d.doc_id, d.grid_id, d.row, m.col_name
"""


# -- template override ----------------------------------------------------

TEMPLATE_ROWS = [
    # (tbl box, tcell_id, tc box or None, role_override, contents_override)
    (0, 0, 240, 230, "h0", None, None, None, None, None, "OVERRIDDEN"),
    (0, 0, 240, 230, "e40", None, None, None, None, "cell", None),
    (0, 290, 1290, 370, "h15", None, None, None, None, None, "VHDR"),
]
TEMPLATE_SCHEMA = (
    "tbl_x1 int, tbl_y1 int, tbl_x2 int, tbl_y2 int, tcell_id string, "
    "tc_x1 int, tc_y1 int, tc_x2 int, tc_y2 int, "
    "role_override string, contents_override string"
)


def template_override(spark, sf_dir):
    """Semantic-template application (§2.3/§2.9; reference
    schemas/table_semantic_parser.py:748-794): template tables matched
    to document tables (the form groups) by position argmax, then
    cell_id-matched role/contents overrides."""
    tmpl = spark.createDataFrame(TEMPLATE_ROWS, TEMPLATE_SCHEMA)
    out = SEM.apply_template(LY.form_cells(spark, sf_dir), tmpl, policy="cell_id")
    return out.select("doc_id", "cell_id", "role", "contents")


SQL_TEMPLATE_OVERRIDE = f"""
WITH {LY.SQL_FORM_BASE},{LY.SQL_FORM_CELLS},
ng AS (SELECT * FROM fc_cells WHERE role <> 'group'),
gr AS (SELECT * FROM fc_cells WHERE role = 'group'),
tmpl AS (
  SELECT * FROM (VALUES
    (0, 0, 240, 230, 'h0', NULL, 'OVERRIDDEN'),
    (0, 0, 240, 230, 'e40', 'cell', NULL),
    (0, 290, 1290, 370, 'h15', NULL, 'VHDR')
  ) AS t(tbl_x1, tbl_y1, tbl_x2, tbl_y2, tcell_id, role_override, contents_override)
),
placed AS (
  SELECT g.doc_id, g.cell_id AS table_id, t.tcell_id, t.role_override, t.contents_override
  FROM gr g JOIN tmpl t
    ON GREATEST(LEAST(t.tbl_x2,g.x2)-GREATEST(t.tbl_x1,g.x1),0)
       *GREATEST(LEAST(t.tbl_y2,g.y2)-GREATEST(t.tbl_y1,g.y1),0) * 2
       > (g.x2-g.x1)*(g.y2-g.y1)
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY g.doc_id, t.tcell_id, t.tbl_x1, t.tbl_y1
    ORDER BY CAST(GREATEST(LEAST(t.tbl_x2,g.x2)-GREATEST(t.tbl_x1,g.x1),0)
                  *GREATEST(LEAST(t.tbl_y2,g.y2)-GREATEST(t.tbl_y1,g.y1),0) AS DOUBLE)
             /((g.x2-g.x1)*(g.y2-g.y1)) DESC, g.cell_id) = 1
),
cell_tbl AS (
  SELECT c.doc_id, c.cell_id, c.role, c.contents, g.cell_id AS table_id
  FROM ng c LEFT JOIN gr g
    ON g.doc_id = c.doc_id
   AND {_sql_ov('g', 'c')} * 5 > (c.x2-c.x1)*(c.y2-c.y1)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c.doc_id, c.cell_id
            ORDER BY CAST({_sql_ov('g', 'c')} AS DOUBLE)
                     /NULLIF((g.x2-g.x1)*(g.y2-g.y1),0) DESC NULLS LAST,
                     g.cell_id) = 1
)
SELECT c.doc_id, c.cell_id,
       COALESCE(p.role_override, c.role) AS role,
       COALESCE(p.contents_override, c.contents) AS contents
FROM cell_tbl c
LEFT JOIN placed p
  ON p.doc_id = c.doc_id AND p.table_id = c.table_id AND p.tcell_id = c.cell_id
"""


# ===================================================================
# registry
# ===================================================================

# Registry order matters for the driver's correctness artifact: it
# snapshots the FIRST 50 entries only (the registry has 102, so the 52
# tail entries are outside the window). Rotation policy: new queries
# and rows absent from the last driver artifact go first; rows that
# are driver-green two consecutive rounds rotate to the tail. No row
# stays out of the window more than two rounds, and EVERY tail row is
# hard-gated by tests/test_oracle_tail.py (full DuckDB replay at
# sf0.01) — rotation never leaves a row with only a by-convention
# referee.
#
# r6 final rotation (supersedes the mid-r6 one): the driver never ran
# a snapshot mid-round, so ALL never-driver-checked rows fit the
# 50-row window at once — the 15 very-late additions (sketch family:
# cmsketch/bloom/decontam-bloom/quantile/kmv + adaptive gate,
# incremental ingest, kmv overlap, winnowing, PSI drift, BPE train/
# apply/pack, sharded packing, substring scrub) lead, then the 19
# earlier-r6 rows, then the pinned rows-only + flagship family, then
# the at-limit returns (ivf_lloyd/argmax/containment/dedup_contained/
# connected_components + multimodal_plan, which also anchors the
# boundary). Evicted to the hard-gated tail: 12 rows driver-green in
# r4+r5 (ann_multiprobe, simhash_near_dup, the relational generics
# anti_join/semi_join/dup_key/direction_vote/grid_cells/span_extents/
# topk_per_group/adjacency_join/grid_recovery, doc_near_dup_clusters)
# plus asof_join / rollup_revenue / content_concat / argmax_join,
# which now sit out their SECOND consecutive round — all four MUST
# return in the r7 window (policy cap). containment_near_pairs
# (added after the rotation, never driver-checked) took argmax_join's
# window slot.
QUERIES = {
    # --- very-late-r6 rows: never driver-checked, window-first per policy ---
    "cmsketch_token_counts": cmsketch_token_counts,
    "bloom_token_membership": bloom_token_membership,
    "decontaminate_bloom": decontaminate_bloom,
    "quantile_sketch_doclen": quantile_sketch_doclen,
    "kmv_sample_tokens": kmv_sample_tokens,
    "adaptive_length_gate": adaptive_length_gate,
    "incremental_ingest_dedup": incremental_ingest_dedup,
    "kmv_overlap_langs": kmv_overlap_langs,
    "winnowing_near_pairs": winnowing_near_pairs,
    "sketch_drift_psi": sketch_drift_psi,
    "bpe_train_merges": bpe_train_merges,
    "bpe_subword_counts": bpe_subword_counts,
    "pack_chunks_bpe": pack_chunks_bpe,
    "pack_chunks_sharded": pack_chunks_sharded,
    "doc_scrub_spans": doc_scrub_spans,
    "containment_near_pairs": containment_near_pairs,
    # --- r6-new rows getting their FIRST driver row this round ---
    "bm25_retrieval_topk": bm25_retrieval_topk,
    "doc_sliding_chunks": doc_sliding_chunks,
    "hll_distinct_tokens": hll_distinct_tokens,
    "decontaminate_ngram": decontaminate_ngram,
    "pii_redaction": pii_redaction,
    "doc_importance_weights": doc_importance_weights,
    "doc_lm_perplexity": doc_lm_perplexity,
    "semdedup_embeddings": semdedup_embeddings,
    "llm_extract_kv": llm_extract_kv,
    "grid_dag_units": grid_dag_units,
    "corpus_index_build": corpus_index_build,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "search_cells_lookup": search_cells_lookup,
    "ann_ivf_clustered_topk": ann_ivf_clustered_topk,
    "embedding_clustered_topk": embedding_clustered_topk,
    "doc_repetition_quality": doc_repetition_quality,
    "exact_substring_spans": exact_substring_spans,
    "corpus_mixture_sample": corpus_mixture_sample,
    "pack_chunks": pack_chunks,
    # --- pinned: rows-only entries + flagship family (never rotate out) ---
    "extract_transcripts_mix": extract_transcripts_mix,
    "multimodal_features": multimodal_features,
    "extract_transcripts": extract_transcripts,
    "extract_transcripts_staged": extract_transcripts_staged,
    "segment_features": segment_features,
    "extract_fields_kv": extract_fields_kv,
    "corpus_build": corpus_build,
    "corpus_build_full": corpus_build_full,
    "training_set_selection": training_set_selection,
    "export_formats": export_formats,
    # --- at out-limit: returned after one tail round (policy cap) ---
    "ivf_lloyd_topk": ivf_lloyd_topk,
    "containment_join": containment_join,
    "dedup_contained_boxes": dedup_contained_boxes,
    "connected_components_labels": connected_components_labels,
    "multimodal_plan": multimodal_plan,
    # --- hard-gated tail (tests/test_oracle_tail.py replays every row at sf0.01) ---
    "ann_multiprobe_topk": ann_multiprobe_topk,
    "argmax_join": argmax_join,
    "simhash_near_dup_pairs": simhash_near_dup_pairs,
    "anti_join_orphans": anti_join_orphans,
    "semi_join_hot_parts": semi_join_hot_parts,
    "content_concat": content_concat,
    "dup_key_indexer": dup_key_indexer,
    "direction_vote": direction_vote,
    "grid_cells": grid_cells,
    "span_extents": span_extents,
    "topk_per_group": topk_per_group,
    "adjacency_join": adjacency_join,
    "grid_recovery": grid_recovery,
    "asof_join": asof_join,
    "rollup_revenue": rollup_revenue,
    "doc_near_dup_clusters": doc_near_dup_clusters,
    "embedding_topk": embedding_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ivf_flat_topk": ivf_flat_topk,
    "ivf_scaled_topk": ivf_scaled_topk,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_pairs": simhash_pairs,
    "doc_lang_id": doc_lang_id,
    "doc_token_stats": doc_token_stats,
    "doc_quality": doc_quality,
    "doc_fingerprint": doc_fingerprint,
    "jaccard_near_pairs": jaccard_near_pairs,
    "gap_detection": gap_detection,
    "doc_exact_dedup": doc_exact_dedup,
    "sessionize": sessionize,
    "q1_pricing_summary": q1_pricing_summary,
    "markdown_escape": markdown_escape,
    "normalize_dates": normalize_dates,
    "phone_format": phone_format,
    "filter_threshold": filter_threshold,
    "price_histogram": price_histogram,
    "pivot_event_types": pivot_event_types,
    "union_distinct_nations": union_distinct_nations,
    "page_select": page_select,
    "zip_join_positional": zip_join_positional,
    "template_override": template_override,
    "grid_header_derivation": grid_header_derivation,
    "grid_merged_cells": grid_merged_cells,
    "split_words_across_cells": split_words_across_cells,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "adjacency_rules": adjacency_rules,
    "kv_items_geometric": kv_items_geometric,
    "extract_scalar_cascade": extract_scalar_cascade,
    "extract_table_field": extract_table_field,
    "search_cells_adjacent": search_cells_adjacent,
    "kv_dict_view": kv_dict_view,
    "grid_row_dicts": grid_row_dicts,
}

ORACLE = {
    "q1_pricing_summary": SQL_Q1,
    "filter_threshold": SQL_FILTER,
    "argmax_join": SQL_ARGMAX,
    "anti_join_orphans": SQL_ANTI,
    "semi_join_hot_parts": SQL_SEMI,
    "content_concat": SQL_CONCAT,
    "dup_key_indexer": SQL_DUPKEY,
    "direction_vote": SQL_VOTE,
    "grid_cells": SQL_GRID,
    "span_extents": SQL_EXTENTS,
    "containment_join": SQL_CONTAIN,
    "dedup_contained_boxes": SQL_DEDUP_BOXES,
    "sessionize": SQL_SESSION,
    "topk_per_group": SQL_TOPK,
    "doc_exact_dedup": SQL_EXACT_DEDUP,
    "doc_near_dup_clusters": SQL_NEAR_DUP_CLUSTERS,
    "training_set_selection": SQL_TRAINING_SELECTION,
    "corpus_build": SQL_CORPUS_BUILD,
    "corpus_build_full": SQL_CORPUS_BUILD_FULL,
    "doc_token_stats": SQL_TOKEN_STATS,
    "doc_quality": SQL_QUALITY,
    "doc_lang_id": SQL_LANG_ID,
    "doc_fingerprint": SQL_FINGERPRINT,
    "markdown_escape": SQL_MD_ESCAPE,
    "minhash_lsh_pairs": SQL_MINHASH_PAIRS,
    "embedding_topk": SQL_EMB_TOPK,
    "normalize_dates": SQL_NORM_DATES,
    "phone_format": SQL_PHONE,
    "price_histogram": SQL_HISTOGRAM,
    "pivot_event_types": SQL_PIVOT,
    "union_distinct_nations": SQL_UNION,
    "gap_detection": SQL_GAPS,
    "adjacency_join": SQL_ADJACENCY,
    "page_select": SQL_PAGE_SELECT,
    "zip_join_positional": SQL_ZIP,
    "grid_recovery": SQL_GRID_RECOVERY,
    "asof_join": SQL_ASOF,
    "rollup_revenue": SQL_ROLLUP,
    "simhash_pairs": SQL_SIMHASH_DOCS,
    "simhash_near_dup_pairs": SQL_SIMHASH_NEAR,
    "ann_lsh_topk": SQL_ANN_LSH,
    "ann_multiprobe_topk": SQL_ANN_MULTIPROBE,
    "ivf_flat_topk": SQL_IVF,
    "ivf_scaled_topk": SQL_IVF_SCALED,
    "search_cells_lookup": SQL_SEARCH_LOOKUP,
    "ann_ivf_pq_topk": SQL_ANN_IVF_PQ,
    "corpus_index_build": SQL_CORPUS_INDEX,
    "embedding_clustered_topk": SQL_EMB_CLUSTERED_TOPK,
    "ann_ivf_clustered_topk": SQL_ANN_IVF_CLUSTERED,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "ivf_lloyd_topk": SQL_IVF_LLOYD,
    "jaccard_near_pairs": SQL_JACCARD,
    "connected_components_labels": SQL_CC,
    "embedding_near_dup_pairs": SQL_EMB_NEAR_DUP,
    "adjacency_rules": SQL_ADJ_RULES,
    "search_cells_adjacent": SQL_SEARCH_CELLS,
    "kv_dict_view": SQL_KV_DICT,
    "llm_extract_kv": SQL_LLM_EXTRACT_KV,
    "grid_dag_units": SQL_GRID_DAG_UNITS,
    "doc_repetition_quality": SQL_REPETITION,
    "exact_substring_spans": SQL_SUBSTRING_SPANS,
    "corpus_mixture_sample": SQL_MIXTURE_SAMPLE,
    "pack_chunks": SQL_PACK_CHUNKS,
    "decontaminate_ngram": SQL_DECONTAMINATE,
    "pii_redaction": SQL_PII_REDACT,
    "doc_importance_weights": SQL_IMPORTANCE_WEIGHTS,
    "doc_lm_perplexity": SQL_LM_PERPLEXITY,
    "bm25_retrieval_topk": SQL_BM25_TOPK,
    "doc_sliding_chunks": SQL_SLIDING_CHUNKS,
    "hll_distinct_tokens": SQL_HLL_DISTINCT,
    "cmsketch_token_counts": SQL_CM_TOKEN_COUNTS,
    "bloom_token_membership": SQL_BLOOM_MEMBERSHIP,
    "decontaminate_bloom": SQL_DECONTAM_BLOOM,
    "quantile_sketch_doclen": SQL_QUANTILE_SKETCH,
    "kmv_sample_tokens": SQL_KMV_SAMPLE,
    "adaptive_length_gate": SQL_ADAPTIVE_GATE,
    "incremental_ingest_dedup": SQL_INCREMENTAL_INGEST,
    "kmv_overlap_langs": SQL_KMV_OVERLAP,
    "winnowing_near_pairs": SQL_WINNOWING,
    "sketch_drift_psi": SQL_DRIFT_PSI,
    "bpe_train_merges": SQL_BPE_TRAIN,
    "bpe_subword_counts": SQL_BPE_APPLY,
    "pack_chunks_bpe": SQL_PACK_BPE,
    "pack_chunks_sharded": SQL_PACK_CHUNKS,
    "doc_scrub_spans": SQL_SCRUB_SPANS,
    "containment_near_pairs": SQL_CONTAINMENT,
    "semdedup_embeddings": SQL_SEMDEDUP,
    "grid_row_dicts": SQL_GRID_DICT,
    "kv_items_geometric": SQL_KV_GEOMETRIC,
    "extract_scalar_cascade": SQL_SCALAR_CASCADE,
    "extract_table_field": SQL_TABLE_FIELD,
    "grid_header_derivation": SQL_GRID_HEADERS,
    "grid_merged_cells": SQL_GRID_MERGED,
    "split_words_across_cells": SQL_SPLIT_WORDS,
    "template_override": SQL_TEMPLATE_OVERRIDE,
    "extract_transcripts": SQL_EXTRACT_CORPUS,
    "extract_transcripts_staged": SQL_EXTRACT_CORPUS,
    "segment_features": SQL_SEGMENT_FEATURES,
    "extract_fields_kv": SQL_FIELDS_KV,
    "export_formats": SQL_EXPORT_FORMATS,
    "multimodal_plan": SQL_MULTIMODAL_PLAN,
    # rows-only (deliberately no SQL referee):
    # - extract_transcripts_mix: layout reading-order is graph-valued
    #   (DAG toposort) — byte-equality vs the pure-Python oracle is
    #   enforced in pytest + the scaling checksum instead.
    # (multimodal_features graduated in r6: the stdlib BMP/WAV decode
    # carries the closed-form SQL_MULTIMODAL_FEATURES referee above.)
}
