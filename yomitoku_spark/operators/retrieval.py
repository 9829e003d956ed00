"""BM25 full-text retrieval over the document corpus.

The reference ships keyword retrieval only as per-document substring
search (schemas/table_semantic_parser.py:213-287 search_cells_by_query
— exact containment inside ONE document); a training-data pipeline
needs the corpus-scale version: rank every document against a query
set by lexical relevance. BM25 (Robertson et al., Okapi; the scoring
function Lucene/Elasticsearch default to) is the standard answer.

Everything here is integer-exact fixed point so a DuckDB referee can
hash-match it:

* ``idf_milli = plog2(ratio_micro) - plog2(10^6)`` where
  ``ratio_micro = 10^6 * ((N - df + 0.5)/(df + 0.5) + 1)`` is computed
  as an exact integer ratio and ``plog2`` is a piecewise-linear
  milli-log2: ``1000*e + 1000*(x - 2^e) DIV 2^e`` with
  ``e = length(bin(x)) - 1`` (the string-exact floor-log2 trick the
  CCNet scorer uses, plus a linear interpolation term so idf gets
  milli resolution instead of 1-bit resolution — exact at powers of
  two, monotone, max error ~86 milli-bits between them);
* the tf saturation term is the textbook
  ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` evaluated in milli
  units with a fixed operation order (every division is an integer
  DIV, identical on both engines);
* a (query, doc) score is the BIGINT sum of per-term
  ``idf_milli * tfn_milli`` (micro units); ties break on doc_id.

Scale shape (the 100 TB story):

* the ONLY corpus-grain exchange is the postings aggregation
  ``(doc_id, term) -> tf`` — partial aggregation applies, and doc
  length rides in the grouping key so scoring never joins back at doc
  grain;
* query terms are a broadcast; everything downstream of
  ``postings ⋈ broadcast(query_terms)`` is bounded by the postings of
  the queried terms, not the corpus (df counts stay exact because the
  semi filter drops TERMS, never documents of a kept term);
* corpus stats (N, total tokens) and the per-term df table are tiny
  and broadcast; the final top-k is a per-query window over the
  matched candidates only.

Overflow bounds (BIGINT): the interpolation term ``1000*(x - 2^e)``
caps the plog2 input below 2^53, i.e. N below ~4.5e9 documents per
scored corpus (shard the query batch per corpus shard above that);
``10^6 * tf * (k1_milli+1000)`` caps tf below ~4e9 occurrences of one
term in one document. Both far past the design point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yomitoku_spark.functions.textstats import tokens


def plog2_frag(x: str, dialect: str = "spark") -> str:
    """The milli-log2 of a positive BIGINT SQL expression ``x``:
    ``1000*e + 1000*(x - 2^e) DIV 2^e`` with ``e = floor(log2 x)``
    taken from the bin() string length. Emitted as a SQL fragment
    because the expression references its input three times; the two
    dialects differ only in the integer-division and shift spellings
    (Spark ``DIV``/``shiftleft``, DuckDB ``//``/``<<``) — the
    arithmetic is identical bit for bit."""
    e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
    if dialect == "spark":
        p = f"shiftleft(CAST(1 AS BIGINT), CAST(length(bin({x})) - 1 AS INT))"
        div = "DIV"
    else:
        p = f"(CAST(1 AS BIGINT) << ({e}))"
        div = "//"
    return f"(1000 * {e} + (1000 * (({x}) - {p})) {div} {p})"


PLOG2_1M = 19907  # plog2_frag of 10^6: e=19, 2^19=524288, frac=907


def plog2q_frag(x: str, dialect: str = "spark") -> str:
    """Quadratic-refined MICRO-log2: the linear fragment's fractional
    term f gains a ``+ 0.347*f*(1-f)`` correction and the fixed point
    moves to micro units (max abs error drops from ~86 milli-bits to
    ~8, and the quantum from 1 milli-bit to 1 micro-bit — needed where
    a log feeds a SMALL difference, e.g. the HLL linear-counting
    ln(m/V) with m/V near 1; BM25 idf keeps the cheaper linear milli
    form). Input must stay below 2^43 (the micro interpolation term
    needs 10^6·(x-2^e) in BIGINT). Same two-dialect contract as
    :func:`plog2_frag`."""
    e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
    if dialect == "spark":
        p = f"shiftleft(CAST(1 AS BIGINT), CAST(length(bin({x})) - 1 AS INT))"
        div = "DIV"
    else:
        p = f"(CAST(1 AS BIGINT) << ({e}))"
        div = "//"
    f_ = f"((1000000 * (({x}) - {p})) {div} {p})"
    return (
        f"(1000000 * {e} + {f_} "
        f"+ (347 * {f_} * (1000000 - {f_})) {div} 1000000000)"
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-``k`` BM25-ranked documents per query (module docstring has
    the fixed-point semantics and the scale shape).

    Returns (query_id, rank, doc_id, score_micro), rank 1..k ordered
    by (score desc, doc_id asc). Documents matching no query term are
    absent (score 0 in classic BM25); queries with no indexed term
    return no rows.
    """
    t = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), t.alias("t")).select(
        id_col, "t", F.size("t").cast("bigint").alias("dl")
    )
    # corpus stats: one tiny row, broadcast into the idf arithmetic
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("tot_tokens"),
    ).select(
        "n_docs",
        F.expr(
            "GREATEST(1000 * tot_tokens DIV GREATEST(n_docs, CAST(1 AS BIGINT)),"
            " CAST(1 AS BIGINT))"
        ).alias("avgdl_milli"),
    )
    # postings (doc_id, dl, term) -> tf: THE corpus exchange. dl rides
    # in the grouping key (functionally dependent on doc_id) so scoring
    # never joins back at doc grain.
    postings = (
        base.select(id_col, "dl", F.explode("t").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    qt = tokens(F.lower(F.col(query_text_col)))
    # qterms is tiny but feeds two broadcasts (term_set + the scoring
    # join); materialize once so the query-side tokenize runs once
    qterms = queries.select(
        F.col(query_id_col), F.explode(qt).alias("term")
    ).distinct().localCheckpoint(eager=True)
    term_set = qterms.select("term").distinct()
    # semi filter to queried TERMS only (documents of a kept term all
    # survive, so df stays exact); everything below is candidate-sized.
    # matched feeds BOTH the df table and the scoring join — left lazy
    # the corpus-grain postings aggregation ran twice (guide §2.4);
    # the materialized frame is candidate-sized (postings of queried
    # terms only), the same bounded class as the broadcasts below
    matched = postings.join(F.broadcast(term_set), "term").localCheckpoint(
        eager=True
    )
    df_t = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = (
        f"({plog2_frag('ratio_micro', 'spark')} - {PLOG2_1M})"
    )
    tfn = (
        "(CAST(1000000 AS BIGINT) * tf * (1000 + {k1}) DIV "
        "((1000 * tf + ({k1} * (1000 - {b} + "
        "({b} * (1000000 * dl DIV avgdl_milli)) DIV 1000)) DIV 1000) "
        "* 1000))".format(k1=k1_milli, b=b_milli)
    )
    scored = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "ratio_micro",
            F.expr(
                "CAST(1000000 AS BIGINT) * (2 * n_docs - 2 * df + 1) "
                "DIV (2 * df + 1) + 1000000"
            ),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.expr(f"{idf} * {tfn}")).alias("score_micro"))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("rank").cast("bigint").alias("rank"),
            id_col,
            F.col("score_micro").cast("bigint").alias("score_micro"),
        )
    )
