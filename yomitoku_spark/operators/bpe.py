"""Distributed BPE merge training (Sennrich, Haddow & Birch 2016,
"Neural machine translation of rare words with subword units" — the
tokenizer-induction step of an LLM data pipeline), Spark-first.

Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not the raw
corpus: the 100 TB corpus reduces to (word, count) in one exchange,
and every merge round then runs over that bounded vocabulary table.
Each round is three JVM-side steps — adjacent-pair counts (explode +
sum), a deterministic argmax (count desc, pair asc), and applying the
merge to every word — with NO Python UDF anywhere: the symbol
sequence is a separator-wrapped STRING (``\\x1f a \\x1f\\x1f b \\x1f``
…), so applying a merge is one ``replace()`` call, whose greedy
leftmost non-overlapping scan is exactly the BPE apply rule and is
bit-identical between Spark and DuckDB (both engines' ``replace``
verified to agree on overlap cases, tests/test_operators.py).

Scale shape: one corpus-grain exchange total (the word count); each
round shuffles only the vocabulary-grain pair table and broadcasts a
single argmax row back. The words frame is localCheckpoint'ed per
round (the same lineage-bounding discipline as the label-propagation
fixpoint); the per-round argmax is a documented 1-row driver fold
(same class as the Lloyd centroid folds in operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yomitoku_spark.functions.textstats import tokens

SEP = "\x1f"


def _sym_array(sep: str) -> str:
    return f"split(trim(BOTH '{sep}' FROM s), '{sep}{sep}')"


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    sep: str = SEP,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a small
    DataFrame (round, x, y, pair_count) — the merge table IS the
    artifact a tokenizer ships. Deterministic: ties broken by
    (pair_count desc, x asc, y asc); words containing the separator
    byte are excluded (it cannot appear in text tokens)."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(~F.col("w").contains(sep))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "w",
            "cnt",
            F.regexp_replace("w", "(.)", sep + "$1" + sep).alias("s"),
        )
    )
    a = _sym_array(sep)
    cur = words.localCheckpoint()
    merges = []
    for r in range(1, n_merges + 1):
        pairs = (
            cur.filter(F.expr(f"size({a}) >= 2"))
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size({a}) - 1), "
                        f"i -> struct(element_at({a}, i) AS x, "
                        f"element_at({a}, i + 1) AS y))"
                    )
                ).alias("p"),
            )
            .select("cnt", "p.x", "p.y")
        )
        top = (
            pairs.groupBy("x", "y")
            .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "x", "y")
            .limit(1)
            .collect()  # 1-row driver fold, like the Lloyd centroid fold
        )
        if not top:
            break
        t0 = top[0]
        merges.append((r, t0.x, t0.y, int(t0.pair_count)))
        search = F.lit(sep + t0.x + sep + sep + t0.y + sep)
        repl = F.lit(sep + t0.x + t0.y + sep)
        cur = cur.select(
            "w", "cnt", F.replace(F.col("s"), search, repl).alias("s")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, schema="round bigint, x string, y string, pair_count bigint"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = SEP,
) -> DataFrame:
    """Tokenize with a learned merge list: per document, the subword
    count after applying every merge in order. The wrap →
    replace(merge 1) → … → replace(merge n) chain is nested JVM
    string ops inside one Project (whole-stage codegen, no UDF), then
    one doc-grain fold. Returns (id_col, n_words, n_subwords) — the
    numbers a token-budget planner needs."""
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(id_col, F.explode(toks).alias("w")).filter(
        ~F.col("w").contains(sep)
    )
    s = F.regexp_replace("w", "(.)", sep + "$1" + sep)
    for x, y in merges:
        s = F.replace(
            s, F.lit(sep + x + sep + sep + y + sep), F.lit(sep + x + y + sep)
        )
    segged = base.withColumn("s", s).withColumn(
        "n_sub",
        F.size(F.split(F.expr(f"trim(BOTH '{sep}' FROM s)"), sep + sep)).cast(
            "bigint"
        ),
    )
    return segged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("n_sub").cast("bigint").alias("n_subwords"),
    )
