"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship fused extraction pipeline over a
transcripts-shaped view of the sf0.001 documents table; ``queries`` /
``oracle_sql`` expose the operator registry (SURVEY.md §2 coverage) —
see :mod:`yomitoku_spark.queries` for the implementations and the
matching DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction over a transcripts table built
    from the sf0.001 documents payloads (plus deterministic synthetic
    turns covering HTML/layout/table/kv payload classes)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.datagen import transcripts_df
    from yomitoku_spark.plans.pipeline import extract

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_turns = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    synth = transcripts_df(spark, n_convs=20, seed=42)
    return extract(doc_turns.unionByName(synth))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from yomitoku_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from yomitoku_spark.queries import ORACLE

    return dict(ORACLE)
