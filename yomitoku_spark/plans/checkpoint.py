"""Resumable extraction: per-bucket checkpoint + lineage + metrics.

North-rule requirement (BASELINE.json): the 10^12-turn job must be
resumable from checkpoint with per-partition lineage and extraction-
metric rows. Design:

* work is bucketed by ``pmod(xxhash64(conv_id, turn_idx), n_buckets)``
  — TURN-grain, so a single hot conversation spreads across all
  buckets (long-conversation skew defusal; SURVEY.md §4.1);
* results land in a parquet table partitioned by ``bucket`` with
  dynamic partition overwrite — re-processing a bucket is an
  idempotent replace, never a double-count;
* the state table gains one row per committed bucket with row count,
  metric sums (blocks kept/dropped, chars emitted — aggregated from
  the COMMITTED output, so metrics are exactly-once by construction),
  an attempt timestamp, and a lineage string (code version + input id);
* on restart, done buckets are anti-joined away and only the remainder
  runs.

On a real cluster the state table would be Iceberg (atomic appends);
the parquet append used here has the same layout and the same
resume semantics for a single writer.

(The reference has no analog — it reprocesses files from scratch,
cli/main.py:538-549; resumability is what 10^12 turns forces.)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yomitoku_spark import __version__
from yomitoku_spark.plans.pipeline import extract

STATE_SCHEMA = (
    "bucket int, status string, n_turns bigint, blocks_kept bigint, "
    "blocks_dropped bigint, chars_emitted bigint, attempt_ts double, lineage string"
)


def _state_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_checkpoint")


def _result_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "result")


def done_buckets(spark: SparkSession, output_dir: str) -> set[int]:
    sd = _state_dir(output_dir)
    try:
        state = spark.read.parquet(sd)
    except Exception:
        return set()
    return {
        r.bucket for r in state.filter(F.col("status") == "done").select("bucket").distinct().collect()
    }


def run_resumable(
    transcripts: DataFrame,
    output_dir: str,
    n_buckets: int = 32,
    wave_size: int = 8,
    max_waves: int | None = None,
    lineage: str = "",
) -> int:
    """Run extraction bucket-wave by bucket-wave, checkpointing after
    each wave. Returns the number of buckets processed this invocation.

    ``max_waves`` exists for fault-injection tests (stop early, then
    call again to resume)."""
    spark = transcripts.sparkSession
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        return _run_resumable(
            spark, transcripts, output_dir, n_buckets, wave_size, max_waves, lineage
        )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def _bucket_expr(n_buckets: int) -> F.Column:
    # xxhash64 is TYPE-sensitive (int vs bigint hash differently), and
    # extract() emits turn_idx as int — so the input-side filter and the
    # output-side write MUST hash the same types, or rows written land
    # in a bucket other than the one that selected them and a later
    # wave's dynamic overwrite silently deletes them.
    return F.pmod(
        F.xxhash64(F.col("conv_id").cast("string"), F.col("turn_idx").cast("int")),
        F.lit(n_buckets),
    ).cast("int")


def _run_resumable(
    spark, transcripts, output_dir, n_buckets, wave_size, max_waves, lineage
) -> int:
    done = done_buckets(spark, output_dir)
    todo = sorted(set(range(n_buckets)) - done)
    lineage = lineage or f"yomitoku_spark-{__version__}"

    bucketed = transcripts.withColumn("bucket", _bucket_expr(n_buckets))

    processed = 0
    waves = [todo[i : i + wave_size] for i in range(0, len(todo), wave_size)]
    for wi, wave in enumerate(waves):
        if max_waves is not None and wi >= max_waves:
            break
        part = bucketed.filter(F.col("bucket").isin(wave))
        res = extract(part.drop("bucket")).withColumn("bucket", _bucket_expr(n_buckets))
        # idempotent per-bucket replace (dynamic partition overwrite)
        res.write.mode("overwrite").partitionBy("bucket").parquet(_result_dir(output_dir))
        # metrics from the COMMITTED output → exactly-once
        committed = spark.read.parquet(_result_dir(output_dir)).filter(
            F.col("bucket").isin(wave)
        )
        stats = committed.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("blocks_kept").alias("blocks_kept"),
            F.sum("blocks_dropped").alias("blocks_dropped"),
            F.sum("chars_emitted").alias("chars_emitted"),
        )
        now = time.time()
        state_rows = stats.select(
            F.col("bucket").cast("int"),
            F.lit("done").alias("status"),
            F.col("n_turns").cast("bigint"),
            F.col("blocks_kept").cast("bigint"),
            F.col("blocks_dropped").cast("bigint"),
            F.col("chars_emitted").cast("bigint"),
            F.lit(now).alias("attempt_ts"),
            F.lit(lineage).alias("lineage"),
        )
        # buckets that happened to be empty still need a done marker
        seen = {r.bucket for r in stats.select("bucket").collect()}
        empty = [b for b in wave if b not in seen]
        if empty:
            edf = spark.createDataFrame(
                [(b, "done", 0, 0, 0, 0, now, lineage) for b in empty], STATE_SCHEMA
            )
            state_rows = state_rows.unionByName(edf)
        state_rows.write.mode("append").parquet(_state_dir(output_dir))
        processed += len(wave)
    return processed


def read_result(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(_result_dir(output_dir)).drop("bucket")


def read_state(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(_state_dir(output_dir))
