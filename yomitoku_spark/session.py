"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime skew-join splitting, partition coalescing), shuffle partitions
sized to cores rather than the 200 default, Arrow enabled for the
pandas-UDF stages, UTC session timezone so parquet timestamps compare
byte-stably against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "yomitoku_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpu count
        inner = master.split("[", 1)[-1].rstrip("]")
        shuffle_partitions = cpus if inner in ("*", "") else int(inner)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner only reclaims shuffle files / broadcast blocks
        # when driver GC collects their references; with a 32g heap a
        # long session (the 59-query bench, a day-long cluster app)
        # accumulates them for the default 30 MINUTES, and that
        # block-manager pressure bleeds into later queries' walls.
        # A 1-minute periodic GC bounds the accumulation at a cost of
        # ~10ms/min of driver GC — same setting a long-lived cluster
        # driver would run with.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # ...and make that explicit System.gc() a CONCURRENT G1 cycle
        # instead of a stop-the-world full GC, so the periodic cleanup
        # costs background CPU rather than a multi-hundred-ms pause
        # landing inside whatever query is running when it fires
        .config(
            "spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent"
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fan_out(df):
    """Round-robin ``repartition(defaultParallelism)`` of a SMALL scan
    before expensive per-row map work (optimization guide §2.5 input
    skew: a sub-row-group parquet file arrives as 1-2 partitions,
    serializing every downstream map — tokenization, shingling, Arrow
    UDFs — on one or two cores regardless of cluster size).

    Size-adaptive in BOTH directions: when the relation is already
    backed by at least ``defaultParallelism`` input files the exchange
    is skipped entirely — at 100 TB a blanket repartition to the core
    count would funnel the whole input into a few giant partitions
    (the opposite of the guide's advice), while the scan itself
    already yields ample parallel splits. The probe is
    ``DataFrame.inputFiles()`` (driver-side listing, already cached by
    the read — measured ~6 ms); it UNDERCOUNTS splits (a large file
    yields several), so the gate only errs toward keeping today's
    behavior. Derived relations (no backing files) keep the fan-out.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= par:
        return df
    return df.repartition(par)
