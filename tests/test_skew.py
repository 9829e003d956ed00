"""Long-conversation skew defusal (north rule): one conversation with
~10× the median turns must not pin a partition."""

import pyspark.sql.functions as F

from yomitoku_spark import datagen
from yomitoku_spark.plans.pipeline import extract
from yomitoku_spark.sources.tables import salt_repartition


def test_salting_balances_hot_conversation(spark):
    tdf = datagen.transcripts_df(spark, n_convs=30, seed=42, skew=40)
    counts = tdf.groupBy("conv_id").count().orderBy(F.desc("count")).collect()
    hot, rest_median = counts[0], counts[len(counts) // 2]
    assert hot["count"] > 10 * rest_median["count"]  # the skew exists

    salted = salt_repartition(tdf, 16)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    per = [r["count"] for r in sizes]
    assert len(per) == 16
    assert max(per) < 2 * (sum(per) / len(per))  # no partition pinned

    # contrast: partitioning BY conv_id pins the hot conversation
    by_conv = tdf.repartition(16, "conv_id")
    worst = max(
        r["count"]
        for r in by_conv.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert worst >= hot["count"]  # the anti-pattern really is worse

    # and correctness is partitioning-invariant
    a = extract(salted).agg(F.sum("chars_emitted")).collect()[0][0]
    b = extract(tdf).agg(F.sum("chars_emitted")).collect()[0][0]
    assert a == b
