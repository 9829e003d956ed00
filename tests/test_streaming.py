"""Structured-Streaming surface: incremental extraction equals batch;
watermarked windowed aggregation runs to completion."""

import pandas as pd
import pytest

from yomitoku_spark import datagen
from yomitoku_spark.plans.pipeline import extract
from yomitoku_spark.streaming import stream as ST


@pytest.mark.filterwarnings("ignore")
def test_stream_extract_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    tdf = datagen.transcripts_df(spark, n_convs=8, seed=42)
    # two separate appends to simulate table growth
    tdf.filter("turn_idx % 2 = 0").write.mode("append").parquet(in_dir)
    tdf.filter("turn_idx % 2 = 1").write.mode("append").parquet(in_dir)

    q = ST.stream_extract(spark, in_dir, out_dir, cp_dir, trigger_once=True)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .select("conv_id", "turn_idx", "extracted_text", "blocks_kept")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        extract(tdf)
        .select("conv_id", "turn_idx", "extracted_text", "blocks_kept")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # incremental restart with no new files → no duplicate output
    q2 = ST.stream_extract(spark, in_dir, out_dir, cp_dir, trigger_once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(want)


@pytest.mark.filterwarnings("ignore")
def test_event_rates_windowed(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    agg = ST.event_rates(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has passed; with a
    # single batch the final windows stay open, so check the state ran
    # and the sink table exists with valid schema
    out = spark.sql("SELECT * FROM rates")
    assert {"win_start", "win_end", "event_type", "n", "value_milli"} <= set(out.columns)
