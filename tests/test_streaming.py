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


@pytest.mark.filterwarnings("ignore")
def test_stream_sessionize_stateful_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == the batch window rule,
    with state surviving a checkpointed restart between two time-ordered
    appends."""
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "sess_in")
    out_dir = str(tmp_path / "sess_out")
    cp_dir = str(tmp_path / "sess_cp")

    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01 00:00:00")
    for user in range(5):
        t = base + pd.Timedelta(minutes=user)
        for burst in range(3):
            for k in range(4):
                rows.append((user, eid, t))
                eid += 1
                t += pd.Timedelta(minutes=10)
            t += pd.Timedelta(hours=2)  # session break
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    events = spark.createDataFrame(pdf)
    cut = pdf["ts"].median()

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_sessionize(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # time-ordered appends: first half, run, second half, run (restart)
    # one file per append: the operator's contract is event-time-ordered
    # appends per user, so each micro-batch must be a time-slice
    events.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    events.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # batch referee: lag + cumulative sum of >1h gaps
    ref = pdf.sort_values(["user_id", "ts", "event_id"]).copy()
    sec = ref["ts"].astype("int64") // 1_000_000_000
    prev = sec.groupby(ref["user_id"]).shift()
    ref["session_no"] = (
        (prev.isna() | (sec - prev > 3600)).groupby(ref["user_id"]).cumsum()
    )
    want = (
        ref[["user_id", "event_id", "session_no"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_exact_dedup_equals_batch_keeper(spark, tmp_path):
    """Streaming dedup-on-ingest == the batch exact-dedup keeper rule,
    with the seen-digest state surviving a checkpointed restart between
    two ordered appends (a wave-2 duplicate of wave-1 content must be
    dropped even though it arrives in a different run)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.operators import dedup as DD

    in_dir = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    cp_dir = str(tmp_path / "dd_cp")

    schema = "conv_id string, turn_idx int, text string"
    wave1 = spark.createDataFrame(
        [("c0", 0, "hello  world"), ("c0", 1, "unique one"),
         ("c0", 2, "Hello World")],  # in-batch duplicate of (c0, 0)
        schema,
    )
    wave2 = spark.createDataFrame(
        [("c1", 0, "HELLO world"),  # cross-restart duplicate of (c0, 0)
         ("c1", 1, "another doc"),
         ("c1", 2, "unique ONE")],  # cross-restart duplicate of (c0, 1)
        schema,
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    got = {
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch referee over the full union: min (conv_id, turn_idx) per digest
    batch = wave1.unionByName(wave2)
    keepers = {
        (r.conv_id, r.turn_idx)
        for r in DD.exact_dedup(
            batch.withColumn("k", F.concat_ws("|", "conv_id", "turn_idx")),
            "text",
            "k",
        )
        .select("conv_id", "turn_idx")
        .collect()
    }
    assert got == keepers == {("c0", 0), ("c0", 1), ("c1", 1)}


def test_stream_simhash_near_dup_equals_batch_pairs(spark, tmp_path):
    """Streaming SimHash near-dup on ingest == the batch
    simhash_near_pairs rule over a two-append replay of the documents
    table, with band-bucket state surviving the checkpointed restart
    (a wave-2 near-dup of wave-1 content must pair across runs)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.operators import dedup as DD

    in_dir = str(tmp_path / "sh_in")
    out_dir = str(tmp_path / "sh_out")
    cp_dir = str(tmp_path / "sh_cp")

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    # split so that near-dup family members land in DIFFERENT waves:
    # odd/even doc_id (the synthetic near-dup families span adjacent ids)
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_simhash_near_dup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(out_dir).distinct().collect()
    }
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in DD.simhash_near_pairs(docs, "doc_id", "text").collect()
    }
    assert got == batch
    assert batch  # the fixture really contains near-dup pairs
    # cross-wave pairs exist (state crossed the restart)
    assert any((a + b) % 2 == 1 for a, b, _ in got)


def test_stream_simhash_ignores_redelivered_ids(spark, tmp_path):
    """A re-delivered doc id (same id in two waves) must not emit a
    degenerate (id, id, 0) self-pair nor register twice in bucket
    state — the batch rule joins on a.id < b.id (r6 review finding)."""
    in_dir = str(tmp_path / "rd_in")
    out_dir = str(tmp_path / "rd_out")
    cp_dir = str(tmp_path / "rd_cp")
    wave = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )

    def run_once():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_simhash_near_dup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave.coalesce(1).write.mode("append").parquet(in_dir)  # re-delivery
    run_once()
    got = [(r.id_a, r.id_b, r.hamming)
           for r in spark.read.parquet(out_dir).distinct().collect()]
    assert got == [(1, 2, 0)]  # the real pair once, no self-pairs


def test_render_pdf_refuses_orphan_pages(spark, tmp_path):
    """Text-layer rows on a page absent from page_sizes raise instead
    of silently vanishing from the written PDF (r6 review finding)."""
    import pytest as _pytest

    from yomitoku_spark.plans import searchable_pdf as SPDF

    containers = spark.createDataFrame(
        [(7, 0, 0, False, 0, 0, 600, 100)],
        "page int, order int, sub_order int, vertical boolean, "
        "x1 int, y1 int, x2 int, y2 int",
    )
    words = spark.createDataFrame(
        [(7, "w", "hello", 10, 10, 110, 30)],
        "page int, word_id string, content string, x1 int, y1 int, x2 int, y2 int",
    )
    layer = SPDF.text_layer(containers, words)
    with _pytest.raises(ValueError, match="absent from"):
        SPDF.render_pdf(layer, {0: (800, 1000)}, str(tmp_path / "x.pdf"))


def test_stream_hll_registers_equals_batch_sketch(spark, tmp_path):
    """Streaming HLL register upgrades, max-folded over everything
    emitted across a checkpointed restart, == the batch register table
    over the full ingested set — so the streamed sketch's estimate is
    bit-identical to the batch estimate."""
    from pyspark.sql import functions as F

    from yomitoku_spark.functions import sketch as SK

    in_dir = str(tmp_path / "hll_in")
    out_dir = str(tmp_path / "hll_out")
    cp_dir = str(tmp_path / "hll_cp")

    schema = "source string, tok string"
    wave1 = spark.createDataFrame(
        [("a", f"tok{i}") for i in range(60)] + [("b", "only")], schema
    )
    # wave 2: overlap (re-ingested tokens must not emit again) + growth
    wave2 = spark.createDataFrame(
        [("a", f"tok{i}") for i in range(40, 120)] + [("b", "only"), ("b", "two")],
        schema,
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_hll_registers(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    emitted = spark.read.parquet(out_dir)
    streamed = {
        (r.source, r.bucket): r.rho
        for r in SK.hll_merge(emitted, ["source"]).collect()
    }
    batch = {
        (r.source, r.bucket): r.rho
        for r in SK.hll_registers(
            wave1.unionByName(wave2), F.col("tok"), ["source"]
        ).collect()
    }
    assert streamed == batch
    # and the folded estimates agree bit for bit
    se = {
        tuple(r)
        for r in SK.hll_estimate(
            SK.hll_merge(emitted, ["source"]), ["source"]
        ).collect()
    }
    be = {
        tuple(r)
        for r in SK.hll_estimate(
            SK.hll_registers(
                wave1.unionByName(wave2), F.col("tok"), ["source"]
            ),
            ["source"],
        ).collect()
    }
    assert se == be


def test_stream_bloom_filter_equals_batch_build(spark, tmp_path):
    """Streaming Bloom word upgrades, bit_or-folded over everything
    emitted across a checkpointed restart, == the batch packed filter
    over the full ingested set — fixed-footprint dedup/decontamination
    state (<= m_bits/32 rows per group regardless of stream length)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.functions import sketch as SK

    in_dir = str(tmp_path / "bl_in")
    out_dir = str(tmp_path / "bl_out")
    cp_dir = str(tmp_path / "bl_cp")
    M, K = 512, 3

    schema = "source string, tok string"
    wave1 = spark.createDataFrame(
        [("a", f"tok{i}") for i in range(50)] + [("b", "only")], schema
    )
    # overlap: re-ingested tokens set no new bits and must not emit
    wave2 = spark.createDataFrame(
        [("a", f"tok{i}") for i in range(30, 90)] + [("b", "two")], schema
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_bloom_filter(stream, m_bits=M, k=K)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    emitted = spark.read.parquet(out_dir)
    streamed = {
        (r.source, r.word): r.bits
        for r in SK.bloom_merge(emitted, ["source"]).collect()
    }
    batch = {
        (r.g, r.word): r.bits
        for r in SK.bloom_build(
            wave1.unionByName(wave2).withColumnRenamed("source", "g"),
            F.col("tok"), ["g"], m_bits=M, k=K,
        ).collect()
    }
    assert streamed == batch
    # bounded state: occupied words never exceed the packed width
    for g in ("a", "b"):
        assert len([1 for s, _ in streamed if s == g]) <= M // 32
    # probing the streamed filter finds every ingested token
    filt = SK.bloom_merge(emitted, ["source"]).withColumnRenamed("source", "g")
    probes = (
        wave1.unionByName(wave2)
        .select(F.col("source").alias("g"), F.col("tok").alias("probe"))
        .distinct()
    )
    got = SK.bloom_contains(filt, probes, ["g"], "probe", m_bits=M, k=K)
    assert got.filter(F.col("contains") == 0).count() == 0


def test_stream_q_buckets_equals_batch_sketch(spark, tmp_path):
    """Streaming quantile-bucket deltas, sum-folded over everything
    emitted across a checkpointed restart, == the batch bucket table
    over the full ingested set (counter semantics: re-ingested values
    COUNT AGAIN, unlike the idempotent HLL/Bloom twins) — so any
    quantile extracted mid-stream is bit-identical to batch."""
    from pyspark.sql import functions as F

    from yomitoku_spark.functions import sketch as SK

    in_dir = str(tmp_path / "q_in")
    out_dir = str(tmp_path / "q_out")
    cp_dir = str(tmp_path / "q_cp")

    schema = "source string, v bigint"
    wave1 = spark.createDataFrame(
        [("a", i % 97 + 1) for i in range(300)] + [("b", 7), ("b", 70000)],
        schema,
    )
    wave2 = spark.createDataFrame(
        [("a", (i * 13) % 4096 + 1) for i in range(250)] + [("b", 7)],
        schema,
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_q_buckets(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    emitted = spark.read.parquet(out_dir)
    streamed = {
        (r.source, r.bucket): r.cnt
        for r in SK.q_merge(emitted, ["source"]).collect()
    }
    both = wave1.unionByName(wave2)
    batch = {
        (r.source, r.bucket): r.cnt
        for r in SK.q_build(both, F.col("v"), ["source"]).collect()
    }
    assert streamed == batch
    # quantiles from the folded stream == batch quantiles, bit for bit
    sq = {
        tuple(r)
        for r in SK.q_quantiles(
            SK.q_merge(emitted, ["source"]), ["source"], [500, 900]
        ).collect()
    }
    bq = {
        tuple(r)
        for r in SK.q_quantiles(
            SK.q_build(both, F.col("v"), ["source"]), ["source"], [500, 900]
        ).collect()
    }
    assert sq == bq


def test_stream_cm_counters_equals_batch_sketch(spark, tmp_path):
    """Streaming count-min deltas, sum-folded over everything emitted
    across a checkpointed restart, == the batch cm_build table over
    the full ingested stream — so any point estimate mid-stream is
    bit-identical to batch (and keeps the est >= true guarantee)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.functions import sketch as SK

    in_dir = str(tmp_path / "cm_in")
    out_dir = str(tmp_path / "cm_out")
    cp_dir = str(tmp_path / "cm_cp")

    schema = "source string, tok string"
    wave1 = spark.createDataFrame(
        [("a", f"t{i % 37}") for i in range(200)] + [("b", "hot")] * 9,
        schema,
    )
    wave2 = spark.createDataFrame(
        [("a", f"t{(i * 7) % 61}") for i in range(150)] + [("b", "hot")] * 4,
        schema,
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            ST.stream_cm_counters(stream, depth=3, width=64)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    wave2.coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    emitted = spark.read.parquet(out_dir)
    streamed = {
        (r.source, r.row, r.bucket): r.cnt
        for r in SK.cm_merge(emitted, ["source"]).collect()
    }
    both = wave1.unionByName(wave2)
    batch = {
        (r.source, r.row, r.bucket): r.cnt
        for r in SK.cm_build(
            both, F.col("tok"), ["source"], depth=3, width=64
        ).collect()
    }
    assert streamed == batch
