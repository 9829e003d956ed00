"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric is fused-extraction wall time over a deterministic
synthetic transcripts table sized to the scale factor (~16.5 turns/conv
mean + one 12× skewed conversation). Extra keys report turns/sec.
Plans are executed fully via the noop sink (no collect, no pruning
shortcuts).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "argmax_join",
    "content_concat",
    "containment_join",
    "dedup_contained_boxes",
    "sessionize",
    "topk_per_group",
    "doc_exact_dedup",
    "doc_quality",
    "doc_lang_id",
    "minhash_lsh_pairs",
    "embedding_topk",
    "simhash_pairs",
    "ann_lsh_topk",
    "ivf_flat_topk",
    "kv_items_geometric",
    "extract_scalar_cascade",
]


def run_plan(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from yomitoku_spark.datagen import transcripts_df
    from yomitoku_spark.plans.pipeline import extract
    from yomitoku_spark.queries import QUERIES
    from yomitoku_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    timings: dict[str, float] = {}

    # flagship: fused extraction over synthetic transcripts sized to sf
    n_convs = max(50, int(60_000 * sf))
    tdf = transcripts_df(spark, n_convs=n_convs, seed=42)
    n_turns = tdf.count()  # generation cost measured separately from extraction
    t0 = time.perf_counter()
    run_plan(extract(tdf))
    t_extract = time.perf_counter() - t0
    timings["extract_transcripts"] = round(t_extract, 3)

    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        run_plan(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": int(n_turns),
        "turns_per_sec_extract": round(n_turns / t_extract, 1),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
