"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric is fused-extraction wall time over a deterministic
synthetic transcripts table sized to the scale factor (~16.5 turns/conv
mean + one 12× skewed conversation) — the `extract_transcripts` key
(the datagen full-mix flagship; the registry row of the same name runs
the corpus-backed oracle slice). Plans execute fully via the noop sink
(no collect, no pruning shortcuts).

Round-comparability: every query runs ONE untimed warmup pass (absorbs
per-query codegen + C2 JIT, which otherwise lands in the first timed
rep and inflates spread 5× on sub-second queries), then is timed
best-of-N inside ONE warmed JVM. N = $SPARK_BENCH_REPS (default 3) for
queries ≥ ~1.5 s, scaled up to ~4.5 s of total reps (cap 12) for
shorter ones so the reported best is stable. `queries` carries the
best-of-N seconds (the driver contract); `queries_spread` carries
max/min over the TIMED reps so a noisy row is visible as data, not as
a phantom regression; `queries_reps` records how many timed reps each
best came from. `recall_at_3` carries each approximate-ANN query's
overlap with the exact quantized-dot top-3 referee (embedding_topk,
integer dot product — the oracle-checkable exact baseline) — wall time
without recall is not a comparable number for ANN.
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
    "training_set_selection",
    "corpus_build",
    "corpus_build_full",
    "minhash_lsh_pairs",
    "embedding_topk",
    "simhash_pairs",
    "ann_lsh_topk",
    "ann_multiprobe_topk",
    "ivf_flat_topk",
    "ivf_scaled_topk",
    "ivf_lloyd_topk",
    "kv_items_geometric",
    "extract_scalar_cascade",
    "grid_header_derivation",
    # split_words_across_cells is deliberately NOT benched: its ~15
    # AQE query stages cost ~0.4 s codegen/scheduling EACH on the tiny
    # corpus (pure fixed overhead, amortized at real scale) — the row
    # still runs in the sf0.01 correctness gate every round
]


def run_plan(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_BENCH_REPS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from yomitoku_spark.datagen import transcripts_df
    from yomitoku_spark.plans.pipeline import extract
    from yomitoku_spark.queries import QUERIES
    from yomitoku_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    nreps: dict[str, int] = {}

    def bench(name, plan_fn):
        t0 = time.perf_counter()
        run_plan(plan_fn())  # untimed warmup: codegen + JIT + cache warm
        warm = time.perf_counter() - t0
        if warm < 3.0:
            # short queries need a 2nd pass for C2; its wall is the
            # steady-state estimate — the COLD warmup wall overestimates
            # it several-fold and starved sub-second queries of reps
            # (embedding_topk got 4 reps and a 2.57x spread in r4)
            t0 = time.perf_counter()
            run_plan(plan_fn())
            warm = time.perf_counter() - t0
        n = max(reps, min(12, int(4.5 / max(warm, 0.4))))
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            run_plan(plan_fn())
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)
        spread[name] = round(max(walls) / max(min(walls), 1e-9), 2)
        nreps[name] = n
        return walls

    # flagship: fused extraction over synthetic transcripts sized to sf
    n_convs = max(50, int(60_000 * sf))
    tdf = transcripts_df(spark, n_convs=n_convs, seed=42)
    n_turns = tdf.count()  # generation cost measured separately from extraction
    bench("extract_transcripts", lambda: extract(tdf))

    for name in BENCH_QUERIES:
        bench(name, lambda name=name: QUERIES[name](spark, sf_dir))

    # recall@3 of every approximate-ANN query vs the brute-force cosine
    # referee (embedding_topk) — rounds compare quality alongside wall
    def topk_sets(name):
        out: dict = {}
        for r in QUERIES[name](spark, sf_dir).collect():
            out.setdefault(r.query_id, set()).add(r.corpus_id)
        return out

    exact = topk_sets("embedding_topk")
    n_exact = sum(len(v) for v in exact.values())
    recall = {}
    for name in (
        "ann_lsh_topk",
        "ann_multiprobe_topk",
        "ivf_flat_topk",
        "ivf_scaled_topk",
        "ivf_lloyd_topk",
    ):
        approx = topk_sets(name)
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        recall[name] = round(hits / n_exact, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "queries_reps": nreps,
        "recall_at_3": recall,
        "reps": reps,
        "sf": sf,
        "n_turns": int(n_turns),
        "turns_per_sec_extract": round(n_turns / timings["extract_transcripts"], 1),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
