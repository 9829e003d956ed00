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

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _cpu_jiffies() -> list[int]:
    """Aggregate cpu line of /proc/stat (user … STEAL): steal is the
    only host-contention signal a microVM guest can see."""
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _steal_pct(c0: list[int], c1: list[int]) -> float:
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 1) if tot else 0.0


def _prev_artifact(repo: str) -> tuple[str, dict] | None:
    """Latest usable BENCH_r{N}.json — the drift baseline. The driver
    wraps bench stdout as {"n", "rc", …, "tail": <last 2000 chars>},
    which truncates the JSON line at the FRONT — so recover the
    per-query seconds from the fragment: every '"name": seconds' pair
    before the "queries_spread" marker belongs to the queries map."""
    import re

    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")), reverse=True):
        try:
            with open(path) as f:
                raw = f.read()
        except OSError:
            continue
        try:
            data = json.loads(raw)
        except json.JSONDecodeError:
            data = None
        if isinstance(data, dict):
            if data.get("queries"):
                return os.path.basename(path), data["queries"]
            raw = data.get("tail", "") or ""
        head = raw.split('"queries_spread"')[0]
        pairs = {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', head)
        }
        if len(pairs) >= 5:
            return os.path.basename(path), pairs
    return None

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
    "corpus_index_build",
    "minhash_lsh_pairs",
    "embedding_topk",
    "simhash_pairs",
    "ann_lsh_topk",
    "ann_multiprobe_topk",
    "ivf_flat_topk",
    "ivf_scaled_topk",
    "ivf_lloyd_topk",
    "embedding_clustered_topk",
    "ann_ivf_clustered_topk",
    "ann_ivf_pq_topk",
    "kv_items_geometric",
    "extract_scalar_cascade",
    "grid_header_derivation",
    "llm_extract_kv",
    "grid_dag_units",
    "doc_repetition_quality",
    "exact_substring_spans",
    "corpus_mixture_sample",
    "pack_chunks",
    "decontaminate_ngram",
    "pii_redaction",
    "doc_importance_weights",
    "doc_lm_perplexity",
    "semdedup_embeddings",
    "bm25_retrieval_topk",
    "doc_sliding_chunks",
    "hll_distinct_tokens",
    "cmsketch_token_counts",
    "bloom_token_membership",
    "decontaminate_bloom",
    "quantile_sketch_doclen",
    "kmv_sample_tokens",
    "adaptive_length_gate",
    "incremental_ingest_dedup",
    "kmv_overlap_langs",
    "winnowing_near_pairs",
    "sketch_drift_psi",
    "bpe_train_merges",
    "bpe_subword_counts",
    "pack_chunks_bpe",
    "pack_chunks_sharded",
    "doc_scrub_spans",
    "containment_near_pairs",
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
    evidence: dict[str, dict] = {}

    def _gc_ms() -> int:
        try:
            beans = (
                spark._jvm.java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans()
            )
            return sum(b.getCollectionTime() for b in beans)
        except Exception:
            return 0

    def _release_blocks() -> None:
        """Drop cached DataFrames and pinned RDD blocks left by the
        previous query (every localCheckpoint(eager=True) pins its
        partitions in executor storage until the Python object is
        GC'd). Without this, block-manager pressure from ~25 earlier
        queries leaks into later rows' walls: kv_items_geometric /
        extract_scalar_cascade measured 2.3x/2.7x slower at suite
        position ~26 than isolated in a fresh JVM at the SAME commit
        (r6 NOTES). Safe between queries: no registry entry memoizes
        DataFrames across calls, so nothing references the blocks."""
        try:
            spark.catalog.clearCache()
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:
            pass

    def bench(name, plan_fn):
        _release_blocks()
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
        la0, c0, g0 = _loadavg(), _cpu_jiffies(), _gc_ms()
        for _ in range(n):
            t0 = time.perf_counter()
            run_plan(plan_fn())
            walls.append(time.perf_counter() - t0)
        # per-query environment evidence across the timed reps, so a
        # >15% round-over-round mover carries its own attribution
        # (host steal / GC ramp / background load) in the artifact
        evidence[name] = {
            "steal_pct": _steal_pct(c0, _cpu_jiffies()),
            "gc_ms": _gc_ms() - g0,
            "loadavg": round(la0, 2),
        }
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

    def recall_vs(referee, names):
        exact = topk_sets(referee)
        n_exact = sum(len(v) for v in exact.values())
        out = {}
        for name in names:
            approx = topk_sets(name)
            hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
            out[name] = round(hits / n_exact, 3)
        return out

    recall = recall_vs(
        "embedding_topk",
        ("ann_lsh_topk", "ann_multiprobe_topk", "ivf_flat_topk",
         "ivf_scaled_topk", "ivf_lloyd_topk"),
    )
    # the clustered-ANN row is measured against the brute-force referee
    # over the SAME derived clustered vectors
    recall.update(
        recall_vs(
            "embedding_clustered_topk",
            ("ann_ivf_clustered_topk", "ann_ivf_pq_topk"),
        )
    )

    # candidates/query and scan fraction per ANN config: recall without
    # its candidate volume is not a comparable number (a 0.88-recall
    # config scanning half the corpus is brute force with extra steps)
    from pyspark.sql import functions as FN

    from yomitoku_spark.operators import similarity as SIM
    from yomitoku_spark.queries import (
        _CL_CELLS, _CL_LLOYD, _CL_N, _CL_PROBE, _CL_W, _MP_FLIP, _MP_PLANES,
        _MP_TABLES, _PQ_RERANK, t as read_table,
    )

    e = read_table(spark, sf_dir, "embeddings")
    n_vec = e.count()
    scan = {}

    def _scan(name, pairs_df, **extra):
        n_pairs = pairs_df.count()
        scan[name] = {
            "cand_per_query": round(n_pairs / n_vec, 1),
            "scan_fraction": round(n_pairs / n_vec / n_vec, 3),
            **extra,
        }

    for name, cells, probe, lloyd, frame in (
        ("ivf_flat_topk", 8, 2, 0, e),
        ("ivf_scaled_topk", 64, 12, 0, e),
        ("ivf_lloyd_topk", 8, 2, 2, e),
        ("ann_ivf_clustered_topk", _CL_CELLS, _CL_PROBE, _CL_LLOYD,
         SIM.clustered_embeddings(e, n_clusters=_CL_N, weight=_CL_W)),
        # PQ row: same candidate stage at lloyd=0; its full-vector
        # traffic is additionally bounded by rerank (recorded in the
        # registry docstring), which cand/q alone does not show
        ("ann_ivf_pq_topk", _CL_CELLS, _CL_PROBE, 0,
         SIM.clustered_embeddings(e, n_clusters=_CL_N, weight=_CL_W)),
    ):
        vec_col = "cvec" if name.startswith("ann_ivf_") else "embedding"
        extra = (
            {"full_vectors_per_query": _PQ_RERANK}
            if name == "ann_ivf_pq_topk"
            else {}
        )
        _scan(name, SIM.ivf_candidate_pairs(
            frame, "vec_id", vec_col, n_cells=cells, n_probe=probe,
            lloyd_iters=lloyd,
        ), **extra)
    # multi-probe LSH candidates: same construction as the query's
    # candidate stage (base-bucket index side, probed query side)
    sigs = SIM.lsh_buckets_quantized(
        e, n_planes=_MP_PLANES, n_tables=_MP_TABLES, n_flip=_MP_FLIP
    ).localCheckpoint(eager=True)
    _scan(
        "ann_multiprobe_topk",
        sigs.select(FN.col("id").alias("query_id"), "table", "bucket")
        .join(
            sigs.filter(FN.col("probe") == 0).select(
                FN.col("id").alias("corpus_id"), "table", "bucket"
            ),
            ["table", "bucket"],
        )
        .filter(FN.col("query_id") != FN.col("corpus_id"))
        .select("query_id", "corpus_id")
        .distinct(),
    )

    total = round(sum(timings.values()), 3)

    # round-over-round drift attribution (r5 verdict item 4): diff
    # against the previous round's artifact; every |delta| > 15% mover
    # carries its spread + steal/GC/loadavg evidence inline
    drift: dict = {}
    prev = _prev_artifact(os.path.dirname(os.path.abspath(__file__)))
    if prev:
        prev_name, prev_q = prev
        deltas = {}
        movers = {}
        for name, v in timings.items():
            p = prev_q.get(name)
            if p:
                d = round(100.0 * (v - p) / p, 1)
                deltas[name] = d
                if abs(d) > 15.0:
                    movers[name] = {
                        "delta_pct": d,
                        "prev_s": p,
                        "cur_s": v,
                        "spread": spread.get(name),
                        **evidence.get(name, {}),
                    }
        drift = {"baseline": prev_name, "delta_pct": deltas, "movers": movers}
    out = {
        "metric": "e2e_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "queries_reps": nreps,
        "recall_at_3": recall,
        "ann_scan": scan,
        "drift_vs_prev": drift,
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
