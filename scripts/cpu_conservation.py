"""CPU-work-conservation evidence for the N→4N scaling clause.

The sandbox's scaling number (BENCH/BASELINE.md) is wall-clock based and
therefore bounded by ONE box's shared memory bus. This script adds the
complementary measurement: the SUM OF EXECUTOR CPU TIME the job burns at 8
vs 32 task parallelism, read from Spark's own task metrics (the UI REST
API, /api/v1/applications/<app>/stages).

CPU-seconds are NOT expected to be equal at both levels on this host: 32
SMT threads share physical cores and one memory bus, so the SAME work
burns more on-CPU time per row at k=32 (stall cycles count as CPU time).
The honest bar is therefore RELATIVE: the job's cpu32/cpu8 inflation vs
the inflation of a pure-JVM compute kernel (no I/O, no shuffle, no Python)
doing fixed work at the same two thread counts. job_inflation ≈
calib_inflation ⇒ the plan adds NO parallelism-dependent work — no serial
stage, no duplicated effort, no k-dependent overhead — and the wall gap is
the box's thread-sharing, the term a real N→4N cluster scales per-node.
A plan defect (driver loop, quadratic recombination, k-dependent
recomputation) would show up as job inflation FAR above the kernel's.

Protocol: same pinning as scripts/scaling_bench.py (coalesce(k) +
shuffle.partitions=k, AQE coalescing off), same 80M-row materialized
input, CPU-probe brackets around each pair, per-sink count parity
asserted; pairs whose legs exceed 1.3× the best same-leg time are
discarded (mid-leg throttle slips past probe brackets — the
scaling_bench dispersion lesson). Stage attribution by diffing the
completed-stage set around each leg.

Writes BENCH/cpu_conservation.json; scripts/scaling_bench.py embeds the
matching section into BENCH/BASELINE.md on every regeneration (this script
appends it directly if the marker is absent).

Usage: python scripts/cpu_conservation.py [n_rows] [n_pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = "## CPU-work conservation"


def cpu_section(d: dict) -> str:
    rows = "\n".join(
        f"| {i + 1} | {p['cpu8_sec']} | {p['cpu32_sec']} | {p['cpu_ratio']} | "
        f"{p['t8']} | {p['t32']} | {p['wall_eff']} |"
        for i, p in enumerate(d["pairs"])
    )
    return f"""

{MARKER} (executor CPU-seconds at 8 vs 32 tasks, {d['rows']:,} rows)

Wall-clock efficiency on one box is capped by the shared memory bus; task
CPU time (executorCpuTime summed over each leg's stages) is the
complementary axis. On this SMT host the SAME work burns more CPU-seconds
at 32 threads than at 8 (threads share cores; stall cycles are on-CPU), so
the bar is RELATIVE: the job's cpu32/cpu8 inflation vs a pure-JVM compute
kernel's inflation at the same thread counts. Ratios agreeing ⇒ the plan
adds no parallelism-dependent work (no serial stage, no duplication) — the
wall gap is the box's thread-sharing, which a real N→4N cluster scales out
per-node.

| pair | cpu8 (s) | cpu32 (s) | cpu32/cpu8 | t8 wall | t32 wall | wall eff |
|---|---|---|---|---|---|---|
{rows}

**Job cpu32/cpu8 (median) = {d['cpu_ratio_median']}** vs pure-JVM kernel
inflation **{d['calib_cpu_ratio_median']}** → relative work ratio
**{d['job_vs_calib_ratio']}** (1.0 = perfect conservation). Tasks are
on-CPU {d['cpu_over_runtime_pct_32']}% of their runtime at k=32 (not
blocked on I/O — stalled on memory while on-CPU, the bus signature).
CPU-seconds per million rows: {d['cpu_sec_per_mrow_8']} at k=8,
{d['cpu_sec_per_mrow_32']} at k=32.

Reproduce: `python scripts/cpu_conservation.py {d['rows']} {d['n_pairs_requested']}`
"""


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as FF

    from hatchery_spark.session import get_spark
    from hatchery_spark.config import DEFAULT_ROUTES
    from hatchery_spark.datagen import transcripts_df, service_catalog_df
    from hatchery_spark.pipeline import prepare
    from hatchery_spark.router import sink_counts

    spark = get_spark(
        "cpu_conservation", cpus=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    base = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/hs_scaling_input")
    input_path = f"{base}/transcripts_{n_rows}_seed42"
    if not os.path.exists(f"{input_path}/_SUCCESS"):
        transcripts_df(spark, n_rows, seed=42).write.mode("overwrite").parquet(input_path)
    spark.read.parquet(input_path).count()  # page-cache warm

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages() -> dict[tuple[int, int], dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            data = json.load(r)
        return {(s["stageId"], s["attemptId"]): s for s in data}

    def build(k: int):
        spark.conf.set("spark.sql.shuffle.partitions", str(k))
        df = spark.read.parquet(input_path).coalesce(k)
        return sink_counts(prepare(df, service_catalog_df(spark)), DEFAULT_ROUTES)

    def probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 32).select(
            FF.avg(FF.pmod(FF.xxhash64("id"), FF.lit(1000)))
        ).collect()
        return time.perf_counter() - t0

    def timed(action) -> tuple[float, float, float]:
        """(wall_s, cpu_s, run_s) for one action, via completed-stage diff."""
        before = set(stages())
        t0 = time.perf_counter()
        action()
        wall = time.perf_counter() - t0
        new = [s for key, s in stages().items() if key not in before]
        cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        run = sum(s.get("executorRunTime", 0) for s in new) / 1e3
        return wall, cpu, run

    counts_ref: dict = {}

    def job_leg(k: int):
        def act():
            counts = {r["route_id"]: r["row_count"] for r in build(k).collect()}
            if counts_ref:
                assert counts == counts_ref, f"count parity broken at k={k}"
            else:
                counts_ref.update(counts)
        return timed(act)

    calib_n = 2_000_000_000  # ~20 s at 32 threads: same regime as the job legs

    def calib_leg(k: int):
        return timed(lambda: spark.range(0, calib_n, 1, k).select(
            FF.avg(FF.pmod(FF.xxhash64("id"), FF.lit(1000)))
        ).collect())

    # JIT warm-up of every plan shape + probe reference
    job_leg(8)
    job_leg(32)
    calib_leg(32)
    probe_hist = [probe() for _ in range(3)]

    def collect(leg_fn, label: str, want: int) -> list[dict]:
        pairs = []
        for i in range(want * 4):
            p_before = probe()
            t8, cpu8, run8 = leg_fn(8)
            t32, cpu32, run32 = leg_fn(32)
            p_after = probe()
            probe_hist.extend([p_before, p_after])
            ref = sorted(probe_hist)[min(len(probe_hist) - 1, len(probe_hist) // 10)]
            clean = p_before <= 1.3 * ref and p_after <= 1.3 * ref
            row = {
                "t8": round(t8, 3), "t32": round(t32, 3),
                "wall_eff": round((t8 / t32) / 4, 3),
                "cpu8_sec": round(cpu8, 2), "cpu32_sec": round(cpu32, 2),
                "run8_sec": round(run8, 2), "run32_sec": round(run32, 2),
                "cpu_ratio": round(cpu32 / cpu8, 3) if cpu8 else None,
                "clean": clean,
                "probes": [round(p_before, 3), round(p_after, 3)],
            }
            print(f"[{label}] pair {i + 1}: {row}", file=sys.stderr)
            if clean:
                pairs.append(row)
            if len(pairs) >= want:
                break
        # mid-leg throttle filter (probe brackets can miss a burst inside a
        # 10-30 s leg): keep pairs whose legs are within 1.3x the best
        # same-leg time of the collected set; never fabricate — if fewer
        # than 2 survive, keep the original clean set and flag it
        best8 = min(p["t8"] for p in pairs)
        best32 = min(p["t32"] for p in pairs)
        tight = [p for p in pairs
                 if p["t8"] <= 1.3 * best8 and p["t32"] <= 1.3 * best32]
        return tight if len(tight) >= 2 else pairs

    calib_pairs = collect(calib_leg, "calib", max(2, n_pairs - 1))
    job_pairs = collect(job_leg, "cpu", n_pairs)

    ratios = [p["cpu_ratio"] for p in job_pairs]
    calib_ratios = [p["cpu_ratio"] for p in calib_pairs]
    job_ratio = statistics.median(ratios)
    calib_ratio = statistics.median(calib_ratios)
    out = {
        "metric": "cpu_work_conservation_8_to_32",
        "rows": n_rows,
        "n_pairs_requested": n_pairs,
        "pairs": job_pairs,
        "calib_pairs": calib_pairs,
        "cpu_ratio_median": round(job_ratio, 3),
        "calib_cpu_ratio_median": round(calib_ratio, 3),
        "job_vs_calib_ratio": round(job_ratio / calib_ratio, 3),
        "wall_eff_median": round(
            statistics.median(p["wall_eff"] for p in job_pairs), 3
        ),
        "cpu_over_runtime_pct_32": round(
            100 * statistics.median(
                p["cpu32_sec"] / p["run32_sec"] for p in job_pairs
            ), 1
        ),
        "cpu_sec_per_mrow_8": round(
            statistics.median(p["cpu8_sec"] for p in job_pairs) / (n_rows / 1e6), 3
        ),
        "cpu_sec_per_mrow_32": round(
            statistics.median(p["cpu32_sec"] for p in job_pairs) / (n_rows / 1e6), 3
        ),
        "counts": counts_ref,
    }
    print(json.dumps(out))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/cpu_conservation.json", "w") as f:
        json.dump(out, f, indent=1)

    baseline = f"{REPO}/BENCH/BASELINE.md"
    if os.path.exists(baseline):
        text = open(baseline).read()
        if MARKER not in text:
            with open(baseline, "a") as f:
                f.write(cpu_section(out))


if __name__ == "__main__":
    main()
