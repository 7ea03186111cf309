"""Scaling-efficiency evidence: identical job + identical input at two parallelism levels.

BASELINE.json's north_rule demands throughput scaling efficiency ≥ 0.8 from N
to 4N executors. No real cluster exists in this sandbox, and the sandbox host
throttles CPU in bursts (identical runs vary 5-20× wall-clock minutes apart),
so the protocol controls for host drift:

  * ONE local[32] JVM; "cluster size k" = the job's parallelism pinned to k
    concurrent tasks (input coalesce(k) + spark.sql.shuffle.partitions=k,
    AQE partition-coalescing off for the measurement).
  * k=8 and k=32 samples are INTERLEAVED (8,32,8,32,…) so both levels sample
    the same host conditions; per-level time = min over samples (the
    throttle-free observations).
  * per-sink counts asserted identical across every run (parity invariant).

    efficiency = (throughput_32 / throughput_8) / 4

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [n_rows] [n_pairs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from hatchery_spark.session import get_spark
    from hatchery_spark.config import DEFAULT_ROUTES
    from hatchery_spark.datagen import transcripts_df, service_catalog_df
    from hatchery_spark.pipeline import prepare
    from hatchery_spark.router import sink_counts

    base = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/hs_scaling_input")
    input_path = f"{base}/transcripts_{n_rows}_seed42"

    spark = get_spark(
        "scaling", cpus=32,
        extra_conf={
            # pin parallelism exactly: no runtime partition coalescing
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    if not os.path.exists(f"{input_path}/_SUCCESS"):
        transcripts_df(spark, n_rows, seed=42).write.mode("overwrite").parquet(input_path)
    spark.read.parquet(input_path).count()  # page-cache warm

    def build(k: int):
        spark.conf.set("spark.sql.shuffle.partitions", str(k))
        df = spark.read.parquet(input_path).coalesce(k)
        return sink_counts(prepare(df, service_catalog_df(spark)), DEFAULT_ROUTES)

    # JIT warm-up for both plan shapes before any timing
    counts_ref = {r["route_id"]: r["row_count"] for r in build(8).collect()}
    build(32).collect()

    samples: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(n_pairs):
        for k in (8, 32):
            t0 = time.perf_counter()
            counts = {r["route_id"]: r["row_count"] for r in build(k).collect()}
            samples[k].append(round(time.perf_counter() - t0, 3))
            assert counts == counts_ref, f"count parity broken at k={k}"

    best8, best32 = min(samples[8]), min(samples[32])
    thr8, thr32 = n_rows / best8, n_rows / best32
    eff = round((thr32 / thr8) / 4, 3)
    result = {
        "metric": "scaling_efficiency_parallelism8_to_32",
        "value": eff,
        "unit": "ratio",
        "rows": n_rows,
        "samples_sec": samples,
        "best_sec": {"8": best8, "32": best32},
        "turns_per_sec": {"8": round(thr8, 1), "32": round(thr32, 1)},
        "target": 0.8,
        "counts": counts_ref,
    }
    print(json.dumps(result))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (sandbox protocol)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, and its host throttles CPU
in bursts (identical runs vary 5-20x minutes apart), so the protocol controls
for host drift: one local[32] JVM, job parallelism pinned to k concurrent
tasks (coalesce(k) + shuffle.partitions=k, AQE coalescing off), k=8 and k=32
samples interleaved, min over {n_pairs} samples per level. Input:
{n_rows:,} synthetic transcript turns (seed=42), identical bytes for every
run; per-sink counts asserted identical across all runs.

| parallelism | best wall sec | turns/sec | all samples (sec) |
|---|---|---|---|
| 8 tasks  | {best8} | {thr8:,.0f} | {samples[8]} |
| 32 tasks | {best32} | {thr32:,.0f} | {samples[32]} |

**Scaling efficiency = (thr32 / thr8) / 4 = {eff}** (target >= 0.8)

Per-sink counts (identical at both levels): {json.dumps(counts_ref)}

The job measured is the full parse -> broadcast-enrich -> route fan-out ->
per-sink aggregate over the materialized transcripts table (the BASELINE.json
headline path). Steady-state absolute throughput on this host:
~{thr32/1e6:.1f}M turns/sec at 32 tasks.

Reproduce: `python scripts/scaling_bench.py {n_rows} {n_pairs}`
""")


if __name__ == "__main__":
    main()
