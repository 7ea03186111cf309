"""Scaling-efficiency evidence: identical job + identical input at two parallelism levels.

BASELINE.json's north_rule demands throughput scaling efficiency ≥ 0.8 from N to
4N executors. No real cluster exists in this sandbox, so (per BASELINE.md's
sandbox protocol) we run the SAME pipeline on the SAME materialized input at
local[8] and local[32] in separate JVMs and report:

    efficiency = (throughput_32 / throughput_8) / 4

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from hatchery_spark.session import get_spark
from hatchery_spark.config import DEFAULT_ROUTES
from hatchery_spark.datagen import service_catalog_df
from hatchery_spark.pipeline import prepare
from hatchery_spark.router import sink_counts

cpus = int(sys.argv[1])
input_path = sys.argv[2]
spark = get_spark(f"scaling_{{cpus}}", cpus=cpus, shuffle_partitions=max(cpus, 8))
spark.range(1000).count()  # JVM warm-up
n = spark.read.parquet(input_path).count()  # warms the page cache too

def build():
    # fresh DataFrame/RDD lineage per run: prevents Spark's shuffle-stage
    # reuse from letting the timed run skip the scan+parse+enrich mappers
    df = spark.read.parquet(input_path)
    return sink_counts(prepare(df, service_catalog_df(spark)), DEFAULT_ROUTES)

build().collect()  # warm-up: JIT-compile the generated stages before timing
t0 = time.perf_counter()
counts = build().collect()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{
    "cpus": cpus, "rows": n, "sec": round(dt, 3),
    "turns_per_sec": round(n / dt, 1),
    "counts": {{r['route_id']: r['row_count'] for r in counts}},
}}))
"""


def run_at(cpus: int, input_path: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), input_path],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run at local[{cpus}] produced no RESULT:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    # reusable input dir: generation is skipped when the same (rows, seed)
    # input already exists (SPARK_GRAFT_SCALING_DIR overrides)
    base = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/hs_scaling_input")
    input_path = f"{base}/transcripts_{n_rows}_seed42"
    if not os.path.exists(f"{input_path}/_SUCCESS"):
        gen = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r});\n"
             "from hatchery_spark.session import get_spark\n"
             "from hatchery_spark.datagen import transcripts_df\n"
             f"df = transcripts_df(get_spark('gen', cpus=32), {n_rows}, seed=42)\n"
             f"df.write.mode('overwrite').parquet({input_path!r})\n"],
            capture_output=True, text=True, timeout=3600,
        )
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-3000:])
    if True:
        lo = run_at(8, input_path)
        hi = run_at(32, input_path)

    assert lo["counts"] == hi["counts"], "count parity broken between parallelism levels"
    eff = round((hi["turns_per_sec"] / lo["turns_per_sec"]) / 4, 3)
    result = {
        "metric": "scaling_efficiency_local8_to_local32",
        "value": eff,
        "unit": "ratio",
        "rows": n_rows,
        "local8": lo,
        "local32": hi,
        "target": 0.8,
    }
    print(json.dumps(result))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (sandbox protocol)

North rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (no real cluster): the identical
parse->enrich->route->aggregate job on the identical materialized input
({n_rows:,} synthetic transcript turns, seed=42), run in separate JVMs at
local[8] and local[32]. Per-sink counts were asserted equal between runs.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  | {lo['sec']} | {lo['turns_per_sec']:,} |
| local[32] | {hi['sec']} | {hi['turns_per_sec']:,} |

**Scaling efficiency = (thr32 / thr8) / 4 = {eff}** (target >= 0.8)

Per-sink counts (identical at both levels): {json.dumps(lo['counts'])}

Reproduce: `python scripts/scaling_bench.py {n_rows}`
""")


if __name__ == "__main__":
    main()
